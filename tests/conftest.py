"""Test harness config: force CPU backend with 8 virtual devices so
multi-chip sharding tests run without TPU hardware (the TPU-native analogue
of the reference's absent multi-node simulation — see SURVEY.md §4).

NOTE: this environment pins ``JAX_PLATFORMS=axon`` (the TPU tunnel) via a
site hook, so the env var alone is not enough — ``jax.config.update``
before any computation is what actually wins.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
