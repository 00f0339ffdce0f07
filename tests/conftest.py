"""Test harness config: force CPU backend with 8 virtual devices so
multi-chip sharding tests run without TPU hardware (the TPU-native analogue
of the reference's absent multi-node simulation — see SURVEY.md §4)."""

import os

# Must run before jax is imported anywhere in the test process.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
