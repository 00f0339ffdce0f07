"""Windowed VMEM gather (ops/pallas/gather.py) — exactness vs jnp.take.

Runs the kernel in interpreter mode on CPU (conftest forces the platform);
the same code path compiles on TPU. Reference semantics: the op must be
bit-identical to ``table[idx]`` for EVERY input — coherent streams take the
windowed fast path, incoherent ones the lax.cond exact fallback.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pointmvsnet_tpu.ops.pallas.gather import gather_rows_windowed


def _coherent_idx(rng, r, n, jitter=512):
    base = np.linspace(0, r - jitter - 64, n)
    return np.clip((base + rng.randint(0, jitter, n)).astype(np.int32),
                   0, r - 1)


@pytest.mark.parametrize("width", [32, 64, 128, 256])
@pytest.mark.parametrize("mechanism", ["take", "loop"])
def test_windowed_gather_exact_coherent(width, mechanism):
    rng = np.random.RandomState(width)
    r, n = 6000, 1024
    table = jnp.asarray(rng.randn(r, width).astype(np.float32))
    idx = _coherent_idx(rng, r, n)
    got = np.asarray(gather_rows_windowed(table, jnp.asarray(idx),
                                          span=1024, block=256,
                                          mechanism=mechanism))
    np.testing.assert_array_equal(got, np.asarray(table)[idx])


def test_windowed_gather_fallback_incoherent():
    rng = np.random.RandomState(3)
    r, n, width = 6000, 1024, 64
    table = jnp.asarray(rng.randn(r, width).astype(np.float32))
    idx = rng.randint(0, r, n).astype(np.int32)      # range >> window
    got = np.asarray(gather_rows_windowed(table, jnp.asarray(idx),
                                          span=512, block=256))
    np.testing.assert_array_equal(got, np.asarray(table)[idx])


def test_windowed_gather_ragged_n_and_bf16():
    """N not a multiple of block; bf16 table; borders of the row range."""
    rng = np.random.RandomState(5)
    r, n, width = 4096, 777, 32
    table = jnp.asarray(rng.randn(r, width).astype(np.float32)).astype(
        jnp.bfloat16)
    idx = _coherent_idx(rng, r, n)
    idx[0], idx[-1] = 0, r - 1                       # extremes (fallback ok)
    got = np.asarray(gather_rows_windowed(table, jnp.asarray(idx),
                                          span=1024, block=256)
                     .astype(jnp.float32))
    ref = np.asarray(table.astype(jnp.float32))[idx]
    np.testing.assert_array_equal(got, ref)
