"""gather_rows_mxu == take_along_axis (exact), with ok-mask semantics."""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from pointmvsnet_tpu.ops.mxu_gather import gather_rows_mxu


@pytest.mark.parametrize("dtype", [np.float32, jnp.bfloat16])
def test_exact_vs_take(rng, dtype):
    r, w, n = 300, 24, 200
    table = jnp.asarray(rng.randn(r, w), dtype)
    # block-coherent indices: ramp + jitter
    idx = np.clip(np.linspace(0, r - 1, n) + rng.randint(-5, 6, n),
                  0, r - 1).astype(np.int32)
    out, ok = gather_rows_mxu(table, jnp.asarray(idx), block=64, span=128)
    want = np.asarray(jnp.take(table, jnp.asarray(idx), axis=0), np.float32)
    assert bool(ok.all())
    # bit-exact: one-hot products and zero-accumulation are exact in fp
    np.testing.assert_array_equal(np.asarray(out, np.float32), want)


def test_leading_batch_dims(rng):
    b, v, r, w, n = 2, 3, 150, 16, 96
    table = jnp.asarray(rng.randn(b, v, r, w).astype(np.float32))
    idx = np.clip(np.linspace(0, r - 1, n)[None, None]
                  + rng.randint(-4, 5, (b, v, n)), 0, r - 1).astype(np.int32)
    out, ok = gather_rows_mxu(table, jnp.asarray(idx), block=32, span=96)
    assert bool(ok.all())
    want = np.take_along_axis(np.asarray(table), idx[..., None], axis=-2)
    np.testing.assert_array_equal(np.asarray(out), want)


def test_out_of_span_masked(rng):
    """A block whose indices straddle more than ``span`` rows reports
    ok=False for the far entries and returns zero rows for them."""
    r, w = 400, 8
    table = jnp.asarray(rng.randn(r, w).astype(np.float32))
    idx = np.zeros(64, np.int32)
    idx[::2] = 390            # span window anchors at min=0 → 390 misses
    out, ok = gather_rows_mxu(table, jnp.asarray(idx), block=64, span=64)
    ok = np.asarray(ok)
    out = np.asarray(out)
    assert not ok[::2].any() and ok[1::2].all()
    np.testing.assert_array_equal(out[::2], 0.0)
    np.testing.assert_array_equal(out[1::2],
                                  np.broadcast_to(np.asarray(table)[0],
                                                  (32, w)))


def test_ragged_tail_padding(rng):
    """N not divisible by block: tail entries still gathered exactly."""
    r, w, n = 100, 8, 70
    table = jnp.asarray(rng.randn(r, w).astype(np.float32))
    idx = np.clip(np.arange(n) + rng.randint(-2, 3, n), 0, r - 1).astype(np.int32)
    out, ok = gather_rows_mxu(table, jnp.asarray(idx), block=32, span=64)
    assert out.shape == (n, w) and ok.shape == (n,)
    assert bool(ok.all())
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(table)[idx])


def test_span_clamped_to_table(rng):
    """span > R degrades to whole-table slabs (still exact)."""
    r, w, n = 40, 8, 64
    table = jnp.asarray(rng.randn(r, w).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, r, n).astype(np.int32))
    out, ok = gather_rows_mxu(table, idx, block=32, span=512)
    assert bool(ok.all())
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(table)[np.asarray(idx)])
