"""Pallas windowed-kNN kernel vs the XLA reference implementation
(SURVEY.md §4: kernel-vs-XLA equivalence tests).

Runs in interpret mode on the CPU test backend — sizes are kept tiny
because interpretation is orders slower than the compiled kernel; the
full-size on-chip equivalence was additionally verified on TPU v5e
(flow1/flow2 shapes, exact index match — see commit log).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pointmvsnet_tpu.ops.knn import window_knn, window_knn_auto
from pointmvsnet_tpu.ops.pallas.knn import pallas_window_knn


def _dist_sets(points, idx):
    """kNN index sets → sorted neighbor-distance matrix (order-insensitive
    comparison; ties may legitimately resolve differently)."""
    b = points.shape[0]
    out = []
    for i in range(b):
        nb = points[i][idx[i]]                     # (P, K, 3)
        d = np.linalg.norm(nb - points[i][:, None], axis=-1)
        out.append(np.sort(d, axis=-1))
    return np.stack(out)


@pytest.mark.parametrize("g,h,w,k,window", [
    (3, 8, 8, 6, 3),
    (5, 8, 16, 12, 5),
])
def test_matches_xla_reference(rng, g, h, w, k, window):
    pts = jnp.asarray(rng.rand(1, g * h * w, 3).astype(np.float32) * 3)
    ref = np.asarray(window_knn(pts, (g, h, w), k, window))
    got = np.asarray(pallas_window_knn(pts, (g, h, w), k, window,
                                       interpret=True))
    assert got.shape == ref.shape
    assert got.min() >= 0 and got.max() < g * h * w
    np.testing.assert_allclose(_dist_sets(np.asarray(pts), got),
                               _dist_sets(np.asarray(pts), ref), atol=1e-5)


def test_self_is_first_and_tiled(rng):
    g, h, w = 3, 16, 8
    pts = jnp.asarray(rng.rand(1, g * h * w, 3).astype(np.float32) * 10)
    idx = np.asarray(pallas_window_knn(pts, (g, h, w), 6, 3, tile_h=8,
                                       interpret=True))
    np.testing.assert_array_equal(idx[0, :, 0], np.arange(g * h * w))


def test_auto_dispatch_uses_xla_on_cpu(rng):
    """On the CPU test backend, "auto" must take the XLA path."""
    g, h, w = 3, 8, 8
    pts = jnp.asarray(rng.rand(1, g * h * w, 3).astype(np.float32))
    out = np.asarray(window_knn_auto(pts, (g, h, w), 6, 3, impl="auto"))
    ref = np.asarray(window_knn(pts, (g, h, w), 6, 3))
    np.testing.assert_array_equal(out, ref)


def test_column_split_path(rng, monkeypatch):
    """Wide-grid column splitting must match the unsplit kernel exactly."""
    import pointmvsnet_tpu.ops.pallas.knn as pk
    g, h, w, k, window = 3, 8, 24, 6, 3
    pts = jnp.asarray(rng.rand(1, g * h * w, 3).astype(np.float32) * 3)
    ref = np.asarray(window_knn(pts, (g, h, w), k, window))
    # force the split path by shrinking the budget
    monkeypatch.setattr(pk, "_VMEM_BUDGET", pk._vmem_need(g, 9, 128, 8) - 1)
    got = np.asarray(pk.pallas_window_knn(pts, (g, h, w), k, window,
                                          interpret=True))
    np.testing.assert_allclose(_dist_sets(np.asarray(pts), got),
                               _dist_sets(np.asarray(pts), ref), atol=1e-5)
