"""Pallas windowed-kNN kernel vs the XLA reference implementation
(SURVEY.md §4: kernel-vs-XLA equivalence tests; runs in interpret mode on
the CPU test backend)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pointmvsnet_tpu.ops.knn import window_knn
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


@pytest.mark.parametrize("g,h,w,k,window,tile_h", [
    (5, 8, 16, 16, 5, 4),
    (5, 8, 16, 16, 5, 8),
    (3, 6, 8, 8, 3, 2),
    (5, 4, 8, 10, 5, 4),
])
def test_matches_xla_reference(rng, g, h, w, k, window, tile_h):
    pts = jnp.asarray(rng.rand(2, g * h * w, 3).astype(np.float32) * 3)
    ref = np.asarray(window_knn(pts, (g, h, w), k, window))
    got = np.asarray(pallas_window_knn(pts, (g, h, w), k, window,
                                       tile_h=tile_h, interpret=True))
    assert got.shape == ref.shape
    assert got.min() >= 0 and got.max() < g * h * w
    np.testing.assert_allclose(_dist_sets(np.asarray(pts), got),
                               _dist_sets(np.asarray(pts), ref), atol=1e-5)


def test_self_is_first(rng):
    g, h, w = 5, 4, 8
    pts = jnp.asarray(rng.rand(1, g * h * w, 3).astype(np.float32) * 10)
    idx = np.asarray(pallas_window_knn(pts, (g, h, w), 8, 5, tile_h=4,
                                       interpret=True))
    np.testing.assert_array_equal(idx[0, :, 0], np.arange(g * h * w))


def test_realistic_flow_grid(rng):
    """Hypothesis-grid geometry as PointFlow produces it: G depth levels a
    fixed step apart along rays, smooth spatial variation."""
    g, h, w, k = 5, 8, 12, 16
    base = rng.rand(1, h, w, 3).astype(np.float32)
    base[..., 2] += 10.0
    step = 0.05
    pts = np.concatenate([base + [0, 0, (i - 2) * step] for i in range(g)],
                         axis=0)  # (G, h, w, 3)
    pts = jnp.asarray(pts.reshape(1, g * h * w, 3))
    ref = np.asarray(window_knn(pts, (g, h, w), k, 5))
    got = np.asarray(pallas_window_knn(pts, (g, h, w), k, 5, tile_h=4,
                                       interpret=True))
    np.testing.assert_allclose(_dist_sets(np.asarray(pts), got),
                               _dist_sets(np.asarray(pts), ref), atol=1e-5)
