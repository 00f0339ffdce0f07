"""kNN + gather tests: windowed/blockwise implementations vs the dense
O(N²) reference semantics (SURVEY.md §7 step 6 correctness baseline)."""

import numpy as np
import jax.numpy as jnp

from pointmvsnet_tpu.ops.knn import (
    blockwise_knn,
    gather_knn,
    knn_indices_bruteforce,
    window_knn,
)


def neighbor_sets_equal(a_idx, b_idx, points):
    """Compare kNN results as *distance multisets* (index order may differ
    among equidistant neighbors)."""
    for b in range(points.shape[0]):
        pa = points[b][a_idx[b]]  # (N, K, 3)
        pb = points[b][b_idx[b]]
        da = np.sort(np.linalg.norm(pa - points[b][:, None], axis=-1), axis=-1)
        db = np.sort(np.linalg.norm(pb - points[b][:, None], axis=-1), axis=-1)
        np.testing.assert_allclose(da, db, atol=1e-4)


def test_gather_knn(rng):
    feats = jnp.asarray(rng.rand(2, 10, 5).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 10, size=(2, 7, 3)), jnp.int32)
    out = np.asarray(gather_knn(feats, idx))
    assert out.shape == (2, 7, 3, 5)
    f = np.asarray(feats)
    i = np.asarray(idx)
    for b in range(2):
        for n in range(7):
            for k in range(3):
                np.testing.assert_array_equal(out[b, n, k], f[b, i[b, n, k]])


def test_gather_knn_grad(rng):
    import jax
    feats = jnp.asarray(rng.rand(1, 6, 4).astype(np.float32))
    idx = jnp.asarray([[[0, 0, 5], [2, 3, 3]]], jnp.int32)
    g = jax.grad(lambda f: gather_knn(f, idx).sum())(feats)
    # scatter-add of ones: index 0 twice, 3 twice, 2 and 5 once, 1/4 never
    expect = np.zeros((1, 6, 4), np.float32)
    for i in [0, 0, 5, 2, 3, 3]:
        expect[0, i] += 1
    np.testing.assert_array_equal(np.asarray(g), expect)


def test_blockwise_vs_bruteforce(rng):
    pts = jnp.asarray(rng.rand(2, 300, 3).astype(np.float32))
    ref = np.asarray(knn_indices_bruteforce(pts, 8))
    out = np.asarray(blockwise_knn(pts, pts, 8, block=64))
    neighbor_sets_equal(out, ref, np.asarray(pts))


def test_blockwise_nearest_is_self(rng):
    pts = jnp.asarray(rng.rand(1, 100, 3).astype(np.float32))
    out = np.asarray(blockwise_knn(pts, pts, 4, block=32))
    np.testing.assert_array_equal(out[0, :, 0], np.arange(100))


def test_window_knn_matches_bruteforce_when_window_covers_grid(rng):
    """With window ≥ grid extent the windowed kNN is exact global kNN."""
    g, h, w = 3, 5, 5
    pts_grid = rng.rand(1, g, h, w, 3).astype(np.float32) * 0.1
    # spread the grid so spatial structure dominates (genuine 3D positions)
    for y in range(h):
        for x in range(w):
            pts_grid[0, :, y, x, 0] += x * 0.5
            pts_grid[0, :, y, x, 1] += y * 0.5
    pts = jnp.asarray(pts_grid.reshape(1, g * h * w, 3))
    out = np.asarray(window_knn(pts, (g, h, w), 10, window=2 * max(h, w) - 1))
    ref = np.asarray(knn_indices_bruteforce(pts, 10))
    neighbor_sets_equal(out, ref, np.asarray(pts))


def test_window_knn_locality(rng):
    """Neighbors returned must lie inside the spatial window and all
    hypothesis levels must be reachable."""
    g, h, w, k, win = 5, 8, 9, 16, 5
    pts = jnp.asarray(rng.rand(1, g * h * w, 3).astype(np.float32))
    idx = np.asarray(window_knn(pts, (g, h, w), k, win))
    assert idx.shape == (1, g * h * w, k)
    assert idx.min() >= 0 and idx.max() < g * h * w
    r = win // 2
    for q in [0, w - 1, (h - 1) * w, h * w - 1, 3 * h * w + 4 * w + 4]:
        qy, qx = (q % (h * w)) // w, (q % (h * w)) % w
        for j in idx[0, q]:
            jy, jx = (int(j) % (h * w)) // w, (int(j) % (h * w)) % w
            assert abs(jy - qy) <= r and abs(jx - qx) <= r


def test_window_knn_self_first(rng):
    g, h, w = 5, 6, 7
    pts = jnp.asarray(rng.rand(1, g * h * w, 3).astype(np.float32) * 10)
    idx = np.asarray(window_knn(pts, (g, h, w), 8, 5))
    np.testing.assert_array_equal(idx[0, :, 0], np.arange(g * h * w))
