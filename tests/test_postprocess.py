"""Fusion + PLY + point-cloud metric tests: synthetic multi-view depth maps
with known geometry must fuse into the GT plane and score ~0 error."""

import numpy as np
import pytest

from pointmvsnet_tpu.postprocess import (
    fuse_depth_maps,
    point_cloud_metrics,
    read_ply,
    write_ply,
)


def make_scene(nviews=4, h=24, w=32, d_true=10.0, f=60.0, baseline=0.3):
    """Consistent fronto-parallel plane at depth d_true seen by a camera rig
    translated along x; returns per-view depths + cams + GT points."""
    cams, depths = [], []
    for v in range(nviews):
        cam = np.zeros((2, 4, 4), np.float32)
        cam[0] = np.eye(4)
        cam[0, 0, 3] = -baseline * v
        cam[1, :3, :3] = [[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]]
        cams.append(cam)
        depths.append(np.full((h, w), d_true, np.float32))
    ys, xs = np.mgrid[0:h, 0:w]
    x_w = (xs - w / 2) * d_true / f          # ref cam at origin
    y_w = (ys - h / 2) * d_true / f
    gt = np.stack([x_w, y_w, np.full_like(x_w, d_true)], -1).reshape(-1, 3)
    return depths, cams, gt.astype(np.float32)


def test_fusion_recovers_plane():
    depths, cams, gt = make_scene()
    pts, _ = fuse_depth_maps(depths, cams, min_views=2)
    assert len(pts) > 0.5 * len(gt)
    np.testing.assert_allclose(pts[:, 2], 10.0, atol=1e-3)
    m = point_cloud_metrics(pts, gt, max_dist=1.0)
    # fused points from non-ref views land between GT grid samples (spacing
    # d/f ≈ 0.167), so accuracy floors at ~half-spacing, not 0
    assert m["accuracy"] < 0.09
    assert m["completeness"] < 0.2   # border pixels lack cross-view support


def test_fusion_rejects_inconsistent_view():
    depths, cams, _ = make_scene(nviews=4)
    depths[2][:] = 5.0   # corrupt one view entirely
    # with view 2 corrupted each good ref has only 2 consistent srcs left
    pts_strict, _ = fuse_depth_maps(depths, cams, min_views=2)
    assert len(pts_strict) > 0
    zs = pts_strict[:, 2]
    assert ((np.abs(zs - 10) < 0.05) | (np.abs(zs - 5) < 0.05)).all()
    frac_bad = np.mean(np.abs(zs - 5) < 0.05)
    assert frac_bad < 0.05


def test_fusion_prob_filter():
    depths, cams, _ = make_scene()
    probs = [np.full(d.shape, 0.9, np.float32) for d in depths]
    probs[0][:, : depths[0].shape[1] // 2] = 0.1
    pts_all, _ = fuse_depth_maps(depths, cams, min_views=2)
    pts_f, _ = fuse_depth_maps(depths, cams, probs=probs, min_views=2)
    assert len(pts_f) < len(pts_all)


def test_fusion_colors():
    depths, cams, _ = make_scene()
    imgs = [np.full((*d.shape, 3), 0.5, np.float32) for d in depths]
    pts, cols = fuse_depth_maps(depths, cams, images=imgs, min_views=2)
    assert cols is not None and cols.shape == (len(pts), 3)
    assert (cols == 127).all() or (cols == 128).all()


def naive_fuse(depths, cams, probs=None, prob_threshold=0.8,
               pix_threshold=1.0, depth_threshold=0.01, min_views=3):
    """Independent scalar re-implementation of the MVSNet fusion protocol
    (per-pixel Python loops, no shared code with fusion.py beyond numpy).
    Returns fused world points in the same ref-major pixel order."""
    def proj(p, cam):
        e, k = cam[0], cam[1, :3, :3]
        pc = e[:3, :3] @ p + e[:3, 3]
        uvw = k @ pc
        z = uvw[2] if abs(uvw[2]) >= 1e-9 else 1e-9
        return uvw[0] / z, uvw[1] / z, pc[2]

    def unproj(u, v, d, cam):
        e, k = cam[0], cam[1, :3, :3]
        pc = np.linalg.inv(k) @ np.array([u, v, 1.0], np.float32) * d
        return e[:3, :3].T @ (pc - e[:3, 3])

    out = []
    nviews = len(depths)
    for ref in range(nviews):
        h, w = depths[ref].shape
        for y in range(h):
            for x in range(w):
                d = float(depths[ref][y, x])
                if d <= 0:
                    continue
                if probs is not None and probs[ref][y, x] <= prob_threshold:
                    continue
                p = unproj(x, y, d, cams[ref])
                n_cons, dsum = 0, d
                for j in range(nviews):
                    if j == ref:
                        continue
                    uj, vj, zj = proj(p, cams[j])
                    xi, yi = int(round(uj)), int(round(vj))
                    hj, wj = depths[j].shape
                    if not (0 <= xi < wj and 0 <= yi < hj):
                        continue
                    dj = float(depths[j][yi, xi])
                    if dj <= 0 or zj <= 0:
                        continue
                    pj = unproj(uj, vj, dj, cams[j])
                    ub, vb, zb = proj(pj, cams[ref])
                    if (np.hypot(ub - x, vb - y) < pix_threshold
                            and abs(zb - d) / max(d, 1e-9) < depth_threshold):
                        n_cons += 1
                        dsum += zb
                if n_cons >= min_views:
                    out.append(unproj(x, y, dsum / (n_cons + 1), cams[ref]))
    return (np.asarray(out, np.float32) if out
            else np.zeros((0, 3), np.float32))


def test_fusion_matches_naive_protocol(rng):
    """Vectorized fuse_depth_maps must agree point-for-point with the
    independent scalar protocol implementation — on a noisy scene where
    the consistency thresholds actually discriminate."""
    depths, cams, _ = make_scene(nviews=5, h=12, w=16)
    for d in depths:
        d += rng.randn(*d.shape).astype(np.float32) * 0.05
    depths[3] += 0.4                              # push one view off-surface
    probs = [rng.rand(*d.shape).astype(np.float32) for d in depths]
    pts, _ = fuse_depth_maps(depths, cams, probs=probs, prob_threshold=0.5,
                             min_views=2, num_threads=1)
    want = naive_fuse(depths, cams, probs=probs, prob_threshold=0.5,
                      min_views=2)
    assert pts.shape == want.shape
    np.testing.assert_allclose(pts, want, atol=1e-4)
    # threaded path returns the same result (ref-major order is preserved)
    pts_mt, _ = fuse_depth_maps(depths, cams, probs=probs, prob_threshold=0.5,
                                min_views=2, num_threads=4)
    np.testing.assert_allclose(pts_mt, want, atol=1e-4)
    assert 0 < len(pts)


def test_fusion_throughput_many_views():
    """49-view scan (a DTU scan's worth of ref views) must fuse in seconds,
    not minutes — the vectorized+threaded path replaces the reference's
    external GPU fusibile step."""
    import os
    import time
    depths, cams, _ = make_scene(nviews=49, h=64, w=80, baseline=0.02)
    t0 = time.perf_counter()
    pts, _ = fuse_depth_maps(depths, cams, min_views=3)
    dt = time.perf_counter() - t0
    assert len(pts) > 0
    # wall-clock bound only under PERF_ASSERTS: the default CI host has a
    # single contended CPU, where a timing assertion flakes without any
    # code regression (ADVICE r2)
    if os.environ.get("PERF_ASSERTS"):
        assert dt < 30.0, f"49-view fusion took {dt:.1f}s"


def test_fusion_jax_matches_numpy(rng):
    """The jit-compiled device fusion must reproduce the numpy protocol:
    identical keep decisions and matching fused points, including the
    prob filter and a padded (ragged) pair graph."""
    from pointmvsnet_tpu.postprocess.fusion_jax import fuse_depth_maps_jax

    depths, cams, _ = make_scene(nviews=5, h=16, w=24)
    for d in depths:
        d += rng.randn(*d.shape).astype(np.float32) * 0.05
    probs = [rng.rand(*d.shape).astype(np.float32) for d in depths]
    pairs = {0: [1, 2, 3], 1: [0, 2], 2: [1, 3, 4], 3: [2, 4], 4: [3]}
    kw = dict(probs=probs, pairs=pairs, prob_threshold=0.4, min_views=2)
    pts_np, _ = fuse_depth_maps(depths, cams, **kw)
    pts_jx, _ = fuse_depth_maps_jax(depths, cams, **kw)
    assert pts_np.shape == pts_jx.shape
    np.testing.assert_allclose(pts_jx, pts_np, atol=1e-3)
    # colors path too
    imgs = [np.full((*d.shape, 3), 0.25, np.float32) for d in depths]
    _, cols = fuse_depth_maps_jax(depths, cams, images=imgs, **kw)
    assert cols is not None and len(cols) == len(pts_jx)


def test_obs_mask_and_plane_metrics(rng):
    from pointmvsnet_tpu.postprocess import apply_obs_mask, apply_plane_mask

    gt = rng.rand(400, 3).astype(np.float32) * 10
    pred = np.concatenate([gt[:200],
                           gt[:50] + np.float32([30, 0, 0])])  # far outliers
    # observability grid covering only the unit-10 cube → outliers dropped
    mask = np.ones((10, 10, 10), bool)
    keep = apply_obs_mask(pred, (mask, np.zeros(3, np.float32), 1.0))
    assert keep[:200].all() and not keep[200:].any()
    # plane z > 5 keeps only the upper half of GT
    plane = np.array([0, 0, 1, -5], np.float32)
    pk = apply_plane_mask(gt, plane)
    assert ((gt[:, 2] > 5) == pk).all()
    m = point_cloud_metrics(pred, gt, max_dist=50.0,
                            obs_mask=(mask, np.zeros(3, np.float32), 1.0))
    assert m["n_pred"] == 200
    assert m["accuracy"] == 0.0          # outliers masked before the mean
    m_pl = point_cloud_metrics(pred, gt, max_dist=50.0,
                               obs_mask=(mask, np.zeros(3, np.float32), 1.0),
                               gt_plane=plane)
    assert m_pl["n_gt"] == int(pk.sum())
    m_unmasked = point_cloud_metrics(pred, gt, max_dist=50.0)
    assert m_unmasked["accuracy"] > 1.0  # outliers dominate without masks


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.rand(100, 3).astype(np.float32)
    cols = (rng.rand(100, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "c.ply")
    write_ply(p, pts, cols)
    pts2, cols2 = read_ply(p)
    np.testing.assert_array_equal(pts, pts2)
    np.testing.assert_array_equal(cols, cols2)
    p2 = str(tmp_path / "n.ply")
    write_ply(p2, pts)
    pts3, cols3 = read_ply(p2)
    np.testing.assert_array_equal(pts, pts3)
    assert cols3 is None


def test_metrics_sanity(rng):
    gt = rng.rand(500, 3).astype(np.float32) * 10
    m = point_cloud_metrics(gt.copy(), gt)
    assert m["accuracy"] == 0 and m["completeness"] == 0 and m["overall"] == 0
    shifted = gt + [0.5, 0, 0]
    m2 = point_cloud_metrics(shifted, gt, max_dist=20.0)
    assert 0.1 < m2["accuracy"] <= 0.51
    m3 = point_cloud_metrics(np.zeros((0, 3), np.float32), gt)
    assert m3["overall"] == float("inf")


def test_fuse_cli_end_to_end(tmp_path):
    """fuse entry: eval_file_logger-style export dir → PLY per scan."""
    from pointmvsnet_tpu import fuse
    from pointmvsnet_tpu.dataset.io import write_cam, write_pfm

    depths, cams, _ = make_scene(nviews=3)
    scan_dir = tmp_path / "depths" / "scan7"
    scan_dir.mkdir(parents=True)
    for v, (d, c) in enumerate(zip(depths, cams)):
        stem = str(scan_dir / f"{v:08d}")
        write_pfm(stem + "_init.pfm", d * 0.9)   # coarse (ignored: flow exists)
        write_pfm(stem + "_flow2.pfm", d)
        write_pfm(stem + "_prob.pfm", np.full(d.shape, 0.95, np.float32))
        write_cam(stem + ".txt", c)
    out = tmp_path / "clouds"
    fuse.main(["--depth_dir", str(tmp_path / "depths"), "--out", str(out),
               "--min_views", "2"])
    pts, _ = read_ply(str(out / "scan7.ply"))
    assert len(pts) > 100
    np.testing.assert_allclose(pts[:, 2], 10.0, atol=1e-3)
    assert (out / "fusion_results.json").exists()
