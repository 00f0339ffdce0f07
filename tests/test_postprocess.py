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
