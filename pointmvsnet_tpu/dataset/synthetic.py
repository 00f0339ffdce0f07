"""Synthetic DTU-format scene generator.

No counterpart in the reference (which assumes the real DTU download); this
exists because the rebuild's test suite (SURVEY.md §4) needs geometrically
consistent multi-view data without the 100 GB dataset. Scenes are textured
fronto-parallel planes: source views are exact homography warps of the
reference texture, so the true depth is recoverable by plane-sweep stereo
and end-to-end tests can assert convergence toward known GT.

Writes the exact on-disk layout `pointmvsnet_tpu.dataset.dtu` consumes.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

from pointmvsnet_tpu.dataset.io import write_cam, write_pfm


def _texture(rng: np.random.RandomState, h: int, w: int) -> np.ndarray:
    """Smooth random RGB texture with enough gradient for photometric cost."""
    small = rng.rand(h // 8 + 2, w // 8 + 2, 3).astype(np.float32)
    import cv2
    tex = cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC)
    tex += 0.25 * rng.rand(h, w, 3).astype(np.float32)
    tex -= tex.min()
    tex /= max(tex.max(), 1e-6)
    return (tex * 255).astype(np.uint8)


def _make_cams(num_views: int, height: int, width: int, depth_min: float,
               depth_interval: float, num_depth: int):
    """Rig shared by the synthetic layouts: cam 0 at origin looking +z,
    view v translated along x. → (cams list, focal f, baseline)."""
    f = 1.2 * max(height, width)
    K = np.array([[f, 0, width / 2.0], [0, f, height / 2.0], [0, 0, 1]],
                 np.float64)
    baseline = depth_min * 0.012
    cams = []
    for v in range(num_views):
        E = np.eye(4)
        E[0, 3] = -v * baseline
        cam = np.zeros((2, 4, 4), np.float32)
        cam[0] = E
        cam[1, :3, :3] = K
        cam[1, 3] = [depth_min, depth_interval, num_depth,
                     depth_min + (num_depth - 1) * depth_interval]
        cams.append(cam)
    return cams, f, baseline


def _render_two_planes(v, f, baseline, height, width, d_lo, d_hi,
                       tex_l, tex_r):
    """View v of the two fronto-parallel textured half-planes (RGB u8)."""
    import cv2
    img = np.zeros((height, width, 3), np.uint8)
    split = width // 2
    for (tex, d, x0, x1) in [(tex_l, d_lo, 0, split), (tex_r, d_hi, split, width)]:
        disp = f * (v * baseline) / d
        M = np.float32([[1, 0, -disp], [0, 1, 0]])
        warped = cv2.warpAffine(tex, M, (width, height))
        mask = np.zeros((height, width), np.uint8)
        mask[:, x0:x1] = 1
        wm = cv2.warpAffine(mask, M, (width, height))
        img[wm > 0] = warped[wm > 0]
    return img


def make_scene_batch(batch: int, num_views: int, height: int, width: int,
                     num_depth: int, depth_min: float = 425.0,
                     depth_interval: float = 2.5, seed: int = 0):
    """In-memory consistent scene batch for benchmarks — geometry identical
    to the on-disk layouts (two textured fronto-parallel half-planes), but
    returned as arrays so the bench needs no tree on disk.

    → (images (B, V, H, W, 3) float32 per-image standardized like the data
    plane's ``norm_image``, cams (B, V, 2, 4, 4) float32, gt_depth
    (B, H, W) float32 — the reference view's true depth).

    Benchmarks used uniform noise through round 2 (VERDICT r2 weak #4);
    consistent scenes exercise representative softmax/confidence sharpness,
    kNN structure, and — most importantly on TPU — the epipolar-coherent
    gather locality of the feature fetch.
    """
    from pointmvsnet_tpu.dataset.preprocess import norm_image

    cams, f, baseline = _make_cams(num_views, height, width, depth_min,
                                   depth_interval, num_depth)
    d_lo = depth_min + 0.25 * (num_depth - 1) * depth_interval
    d_hi = depth_min + 0.70 * (num_depth - 1) * depth_interval
    split = width // 2

    images = np.zeros((batch, num_views, height, width, 3), np.float32)
    gt = np.zeros((batch, height, width), np.float32)
    for b in range(batch):
        rng = np.random.RandomState(seed + b)
        tex_l = _texture(rng, height, width)
        tex_r = _texture(rng, height, width)
        for v in range(num_views):
            img = _render_two_planes(v, f, baseline, height, width,
                                     d_lo, d_hi, tex_l, tex_r)
            images[b, v] = norm_image(img)
        gt[b] = d_lo
        gt[b, :, split:] = d_hi
    cam_batch = np.broadcast_to(np.stack(cams), (batch, num_views, 2, 4, 4))
    return images, np.ascontiguousarray(cam_batch, np.float32), gt


def make_synthetic_tanks(root: str, scenes: Sequence[str] = ("Family",),
                         num_views: int = 5, height: int = 128,
                         width: int = 160, depth_min: float = 425.0,
                         depth_interval: float = 2.5, num_depth: int = 96,
                         seed: int = 0, per_scene: dict | None = None) -> None:
    """Create a Tanks & Temples-layout tree under ``root``
    (``<scene>/pair.txt``, ``<scene>/cams/{v:08d}_cam.txt``,
    ``<scene>/images/{v:08d}.jpg`` — the preprocessed MVSNet release that
    ``dataset.tanks.TanksDataset`` consumes), with the same recoverable
    two-plane geometry as ``make_synthetic_dtu``.

    ``per_scene``: optional {scene: {height/width/num_depth/depth_interval:
    ...}} overrides, reproducing the real release's heterogeneity (ragged
    per-scene resolutions, per-scene depth sampling in the cam files)."""
    import cv2

    rng = np.random.RandomState(seed)

    for scene in scenes:
        ov = dict(per_scene.get(scene, {})) if per_scene else {}
        s_h = int(ov.get("height", height))
        s_w = int(ov.get("width", width))
        s_nd = int(ov.get("num_depth", num_depth))
        s_di = float(ov.get("depth_interval", depth_interval))
        cams, f, baseline = _make_cams(num_views, s_h, s_w, depth_min,
                                       s_di, s_nd)
        d_lo = depth_min + 0.25 * (s_nd - 1) * s_di
        d_hi = depth_min + 0.70 * (s_nd - 1) * s_di
        sd = os.path.join(root, scene)
        os.makedirs(os.path.join(sd, "cams"), exist_ok=True)
        os.makedirs(os.path.join(sd, "images"), exist_ok=True)
        with open(os.path.join(sd, "pair.txt"), "w") as fp:
            fp.write(f"{num_views}\n")
            for v in range(num_views):
                others = sorted(range(num_views), key=lambda u: (abs(u - v), u))
                others = [u for u in others if u != v]
                fp.write(f"{v}\n{len(others)} " +
                         " ".join(f"{u} {100.0 - 10 * i}"
                                  for i, u in enumerate(others)) + "\n")
        tex_l = _texture(rng, s_h, s_w)
        tex_r = _texture(rng, s_h, s_w)
        for v in range(num_views):
            write_cam(os.path.join(sd, "cams", f"{v:08d}_cam.txt"), cams[v])
            img = _render_two_planes(v, f, baseline, s_h, s_w,
                                     d_lo, d_hi, tex_l, tex_r)
            cv2.imwrite(os.path.join(sd, "images", f"{v:08d}.jpg"),
                        cv2.cvtColor(img, cv2.COLOR_RGB2BGR))


def make_synthetic_dtu(root: str, scans: Sequence[int] = (1,), num_views: int = 5,
                       height: int = 128, width: int = 160, depth_min: float = 425.0,
                       depth_interval: float = 2.5, num_depth: int = 48,
                       num_lights: int = 7, seed: int = 0,
                       layout: str = "train") -> None:
    """Create a DTU-layout tree under ``root``.

    Geometry: reference camera 0 at world origin looking +z; view ``v`` is
    translated by a small baseline along x. The scene is two fronto-parallel
    textured half-planes (left/right) at different depths within the
    hypothesis range, so GT depth is piecewise constant and recoverable.

    ``layout="train"`` writes the training release
    (``Rectified/scan{n}_train`` + shared ``Cameras/``); ``layout="eval"``
    writes the official eval/testing release
    (``Eval/scan{n}/{images,cams}/{view:08d}.{jpg,txt}`` + per-scan
    ``pair.txt``), matching ``DTUTestDataset``'s auto-detection.
    """
    import cv2

    assert layout in ("train", "eval")
    rng = np.random.RandomState(seed)
    cams, f, baseline = _make_cams(num_views, height, width, depth_min,
                                   depth_interval, num_depth)

    def _write_pair(path: str) -> None:
        with open(path, "w") as fp:
            fp.write(f"{num_views}\n")
            for v in range(num_views):
                others = sorted(range(num_views), key=lambda u: (abs(u - v), u))
                others = [u for u in others if u != v]
                fp.write(f"{v}\n{len(others)} " +
                         " ".join(f"{u} {100.0 - 10 * i}" for i, u in enumerate(others)) + "\n")

    if layout == "train":
        # cameras + pair.txt shared across scans, like DTU's Cameras/ dir
        os.makedirs(os.path.join(root, "Cameras"), exist_ok=True)
        for v in range(num_views):
            write_cam(os.path.join(root, "Cameras", f"{v:08d}_cam.txt"), cams[v])
        _write_pair(os.path.join(root, "Cameras", "pair.txt"))

    d_lo = depth_min + 0.25 * (num_depth - 1) * depth_interval
    d_hi = depth_min + 0.70 * (num_depth - 1) * depth_interval

    for scan in scans:
        if layout == "eval":
            scan_dir = os.path.join(root, "Eval", f"scan{scan}")
            img_dir = os.path.join(scan_dir, "images")
            cam_dir = os.path.join(scan_dir, "cams")
            os.makedirs(img_dir, exist_ok=True)
            os.makedirs(cam_dir, exist_ok=True)
            for v in range(num_views):
                write_cam(os.path.join(cam_dir, f"{v:08d}_cam.txt"), cams[v])
            _write_pair(os.path.join(scan_dir, "pair.txt"))
            dep_dir = None
        else:
            img_dir = os.path.join(root, "Rectified", f"scan{scan}_train")
            dep_dir = os.path.join(root, "Depths", f"scan{scan}_train")
            os.makedirs(img_dir, exist_ok=True)
            os.makedirs(dep_dir, exist_ok=True)

        tex_l = _texture(rng, height, width)
        tex_r = _texture(rng, height, width)
        split = width // 2

        # Per-view render: each half-plane at depth d maps ref pixel (x,y) to
        # view-v pixel (x - f·(v·b)/d, y)  (pure horizontal disparity).
        for v in range(num_views):
            img = _render_two_planes(v, f, baseline, height, width,
                                     d_lo, d_hi, tex_l, tex_r)
            if layout == "eval":
                cv2.imwrite(os.path.join(img_dir, f"{v:08d}.jpg"),
                            cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            else:
                for light in range(num_lights):
                    gain = 0.75 + 0.08 * light
                    out = np.clip(img.astype(np.float32) * gain, 0, 255).astype(np.uint8)
                    cv2.imwrite(os.path.join(img_dir, f"rect_{v + 1:03d}_{light}_r5000.png"),
                                cv2.cvtColor(out, cv2.COLOR_RGB2BGR))

        if dep_dir is None:
            continue
        for v in range(num_views):
            depth = np.full((height, width), d_lo, np.float32)
            depth[:, split:] = d_hi
            # each view sees the planes shifted by its disparity
            for (d, x0, x1) in [(d_lo, 0, split), (d_hi, split, width)]:
                disp = int(round(f * (v * baseline) / d))
                depth[:, max(0, x0 - disp):max(0, x1 - disp)] = d
            write_pfm(os.path.join(dep_dir, f"depth_map_{v:04d}.pfm"), depth)
