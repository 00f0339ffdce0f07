"""Depth-fusion entry point: exported depth maps → fused point cloud (PLY).

Completes the reference's out-of-repo pipeline step (fusibile + DTU MATLAB
eval, SURVEY.md §2.19) in-repo::

    python -m pointmvsnet_tpu.fuse --depth_dir outputs/dtu_wde3/depths \
        --out clouds [--prob_threshold 0.8 --min_views 3 --gt_dir ...]

Reads each ``scan*/`` directory written by ``eval_file_logger``
(``*_flowN.pfm`` final depths, ``*_prob.pfm`` confidences, ``*.txt`` cams),
fuses per scan, writes ``<out>/scan<N>.ply``, and — when a GT point cloud
directory is given — reports accuracy/completeness/overall.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re

import numpy as np

from pointmvsnet_tpu.dataset.io import load_cam, load_pfm
from pointmvsnet_tpu.postprocess import (
    fuse_depth_maps,
    point_cloud_metrics,
    read_ply,
    write_ply,
)


def fuse_scan(scan_dir: str, prob_threshold: float = 0.8,
              pix_threshold: float = 1.0, depth_threshold: float = 0.01,
              min_views: int = 3, backend: str = "numpy"):
    """→ (points, colors) for one exported scan directory."""
    stems = sorted(set(
        re.sub(r"_(init|flow\d+|prob)\.pfm$", "", p)
        for p in glob.glob(os.path.join(scan_dir, "*.pfm"))))
    depths, cams, probs, images = [], [], [], []
    for stem in stems:
        flows = sorted(glob.glob(stem + "_flow*.pfm"))
        depth_path = flows[-1] if flows else stem + "_init.pfm"
        d = load_pfm(depth_path)
        cam = load_cam(stem + ".txt")
        prob_path = stem + "_prob.pfm"
        p = load_pfm(prob_path) if os.path.isfile(prob_path) else None
        if p is not None and p.shape != d.shape:
            # prob map is at coarse resolution; upsample nearest
            ys = (np.arange(d.shape[0]) * p.shape[0] // d.shape[0]).clip(0, p.shape[0] - 1)
            xs = (np.arange(d.shape[1]) * p.shape[1] // d.shape[1]).clip(0, p.shape[1] - 1)
            p = p[ys][:, xs]
        depths.append(d)
        cams.append(cam)
        probs.append(p)
        img_path = stem + ".png"
        if os.path.isfile(img_path):
            import cv2
            im = cv2.cvtColor(cv2.imread(img_path), cv2.COLOR_BGR2RGB)
            if im.shape[:2] != d.shape:
                im = cv2.resize(im, (d.shape[1], d.shape[0]))
            images.append(im.astype(np.float32))
    probs_arg = probs if all(p is not None for p in probs) else None
    images_arg = images if len(images) == len(depths) else None
    fuse_fn = fuse_depth_maps
    if backend == "jax" and len({d.shape for d in depths}) == 1:
        from pointmvsnet_tpu.postprocess.fusion_jax import fuse_depth_maps_jax
        fuse_fn = fuse_depth_maps_jax
    return fuse_fn(depths, cams, probs=probs_arg, images=images_arg,
                   prob_threshold=prob_threshold,
                   pix_threshold=pix_threshold,
                   depth_threshold=depth_threshold,
                   min_views=min_views)


def main(argv=None):
    ap = argparse.ArgumentParser(description="fuse exported depth maps")
    ap.add_argument("--depth_dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--prob_threshold", type=float, default=0.8)
    ap.add_argument("--pix_threshold", type=float, default=1.0)
    ap.add_argument("--depth_threshold", type=float, default=0.01)
    ap.add_argument("--min_views", type=int, default=3)
    ap.add_argument("--gt_dir", default="", help="dir of GT scan<N>.ply for metrics")
    ap.add_argument("--backend", default="numpy", choices=["numpy", "jax"],
                    help="jax = run the consistency sweep jit-compiled on the "
                         "default device (TPU); needs uniform per-scan shapes")
    args = ap.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    results = {}
    for scan_dir in sorted(glob.glob(os.path.join(args.depth_dir, "scan*"))):
        scan = os.path.basename(scan_dir)
        pts, cols = fuse_scan(scan_dir, args.prob_threshold,
                              args.pix_threshold, args.depth_threshold,
                              args.min_views, backend=args.backend)
        out_path = os.path.join(args.out, scan + ".ply")
        write_ply(out_path, pts, cols)
        entry = {"n_points": int(len(pts)), "ply": out_path}
        gt_path = os.path.join(args.gt_dir, scan + ".ply") if args.gt_dir else ""
        if gt_path and os.path.isfile(gt_path):
            gt_pts, _ = read_ply(gt_path)
            entry.update(point_cloud_metrics(pts, gt_pts))
        results[scan] = entry
        print(scan, json.dumps(entry))
    with open(os.path.join(args.out, "fusion_results.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
