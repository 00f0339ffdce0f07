"""MVSNet-format eval artifact export for the external fusion stage.

Reference counterpart: ``pointmvsnet/utils/eval_file_logger.py ::
eval_file_logger`` (SURVEY.md §2.15): per reference view, write the coarse
(``*_init.pfm``) and per-iteration (``*_flowN.pfm``) depth maps, the
probability map (``*_prob.pfm``), the camera rescaled to the depth-map
resolution, and the reference image — into ``<out>/<scan>/``.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from pointmvsnet_tpu.dataset.io import write_cam, write_pfm
from pointmvsnet_tpu.dataset.preprocess import scale_camera


def eval_file_logger(batch: Dict[str, np.ndarray], preds: Dict[str, np.ndarray],
                     output_dir: str, batch_index: int = 0) -> str:
    """Write one sample's artifacts; returns the scan directory."""
    i = batch_index
    scan = int(np.asarray(batch["scan"])[i])
    ref_view = int(np.asarray(batch["ref_view"])[i])
    images = np.asarray(batch["images"])[i]          # (V, H, W, 3)
    cams = np.asarray(batch["cams"])[i]              # (V, 2, 4, 4)
    h, w = images.shape[1:3]

    scan_dir = os.path.join(output_dir, f"scan{scan}")
    os.makedirs(scan_dir, exist_ok=True)
    stem = os.path.join(scan_dir, f"{ref_view:08d}")

    flow_keys = sorted(k for k in preds
                       if k.startswith("flow") and not k.endswith("_input"))
    final_key = flow_keys[-1] if flow_keys else "coarse_depth_map"

    coarse = np.asarray(preds["coarse_depth_map"])[i]
    write_pfm(stem + "_init.pfm", coarse.astype(np.float32))
    for k in flow_keys:
        write_pfm(stem + f"_{k}.pfm", np.asarray(preds[k])[i].astype(np.float32))

    prob = np.asarray(preds["coarse_prob_map"])[i]
    write_pfm(stem + "_prob.pfm", prob.astype(np.float32))

    # camera rescaled to the FINAL depth-map resolution (what fusion consumes)
    dh, dw = np.asarray(preds[final_key])[i].shape
    cam = scale_camera(cams[0], (dw / w, dh / h))
    write_cam(stem + ".txt", cam)

    # reference image (undo nothing — inputs are normalized; save a
    # visually meaningful rescale)
    img = images[0]
    lo, hi = img.min(), img.max()
    vis = ((img - lo) / max(hi - lo, 1e-6) * 255).astype(np.uint8)
    try:
        import cv2
        cv2.imwrite(stem + ".png", cv2.cvtColor(vis, cv2.COLOR_RGB2BGR))
    except ImportError:  # pragma: no cover
        pass
    return scan_dir
