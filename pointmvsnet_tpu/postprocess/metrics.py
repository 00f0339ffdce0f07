"""Point-cloud accuracy/completeness metrics (DTU-protocol style).

The reference defers to the official DTU MATLAB evaluation (SURVEY.md
§2.19 / BASELINE.md): accuracy = mean distance from predicted points to
the GT cloud (after outlier thresholding), completeness = mean distance
from GT points to the prediction, overall = their mean. This is that
protocol's core (without the DTU observability masks, which require the
dataset's stl scans).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _nn_dist(src: np.ndarray, dst: np.ndarray, block: int = 4096) -> np.ndarray:
    """For each src point, distance to nearest dst point (blockwise)."""
    from scipy.spatial import cKDTree
    tree = cKDTree(dst)
    d, _ = tree.query(src, k=1)
    return np.asarray(d, np.float32)


def point_cloud_metrics(pred: np.ndarray, gt: np.ndarray,
                        max_dist: float = 20.0) -> Dict[str, float]:
    """→ {accuracy, completeness, overall} in scene units (mm for DTU).

    ``max_dist``: DTU-protocol outlier threshold — distances beyond it are
    discarded from the mean (official eval uses 20 mm).
    """
    if len(pred) == 0 or len(gt) == 0:
        return {"accuracy": float("inf"), "completeness": float("inf"),
                "overall": float("inf"), "n_pred": len(pred), "n_gt": len(gt)}
    d_acc = _nn_dist(pred, gt)
    d_comp = _nn_dist(gt, pred)
    acc = float(d_acc[d_acc < max_dist].mean()) if (d_acc < max_dist).any() else float("inf")
    comp = float(d_comp[d_comp < max_dist].mean()) if (d_comp < max_dist).any() else float("inf")
    return {
        "accuracy": acc,
        "completeness": comp,
        "overall": 0.5 * (acc + comp),
        "n_pred": int(len(pred)),
        "n_gt": int(len(gt)),
    }
