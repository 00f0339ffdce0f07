"""Loss and metrics for Point-MVSNet.

Reference counterpart: ``pointmvsnet/model.py :: PointMVSNetLoss`` and the
``cal_less_percentage``-style metrics (SURVEY.md §2.10): masked mean
absolute error measured in depth-interval units, summed over the coarse
output and every flow iteration; metrics are the fraction of valid pixels
within 1 and 3 intervals of GT.

Pure functions over the model's prediction dict — jit/grad-safe, and the
masking uses ``where``-style guarded means (no NaNs when a batch member has
an empty mask).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from pointmvsnet_tpu.ops.geometry import cam_depth_range


def _resize_gt(gt: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """GT depth (B, H, W) → (B, h, w), nearest (zeros must stay exact)."""
    return jax.image.resize(gt, (gt.shape[0], h, w), method="nearest")


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(jnp.where(mask, x, 0.0)) / denom


def pointmvsnet_loss(preds: Dict[str, jnp.ndarray], gt_depth: jnp.ndarray,
                     cams: jnp.ndarray,
                     valid_threshold: float = 0.0) -> Dict[str, jnp.ndarray]:
    """Per-output masked MAE in interval units; total = unweighted sum
    (reference weighting reconstructed as 1.0 each — SURVEY.md §2.10 [med]).

    ``valid_threshold`` (reference ``MODEL.VALID_THRESHOLD`` [med
    semantics]): when > 0, each flow iteration's loss is additionally
    restricted to pixels whose GT lies within ``threshold · interval`` of
    that iteration's INPUT depth (``preds["flowN_input"]``) — PointFlow can
    only move ±m·step, so unreachable targets would otherwise dominate.

    gt_depth: (B, H, W, 1) at image resolution, zeros invalid.
    """
    gt = gt_depth[..., 0]
    _, d_int, _, _ = cam_depth_range(cams[:, 0])
    inv_int = 1.0 / d_int[:, None, None]

    losses: Dict[str, jnp.ndarray] = {}
    total = 0.0
    for key in ["coarse_depth_map"] + sorted(
            k for k in preds if k.startswith("flow") and not k.endswith("_input")):
        if key not in preds:
            continue
        pred = preds[key]
        g = _resize_gt(gt, pred.shape[1], pred.shape[2])
        mask = g > 0
        if valid_threshold > 0 and key + "_input" in preds:
            reach = jnp.abs(preds[key + "_input"] - g) * inv_int
            mask = mask & (reach < valid_threshold)
        err = jnp.abs(pred - g) * inv_int
        name = "coarse_loss" if key == "coarse_depth_map" else f"{key}_loss"
        losses[name] = _masked_mean(err, mask)
        total = total + losses[name]
    losses["total_loss"] = total
    return losses


def pointmvsnet_metrics(preds: Dict[str, jnp.ndarray], gt_depth: jnp.ndarray,
                        cams: jnp.ndarray,
                        thresholds: Sequence[float] = (1.0, 3.0)) -> Dict[str, jnp.ndarray]:
    """``<{t}_pct_{stage}``: fraction of valid pixels with error < t·interval
    (the reference's train/val quality signal, SURVEY.md §4)."""
    gt = gt_depth[..., 0]
    _, d_int, _, _ = cam_depth_range(cams[:, 0])
    interval = d_int[:, None, None]

    out: Dict[str, jnp.ndarray] = {}
    for key in ["coarse_depth_map"] + sorted(
            k for k in preds if k.startswith("flow") and not k.endswith("_input")):
        if key not in preds:
            continue
        pred = preds[key]
        g = _resize_gt(gt, pred.shape[1], pred.shape[2])
        mask = g > 0
        err = jnp.abs(pred - g)
        stage = "cor" if key == "coarse_depth_map" else key
        for t in thresholds:
            out[f"<{int(t)}_pct_{stage}"] = _masked_mean((err < t * interval).astype(jnp.float32), mask)
    return out
