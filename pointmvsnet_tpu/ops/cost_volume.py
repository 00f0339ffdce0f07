"""Plane-sweep cost volume, soft-argmin depth regression, confidence.

Reference counterpart: the coarse branch of ``pointmvsnet/model.py ::
PointMVSNet.forward`` (SURVEY.md §3.3): unproject reference-pixel rays at D
hypothesis depths, fetch every view's features (the differentiable
homography warp), aggregate by variance over views, regress depth as the
probability-weighted hypothesis sum.

TPU design notes:
* Everything is one fused jit region — the (B, D, h, w, C) volume never
  leaves HBM and the variance is computed as E[f²] − E[f]² in a single pass
  over views (no V-sized buffer).
* Layout is depth-major NHWC: (B, D, h, w, C) so the 3D U-Net convolves
  with C in the lane dimension.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from pointmvsnet_tpu.ops.geometry import (
    cam_extrinsics,
    cam_intrinsics,
    pixel_grid,
    unproject_pixels,
)
from pointmvsnet_tpu.ops.sampling import fetch_features, fetch_features_mxu


def plane_sweep_volume(feats: jnp.ndarray, cams: jnp.ndarray,
                       depths: jnp.ndarray, impl: str = "take") -> jnp.ndarray:
    """Variance-aggregated plane-sweep cost volume.

    feats:  (B, V, h, w, C) feature maps (view 0 = reference)
    cams:   (B, V, 2, 4, 4) cameras *at feature resolution*
    depths: (B, D) hypothesis depths for the reference view
    impl:   "take" = hardware row gather; "mxu" = slab-matmul gather with
            per-view exact fallback (bit-identical, ~D× fewer row
            latencies — the warp is the coarse stage's dominant cost).
            A depth-block-grouped third impl was measured slower
            standalone (43.7 vs 29.2 ms) and excised in round 5.
    → cost (B, D, h, w, C)
    """
    b, v, h, w, c = feats.shape
    d = depths.shape[-1]

    # geometry strictly in fp32 (bf16 pixel coords quantize to whole pixels)
    cams = cams.astype(jnp.float32)
    grid = pixel_grid(h, w, dtype=jnp.float32)  # (h·w, 3)
    ref_extr = cam_extrinsics(cams)[:, 0]
    ref_intr = cam_intrinsics(cams)[:, 0]
    # rays × depths: (B, D, h·w, 3) world points
    pts = unproject_pixels(grid[None, None], depths.astype(jnp.float32)[..., None],
                           ref_extr[:, None], ref_intr[:, None])
    pts = pts.reshape(b, d * h * w, 3)

    # Reference-view shortcut: projecting the ref-pixel rays back into the
    # reference camera lands exactly on the pixel grid for every hypothesis
    # depth — view 0 contributes its feature map directly (masked where the
    # hypothesis depth is non-positive, the projective path's z>0 gate);
    # only the V−1 source views need the warped gather.
    ref_f = feats[:, 0].astype(jnp.float32).reshape(b, 1, h * w, c)
    ref_f = jnp.where((depths > 0)[..., None, None], ref_f, 0.0)
    ref_f = ref_f.reshape(b, d * h * w, c)
    fetch = fetch_features_mxu if impl == "mxu" else fetch_features
    src = fetch(feats[:, 1:], pts, cams[:, 1:])           # (B, V−1, D·h·w, C)
    mean = (ref_f + jnp.sum(src, axis=1)) / v
    sq_mean = (jnp.square(ref_f) + jnp.sum(jnp.square(src), axis=1)) / v
    var = sq_mean - jnp.square(mean)
    return var.reshape(b, d, h, w, c)


def depth_regression(prob_volume: jnp.ndarray, depths: jnp.ndarray) -> jnp.ndarray:
    """Soft-argmin: expected depth under the probability volume.

    prob_volume: (B, D, h, w) softmax over D; depths: (B, D) → (B, h, w).
    """
    return jnp.einsum("bdhw,bd->bhw", prob_volume, depths)


def photometric_confidence(prob_volume: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel confidence: probability mass of the 4 hypotheses around the
    argmax (MVSNet §3.3 photometric confidence; the reference's ``prob_map``
    exported by ``eval_file_logger`` for fusion thresholding).

    prob_volume: (B, D, h, w) → (B, h, w) in [0, 1].
    """
    # sum over a 4-wide window centred at argmax: prob smoothed with a
    # size-4 box filter along D, evaluated at the argmax index.
    pad = jnp.pad(prob_volume, ((0, 0), (1, 2), (0, 0), (0, 0)))
    csum = jnp.cumsum(pad, axis=1)
    csum = jnp.pad(csum, ((0, 0), (1, 0), (0, 0), (0, 0)))
    # window sum at j = Σ prob[j-1 : j+3] = csum[j+4] − csum[j]
    win4 = csum[:, 4:] - csum[:, :-4]  # (B, D, h, w)
    idx = jnp.argmax(prob_volume, axis=1, keepdims=True)
    return jnp.take_along_axis(win4, idx, axis=1)[:, 0]
