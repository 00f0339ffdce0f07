"""Bilinear feature sampling (the differentiable-warp primitive).

Reference counterpart: ``pointmvsnet/utils/feature_fetcher.py ::
FeatureFetcher`` — project world points into every view, normalize to
[-1, 1], ``F.grid_sample`` (SURVEY.md §2.6). Here sampling takes raw pixel
coordinates directly (the normalize/denormalize roundtrip is the identity
under the align_corners=True convention; see ``ops/geometry.py``), with
zero padding outside the image — parity-tested against torch's
``grid_sample(align_corners=True, padding_mode="zeros")``.

TPU note: implemented as four gathers over a flattened (H·W) axis + a fused
weighted sum. XLA lowers ``jnp.take`` to a hardware gather; this is
bandwidth-bound, and the elementwise lerp fuses into the gather consumers.
Feature channel dim stays last (lane dimension).
"""

from __future__ import annotations

import jax.numpy as jnp

from pointmvsnet_tpu.ops.geometry import cam_extrinsics, cam_intrinsics, project_points


def bilinear_sample(feat: jnp.ndarray, uv: jnp.ndarray,
                    valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Sample ``feat`` (..., H, W, C) at pixel coords ``uv`` (..., N, 2).

    Out-of-image samples (and entries where ``valid`` is False) return 0,
    matching torch ``grid_sample(padding_mode='zeros')``: contributions of
    out-of-bounds corner taps are dropped individually, so samples straddling
    the border are partially weighted.
    Leading dims of ``feat`` and ``uv`` must agree. → (..., N, C)
    """
    h, w, c = feat.shape[-3], feat.shape[-2], feat.shape[-1]
    u, v = uv[..., 0], uv[..., 1]

    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0

    flat = feat.reshape(*feat.shape[:-3], h * w, c)

    def tap(ui, vi):
        inside = (ui >= 0) & (ui <= w - 1) & (vi >= 0) & (vi <= h - 1)
        idx = (jnp.clip(vi, 0, h - 1) * w + jnp.clip(ui, 0, w - 1)).astype(jnp.int32)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=-2)
        return vals, inside[..., None]

    i0 = u0.astype(jnp.int32)
    j0 = v0.astype(jnp.int32)
    f00, m00 = tap(i0, j0)
    f01, m01 = tap(i0 + 1, j0)
    f10, m10 = tap(i0, j0 + 1)
    f11, m11 = tap(i0 + 1, j0 + 1)

    w00 = ((1 - du) * (1 - dv))[..., None]
    w01 = (du * (1 - dv))[..., None]
    w10 = ((1 - du) * dv)[..., None]
    w11 = (du * dv)[..., None]

    out = (jnp.where(m00, f00, 0) * w00 + jnp.where(m01, f01, 0) * w01
           + jnp.where(m10, f10, 0) * w10 + jnp.where(m11, f11, 0) * w11)
    if valid is not None:
        out = jnp.where(valid[..., None], out, 0)
    return out


def fetch_features(feats: jnp.ndarray, points: jnp.ndarray,
                   cams: jnp.ndarray) -> jnp.ndarray:
    """Multi-view point-feature fetch (the FeatureFetcher).

    feats:  (B, V, H, W, C) per-view feature maps
    points: (B, N, 3) world points
    cams:   (B, V, 2, 4, 4)
    → (B, V, N, C); points behind a camera or projecting outside its image
    contribute zeros (reference behavior via grid_sample zero padding).
    """
    extr = cam_extrinsics(cams)   # (B, V, 4, 4)
    intr = cam_intrinsics(cams)   # (B, V, 3, 3)
    uv, z = project_points(points[:, None], extr, intr)  # (B, V, N, 2), (B, V, N)
    return bilinear_sample(feats, uv, valid=z > 0)
