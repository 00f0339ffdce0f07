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

    TPU note: the four bilinear taps are served by ONE gather from a
    precomputed 2×2 "patch table" (each row holds the 4C values of a 2×2
    neighborhood). Random-access gathers are latency-bound on TPU, so
    quartering the gather count (and 4×-ing the row width) is ~4× faster
    than four independent taps; the patch table itself is a cheap fused
    pad+concat that XLA materializes once per feature map.
    """
    h, w, c = feat.shape[-3], feat.shape[-2], feat.shape[-1]
    u, v = uv[..., 0], uv[..., 1]

    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = (u - u0)[..., None]
    dv = (v - v0)[..., None]
    i0 = u0.astype(jnp.int32)
    j0 = v0.astype(jnp.int32)

    # patch table over border-shifted coords: row (jy, jx) with
    # jy = y0+1 ∈ [0, h], jx = x0+1 ∈ [0, w] holds
    # [F[y0,x0], F[y0,x0+1], F[y0+1,x0], F[y0+1,x0+1]] with zeros baked in
    # for out-of-image positions — so straddling-border samples gather the
    # correct (partially zero) 2×2 patch from a single row.
    pad = [(0, 0)] * (feat.ndim - 3) + [(1, 1), (1, 1), (0, 0)]
    fp = jnp.pad(feat, pad)                          # coords shifted by +1
    hp, wp = h + 1, w + 1
    patches = jnp.concatenate(
        [fp[..., :hp, :wp, :], fp[..., :hp, 1:wp + 1, :],
         fp[..., 1:hp + 1, :wp, :], fp[..., 1:hp + 1, 1:wp + 1, :]], axis=-1)
    patches = patches.reshape(*feat.shape[:-3], hp * wp, 4 * c)

    idx = (jnp.clip(j0 + 1, 0, h) * wp + jnp.clip(i0 + 1, 0, w))
    g = jnp.take_along_axis(patches, idx[..., None], axis=-2)
    f00 = g[..., 0 * c:1 * c]
    f01 = g[..., 1 * c:2 * c]
    f10 = g[..., 2 * c:3 * c]
    f11 = g[..., 3 * c:4 * c]

    # per-tap validity (the clip above redirects out-of-range taps, and the
    # padded rows/cols already hold zeros for the +1 taps at the border)
    def inside(ui, vi):
        return ((ui >= 0) & (ui <= w - 1) & (vi >= 0) & (vi <= h - 1))[..., None]

    m00 = inside(i0, j0)
    m01 = inside(i0 + 1, j0)
    m10 = inside(i0, j0 + 1)
    m11 = inside(i0 + 1, j0 + 1)

    out = (jnp.where(m00, f00, 0) * ((1 - du) * (1 - dv))
           + jnp.where(m01, f01, 0) * (du * (1 - dv))
           + jnp.where(m10, f10, 0) * ((1 - du) * dv)
           + jnp.where(m11, f11, 0) * (du * dv))
    if valid is not None:
        out = jnp.where(valid[..., None], out, 0)
    return out


def regular_grid_sample(feat: jnp.ndarray, sx: float, sy: float,
                        out_h: int, out_w: int,
                        y_offset: int = 0) -> jnp.ndarray:
    """Bilinear-sample ``feat`` (B, H, W, C) at the regular grid
    u = j·sx, v = (y_offset + i)·sy — the reference-view case of the
    point-feature fetch, where projecting the hypothesis points back into
    the camera that generated them lands exactly on the (scaled) pixel
    grid for every hypothesis depth.

    Same semantics as ``bilinear_sample`` (align_corners pixel centers,
    zero contribution from out-of-image taps), but computed as two small
    interpolation matmuls (separable along W then H) — MXU work instead of
    G·N latency-bound gathers. → (B, out_h·out_w, C) float32.
    """
    b, h, w, c = feat.shape

    def interp_matrix(n_out, scale, offset, n_in):
        t = (jnp.arange(n_out, dtype=jnp.float32) + offset) * scale
        t0 = jnp.floor(t)
        dt = (t - t0)[:, None]
        i0 = t0.astype(jnp.int32)[:, None]
        cols = jnp.arange(n_in, dtype=jnp.int32)[None, :]
        m = (jnp.where((cols == i0) & (i0 >= 0) & (i0 <= n_in - 1), 1.0 - dt, 0.0)
             + jnp.where((cols == i0 + 1) & (i0 + 1 >= 0) & (i0 + 1 <= n_in - 1),
                         dt, 0.0))
        return m                                      # (n_out, n_in)

    mx = interp_matrix(out_w, sx, 0, w)
    my = interp_matrix(out_h, sy, y_offset, h)
    # f32 throughout to match the gather path's f32 lerp weights
    y = jnp.einsum("bhwc,ow->bhoc", feat.astype(jnp.float32), mx)
    y = jnp.einsum("bhoc,ph->bpoc", y, my)
    return y.reshape(b, out_h * out_w, c)


def fetch_features(feats: jnp.ndarray, points: jnp.ndarray,
                   cams: jnp.ndarray) -> jnp.ndarray:
    """Multi-view point-feature fetch (the FeatureFetcher).

    feats:  (B, V, H, W, C) per-view feature maps
    points: (B, N, 3) world points
    cams:   (B, V, 2, 4, 4)
    → (B, V, N, C); points behind a camera or projecting outside its image
    contribute zeros (reference behavior via grid_sample zero padding).
    """
    # projection always in fp32: bf16 pixel coordinates quantize to ~2 px
    # at 640-wide maps, which silently destroys sampling accuracy
    cams32 = cams.astype(jnp.float32)
    extr = cam_extrinsics(cams32)   # (B, V, 4, 4)
    intr = cam_intrinsics(cams32)   # (B, V, 3, 3)
    uv, z = project_points(points.astype(jnp.float32)[:, None], extr, intr)
    return bilinear_sample(feats, uv, valid=z > 0)
