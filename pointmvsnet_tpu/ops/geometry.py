"""Camera geometry core: pixel grids, project/unproject, depth hypotheses.

Reference counterparts: ``pointmvsnet/model.py :: get_pixel_grids`` and the
projection math inside ``pointmvsnet/utils/feature_fetcher.py ::
FeatureFetcher`` (SURVEY.md §2.6, §3.3). Pure ``jnp``, shape-polymorphic
over leading batch dims, fully differentiable.

Conventions (self-consistent; parity-checked by roundtrip property tests):

* pixel centers at integer coordinates ``u ∈ [0, W-1]`` (torch
  ``align_corners=True`` convention, matching the reference's
  normalize-to-[-1,1]-by-(size-1) grid_sample usage);
* camera layout ``(2, 4, 4)``: ``cam[0]`` = world→camera extrinsic,
  ``cam[1, :3, :3]`` = K, ``cam[1, 3] = [d_min, d_interval, d_num, d_max]``
  (MVSNet cam.txt, arXiv:1804.02505 §3);
* invalid/behind-camera projections are the caller's concern — ``project``
  returns raw ``z`` so samplers can mask.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def cam_extrinsics(cams: jnp.ndarray) -> jnp.ndarray:
    """(..., 2, 4, 4) → world→camera (..., 4, 4)."""
    return cams[..., 0, :, :]


def cam_intrinsics(cams: jnp.ndarray) -> jnp.ndarray:
    """(..., 2, 4, 4) → K (..., 3, 3)."""
    return cams[..., 1, :3, :3]


def cam_depth_range(cams: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(..., 2, 4, 4) → (depth_min, depth_interval, num_depth, depth_max),
    each (...,). Matches the reference's ``cams[:, 0, 1, 3, :]`` access."""
    row = cams[..., 1, 3, :]
    return row[..., 0], row[..., 1], row[..., 2], row[..., 3]


def pixel_grid(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """Homogeneous pixel coordinates, shape (H*W, 3), rows ``[u, v, 1]``
    in row-major (v-major) pixel order (reference ``get_pixel_grids``)."""
    v = jnp.arange(height, dtype=dtype)
    u = jnp.arange(width, dtype=dtype)
    uu, vv = jnp.meshgrid(u, v)  # (H, W)
    ones = jnp.ones_like(uu)
    return jnp.stack([uu, vv, ones], axis=-1).reshape(height * width, 3)


def depth_hypotheses(depth_min: jnp.ndarray, depth_interval: jnp.ndarray,
                     num_depth: int, dtype=jnp.float32) -> jnp.ndarray:
    """Fronto-parallel plane depths ``d_j = d_min + j·interval``.

    ``depth_min``/``depth_interval``: (...,) → output (..., D). ``num_depth``
    must be static (XLA shape).
    """
    j = jnp.arange(num_depth, dtype=dtype)
    return depth_min[..., None] + j * depth_interval[..., None]


def intrinsic_inverse(intrinsic: jnp.ndarray) -> jnp.ndarray:
    """Analytic inverse of a pinhole K = [[fx, s, cx], [0, fy, cy], [0, 0, 1]].

    Exact in fp32 (a generic LU inverse injects ~1e-4 noise that breaks
    depth-parity tests) and cheaper than ``jnp.linalg.inv``.
    """
    fx = intrinsic[..., 0, 0]
    s = intrinsic[..., 0, 1]
    cx = intrinsic[..., 0, 2]
    fy = intrinsic[..., 1, 1]
    cy = intrinsic[..., 1, 2]
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    inv_fx = 1.0 / fx
    inv_fy = 1.0 / fy
    row0 = jnp.stack([inv_fx, -s * inv_fx * inv_fy, (s * cy - cx * fy) * inv_fx * inv_fy], axis=-1)
    row1 = jnp.stack([zero, inv_fy, -cy * inv_fy], axis=-1)
    row2 = jnp.stack([zero, zero, one], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def unproject_pixels(pixels_h: jnp.ndarray, depth: jnp.ndarray,
                     extrinsic: jnp.ndarray, intrinsic: jnp.ndarray) -> jnp.ndarray:
    """Lift homogeneous pixels to world points.

    pixels_h: (..., N, 3) rows [u, v, 1]
    depth:    (..., N) or broadcastable — z-depth in the camera frame
    extrinsic: (..., 4, 4) world→camera; intrinsic: (..., 3, 3)
    → world points (..., N, 3)
    """
    k_inv = intrinsic_inverse(intrinsic)
    # camera-frame points: d · K⁻¹ p
    cam_pts = jnp.einsum("...ij,...nj->...ni", k_inv, pixels_h) * depth[..., None]
    r = extrinsic[..., :3, :3]
    t = extrinsic[..., :3, 3]
    # world = Rᵀ (X_c − t)
    return jnp.einsum("...ji,...nj->...ni", r, cam_pts - t[..., None, :])


def project_points(points: jnp.ndarray, extrinsic: jnp.ndarray,
                   intrinsic: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World points → (pixel uv (..., N, 2), camera z-depth (..., N)).

    ``uv`` is finite even behind the camera (z clamped in the divide); use
    the returned ``z`` to mask invalid projections.
    """
    r = extrinsic[..., :3, :3]
    t = extrinsic[..., :3, 3]
    cam_pts = jnp.einsum("...ij,...nj->...ni", r, points) + t[..., None, :]
    proj = jnp.einsum("...ij,...nj->...ni", intrinsic, cam_pts)
    z = proj[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    return proj[..., :2] / safe_z[..., None], z


def view_direction(points: jnp.ndarray, extrinsic: jnp.ndarray) -> jnp.ndarray:
    """Unit vectors from the camera center to world ``points`` (..., N, 3).

    PointFlow displaces hypothesis points along this reference-camera viewing
    ray (paper §3.2; reference ``model.py`` flow branch).
    """
    r = extrinsic[..., :3, :3]
    t = extrinsic[..., :3, 3]
    center = -jnp.einsum("...ji,...j->...i", r, t)  # camera center in world
    d = points - center[..., None, :]
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
