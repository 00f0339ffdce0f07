"""Depth-map fusion on the TPU chip (jit twin of ``fusion.py``).

Same MVSNet post-processing protocol as ``fusion.fuse_depth_maps``
(probability filter → cross-view geometric consistency → visibility-
averaged depth → unprojection), but the consistency sweep runs as ONE
jit-compiled program over the stacked (V, H, W) scan: all reference
views are processed simultaneously, with a ``lax.fori_loop`` over the
padded source list accumulating consistency counts. On a 49-view DTU
scan this replaces minutes of host numpy (single-core here) with a
sub-second device program — the TPU answer to the reference's external
GPU fusibile binary (SURVEY.md §2.19).

Requires uniform per-scan shapes (true for DTU; for mixed-resolution
T&T scans fall back to the numpy path). Nearest-neighbor sampling uses
round-half-even, matching numpy.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def _cam_mats(cams: jnp.ndarray):
    """cams (V, 2, 4, 4) → (R (V,3,3), t (V,3), K (V,3,3), K⁻¹ (V,3,3))."""
    r = cams[:, 0, :3, :3]
    t = cams[:, 0, :3, 3]
    k = cams[:, 1, :3, :3]
    return r, t, k, jnp.linalg.inv(k)


@functools.partial(jax.jit, static_argnames=("prob_threshold", "pix_threshold",
                                             "depth_threshold", "min_views"))
def _fuse_all(depths: jnp.ndarray, cams: jnp.ndarray,
              probs: Optional[jnp.ndarray], pair_table: jnp.ndarray,
              prob_threshold: float, pix_threshold: float,
              depth_threshold: float, min_views: int):
    """depths (V, H, W) f32, cams (V, 2, 4, 4), probs (V, H, W) or None,
    pair_table (V, S) int32 (−1 padding) →
    (keep (V, N) bool, points (V, N, 3) f32) with N = H·W row-major."""
    v, h, w = depths.shape
    n = h * w
    r, t, k, kinv = _cam_mats(cams.astype(jnp.float32))

    d_flat = depths.reshape(v, n)
    valid = d_flat > 0
    if probs is not None:
        valid &= probs.reshape(v, n) > prob_threshold

    jj, ii = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                          jnp.arange(h, dtype=jnp.float32))
    pix = jnp.stack([jj.ravel(), ii.ravel(), jnp.ones(n, jnp.float32)], -1)  # (N, 3)

    def unproject(depth, kinv_v, r_v, t_v):
        """(V, N) depth + per-view mats → world (V, N, 3)."""
        pc = jnp.einsum("vij,nj->vni", kinv_v, pix) * depth[..., None]
        return jnp.einsum("vnj,vji->vni", pc - t_v[:, None], r_v)

    def project(pts, r_v, t_v, k_v):
        """world (V, N, 3) + per-view mats → uv (V, N, 2), z (V, N)."""
        pc = jnp.einsum("vij,vnj->vni", r_v, pts) + t_v[:, None]
        uvw = jnp.einsum("vij,vnj->vni", k_v, pc)
        z = uvw[..., 2]
        safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        return uvw[..., :2] / safe[..., None], z

    world = unproject(d_flat, kinv, r, t)                    # (V, N, 3)
    uv_ref = pix[None, :, :2]                                # (1, N, 2)

    def body(s, carry):
        n_cons, depth_sum = carry
        src = pair_table[:, s]                               # (V,)
        live = src >= 0
        sidx = jnp.maximum(src, 0)
        r_s, t_s, k_s, kinv_s = r[sidx], t[sidx], k[sidx], kinv[sidx]
        uv_j, z_j = project(world, r_s, t_s, k_s)            # (V, N, 2), (V, N)
        x = jnp.round(uv_j[..., 0]).astype(jnp.int32)
        y = jnp.round(uv_j[..., 1]).astype(jnp.int32)
        inside = (x >= 0) & (x < w) & (y >= 0) & (y < h)
        lin = jnp.clip(y, 0, h - 1) * w + jnp.clip(x, 0, w - 1)
        dsamp = jnp.take_along_axis(d_flat[sidx], lin, axis=1)
        ok = inside & (dsamp > 0) & (z_j > 0)
        world_j = unproject_at(uv_j, dsamp, kinv_s, r_s, t_s)
        uv_back, z_back = project(world_j, r, t, k)          # back into ref
        pix_err = jnp.linalg.norm(uv_back - uv_ref, axis=-1)
        rel_d = jnp.abs(z_back - d_flat) / jnp.maximum(d_flat, 1e-9)
        cons = (ok & (pix_err < pix_threshold) & (rel_d < depth_threshold)
                & live[:, None])
        return (n_cons + cons.astype(jnp.int32),
                depth_sum + jnp.where(cons, z_back, 0.0))

    def unproject_at(uv, depth, kinv_v, r_v, t_v):
        ones = jnp.ones(uv.shape[:-1] + (1,), uv.dtype)
        p = jnp.concatenate([uv, ones], -1)
        pc = jnp.einsum("vij,vnj->vni", kinv_v, p) * depth[..., None]
        return jnp.einsum("vnj,vji->vni", pc - t_v[:, None], r_v)

    n_cons = jnp.zeros((v, n), jnp.int32)
    depth_sum = d_flat
    n_cons, depth_sum = lax.fori_loop(0, pair_table.shape[1], body,
                                      (n_cons, depth_sum))
    keep = valid & (n_cons >= min_views)
    fused = depth_sum / (n_cons + 1).astype(jnp.float32)
    points = unproject(fused, kinv, r, t)
    return keep, points


def fuse_depth_maps_jax(depths: Sequence[np.ndarray],
                        cams: Sequence[np.ndarray],
                        probs: Optional[Sequence[np.ndarray]] = None,
                        images: Optional[Sequence[np.ndarray]] = None,
                        pairs: Optional[Dict[int, List[int]]] = None,
                        prob_threshold: float = 0.8,
                        pix_threshold: float = 1.0,
                        depth_threshold: float = 0.01,
                        min_views: int = 3
                        ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Drop-in twin of ``fusion.fuse_depth_maps`` (same output order:
    ref-major, row-major pixels) that runs the consistency sweep on the
    default JAX device. All depth maps must share one (H, W)."""
    nviews = len(depths)
    shapes = {np.asarray(d).shape for d in depths}
    if len(shapes) != 1:
        raise ValueError(f"jax fusion needs uniform shapes, got {shapes}")

    src_lists = [list(pairs[ref]) if pairs is not None else
                 [j for j in range(nviews) if j != ref]
                 for ref in range(nviews)]
    s_max = max((len(s) for s in src_lists), default=0)
    table = np.full((nviews, s_max), -1, np.int32)
    for i, s in enumerate(src_lists):
        table[i, :len(s)] = s

    d_stack = jnp.asarray(np.stack([np.asarray(d, np.float32) for d in depths]))
    c_stack = jnp.asarray(np.stack([np.asarray(c, np.float32) for c in cams]))
    p_stack = (jnp.asarray(np.stack([np.asarray(p, np.float32) for p in probs]))
               if probs is not None else None)
    keep, points = _fuse_all(d_stack, c_stack, p_stack, jnp.asarray(table),
                             prob_threshold=float(prob_threshold),
                             pix_threshold=float(pix_threshold),
                             depth_threshold=float(depth_threshold),
                             min_views=int(min_views))
    keep = np.asarray(keep)
    points = np.asarray(points)

    h, w = next(iter(shapes))
    all_pts, all_cols = [], []
    for ref in range(nviews):
        m = keep[ref]
        if not m.any():
            continue
        all_pts.append(points[ref][m])
        if images is not None:
            img = np.asarray(images[ref])
            if img.max() <= 1.0 + 1e-6:
                img = img * 255.0
            all_cols.append(img.reshape(h * w, -1)[m].astype(np.uint8))
    if not all_pts:
        return np.zeros((0, 3), np.float32), None
    pts = np.concatenate(all_pts, 0)
    cols = np.concatenate(all_cols, 0) if all_cols else None
    return pts, cols
