"""View-parallel plane sweep: shard the view axis over the mesh.

The reference's only parallelism is batch replication (SURVEY.md §2.12).
On TPU there is a second natural axis for high-view-count eval (BASELINE
config #4: V=5, D=96): the variance cost aggregation

    cost = E_v[f²] − E_v[f]²

decomposes into per-view moment sums, so each device can hold a SLICE of
the views, warp only its own feature maps, and the mesh combines with two
``psum``s over ICI — features and the (huge) per-view warped volumes never
leave their device. Combine with the "data" axis for a 2-D scan×view mesh.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pointmvsnet_tpu.ops.cost_volume import plane_sweep_volume
from pointmvsnet_tpu.ops.geometry import (
    cam_extrinsics,
    cam_intrinsics,
    pixel_grid,
    unproject_pixels,
)
from pointmvsnet_tpu.ops.sampling import fetch_features, fetch_features_mxu


def view_sharded_plane_sweep(feats: jnp.ndarray, cams: jnp.ndarray,
                             ref_cam: jnp.ndarray, depths: jnp.ndarray,
                             mesh: Mesh, axis: str = "view",
                             impl: str = "take") -> jnp.ndarray:
    """Variance plane-sweep with the V axis sharded over ``axis``.

    feats (B, V, h, w, C), cams (B, V, 2, 4, 4) — sharded on V;
    ref_cam (B, 2, 4, 4) — the reference view's camera at feature
    resolution, replicated (the ref view itself may live on any shard);
    depths (B, D) replicated. → cost (B, D, h, w, C) replicated.

    V must divide the axis size × shard count evenly (pad views with
    repeats if not — repeated views change E[] weights, so prefer exact).
    """
    b, v, h, w, c = feats.shape
    d = depths.shape[-1]

    def shard_fn(feats_s, cams_s, ref_cam_r, depths_r):
        nshard = jax.lax.psum(1, axis)
        v_local = feats_s.shape[1]
        grid = pixel_grid(h, w, dtype=jnp.float32)
        pts = unproject_pixels(
            grid[None, None], depths_r.astype(jnp.float32)[..., None],
            cam_extrinsics(ref_cam_r.astype(jnp.float32))[:, None],
            cam_intrinsics(ref_cam_r.astype(jnp.float32))[:, None])
        pts = pts.reshape(b, d * h * w, 3)
        fetch = fetch_features_mxu if impl == "mxu" else fetch_features
        sampled = fetch(feats_s, pts, cams_s)            # (B, v_local, D·hw, C)
        s1 = jnp.sum(sampled, axis=1)
        s2 = jnp.sum(jnp.square(sampled), axis=1)
        s1 = jax.lax.psum(s1, axis)
        s2 = jax.lax.psum(s2, axis)
        v_total = v_local * nshard
        mean = s1 / v_total
        var = s2 / v_total - jnp.square(mean)
        return var.reshape(b, d, h, w, c)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(), P()),
        out_specs=P(),
    )
    return fn(feats, cams, ref_cam, depths)
