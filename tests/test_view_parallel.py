"""View-sharded plane sweep vs the single-device implementation
(SURVEY.md §2.12 TPU-native note: collectives over ICI, here moment psums)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointmvsnet_tpu.ops.cost_volume import plane_sweep_volume
from pointmvsnet_tpu.parallel.mesh import make_mesh
from pointmvsnet_tpu.parallel.view_parallel import view_sharded_plane_sweep
from jax.sharding import Mesh


def make_scene(rng, b=1, v=4, h=16, w=24, c=6):
    feats = jnp.asarray(rng.rand(b, v, h, w, c).astype(np.float32))
    cams = np.zeros((b, v, 2, 4, 4), np.float32)
    for vi in range(v):
        cams[:, vi, 0] = np.eye(4)
        cams[:, vi, 0, 0, 3] = -0.4 * vi
        cams[:, vi, 1, :3, :3] = [[40, 0, w / 2], [0, 40, h / 2], [0, 0, 1]]
    depths = jnp.asarray([[8.0, 10.0, 12.0, 14.0]])
    return feats, jnp.asarray(cams), depths


def test_view_sharded_matches_unsharded(rng):
    feats, cams, depths = make_scene(rng, v=4)
    ref = np.asarray(plane_sweep_volume(feats, cams, depths))

    devices = jax.devices()[:4]
    mesh = Mesh(np.asarray(devices).reshape(4), ("view",))
    out = np.asarray(view_sharded_plane_sweep(
        feats, cams, cams[:, 0], depths, mesh))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_view_sharded_two_views_per_device(rng):
    feats, cams, depths = make_scene(rng, v=8)
    ref = np.asarray(plane_sweep_volume(feats, cams, depths))
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("view",))
    out = np.asarray(view_sharded_plane_sweep(
        feats, cams, cams[:, 0], depths, mesh))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_view_sharded_mxu_impl(rng):
    """COARSE_FETCH=mxu inside the shard_map (per-device slab gather +
    cond fallback) matches the unsharded take-path sweep."""
    feats, cams, depths = make_scene(rng, v=4)
    ref = np.asarray(plane_sweep_volume(feats, cams, depths))
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("view",))
    out = np.asarray(view_sharded_plane_sweep(
        feats, cams, cams[:, 0], depths, mesh, impl="mxu"))
    np.testing.assert_allclose(out, ref, atol=2e-5)
