"""Multi-chip data parallelism tests on the 8-virtual-device CPU mesh
(SURVEY.md §4: the TPU-native analogue of multi-node simulation).

Checks: sharded train step runs and updates params; SPMD invariance — the
same global batch gives (near-)identical losses on a 1-device and an
8-device mesh (DataParallel-equivalent semantics, SURVEY.md §7)."""

import jax
import jax.numpy as jnp
import numpy as np

from pointmvsnet_tpu.config import get_default_cfg
from pointmvsnet_tpu.models import build_model
from pointmvsnet_tpu.parallel import (
    create_train_state,
    make_eval_step,
    make_train_step,
    make_mesh,
    replicate,
    shard_batch,
)
from pointmvsnet_tpu.utils.solver import build_optimizer

B, V, H, W, D = 8, 2, 64, 64, 8
KW = dict(is_flow=True, img_scales=(0.25,), inter_scales=(0.75,),
          num_virtual_plane=D)


def tiny_cfg():
    cfg = get_default_cfg()
    cfg.MODEL.NUM_VIRTUAL_PLANE = D
    cfg.MODEL.EDGE_CHANNELS = (8,)
    cfg.MODEL.FLOW_CHANNELS = (8, 1)
    cfg.MODEL.IMG_BASE_CHANNELS = 4
    cfg.MODEL.VOL_BASE_CHANNELS = 4
    cfg.MODEL.KNN = 8
    cfg.MODEL.NORM = "gn"   # deterministic across mesh sizes (no batch stats)
    return cfg


def make_batch(rng):
    images = rng.rand(B, V, H, W, 3).astype(np.float32)
    cams = np.zeros((B, V, 2, 4, 4), np.float32)
    for v in range(V):
        cams[:, v, 0] = np.eye(4)
        cams[:, v, 0, 0, 3] = -0.5 * v
        cams[:, v, 1, :3, :3] = [[80, 0, W / 2], [0, 80, H / 2], [0, 0, 1]]
        cams[:, v, 1, 3] = [8.0, 0.5, D, 8.0 + (D - 1) * 0.5]
    gt = rng.uniform(8.5, 11.0, size=(B, H, W, 1)).astype(np.float32)
    return {"images": jnp.asarray(images), "cams": jnp.asarray(cams),
            "gt_depth": jnp.asarray(gt)}


def _run_steps(mesh, batch, n_steps=2, norm=None):
    cfg = tiny_cfg()
    if norm is not None:
        cfg.MODEL.NORM = norm
    model, loss_fn, metric_fn = build_model(cfg)
    opt = build_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), batch, KW)
    state = replicate(state, mesh)
    sbatch = shard_batch(batch, mesh)
    step = make_train_step(model, loss_fn, opt, mesh, KW)
    losses = None
    for _ in range(n_steps):
        state, losses = step(state, sbatch)
    return state, losses, (model, loss_fn, metric_fn)


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_sharded_train_step_runs(rng):
    mesh = make_mesh(8)
    batch = make_batch(rng)
    state, losses, _ = _run_steps(mesh, batch, n_steps=2)
    assert int(state.step) == 2
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_spmd_matches_single_device(rng):
    """Same global batch → same loss trajectory on 1 vs 8 devices."""
    batch = make_batch(rng)
    _, l1, _ = _run_steps(make_mesh(1), batch, n_steps=2)
    _, l8, _ = _run_steps(make_mesh(8), batch, n_steps=2)
    # rtol: cross-shard reduction order reassociates fp32 sums; a semantic
    # divergence (per-shard statistics) would be orders of magnitude larger
    np.testing.assert_allclose(float(l1["total_loss"]), float(l8["total_loss"]),
                               rtol=1e-3)


def test_spmd_batchnorm_matches_single_device(rng):
    """Sync-BN claim (parallel/train_step.py): with BatchNorm — the
    reference's default norm — batch statistics reduce over the GLOBAL
    sharded batch, so the step-1 loss AND the updated running stats must
    agree between a 1-device and an 8-device mesh.

    One step only, on purpose: step-1 stats depend solely on (identical)
    init params and the global batch, so per-shard statistics would
    diverge by ~1e-1 while reduction-order noise stays ~1e-6. After a
    param update the comparison is no longer sharp — RMSprop's first step
    is ≈ lr·sign(g), so cross-shard reduction noise that flips a
    near-zero gradient's sign moves a param by a whole step."""
    batch = make_batch(rng)
    s1, l1, _ = _run_steps(make_mesh(1), batch, n_steps=1, norm="bn")
    s8, l8, _ = _run_steps(make_mesh(8), batch, n_steps=1, norm="bn")
    np.testing.assert_allclose(float(l1["total_loss"]), float(l8["total_loss"]),
                               rtol=2e-4)
    flat1 = jax.tree_util.tree_leaves_with_path(s1.batch_stats)
    flat8 = dict(jax.tree_util.tree_leaves_with_path(s8.batch_stats))
    assert flat1
    for path, v1 in flat1:
        v8 = flat8[path]
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v8),
                                   rtol=2e-4, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(path))


import pytest


@pytest.mark.parametrize("fetch", ["table", "bilinear"])
def test_band_parallel_flow_matches_serial(rng, fetch):
    """Band-parallel PointFlow (flow row bands vmapped + sharded over the
    mesh "band" axis) must reproduce the serial banded forward exactly —
    the bands are independent given the replicated pyramid, and the halo
    covers the EdgeConv receptive field. Parametrized over both fetch
    engines; "bilinear" is the shipped eval default (VERDICT r4 #6 — the
    default must be covered explicitly, not only via "auto")."""
    from pointmvsnet_tpu.parallel import make_mesh_2d

    h, w = 64, 64
    cfg = tiny_cfg()
    cfg.MODEL.NORM = "bn"              # banding is exact under eval BN
    cfg.MODEL.FLOW_CHUNK_ROWS = 16     # 4 bands at the flow resolution
    cfg.MODEL.FLOW_FETCH = fetch
    kw = dict(KW, img_scales=(1.0,), inter_scales=(0.75,))
    batch = make_batch(rng)

    model_s, _, _ = build_model(cfg)
    variables = model_s.init(jax.random.PRNGKey(0), batch["images"],
                             batch["cams"], **kw)
    want = model_s.apply(variables, batch["images"], batch["cams"], **kw)

    mesh = make_mesh_2d(data=1, band=4)
    model_p, _, _ = build_model(cfg, band_mesh=mesh)
    fwd = jax.jit(lambda v, im, cm: model_p.apply(v, im, cm, **kw))
    got = fwd(variables, batch["images"], batch["cams"])

    np.testing.assert_allclose(np.asarray(got["flow1"]),
                               np.asarray(want["flow1"]), rtol=1e-5, atol=1e-5)


def test_view_parallel_model_matches_serial(rng):
    """PARALLEL.VIEW in-model path: the coarse cost volume with its view
    axis sharded over the mesh must match the unsharded forward."""
    from pointmvsnet_tpu.parallel import make_mesh_eval

    cfg = tiny_cfg()
    batch = make_batch(rng)
    model_s, _, _ = build_model(cfg)
    variables = model_s.init(jax.random.PRNGKey(0), batch["images"],
                             batch["cams"], **KW)
    want = model_s.apply(variables, batch["images"], batch["cams"], **KW)

    mesh = make_mesh_eval(data=1, band=1, view=2)   # V=2 views, one each
    model_p, _, _ = build_model(cfg, view_mesh=mesh)
    fwd = jax.jit(lambda v, im, cm: model_p.apply(v, im, cm, **KW))
    got = fwd(variables, batch["images"], batch["cams"])
    np.testing.assert_allclose(np.asarray(got["coarse_depth_map"]),
                               np.asarray(want["coarse_depth_map"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got["flow1"]),
                               np.asarray(want["flow1"]),
                               rtol=1e-4, atol=1e-4)


def test_combined_data_band_view_mesh(rng):
    """ALL THREE parallel axes composed in ONE jit program: a 2×2×2
    (data × band × view) mesh through ``make_eval_step`` — the exact
    wiring the test CLI uses (test.py builds ``make_mesh_eval`` and hands
    the same mesh to the model as band_mesh AND view_mesh). Must equal
    the serial forward."""
    from pointmvsnet_tpu.parallel import make_mesh_eval

    cfg = tiny_cfg()
    cfg.MODEL.NORM = "bn"              # banding is exact under eval BN
    cfg.MODEL.FLOW_CHUNK_ROWS = 16     # 4 bands over the band=2 axis
    kw = dict(KW, img_scales=(1.0,), inter_scales=(0.75,))
    batch = {k: v[:2] for k, v in make_batch(rng).items()}  # data=2 shards

    mesh = make_mesh_eval(data=2, band=2, view=2)
    model_p, loss_fn, metric_fn = build_model(cfg, band_mesh=mesh,
                                              view_mesh=mesh)
    opt = build_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(model_p, opt, jax.random.PRNGKey(0), batch, kw)
    state = replicate(state, mesh)
    eval_step = make_eval_step(model_p, loss_fn, metric_fn, mesh, kw)
    preds, losses, metrics = eval_step(state, shard_batch(batch, mesh))
    assert np.isfinite(float(losses["total_loss"]))

    model_s, _, _ = build_model(cfg)
    variables = {"params": jax.device_get(state.params)}
    stats = jax.device_get(state.batch_stats)
    if stats:
        variables["batch_stats"] = stats
    want = model_s.apply(variables, batch["images"], batch["cams"], **kw)
    for k in ("coarse_depth_map", "flow1"):
        np.testing.assert_allclose(np.asarray(preds[k]),
                                   np.asarray(want[k]),
                                   rtol=1e-4, atol=1e-4, err_msg=k)


def test_sharded_eval_step(rng):
    mesh = make_mesh(8)
    batch = make_batch(rng)
    state, _, (model, loss_fn, metric_fn) = _run_steps(mesh, batch, n_steps=1)
    eval_step = make_eval_step(model, loss_fn, metric_fn, mesh, KW)
    preds, losses, metrics = eval_step(state, shard_batch(batch, mesh))
    assert preds["flow1"].shape == (B, H // 4, W // 4)
    assert np.isfinite(float(losses["total_loss"]))
    assert all(0 <= float(v) <= 1 for v in metrics.values())
