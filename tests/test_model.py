"""Model forward/backward tests: module shapes, full PointMVSNet coarse +
flow forward, loss/metric plumbing, gradient flow (SURVEY.md §7 step 4/6).

Volume U-Net constraint: D and the cost-volume h, w must be divisible by 8
(3 stride-2 stages) — input H, W divisible by 64 guarantees it, matching
the data plane's crop base.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointmvsnet_tpu.models import build_model
from pointmvsnet_tpu.models.image_conv import ImageConv
from pointmvsnet_tpu.models.loss import pointmvsnet_loss, pointmvsnet_metrics
from pointmvsnet_tpu.models.volume_conv import VolumeConv
from pointmvsnet_tpu.config import get_default_cfg

B, V, H, W, D = 1, 2, 64, 64, 16


def tiny_cfg():
    cfg = get_default_cfg()
    cfg.MODEL.NUM_VIRTUAL_PLANE = D
    cfg.MODEL.EDGE_CHANNELS = (8, 8)
    cfg.MODEL.FLOW_CHANNELS = (16, 8, 1)
    cfg.MODEL.IMG_BASE_CHANNELS = 4
    cfg.MODEL.VOL_BASE_CHANNELS = 4
    cfg.MODEL.KNN = 8
    return cfg


def make_batch(rng):
    images = rng.rand(B, V, H, W, 3).astype(np.float32)
    cams = np.zeros((B, V, 2, 4, 4), np.float32)
    for v in range(V):
        cams[:, v, 0] = np.eye(4)
        cams[:, v, 0, 0, 3] = -0.5 * v
        cams[:, v, 1, :3, :3] = [[80, 0, W / 2], [0, 80, H / 2], [0, 0, 1]]
        cams[:, v, 1, 3] = [8.0, 0.5, D, 8.0 + (D - 1) * 0.5]
    gt = rng.uniform(8.5, 14.0, size=(B, H, W, 1)).astype(np.float32)
    gt[:, :4] = 0.0  # some invalid pixels
    return jnp.asarray(images), jnp.asarray(cams), jnp.asarray(gt)


@pytest.fixture(scope="module")
def fwd(rng=np.random.RandomState(0)):
    """Init + one full forward (coarse + 2 flow iters), cached per module."""
    cfg = tiny_cfg()
    model, loss_fn, metric_fn = build_model(cfg)
    images, cams, gt = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), images, cams,
                           is_flow=True, img_scales=(0.25, 0.5),
                           inter_scales=(0.75, 0.375),
                           num_virtual_plane=D, train=False)
    preds = model.apply(variables, images, cams, is_flow=True,
                        img_scales=(0.25, 0.5), inter_scales=(0.75, 0.375),
                        num_virtual_plane=D, train=False)
    return cfg, model, variables, images, cams, gt, preds


def test_image_conv_pyramid(rng):
    m = ImageConv(base_channels=4, norm="gn")
    x = jnp.asarray(rng.rand(2, 32, 48, 3).astype(np.float32))
    var = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(var, x)
    assert out["conv0"].shape == (2, 32, 48, 4)
    assert out["conv1"].shape == (2, 16, 24, 8)
    assert out["conv2"].shape == (2, 8, 12, 16)
    assert out["conv3"].shape == (2, 4, 6, 32)


def test_volume_conv_shape(rng):
    m = VolumeConv(base_channels=4, norm="gn")
    x = jnp.asarray(rng.rand(1, 8, 16, 16, 6).astype(np.float32))
    var = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(var, x)
    assert out.shape == (1, 8, 16, 16, 1)


def test_forward_output_shapes(fwd):
    _, _, _, _, _, _, preds = fwd
    # coarse at input·0.5 (coarse stage) / 4 (feature stride) = 1/8
    assert preds["coarse_depth_map"].shape == (B, H // 8, W // 8)
    assert preds["coarse_prob_map"].shape == (B, H // 8, W // 8)
    assert preds["flow1"].shape == (B, H // 4, W // 4)
    assert preds["flow2"].shape == (B, H // 2, W // 2)


def test_forward_depth_in_range(fwd):
    _, _, _, _, cams, _, preds = fwd
    d_min, d_int = float(cams[0, 0, 1, 3, 0]), float(cams[0, 0, 1, 3, 1])
    d_max = d_min + (D - 1) * d_int
    c = np.asarray(preds["coarse_depth_map"])
    assert np.isfinite(c).all()
    assert (c >= d_min - 1e-3).all() and (c <= d_max + 1e-3).all()
    # flow moves depth by at most m·step per iteration
    for k, inter_s in [("flow1", 0.75), ("flow2", 0.375)]:
        f = np.asarray(preds[k])
        assert np.isfinite(f).all()
    prob = np.asarray(preds["coarse_prob_map"])
    assert (prob >= 0).all() and (prob <= 1 + 1e-5).all()


def test_flow_moments_matches_stacked(fwd):
    """MODEL.FLOW_MOMENTS="on" (fused per-view Σf/Σf² in the fetch)
    reproduces the "off" stacked-tensor variance path — f32 model, so the
    only difference is reduction/fusion order (ulp-level). The shipped
    "auto" default resolves to moments at EVAL (the measured winner,
    benchmarks/results/knob_ab_r5.json), so both sides pin explicitly;
    "auto" itself is checked against "on" at eval."""
    cfg, model, variables, images, cams, _, _ = fwd
    outs = {}
    for mom in ("off", "on", "auto"):
        cfg_m = tiny_cfg()
        cfg_m.MODEL.FLOW_MOMENTS = mom
        model_m, _, _ = build_model(cfg_m)
        outs[mom] = model_m.apply(variables, images, cams, is_flow=True,
                                  img_scales=(0.25, 0.5),
                                  inter_scales=(0.75, 0.375),
                                  num_virtual_plane=D, train=False)
    for k in ("coarse_depth_map", "flow1", "flow2"):
        np.testing.assert_allclose(np.asarray(outs["on"][k]),
                                   np.asarray(outs["off"][k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)
        # auto == on at eval, bit-exact (same resolved graph)
        np.testing.assert_array_equal(np.asarray(outs["auto"][k]),
                                      np.asarray(outs["on"][k]), err_msg=k)


def test_flow_src_dtype_bf16_close(fwd):
    """MODEL.FLOW_SRC_DTYPE=bfloat16 quantizes only the per-view fetched
    features; refined depths stay within a small fraction of the depth
    interval of the f32 path."""
    cfg, model, variables, images, cams, _, _ = fwd
    kwargs = dict(is_flow=True, img_scales=(0.25, 0.5),
                  inter_scales=(0.75, 0.375), num_virtual_plane=D,
                  train=False)
    preds = {}
    for sdt in ("", "bfloat16"):
        cfg_s = tiny_cfg()
        cfg_s.MODEL.FLOW_FETCH = "bilinear"
        cfg_s.MODEL.FLOW_SRC_DTYPE = sdt
        model_s, _, _ = build_model(cfg_s)
        preds[sdt] = model_s.apply(variables, images, cams, **kwargs)
    d_int = float(np.asarray(cams)[0, 0, 1, 3, 1])
    for k, tol in (("flow1", 0.25), ("flow2", 0.25)):
        delta = np.abs(np.asarray(preds["bfloat16"][k], np.float32)
                       - np.asarray(preds[""][k], np.float32))
        assert delta.max() < tol * d_int, (k, delta.max(), d_int)


def test_flow_fetch_bilinear_matches(fwd):
    """MODEL.FLOW_FETCH=bilinear (per-level 2×2-table engine) reproduces
    the table engine end-to-end (same primitive, different composition).
    A third engine (bilinear_p, Pallas windowed-VMEM gather) was excised
    in round 5: Mosaic has no lowerable in-kernel row gather (internal
    compiler error on every mechanism probed — docs/STATUS.md)."""
    cfg, model, variables, images, cams, _, _ = fwd
    kwargs = dict(is_flow=True, img_scales=(0.25, 0.5),
                  inter_scales=(0.75, 0.375), num_virtual_plane=D,
                  train=False)
    preds = {}
    for fetch in ("table", "bilinear"):
        cfg_f = tiny_cfg()
        cfg_f.MODEL.FLOW_FETCH = fetch
        model_f, _, _ = build_model(cfg_f)
        preds[fetch] = model_f.apply(variables, images, cams, **kwargs)
    for k in ("coarse_depth_map", "flow1", "flow2"):
        np.testing.assert_allclose(np.asarray(preds["bilinear"][k]),
                                   np.asarray(preds["table"][k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)


def test_coarse_only_forward(fwd):
    cfg, model, variables, images, cams, _, _ = fwd
    preds = model.apply(variables, images, cams, is_flow=False,
                        num_virtual_plane=D)
    assert "flow1" not in preds and "coarse_depth_map" in preds


def test_loss_and_metrics(fwd):
    _, _, _, _, cams, gt, preds = fwd
    losses = pointmvsnet_loss(preds, gt, cams)
    for k in ["coarse_loss", "flow1_loss", "flow2_loss", "total_loss"]:
        assert k in losses and np.isfinite(float(losses[k]))
    np.testing.assert_allclose(
        float(losses["total_loss"]),
        float(losses["coarse_loss"] + losses["flow1_loss"] + losses["flow2_loss"]),
        rtol=1e-6)
    mets = pointmvsnet_metrics(preds, gt, cams)
    for k, v in mets.items():
        assert 0.0 <= float(v) <= 1.0, k


def test_gradients_flow_everywhere(fwd):
    cfg, model, variables, images, cams, gt, _ = fwd
    params = variables["params"]
    others = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        preds, _ = model.apply({"params": p, **others}, images, cams,
                               is_flow=True, img_scales=(0.25,),
                               inter_scales=(0.75,), num_virtual_plane=D,
                               train=True, mutable=["batch_stats"])
        return pointmvsnet_loss(preds, gt, cams)["total_loss"]

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves_with_path(grads)
    assert leaves
    zero_paths = []
    for path, g in leaves:
        if not np.all(np.isfinite(np.asarray(g))):
            raise AssertionError(f"non-finite grad at {path}")
        if float(jnp.max(jnp.abs(g))) == 0.0:
            zero_paths.append(jax.tree_util.keystr(path))
    # every major submodule must receive gradient (a few conv3/bias zeros
    # are tolerated, e.g. unused pyramid level conv3)
    for mod in ["img_conv", "vol_conv", "point_flow"]:
        got = [p for p, g in leaves
               if mod in jax.tree_util.keystr(p)
               and float(jnp.max(jnp.abs(g))) > 0]
        assert got, f"no nonzero grads reach {mod}: zeros={zero_paths[:10]}"


def test_batchnorm_stats_update(fwd):
    cfg, model, variables, images, cams, _, _ = fwd
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    _, updated = model.apply(variables, images, cams, is_flow=False,
                             num_virtual_plane=D, train=True,
                             mutable=["batch_stats"])
    after = jax.tree_util.tree_leaves(updated["batch_stats"])
    changed = any(not np.allclose(np.asarray(a), np.asarray(b))
                  for a, b in zip(before, after))
    assert changed


def test_eval_settings_v5_d96_three_flow(rng):
    """BASELINE config #4 settings (V=5, D=96, TEST 3-scale chain ending
    at 1.0) at CPU-sized resolution: the wide cost volume + full-res-chain
    flow path must compile and produce sane full-resolution output."""
    b, v, h, w, d = 1, 5, 128, 192, 96
    cfg = tiny_cfg()
    cfg.MODEL.NUM_VIRTUAL_PLANE = d
    model, _, _ = build_model(cfg)
    images = jnp.asarray(rng.rand(b, v, h, w, 3).astype(np.float32))
    cams = np.zeros((b, v, 2, 4, 4), np.float32)
    d_int = 0.08
    for vi in range(v):
        cams[:, vi, 0] = np.eye(4)
        cams[:, vi, 0, 0, 3] = -0.25 * vi
        cams[:, vi, 1, :3, :3] = [[150, 0, w / 2], [0, 150, h / 2], [0, 0, 1]]
        cams[:, vi, 1, 3] = [8.0, d_int, d, 8.0 + (d - 1) * d_int]
    cams = jnp.asarray(cams)
    kw = dict(is_flow=True, img_scales=(0.25, 0.5, 1.0),
              inter_scales=(0.75, 0.375, 0.1875), num_virtual_plane=d)
    variables = model.init(jax.random.PRNGKey(0), images, cams, **kw)
    preds = model.apply(variables, images, cams, **kw)
    assert preds["coarse_depth_map"].shape == (b, h // 8, w // 8)
    assert preds["flow3"].shape == (b, h, w)   # full-res final output
    lo, hi = 8.0 - 3 * d_int, 8.0 + (d + 2) * d_int
    for k in ("coarse_depth_map", "flow1", "flow2", "flow3"):
        arr = np.asarray(preds[k])
        assert np.isfinite(arr).all(), k
        assert (arr > lo).all() and (arr < hi).all(), k


@pytest.mark.parametrize("fetch", ["bilinear", "table"])
def test_chunked_flow_exact_with_bn_eval(rng, fetch):
    """Row-banded PointFlow must be bit-identical to the unchunked pass in
    BN eval mode (running stats; halo covers the kNN window). Parametrized
    over the fetch engine so the shipped eval default ("bilinear") has an
    explicit banding-equality test (VERDICT r4 #6)."""
    import jax
    import jax.numpy as jnp
    cfg = tiny_cfg()
    cfg.MODEL.NORM = "bn"
    cfg.MODEL.FLOW_FETCH = fetch
    images, cams, _ = make_batch(np.random.RandomState(1))
    kw = dict(is_flow=True, img_scales=(0.25, 0.5),
              inter_scales=(0.75, 0.375), num_virtual_plane=D, train=False)
    m0, _, _ = build_model(cfg)
    var = m0.init(jax.random.PRNGKey(0), images, cams, **kw)
    p0 = m0.apply(var, images, cams, **kw)
    cfg2 = cfg.clone()
    cfg2.MODEL.FLOW_CHUNK_ROWS = 8
    m1, _, _ = build_model(cfg2)
    p1 = m1.apply(var, images, cams, **kw)
    np.testing.assert_array_equal(np.asarray(p0["flow2"]), np.asarray(p1["flow2"]))
    np.testing.assert_array_equal(np.asarray(p0["flow1"]), np.asarray(p1["flow1"]))


@pytest.mark.parametrize("save", [("knn",), ("knn", "feat")])
def test_remat_grads_match_no_remat(save, rng=np.random.RandomState(7)):
    """MODEL.REMAT (checkpointed PointFlowCore) must reproduce the
    unrematted training gradients under every MODEL.REMAT_SAVE policy —
    rematerialization changes scheduling, never math (tolerance covers the
    float reassociation of the differently-fused recompute graph)."""
    images, cams, gt = make_batch(rng)
    kwargs = dict(is_flow=True, img_scales=(0.25, 0.5),
                  inter_scales=(0.75, 0.375), num_virtual_plane=D)

    def grads_with(remat):
        cfg = tiny_cfg()
        cfg.MODEL.REMAT = remat
        cfg.MODEL.REMAT_SAVE = save
        model, loss_fn, _ = build_model(cfg)
        variables = model.init(jax.random.PRNGKey(0), images, cams, **kwargs)

        def loss(params):
            preds, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                images, cams, train=True, mutable=["batch_stats"], **kwargs)
            return loss_fn(preds, gt, cams)["total_loss"]

        return jax.grad(loss)(variables["params"])

    g0 = grads_with(False)
    g1 = grads_with(True)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(g1)}
    for k, v in flat0:
        ref = np.asarray(v)
        got = np.asarray(flat1[jax.tree_util.keystr(k)])
        # per-tensor scaled bound: reassociation noise is relative to the
        # tensor's grad magnitude, not each element's
        # floor covers true-zero grads (e.g. the flow-head bias: softmax is
        # shift-invariant, so its exact grad is 0 and both paths produce
        # O(1e-8) cancellation noise)
        tol = max(1e-3 * float(np.abs(ref).max()), 1e-6)
        np.testing.assert_allclose(got, ref, rtol=0, atol=tol,
                                   err_msg=jax.tree_util.keystr(k))


def test_resolve_chunk_rows_auto():
    """MODEL.FLOW_CHUNK_ROWS=-1 band-height resolution: keep the EdgeConv
    Pallas masked-window-max inside VMEM (the measured ~6x knob-A/B cliff
    sits exactly at its fit boundary) with the largest qualifying band;
    unbanded when the full height already fits."""
    from pointmvsnet_tpu.models.pointmvsnet import resolve_chunk_rows

    g, f = 5, 64                      # flow G = 2m+1, max edge channels
    assert resolve_chunk_rows(512, 640, g, f) == 64    # DTU headline (64
    #   beat 128 in both knob A/B waves: 202.2 vs 207.2 ms with moments)
    assert resolve_chunk_rows(1024, 1280, g, f) == 64  # T&T full res
    assert resolve_chunk_rows(512, 1280, g, f) == 64   # wide mid shape
    assert resolve_chunk_rows(128, 160, g, f) == 0     # flow1: fits whole
    # the resolved band always divides the height and keeps the fast path
    from pointmvsnet_tpu.ops.pallas.edge import masked_window_max_fits
    for h, w in [(512, 640), (1024, 1280), (256, 896), (2048, 1920)]:
        cr = resolve_chunk_rows(h, w, g, f)
        if cr:
            assert h % cr == 0 and cr % 8 == 0
            assert masked_window_max_fits(g, cr + 16, w, f, 5, 4)
        else:
            assert masked_window_max_fits(g, h, w, f, 5, 4)
