"""Serving Predictor tests: numpy-in/numpy-out, shape caching, crop handling."""

import numpy as np

from pointmvsnet_tpu.config import get_default_cfg
from pointmvsnet_tpu.predictor import Predictor


def small_cfg():
    cfg = get_default_cfg()
    cfg.MODEL.NUM_VIRTUAL_PLANE = 8
    cfg.MODEL.IMG_BASE_CHANNELS = 4
    cfg.MODEL.VOL_BASE_CHANNELS = 4
    cfg.MODEL.EDGE_CHANNELS = (8,)
    cfg.MODEL.FLOW_CHANNELS = (8, 1)
    cfg.MODEL.KNN = 8
    cfg.MODEL.NORM = "gn"
    cfg.MODEL.TEST.IMG_SCALES = (0.25, 0.5)
    cfg.MODEL.TEST.INTER_SCALES = (0.75, 0.375)
    cfg.DATA.TEST.NUM_VIRTUAL_PLANE = 8
    return cfg


def make_views(rng, v=2, h=70, w=130):
    images = (rng.rand(v, h, w, 3) * 255).astype(np.float32)
    cams = np.zeros((v, 2, 4, 4), np.float32)
    for vi in range(v):
        cams[vi, 0] = np.eye(4)
        cams[vi, 0, 0, 3] = -0.5 * vi
        cams[vi, 1, :3, :3] = [[80, 0, w / 2], [0, 80, h / 2], [0, 0, 1]]
        cams[vi, 1, 3] = [8.0, 0.5, 8, 11.5]
    return images, cams


def test_predictor_end_to_end(rng):
    pred = Predictor(small_cfg())
    images, cams = make_views(rng)
    out = pred(images, cams)
    # 70x130 crops to 64x128; final flow at 0.5 scale
    assert out["depth"].shape == (32, 64)
    assert out["confidence"].shape == (8, 16)
    assert np.isfinite(out["depth"]).all()
    d_min, d_max = 8.0, 11.5
    assert out["depth"].min() >= d_min - 1.5 and out["depth"].max() <= d_max + 1.5


def test_predictor_with_eval_mesh(rng):
    """Predictor(mesh=...) parallelizes each prediction over the view axis
    and matches the single-device output."""
    from pointmvsnet_tpu.parallel import make_mesh_eval

    images, cams = make_views(rng)
    base = Predictor(small_cfg())(images, cams)
    mesh = make_mesh_eval(data=1, band=1, view=2)
    out = Predictor(small_cfg(), mesh=mesh)(images, cams)
    # psum reassociation perturbs the cost volume in the last ulp; the
    # softargmin amplifies that at a handful of ambiguous pixels — bound
    # the worst pixel by a small fraction of the 0.5 depth interval
    diff = np.abs(out["depth"] - base["depth"])
    assert np.quantile(diff, 0.999) < 1e-3
    assert diff.max() < 0.05


def test_predictor_shape_cache(rng):
    pred = Predictor(small_cfg())
    images, cams = make_views(rng)
    pred(images, cams)
    assert len(pred._fns) == 1
    pred(images, cams)
    assert len(pred._fns) == 1  # same shape → cached executable
    images2, cams2 = make_views(rng, h=64, w=64)
    pred(images2, cams2)
    assert len(pred._fns) == 2


def test_predictor_loads_checkpoint(tmp_path, rng):
    """Checkpoint → Predictor chain: saved weights must drive predictions."""
    import jax
    from pointmvsnet_tpu.models import build_model
    from pointmvsnet_tpu.parallel import create_train_state
    from pointmvsnet_tpu.utils.checkpoint import Checkpointer
    from pointmvsnet_tpu.utils.solver import build_optimizer

    cfg = small_cfg()
    images, cams = make_views(rng, h=64, w=64)
    model, _, _ = build_model(cfg)
    opt = build_optimizer(cfg, 1)
    kw = dict(is_flow=True, img_scales=(0.25,), inter_scales=(0.75,),
              num_virtual_plane=8)
    state = create_train_state(model, opt, jax.random.PRNGKey(7),
                               {"images": images[None], "cams": cams[None]}, kw)
    # make the params recognizably different from a fresh init
    state = state.replace(params=jax.tree_util.tree_map(
        lambda x: x * 0 + 0.05, state.params))
    cp = Checkpointer(str(tmp_path / "ckpt"))
    cp.save(state, 3)
    cp.close()

    pred = Predictor(cfg, checkpoint_dir=str(tmp_path / "ckpt"))
    out = pred(images, cams)
    assert np.isfinite(out["depth"]).all()
    # loaded params are the constant tree, not a fresh random init
    leaf = jax.tree_util.tree_leaves(pred._variables["params"])[0]
    np.testing.assert_allclose(np.asarray(leaf), 0.05)
