"""Golden-value regression tests (SURVEY.md §4: golden-value tests of
coarse-stage outputs on a CPU-runnable config).

Fixed-seed inputs + fixed-seed init → committed golden outputs. Catches
silent numeric drift in the geometry/sampling/cost/volume chain (the class
of bug depth-map parity dies from). Regenerate deliberately with:
``PMVS_REGEN_GOLDEN=1 python -m pytest tests/test_golden.py``.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
B, V, H, W, D = 1, 3, 64, 64, 16


def _fixed_inputs():
    rng = np.random.RandomState(1234)
    images = jnp.asarray(rng.rand(B, V, H, W, 3).astype(np.float32))
    cams = np.zeros((B, V, 2, 4, 4), np.float32)
    for v in range(V):
        cams[:, v, 0] = np.eye(4)
        cams[:, v, 0, 0, 3] = -0.5 * v
        cams[:, v, 1, :3, :3] = [[80, 0, W / 2], [0, 80, H / 2], [0, 0, 1]]
        cams[:, v, 1, 3] = [8.0, 0.5, D, 8.0 + (D - 1) * 0.5]
    return images, jnp.asarray(cams)


def _forward():
    from pointmvsnet_tpu.config import get_default_cfg
    from pointmvsnet_tpu.models import build_model

    cfg = get_default_cfg()
    cfg.MODEL.NUM_VIRTUAL_PLANE = D
    cfg.MODEL.IMG_BASE_CHANNELS = 4
    cfg.MODEL.VOL_BASE_CHANNELS = 4
    cfg.MODEL.EDGE_CHANNELS = (8,)
    cfg.MODEL.FLOW_CHANNELS = (8, 1)
    cfg.MODEL.KNN = 8
    cfg.MODEL.NORM = "gn"
    model, _, _ = build_model(cfg)
    images, cams = _fixed_inputs()
    kw = dict(is_flow=True, img_scales=(0.25, 0.5),
              inter_scales=(0.75, 0.375), num_virtual_plane=D, train=False)
    variables = model.init(jax.random.PRNGKey(42), images, cams, **kw)
    return model.apply(variables, images, cams, **kw)


def test_golden_outputs():
    preds = _forward()
    keys = ["coarse_depth_map", "coarse_prob_map", "flow1", "flow2"]
    if os.environ.get("PMVS_REGEN_GOLDEN"):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for k in keys:
            np.save(os.path.join(GOLDEN_DIR, f"{k}.npy"),
                    np.asarray(preds[k], np.float32))
        return
    for k in keys:
        path = os.path.join(GOLDEN_DIR, f"{k}.npy")
        assert os.path.isfile(path), f"golden missing: regenerate with PMVS_REGEN_GOLDEN=1"
        want = np.load(path)
        got = np.asarray(preds[k], np.float32)
        # loose-ish tolerance: compiler/version variation is acceptable,
        # semantic drift (pixel shifts, mask changes) is not
        np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-3, err_msg=k)
