"""bf16 mixed-precision training audit (VERDICT r1 #8 / STATUS #6).

Production precision policy (documented by this test):
* params, optimizer state, geometry (projection/unprojection, depth
  hypotheses, regression) — float32 always;
* conv/EdgeConv/MLP compute — MODEL.DTYPE, bf16 in production (MXU-native);
* softmax/loss — float32.

The audit trains the same synthetic-scene batch under f32 compute and
bf16 compute and bounds the trajectory drift: bf16 must descend, stay
finite, and land within a modest band of the f32 loss — mixed precision
changes rounding, not dynamics.
"""

import jax
import numpy as np
import pytest

from pointmvsnet_tpu.config import get_default_cfg
from pointmvsnet_tpu.dataset.dtu import DTUTrainValDataset
from pointmvsnet_tpu.dataset.synthetic import make_synthetic_dtu
from pointmvsnet_tpu.models import build_model
from pointmvsnet_tpu.parallel import create_train_state, make_train_step
from pointmvsnet_tpu.utils.solver import build_optimizer

H, W, D = 64, 128, 16
KW = dict(is_flow=True, img_scales=(0.25,), inter_scales=(0.75,),
          num_virtual_plane=D)
N_STEPS = 20


@pytest.fixture(scope="module")
def batch(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dtu_bf16"))
    make_synthetic_dtu(root, scans=[2], num_views=3, height=H, width=W,
                       num_depth=D, depth_min=425.0, depth_interval=2.5)
    ds = DTUTrainValDataset(root, mode="train", num_view=3,
                            num_virtual_plane=D, interval_scale=1.0)
    items = [ds[i] for i in range(2)]
    return {k: np.stack([it[k] for it in items])
            for k in ("images", "cams", "gt_depth")}


def _train_curve(batch, dtype, norm="gn"):
    cfg = get_default_cfg()
    cfg.MODEL.NUM_VIRTUAL_PLANE = D
    cfg.MODEL.IMG_BASE_CHANNELS = 4
    cfg.MODEL.VOL_BASE_CHANNELS = 4
    cfg.MODEL.EDGE_CHANNELS = (8,)
    cfg.MODEL.FLOW_CHANNELS = (8, 1)
    cfg.MODEL.KNN = 8
    cfg.MODEL.NORM = norm
    cfg.MODEL.DTYPE = dtype
    model, loss_fn, _ = build_model(cfg)
    opt = build_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), batch, KW)
    step = make_train_step(model, loss_fn, opt, None, KW)
    curve = []
    for _ in range(N_STEPS):
        state, losses = step(state, batch)
        curve.append(float(losses["total_loss"]))
    return np.asarray(curve)


@pytest.mark.parametrize("norm", ["gn", "bn"])
def test_bf16_trajectory_tracks_f32(batch, norm):
    """GN covers the audit baseline; BN covers the PRODUCTION norm at B=2 —
    the exact config of the known XLA:TPU backward-NaN anomaly (docs/STATUS).
    This runs on the CPU mesh, where the same graph+data is clean, so a green
    BN case bounds the anomaly to the TPU backend, not the model numerics."""
    f32 = _train_curve(batch, "float32", norm)
    bf16 = _train_curve(batch, "bfloat16", norm)
    print(f"\nf32 curve:  {np.round(f32, 4).tolist()}")
    print(f"bf16 curve: {np.round(bf16, 4).tolist()}")
    drift = np.abs(bf16 - f32) / np.maximum(np.abs(f32), 1e-6)
    print(f"relative drift per step: {np.round(drift, 4).tolist()}")

    assert np.isfinite(bf16).all()
    # both optimize: clear net loss reduction over the run. Averaged over
    # 3-step windows because BN running stats + RMSprop warmup spike the
    # loss in the first steps (the bn f32 curve peaks at step 2 before
    # descending monotonically) and single-step endpoints bounce.
    assert f32[-3:].mean() < 0.75 * f32[:3].mean()
    assert bf16[-3:].mean() < 0.75 * bf16[:3].mean()
    # step-1 losses (pure forward at identical init params) agree closely:
    # only compute rounding differs
    assert drift[0] < 0.02
    # trajectory stays in a modest band of the f32 run (RMSprop amplifies
    # rounding over steps; dynamics must still match)
    assert drift.max() < 0.35
    # endpoint check is ONE-SIDED over the last-3-step mean: bf16 must not
    # end meaningfully WORSE than f32 (a single-step loss bounce once put
    # bf16 25% BELOW f32 and failed the old two-sided single-step bound)
    assert bf16[-3:].mean() < 1.25 * f32[-3:].mean()
