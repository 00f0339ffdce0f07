"""End-to-end engine tests on the synthetic DTU tree: curriculum training,
checkpoint auto-resume, eval export (SURVEY.md §3.1/§3.2 parity)."""

import glob
import os

import numpy as np
import pytest

from pointmvsnet_tpu.config import get_default_cfg
from pointmvsnet_tpu.dataset.synthetic import make_synthetic_dtu
from pointmvsnet_tpu.parallel import make_mesh

H, W, D = 64, 128, 16


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("dtu")
    # scan2 ∈ train split, scan3 ∈ val split, scan4 ∈ eval split
    make_synthetic_dtu(str(root), scans=[2, 3, 4], num_views=3, height=H,
                       width=W, num_depth=D, depth_min=425.0,
                       depth_interval=2.5)
    out = tmp_path_factory.mktemp("out")
    cfg = get_default_cfg()
    for split in ("TRAIN", "VAL", "TEST"):
        cfg.DATA[split].ROOT_DIR = str(root)
        cfg.DATA[split].NUM_VIEW = 3
    cfg.DATA.TRAIN.NUM_VIRTUAL_PLANE = D
    cfg.DATA.TRAIN.INTERVAL_SCALE = 1.0
    cfg.DATA.TEST.NUM_VIRTUAL_PLANE = D
    cfg.DATA.TEST.INTERVAL_SCALE = 1.0
    cfg.DATA.TEST.IMG_HEIGHT = H
    cfg.DATA.TEST.IMG_WIDTH = W
    cfg.MODEL.NUM_VIRTUAL_PLANE = D
    cfg.MODEL.IMG_BASE_CHANNELS = 4
    cfg.MODEL.VOL_BASE_CHANNELS = 4
    cfg.MODEL.EDGE_CHANNELS = (8,)
    cfg.MODEL.FLOW_CHANNELS = (8, 1)
    cfg.MODEL.KNN = 8
    cfg.MODEL.NORM = "gn"
    cfg.MODEL.TRAIN.IMG_SCALES = (0.25,)
    cfg.MODEL.TRAIN.INTER_SCALES = (0.75,)
    cfg.MODEL.TEST.IMG_SCALES = (0.25, 0.5)
    cfg.MODEL.TEST.INTER_SCALES = (0.75, 0.375)
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.TEST.BATCH_SIZE = 1
    cfg.SCHEDULER.MAX_EPOCH = 2
    cfg.SCHEDULER.INIT_EPOCH = 1  # epoch 0 coarse-only, epoch 1 with flow
    return cfg, str(out)


def test_train_two_epochs_with_curriculum(env):
    from pointmvsnet_tpu.train import train
    cfg, out = env
    state = train(cfg, out, max_steps_per_epoch=2, mesh=make_mesh(1))
    assert int(state.step) == 4  # 2 epochs × 2 steps
    assert os.path.isdir(os.path.join(out, "checkpoints"))
    assert os.path.isfile(os.path.join(out, "log.txt"))


def test_auto_resume_continues(env):
    from pointmvsnet_tpu.train import train
    cfg, out = env
    cfg2 = cfg.clone()
    cfg2.SCHEDULER.MAX_EPOCH = 3
    state = train(cfg2, out, max_steps_per_epoch=2, mesh=make_mesh(1))
    # resumed from epoch 2 → only one extra epoch of 2 steps on top of the
    # restored step counter
    assert int(state.step) == 6


def test_eval_export(env):
    from pointmvsnet_tpu.test import test as run_test
    cfg, out = env
    summary, depth_dir = run_test(cfg, out, max_batches=2, mesh=make_mesh(1))
    pfms = glob.glob(os.path.join(depth_dir, "scan4", "*_init.pfm"))
    assert len(pfms) == 2
    assert glob.glob(os.path.join(depth_dir, "scan4", "*_flow2.pfm"))
    assert glob.glob(os.path.join(depth_dir, "scan4", "*_prob.pfm"))
    assert glob.glob(os.path.join(depth_dir, "scan4", "*.txt"))
    # exported depths parse back and lie in the hypothesis range
    from pointmvsnet_tpu.dataset.io import load_pfm
    d = load_pfm(pfms[0])
    assert np.isfinite(d).all()
    assert d.min() >= 425.0 - 1e-3 and d.max() <= 425.0 + (D - 1) * 2.5 + 1e-3
    assert "<3_pct_cor" in summary
