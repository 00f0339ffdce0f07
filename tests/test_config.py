"""Config system tests (reference parity: `pointmvsnet/config.py`)."""

import os

import pytest

from pointmvsnet_tpu.config import CfgNode, get_default_cfg, load_cfg_from_file

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_defaults_schema():
    cfg = get_default_cfg()
    # Reference section layout must exist.
    for section in ["DATA", "MODEL", "SOLVER", "SCHEDULER", "TRAIN", "TEST"]:
        assert section in cfg
    assert cfg.MODEL.NUM_VIRTUAL_PLANE == 48
    assert cfg.SOLVER.TYPE == "RMSprop"
    assert cfg.SCHEDULER.INIT_EPOCH == 4


def test_yaml_overlay():
    cfg = load_cfg_from_file(os.path.join(REPO, "configs", "dtu_wde3.yaml"))
    assert cfg.DATA.TEST.NUM_VIEW == 5
    assert cfg.DATA.TEST.NUM_VIRTUAL_PLANE == 96
    assert cfg.MODEL.TRAIN.IMG_SCALES == (0.25, 0.5)


def test_gn_overlay():
    cfg = load_cfg_from_file(os.path.join(REPO, "configs", "dtu_wde3_gn.yaml"))
    assert cfg.MODEL.NORM == "gn"


def test_merge_from_list_coercion():
    cfg = get_default_cfg()
    cfg.merge_from_list(["TRAIN.BATCH_SIZE", "8", "SOLVER.BASE_LR", "1e-3",
                         "MODEL.NORM", "gn", "MODEL.TRAIN.IMG_SCALES", "[0.5, 1.0]"])
    assert cfg.TRAIN.BATCH_SIZE == 8
    assert cfg.SOLVER.BASE_LR == 1e-3
    assert cfg.MODEL.TRAIN.IMG_SCALES == (0.5, 1.0)


def test_unknown_key_rejected():
    cfg = get_default_cfg()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["TRAIN.NOPE", "1"])


def test_freeze():
    cfg = get_default_cfg()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.TRAIN.BATCH_SIZE = 2
    cfg.defrost()
    cfg.TRAIN.BATCH_SIZE = 2
    assert cfg.TRAIN.BATCH_SIZE == 2


def test_clone_independent():
    cfg = get_default_cfg()
    c2 = cfg.clone()
    c2.TRAIN.BATCH_SIZE = 99
    assert cfg.TRAIN.BATCH_SIZE != 99


def test_dump_roundtrip(tmp_path):
    cfg = get_default_cfg()
    p = tmp_path / "dump.yaml"
    p.write_text(cfg.dump())
    cfg2 = load_cfg_from_file(str(p))
    assert cfg2.MODEL.FLOW_CHANNELS == cfg.MODEL.FLOW_CHANNELS


def test_purge_cfg():
    from pointmvsnet_tpu.config import purge_cfg
    cfg = CfgNode({"A": 1, "B": None, "C": {"D": None}, "E": {"F": 2}})
    purge_cfg(cfg)
    assert "B" not in cfg and "C" not in cfg
    assert cfg.A == 1 and cfg.E.F == 2
