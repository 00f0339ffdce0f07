"""Tanks & Temples loader + Freezer tests."""

import os

import numpy as np
import pytest

from pointmvsnet_tpu.dataset.io import write_cam
from pointmvsnet_tpu.dataset.tanks import TanksDataset


@pytest.fixture(scope="module")
def tanks_root(tmp_path_factory):
    import cv2
    root = tmp_path_factory.mktemp("tanks")
    rng = np.random.RandomState(0)
    for scene in ["Family", "Horse"]:
        sd = root / scene
        (sd / "cams").mkdir(parents=True)
        (sd / "images").mkdir()
        nv = 4
        with open(sd / "pair.txt", "w") as f:
            f.write(f"{nv}\n")
            for v in range(nv):
                others = [u for u in range(nv) if u != v]
                f.write(f"{v}\n{len(others)} "
                        + " ".join(f"{u} {50 - i}" for i, u in enumerate(others))
                        + "\n")
        for v in range(nv):
            cam = np.zeros((2, 4, 4), np.float32)
            cam[0] = np.eye(4)
            cam[0, 0, 3] = -0.4 * v
            cam[1, :3, :3] = [[100, 0, 48], [0, 100, 32], [0, 0, 1]]
            cam[1, 3] = [5.0, 0.1, 96, 14.5]
            write_cam(str(sd / "cams" / f"{v:08d}_cam.txt"), cam)
            img = (rng.rand(64, 96, 3) * 255).astype(np.uint8)
            cv2.imwrite(str(sd / "images" / f"{v:08d}.jpg"), img)
    return str(root)


def test_tanks_dataset(tanks_root):
    ds = TanksDataset(tanks_root, num_view=3, img_height=64, img_width=96,
                      base=32)
    assert len(ds) == 2 * 4
    item = ds[0]
    assert item["images"].shape == (3, 64, 96, 3)
    assert item["cams"].shape == (3, 2, 4, 4)
    # source is exactly target-sized → no scale, no crop, cy unchanged
    assert abs(item["cams"][0, 1, 1, 2] - 32) < 1e-5
    np.testing.assert_allclose(item["cams"][0, 1, 3, :2], [5.0, 0.1], rtol=1e-6)


def test_tanks_missing_scene_skipped(tanks_root):
    ds = TanksDataset(tanks_root, num_view=3, scenes=["Family", "Nope"],
                      img_height=64, img_width=96, base=32)
    assert ds.scenes == ["Family"]


def test_tanks_end_to_end_export(tmp_path):
    """BASELINE config #5 smoke: the test CLI over configs/tanks.yaml on a
    synthetic T&T tree exports MVSNet-format artifacts per scene."""
    import glob

    from pointmvsnet_tpu import test as test_entry
    from pointmvsnet_tpu.dataset.synthetic import make_synthetic_tanks

    root = str(tmp_path / "tt")
    make_synthetic_tanks(root, scenes=["Family", "Horse"], num_views=3,
                         height=64, width=128, num_depth=16)
    out = str(tmp_path / "out")
    test_entry.main([
        "--cfg", "/root/repo/configs/tanks.yaml",
        "DATA.TEST.ROOT_DIR", root,
        "DATA.TEST.NUM_VIEW", "3",
        "DATA.TEST.NUM_VIRTUAL_PLANE", "16",
        "DATA.TEST.IMG_HEIGHT", "64", "DATA.TEST.IMG_WIDTH", "128",
        "MODEL.NORM", "gn", "MODEL.TEST.IMG_SCALES", "(0.25, 0.5)",
        "MODEL.TEST.INTER_SCALES", "(0.75, 0.375)",
        "OUTPUT_DIR", out,
    ])
    flows = glob.glob(os.path.join(out, "depths", "scan*", "*_flow2.pfm"))
    probs = glob.glob(os.path.join(out, "depths", "scan*", "*_prob.pfm"))
    # 2 scenes × 3 ref views with full source support
    assert len(flows) == 6 and len(probs) == 6


def test_tanks_rescale_depth(tanks_root):
    """Real-release quirk: each cam.txt carries its OWN num_depth (e.g. 256
    for Family vs 96 elsewhere). Static TPU shapes can't honor it
    dynamically; rescale_depth stretches the interval so the configured D
    hypotheses span the file's full [depth_min, depth_max] range."""
    # the fixture writes num_depth=96 into every cam file; ask for D=32
    ds = TanksDataset(tanks_root, num_view=3, num_virtual_plane=32,
                      img_height=64, img_width=96, base=32)
    cam = ds[0]["cams"][0]
    # span preserved: d_min + (D-1)*interval == d_min + (96-1)*0.1
    np.testing.assert_allclose(cam[1, 3, 1] * (32 - 1), 0.1 * (96 - 1),
                               rtol=1e-5)
    assert cam[1, 3, 2] == 32
    # opt-out restores the raw interval
    ds_raw = TanksDataset(tanks_root, num_view=3, num_virtual_plane=32,
                          img_height=64, img_width=96, base=32,
                          rescale_depth=False)
    np.testing.assert_allclose(ds_raw[0]["cams"][0][1, 3, 1], 0.1, rtol=1e-6)


def test_pick_shape_prefers_aspect_match():
    from pointmvsnet_tpu.dataset.tanks import pick_shape

    shapes = [(512, 640), (1024, 1920), (512, 1280)]
    # 1080×1920 source (16:9) → the 1024×1920 target keeps the most pixels
    assert pick_shape(1080, 1920, shapes, base=64) == (1024, 1920)
    # 4:3-ish source → the 512×640 box fits best
    assert pick_shape(600, 800, shapes, base=64) == (512, 640)


def test_tanks_ragged_resolutions(tmp_path):
    """Heterogeneous synthetic release: two scenes at different native
    resolutions and depth samplings; a shape_set lets each scene pick its
    own (H, W) (one jit compile per distinct shape downstream), and
    rescale_depth folds each scene's num_depth into the static D."""
    from pointmvsnet_tpu.dataset.synthetic import make_synthetic_tanks

    root = str(tmp_path / "tt")
    make_synthetic_tanks(
        root, scenes=["Family", "Horse"], num_views=3, num_depth=16,
        height=64, width=128,
        per_scene={"Horse": {"height": 96, "width": 96, "num_depth": 24,
                             "depth_interval": 1.5}})
    ds = TanksDataset(root, num_view=3, num_virtual_plane=16,
                      img_height=64, img_width=128, base=32,
                      shape_set=[(64, 128), (96, 96)])
    shapes = {}
    for i in range(len(ds)):
        scene, _ = ds.index[i]
        item = ds[i]
        shapes.setdefault(scene, item["images"].shape)
        assert item["images"].shape == shapes[scene]
        cam = item["cams"][0]
        assert cam[1, 3, 2] == 16          # static D everywhere
    assert shapes["Family"][1:3] == (64, 128)
    assert shapes["Horse"][1:3] == (96, 96)
    # Horse's 24-sample/1.5-interval span is preserved under D=16
    horse = next(i for i in range(len(ds)) if ds.index[i][0] == "Horse")
    cam = ds[horse]["cams"][0]
    np.testing.assert_allclose(cam[1, 3, 1] * (16 - 1), 1.5 * (24 - 1),
                               rtol=1e-5)


def test_freezer_masks_updates():
    import jax.numpy as jnp
    import optax
    from pointmvsnet_tpu.utils.freezer import with_frozen

    params = {"img_conv": {"kernel": jnp.ones(3)},
              "vol_conv": {"kernel": jnp.ones(3)}}
    opt = with_frozen(optax.sgd(0.1), [r"img_conv"])
    st = opt.init(params)
    grads = {"img_conv": {"kernel": jnp.ones(3)},
             "vol_conv": {"kernel": jnp.ones(3)}}
    updates, _ = opt.update(grads, st, params)
    np.testing.assert_array_equal(np.asarray(updates["img_conv"]["kernel"]), 0.0)
    assert np.all(np.asarray(updates["vol_conv"]["kernel"]) != 0.0)


def test_solver_skips_nonfinite_updates():
    """SOLVER.SKIP_NONFINITE: a step with NaN/inf grads must leave params
    untouched, and the next finite step must apply normally."""
    import jax.numpy as jnp

    from pointmvsnet_tpu.config import get_default_cfg
    from pointmvsnet_tpu.utils.solver import build_optimizer
    import optax

    cfg = get_default_cfg()
    opt = build_optimizer(cfg, steps_per_epoch=10)
    params = {"w": jnp.ones(3)}
    st = opt.init(params)
    bad = {"w": jnp.asarray([1.0, float("nan"), 1.0])}
    updates, st = opt.update(bad, st, params)
    params2 = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(np.asarray(params2["w"]), 1.0)  # skipped
    good = {"w": jnp.ones(3)}
    updates, st = opt.update(good, st, params2)
    params3 = optax.apply_updates(params2, updates)
    assert (np.asarray(params3["w"]) != 1.0).all()                # applied


def test_freezer_noop_without_patterns():
    import jax.numpy as jnp
    import optax
    from pointmvsnet_tpu.utils.freezer import with_frozen

    opt = with_frozen(optax.sgd(0.1), [])
    params = {"a": jnp.ones(2)}
    st = opt.init(params)
    updates, _ = opt.update({"a": jnp.ones(2)}, st, params)
    np.testing.assert_allclose(np.asarray(updates["a"]), -0.1)


def test_profiler_trace_smoke(tmp_path):
    """xprof trace context manager produces a trace directory."""
    import jax.numpy as jnp
    from pointmvsnet_tpu.utils.profiler import trace
    with trace(str(tmp_path / "tb")):
        _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    import os
    assert os.path.isdir(str(tmp_path / "tb"))
