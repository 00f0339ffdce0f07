"""DTU dataset + loader tests against the synthetic DTU-format tree
(reference parity: `pointmvsnet/dataset/dtu.py`, SURVEY.md §3.5)."""

import numpy as np
import pytest

from pointmvsnet_tpu.dataset.build import DataLoader, collate
from pointmvsnet_tpu.dataset.dtu import DTUTestDataset, DTUTrainValDataset
from pointmvsnet_tpu.dataset.synthetic import make_synthetic_dtu


@pytest.fixture(scope="module")
def dtu_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dtu")
    make_synthetic_dtu(str(root), scans=[1, 2], num_views=4, height=64,
                       width=80, num_lights=2)
    return str(root)


def test_train_item_shapes(dtu_root):
    ds = DTUTrainValDataset(dtu_root, mode="train", num_view=3, scans=[1, 2], num_lights=2)
    assert len(ds) == 2 * 4 * 2  # scans × ref views × lights
    item = ds[0]
    assert item["images"].shape == (3, 64, 80, 3)
    assert item["cams"].shape == (3, 2, 4, 4)
    assert item["gt_depth"].shape == (64, 80, 1)
    # depth values must lie inside the hypothesis range
    valid = item["gt_depth"][item["gt_depth"] > 0]
    d_min, d_int = item["cams"][0, 1, 3, 0], item["cams"][0, 1, 3, 1]
    nd = item["cams"][0, 1, 3, 2]
    assert valid.min() >= d_min and valid.max() <= d_min + (nd - 1) * d_int


def test_view_selection_order(dtu_root):
    ds = DTUTrainValDataset(dtu_root, mode="train", num_view=3, scans=[1], num_lights=2)
    item = ds[0]
    # first view is the ref view; cams differ across views (baseline tx)
    assert item["ref_view"] == 0
    assert not np.allclose(item["cams"][0, 0], item["cams"][1, 0])


def test_test_dataset(dtu_root):
    ds = DTUTestDataset(dtu_root, num_view=3, img_height=64, img_width=80,
                        scans=[1], base=16, light_idx=1)
    item = ds[0]
    assert item["images"].shape == (3, 64, 80, 3)
    # synthetic tree ships Depths/ → GT is loaded for depth-map-level eval
    assert item["gt_depth"].shape == (64, 80, 1)


def test_collate_and_loader(dtu_root):
    ds = DTUTrainValDataset(dtu_root, mode="train", num_view=3, scans=[1, 2], num_lights=2)
    dl = DataLoader(ds, batch_size=4, shuffle=True, seed=0)
    batches = list(dl)
    assert len(batches) == len(ds) // 4
    b = batches[0]
    assert b["images"].shape == (4, 3, 64, 80, 3)
    assert b["cams"].shape == (4, 3, 2, 4, 4)


def test_loader_shuffle_deterministic(dtu_root):
    ds = DTUTrainValDataset(dtu_root, mode="train", num_view=3, scans=[1, 2], num_lights=2)
    dl1 = DataLoader(ds, batch_size=2, shuffle=True, seed=7)
    dl2 = DataLoader(ds, batch_size=2, shuffle=True, seed=7)
    b1, b2 = next(iter(dl1)), next(iter(dl2))
    np.testing.assert_array_equal(b1["scan"], b2["scan"])
    np.testing.assert_array_equal(b1["ref_view"], b2["ref_view"])
    dl1.set_epoch(1)
    b3 = next(iter(dl1))
    # different epoch → different order (overwhelmingly likely with 16 items)
    assert not (np.array_equal(b1["ref_view"], b3["ref_view"])
                and np.array_equal(b1["scan"], b3["scan"]))


def test_threaded_loader_matches_sync(dtu_root):
    ds = DTUTrainValDataset(dtu_root, mode="train", num_view=3, scans=[1], num_lights=2)
    sync = list(DataLoader(ds, batch_size=2, shuffle=False))
    thr = list(DataLoader(ds, batch_size=2, shuffle=False, num_workers=1))
    assert len(sync) == len(thr)
    for a, b in zip(sync, thr):
        np.testing.assert_array_equal(a["images"], b["images"])


def test_synthetic_geometry_is_consistent(dtu_root):
    """Photometric check: warping view v's image by GT disparity must match
    the ref view (this validates the generator the e2e tests depend on)."""
    ds = DTUTrainValDataset(dtu_root, mode="train", num_view=3, scans=[1], num_lights=2)
    item = ds[0]
    imgs, cams = item["images"], item["cams"]
    gt = item["gt_depth"][..., 0]
    f = cams[0, 1, 0, 0]
    # view 1 world→cam tx (camera at +b ⇒ E[0,3] = -b)
    b = -cams[1, 0, 0, 3]
    h, w = gt.shape
    err, cnt = 0.0, 0
    for y in range(0, h, 7):
        for x in range(8, w - 8, 5):
            d = gt[y, x]
            if d <= 0:
                continue
            xs = x - f * b / d
            xi = int(round(xs))
            if 0 <= xi < w:
                err += float(np.abs(imgs[1, y, xi] - imgs[0, y, x]).mean())
                cnt += 1
    assert cnt > 50
    assert err / cnt < 0.35  # normalized-image units; most pixels must agree


@pytest.fixture(scope="module")
def dtu_eval_root(tmp_path_factory):
    """Official eval/testing-release layout: Eval/scan{n}/{images,cams} +
    per-scan pair.txt, jpg images, no shared Cameras/ and no Depths/."""
    root = tmp_path_factory.mktemp("dtu_eval")
    make_synthetic_dtu(str(root), scans=[1, 4], num_views=4, height=64,
                       width=80, layout="eval")
    return str(root)


def test_eval_release_layout(dtu_eval_root):
    ds = DTUTestDataset(dtu_eval_root, num_view=3, img_height=64,
                        img_width=80, scans=[1, 4], base=16)
    assert ds.scans == [1, 4]
    assert len(ds) == 2 * 4  # per-scan pair.txt: every view is a ref
    item = ds[0]
    assert item["images"].shape == (3, 64, 80, 3)
    assert item["cams"].shape == (3, 2, 4, 4)
    assert "gt_depth" not in item  # eval release ships no GT depth
    # cams must round-trip through the per-scan cams/ dir (baseline tx)
    assert not np.allclose(item["cams"][0, 0], item["cams"][1, 0])


def test_eval_release_ignores_missing_scans(dtu_eval_root):
    ds = DTUTestDataset(dtu_eval_root, num_view=3, img_height=64,
                        img_width=80, scans=[1, 99], base=16)
    assert ds.scans == [1]


def test_mixed_layouts_one_root(dtu_root, dtu_eval_root, tmp_path_factory):
    """Train-release and eval-release scans may coexist under one root."""
    import shutil
    root = tmp_path_factory.mktemp("dtu_mixed")
    for d in ("Cameras", "Rectified", "Depths"):
        shutil.copytree(f"{dtu_root}/{d}", f"{root}/{d}")
    shutil.copytree(f"{dtu_eval_root}/Eval", f"{root}/Eval")
    # scan 2 exists only as train-release, scan 4 only as eval-release
    ds = DTUTestDataset(str(root), num_view=3, img_height=64, img_width=80,
                        scans=[2, 4], base=16, light_idx=1)
    assert ds.scans == [2, 4]
    kinds = {s: ds._layout[s][0] for s in ds.scans}
    assert kinds == {2: "train", 4: "eval"}
    items = [ds[i] for i in (0, len(ds) - 1)]
    for item in items:
        assert item["images"].shape == (3, 64, 80, 3)
