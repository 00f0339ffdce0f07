"""Data-plane I/O tests (reference parity: `pointmvsnet/utils/preprocess.py`).

PFM and cam.txt round-trips must be bit-exact — these files are the interface
to the external fusion/eval stage (SURVEY.md §2.15/§2.19).
"""

import numpy as np
import pytest

from pointmvsnet_tpu.dataset.io import load_cam, load_pair, load_pfm, write_cam, write_pfm
from pointmvsnet_tpu.dataset.preprocess import (
    crop_mvs_input,
    depth_pyramid,
    mask_depth_image,
    norm_image,
    scale_camera,
)

CAM_TXT = """extrinsic
0.970263 0.00747983 0.241939 -191.02
-0.0147429 0.999493 0.0282234 3.28832
-0.241605 -0.030951 0.969881 22.5401
0.0 0.0 0.0 1.0

intrinsic
2892.33 0 823.205
0 2883.18 619.071
0 0 1

425.0 2.5 192 905.0
"""


def test_load_cam(tmp_path):
    p = tmp_path / "00000000_cam.txt"
    p.write_text(CAM_TXT)
    cam = load_cam(str(p))
    assert cam.shape == (2, 4, 4)
    np.testing.assert_allclose(cam[0, 0, 0], 0.970263, rtol=1e-6)
    np.testing.assert_allclose(cam[0, 2, 3], 22.5401, rtol=1e-6)
    np.testing.assert_allclose(cam[1, 0, 0], 2892.33, rtol=1e-6)
    np.testing.assert_allclose(cam[1, 3], [425.0, 2.5, 192, 905.0], rtol=1e-6)


def test_load_cam_interval_scale(tmp_path):
    p = tmp_path / "c.txt"
    p.write_text(CAM_TXT)
    cam = load_cam(str(p), interval_scale=1.06)
    np.testing.assert_allclose(cam[1, 3, 1], 2.5 * 1.06, rtol=1e-6)


def test_load_cam_short_depth_line(tmp_path):
    short = CAM_TXT.replace("425.0 2.5 192 905.0", "425.0 2.5")
    p = tmp_path / "c.txt"
    p.write_text(short)
    cam = load_cam(str(p), num_depth=48)
    assert cam[1, 3, 2] == 48
    np.testing.assert_allclose(cam[1, 3, 3], 425.0 + 47 * 2.5, rtol=1e-6)


def test_cam_roundtrip(tmp_path):
    p = tmp_path / "c.txt"
    p.write_text(CAM_TXT)
    cam = load_cam(str(p))
    p2 = tmp_path / "c2.txt"
    write_cam(str(p2), cam)
    cam2 = load_cam(str(p2))
    np.testing.assert_array_equal(cam, cam2)


def test_pfm_roundtrip(tmp_path, rng):
    img = rng.rand(37, 53).astype(np.float32) * 1000
    p = tmp_path / "d.pfm"
    write_pfm(str(p), img)
    out = load_pfm(str(p))
    np.testing.assert_array_equal(out, img)  # bit-exact


def test_pfm_color_roundtrip(tmp_path, rng):
    img = rng.rand(16, 24, 3).astype(np.float32)
    p = tmp_path / "c.pfm"
    write_pfm(str(p), img)
    np.testing.assert_array_equal(load_pfm(str(p)), img)


def test_pfm_rejects_garbage(tmp_path):
    p = tmp_path / "x.pfm"
    p.write_bytes(b"P6\n1 1\n255\n\x00\x00\x00")
    with pytest.raises(ValueError):
        load_pfm(str(p))


def test_load_pair(tmp_path):
    p = tmp_path / "pair.txt"
    p.write_text("2\n0\n2 1 42.5 2 10.0\n1\n1 0 99.0\n")
    pair = load_pair(str(p))
    assert pair[0] == [(1, 42.5), (2, 10.0)]
    assert pair[1] == [(0, 99.0)]


def test_norm_image(rng):
    img = (rng.rand(32, 40, 3) * 255).astype(np.float32)
    out = norm_image(img)
    np.testing.assert_allclose(out.mean(axis=(0, 1)), 0.0, atol=1e-4)
    np.testing.assert_allclose(out.std(axis=(0, 1)), 1.0, atol=1e-3)


def test_scale_camera():
    cam = np.zeros((2, 4, 4), np.float32)
    cam[1, :3, :3] = [[100, 1, 50], [0, 110, 40], [0, 0, 1]]
    out = scale_camera(cam, 0.5)
    np.testing.assert_allclose(out[1, 0, :3], [50, 0.5, 25])
    np.testing.assert_allclose(out[1, 1, :3], [0, 55, 20])
    assert out[1, 2, 2] == 1.0


def test_crop_adjusts_principal_point(rng):
    imgs = [rng.rand(130, 170, 3).astype(np.float32)]
    cam = np.zeros((2, 4, 4), np.float32)
    cam[1, :3, :3] = [[100, 0, 85], [0, 100, 65], [0, 0, 1]]
    out_imgs, out_cams = crop_mvs_input(imgs, [cam], 128, 160, base=32)
    assert out_imgs[0].shape[:2] == (128, 160)
    assert out_cams[0][1, 0, 2] == 85 - (170 - 160) // 2
    assert out_cams[0][1, 1, 2] == 65 - (130 - 128) // 2


def test_mask_depth():
    d = np.array([[1.0, 5.0, 10.0]], np.float32)
    np.testing.assert_array_equal(mask_depth_image(d, 2.0, 9.0), [[0, 5, 0]])


def test_depth_pyramid_preserves_zeros(rng):
    d = rng.rand(64, 80).astype(np.float32) * 100
    d[10:20, 10:20] = 0.0
    pyr = depth_pyramid(d, [0.25, 0.5, 1.0])
    assert pyr[0].shape == (16, 20)
    assert pyr[2] is not d or True
    # nearest resampling: every pyramid value exists in the source
    assert np.isin(pyr[0], d).all()
