"""Native C++ data plane: bit-exact equivalence vs the Python reference
implementations (SURVEY.md §2.9's native-component rebuild, data-plane
role)."""

import numpy as np
import pytest

from pointmvsnet_tpu import native
from pointmvsnet_tpu.dataset import io as pyio
from pointmvsnet_tpu.dataset.preprocess import norm_image, resize_image

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason=f"native build unavailable: {native.build_error()}")


def test_pfm_native_matches_python(tmp_path, rng):
    img = (rng.rand(33, 47).astype(np.float32) * 900).astype(np.float32)
    p = str(tmp_path / "d.pfm")
    pyio.write_pfm(p, img)
    np.testing.assert_array_equal(native.load_pfm(p), pyio._load_pfm_py(p))


def test_pfm_color_native(tmp_path, rng):
    img = rng.rand(16, 20, 3).astype(np.float32)
    p = str(tmp_path / "c.pfm")
    pyio.write_pfm(p, img)
    np.testing.assert_array_equal(native.load_pfm(p), pyio._load_pfm_py(p))


def test_pfm_batch_parallel(tmp_path, rng):
    paths = []
    ref = []
    for i in range(8):
        img = rng.rand(24, 30).astype(np.float32) * 100
        p = str(tmp_path / f"{i}.pfm")
        pyio.write_pfm(p, img)
        paths.append(p)
        ref.append(img)
    out = native.load_pfm_batch(paths, 24, 30, n_threads=4)
    np.testing.assert_array_equal(out, np.stack(ref))


def test_cam_native_matches_python(tmp_path):
    from tests.test_dataset_io import CAM_TXT
    p = str(tmp_path / "c.txt")
    open(p, "w").write(CAM_TXT)
    np.testing.assert_array_equal(native.load_cam(p, 1.06),
                                  pyio._load_cam_py(p, 1.06))


def test_cam_native_short_line(tmp_path):
    from tests.test_dataset_io import CAM_TXT
    p = str(tmp_path / "c.txt")
    open(p, "w").write(CAM_TXT.replace("425.0 2.5 192 905.0", "425.0 2.5"))
    np.testing.assert_array_equal(native.load_cam(p, 1.0, num_depth=48),
                                  pyio._load_cam_py(p, 1.0, num_depth=48))


def test_standardize_matches_python(rng):
    img = (rng.rand(40, 52, 3) * 255).astype(np.float32)
    want = norm_image(img)
    got = native.standardize(img.copy())
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_resize_nearest_matches_python(rng):
    img = rng.rand(32, 40, 3).astype(np.float32)
    got = native.resize_nearest(img, 8, 10)
    # python fallback path in resize_image uses the same index formula
    h, w = img.shape[:2]
    ys = np.clip((np.arange(8) * h / 8).astype(np.int64), 0, h - 1)
    xs = np.clip((np.arange(10) * w / 10).astype(np.int64), 0, w - 1)
    np.testing.assert_array_equal(got, img[ys][:, xs])


def test_native_error_codes(tmp_path):
    with pytest.raises(RuntimeError):
        native.load_pfm(str(tmp_path / "missing.pfm"))
    bad = tmp_path / "bad.pfm"
    bad.write_bytes(b"P6\n1 1\n255\n")
    with pytest.raises(RuntimeError):
        native.load_pfm(str(bad))
