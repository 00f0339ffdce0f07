"""Geometry core property tests (SURVEY.md §7 step 3): project∘unproject
roundtrips, hand-computed cases, DTU-style camera sanity."""

import numpy as np
import jax.numpy as jnp

from pointmvsnet_tpu.ops.geometry import (
    cam_depth_range,
    depth_hypotheses,
    pixel_grid,
    project_points,
    unproject_pixels,
    view_direction,
)


def random_camera(rng, f=100.0, h=48, w=64):
    """Random-ish but well-conditioned camera: small rotation + translation."""
    angle = rng.uniform(-0.2, 0.2, size=3)
    c, s = np.cos(angle), np.sin(angle)
    rx = np.array([[1, 0, 0], [0, c[0], -s[0]], [0, s[0], c[0]]])
    ry = np.array([[c[1], 0, s[1]], [0, 1, 0], [-s[1], 0, c[1]]])
    rz = np.array([[c[2], -s[2], 0], [s[2], c[2], 0], [0, 0, 1]])
    r = rx @ ry @ rz
    e = np.eye(4)
    e[:3, :3] = r
    e[:3, 3] = rng.uniform(-5, 5, size=3)
    k = np.array([[f, 0, w / 2], [0, f * 1.05, h / 2], [0, 0, 1.0]])
    return jnp.asarray(e, jnp.float32), jnp.asarray(k, jnp.float32)


def test_pixel_grid_layout():
    g = np.asarray(pixel_grid(2, 3))
    assert g.shape == (6, 3)
    np.testing.assert_array_equal(g[0], [0, 0, 1])
    np.testing.assert_array_equal(g[1], [1, 0, 1])   # u-fastest (row-major)
    np.testing.assert_array_equal(g[3], [0, 1, 1])


def test_depth_hypotheses():
    d = np.asarray(depth_hypotheses(jnp.array([425.0]), jnp.array([2.5]), 4))
    np.testing.assert_allclose(d[0], [425.0, 427.5, 430.0, 432.5])


def test_cam_depth_range():
    cam = np.zeros((2, 4, 4), np.float32)
    cam[1, 3] = [425.0, 2.5, 48, 542.5]
    dmin, dint, dnum, dmax = cam_depth_range(jnp.asarray(cam))
    assert (float(dmin), float(dint), float(dnum), float(dmax)) == (425.0, 2.5, 48.0, 542.5)


def test_project_unproject_roundtrip(rng):
    e, k = random_camera(rng)
    pix = pixel_grid(48, 64)[None]                      # (1, N, 3)
    depth = jnp.asarray(rng.uniform(5, 50, size=(1, 48 * 64)), jnp.float32)
    pts = unproject_pixels(pix, depth, e[None], k[None])
    uv, z = project_points(pts, e[None], k[None])
    np.testing.assert_allclose(np.asarray(uv), np.asarray(pix[..., :2]), atol=2e-2)
    np.testing.assert_allclose(np.asarray(z), np.asarray(depth), rtol=1e-4)


def test_unproject_identity_cam():
    e = jnp.eye(4, dtype=jnp.float32)
    k = jnp.asarray([[10.0, 0, 5], [0, 10, 4], [0, 0, 1]], jnp.float32)
    pix = jnp.asarray([[[5.0, 4.0, 1.0], [15.0, 4.0, 1.0]]])  # principal pt, +10px
    depth = jnp.asarray([[2.0, 2.0]])
    pts = np.asarray(unproject_pixels(pix, depth, e[None], k[None]))
    np.testing.assert_allclose(pts[0, 0], [0, 0, 2.0], atol=1e-6)
    # 10 px at f=10 → x/z = 1 → x = 2
    np.testing.assert_allclose(pts[0, 1], [2.0, 0, 2.0], atol=1e-5)


def test_project_behind_camera_z_negative():
    e = jnp.eye(4, dtype=jnp.float32)
    k = jnp.asarray([[10.0, 0, 5], [0, 10, 4], [0, 0, 1]], jnp.float32)
    pts = jnp.asarray([[[0.0, 0.0, -3.0]]])
    _, z = project_points(pts, e[None], k[None])
    assert float(z[0, 0]) < 0


def test_translated_camera_disparity():
    """Stereo pair with baseline b: disparity = f·b/d (the synthetic-scene
    geometry the dataset tests rely on)."""
    f, b, d = 100.0, 0.5, 10.0
    e = np.eye(4, dtype=np.float32)
    e[0, 3] = -b  # camera at x=+b
    k = np.asarray([[f, 0, 32], [0, f, 24], [0, 0, 1]], np.float32)
    pts = jnp.asarray([[[0.0, 0.0, d]]])
    uv, z = project_points(pts, jnp.asarray(e)[None], jnp.asarray(k)[None])
    np.testing.assert_allclose(float(uv[0, 0, 0]), 32 - f * b / d, rtol=1e-5)
    np.testing.assert_allclose(float(z[0, 0]), d, rtol=1e-6)


def test_view_direction_unit_and_outward(rng):
    e, k = random_camera(rng)
    pts = jnp.asarray(rng.uniform(-3, 3, size=(1, 17, 3)) + [0, 0, 20], jnp.float32)
    dirs = np.asarray(view_direction(pts, e[None]))
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-5)
    # moving along +dir must increase camera-frame depth
    uv1, z1 = project_points(pts, e[None], k[None])
    uv2, z2 = project_points(pts + 0.1 * dirs, e[None], k[None])
    assert np.all(np.asarray(z2) > np.asarray(z1))
    # and keep the pixel location fixed (rays through the camera center)
    np.testing.assert_allclose(np.asarray(uv1), np.asarray(uv2), atol=1e-2)
