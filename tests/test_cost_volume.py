"""Plane-sweep cost volume tests (coarse stage, SURVEY.md §3.3)."""

import numpy as np
import jax.numpy as jnp

from pointmvsnet_tpu.ops.cost_volume import (
    depth_regression,
    photometric_confidence,
    plane_sweep_volume,
)
from pointmvsnet_tpu.ops.geometry import depth_hypotheses


def stereo_cams(b, v, h, w, f=60.0, baseline=0.4):
    cams = np.zeros((b, v, 2, 4, 4), np.float32)
    for vi in range(v):
        cams[:, vi, 0] = np.eye(4)
        cams[:, vi, 0, 0, 3] = -baseline * vi
        cams[:, vi, 1, :3, :3] = [[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]]
    return cams


def test_variance_zero_at_true_depth(rng):
    """A fronto-parallel textured plane at depth d*: cost (variance across
    views) must be ~0 at the d* hypothesis and larger elsewhere."""
    h, w, c, v = 16, 24, 4, 3
    f, baseline, d_true = 100.0, 0.5, 10.0
    cams = stereo_cams(1, v, h, w, f, baseline)

    # Build per-view features consistent with the plane: view v sees the ref
    # texture shifted left by disparity f·b·v/d*, i.e. I_v[:, x] = tex[:, x+disp].
    tex = rng.rand(h, w + 40, c).astype(np.float32)  # wide texture, crop shifted
    feats = np.zeros((1, v, h, w, c), np.float32)
    for vi in range(v):
        disp = f * baseline * vi / d_true
        assert abs(disp - round(disp)) < 1e-6  # integer by construction
        feats[0, vi] = tex[:, int(round(disp)):int(round(disp)) + w]
    depths = jnp.asarray([[8.0, 10.0, 12.5]])
    cost = np.asarray(plane_sweep_volume(jnp.asarray(feats), jnp.asarray(cams), depths))
    assert cost.shape == (1, 3, h, w, c)
    # compare mean cost on the interior: view 2's disparity at d* is 10 px,
    # so ref pixels u < 10 sample out of bounds (zero-padded) — crop past that
    interior = cost[:, :, 2:-2, 12:-2]
    m = interior.mean(axis=(0, 2, 3, 4))
    assert m[1] < 1e-6
    assert m[0] > 100 * max(m[1], 1e-9) and m[2] > 100 * max(m[1], 1e-9)


def test_depth_regression_softargmin():
    prob = np.zeros((1, 4, 2, 2), np.float32)
    prob[0, 1] = 0.75
    prob[0, 2] = 0.25
    depths = jnp.asarray([[10.0, 20.0, 30.0, 40.0]])
    d = np.asarray(depth_regression(jnp.asarray(prob), depths))
    np.testing.assert_allclose(d, 0.75 * 20 + 0.25 * 30)


def test_photometric_confidence():
    prob = np.full((1, 8, 1, 1), 0.02, np.float32)
    prob[0, 3] = 0.5
    prob[0, 4] = 0.3
    conf = np.asarray(photometric_confidence(jnp.asarray(prob)))
    # window at argmax=3 covers hypotheses 2..5
    np.testing.assert_allclose(conf[0, 0, 0], 0.02 + 0.5 + 0.3 + 0.02, atol=1e-6)
    assert conf.shape == (1, 1, 1)


def test_confidence_edge_indices():
    prob = np.full((1, 6, 1, 1), 0.05, np.float32)
    prob[0, 0] = 0.75  # argmax at the first hypothesis
    conf = np.asarray(photometric_confidence(jnp.asarray(prob)))
    np.testing.assert_allclose(conf[0, 0, 0], 0.75 + 0.05 + 0.05, atol=1e-6)


def test_mxu_sweep_matches_take(rng):
    """COARSE_FETCH=mxu (slab-matmul gather) vs the hardware row gather:
    same cost volume to a few f32 ulps (identical taps/masks/lerp weights;
    XLA orders the FMA chains differently per graph), including at shapes
    where h·w doesn't divide the gather block (plane-straddling blocks),
    and same gradients (the training path)."""
    import jax

    for (h, w, v, d) in [(16, 16, 3, 8), (20, 24, 5, 12)]:
        feats = jnp.asarray(rng.rand(2, v, h, w, 6).astype(np.float32))
        cams = jnp.asarray(stereo_cams(2, v, h, w, f=20.0, baseline=0.3))
        depths = jnp.asarray(
            np.linspace(3.0, 9.0, d, dtype=np.float32)[None].repeat(2, 0))
        a = plane_sweep_volume(feats, cams, depths, impl="take")
        b = plane_sweep_volume(feats, cams, depths, impl="mxu")
        assert float(jnp.max(jnp.abs(a - b))) < 1e-6

    # gradient parity (plane-sweep warp is in the training graph)
    feats32 = jnp.asarray(rng.rand(1, v, h, w, 6).astype(np.float32))
    def loss(impl):
        return lambda x: jnp.sum(
            plane_sweep_volume(x, cams[:1], depths[:1], impl=impl) ** 2)
    ga = jax.grad(loss("take"))(feats32)
    gb = jax.grad(loss("mxu"))(feats32)
    assert float(jnp.max(jnp.abs(ga - gb))) < 1e-5

    # bf16 (the production eval dtype)
    fb = feats.astype(jnp.bfloat16)
    a = plane_sweep_volume(fb, cams, depths, impl="take").astype(jnp.float32)
    b = plane_sweep_volume(fb, cams, depths, impl="mxu").astype(jnp.float32)
    assert float(jnp.max(jnp.abs(a - b))) < 1e-5


def test_mxu_sweep_incoherent_fallback(rng):
    """Geometry whose projections overflow every span window must still be
    exact (per-view lax.cond fallback to the row gather)."""
    from pointmvsnet_tpu.ops.sampling import fetch_features, fetch_features_mxu

    h, w, v = 12, 14, 2
    feats = jnp.asarray(rng.rand(1, v, h, w, 4).astype(np.float32))
    cams = jnp.asarray(stereo_cams(1, v, h, w, f=15.0, baseline=0.5))
    # scattered points: consecutive projections far apart -> span overflow
    pts = jnp.asarray(rng.rand(1, 600, 3).astype(np.float32) * 30 - 15
                      + np.float32([0, 0, 20]))
    a = fetch_features(feats, pts, cams)
    b = fetch_features_mxu(feats, pts, cams, block=64, span=8)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
