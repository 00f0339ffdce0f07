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
