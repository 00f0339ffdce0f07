"""Shared fixtures for the point-feature-fetch equivalence tests: a small
stride-2 feature pyramid with DTU-like multi-view cameras, and g-major
grouped hypothesis points (hypothesis g of pixel n at index g·N + n —
PointFlow's layout)."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def make_pyramid(rng, b=1, v=3, h=16, w=24, chans=(4, 6, 8)):
    levels = [jnp.asarray(rng.randn(b, v, h >> l, w >> l, c).astype(np.float32))
              for l, c in enumerate(chans)]
    cams = np.zeros((b, v, 2, 4, 4), np.float32)
    f = 30.0
    for vi in range(v):
        cams[:, vi, 0] = np.eye(4)
        cams[:, vi, 0, 0, 3] = -0.3 * vi          # x-baseline
        cams[:, vi, 0, 1, 3] = 0.1 * vi           # slight vertical drift
        cams[:, vi, 1, :3, :3] = [[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]]
        cams[:, vi, 1, 3] = [1.0, 0.1, 8, 1.8]
    return levels, jnp.asarray(cams)


def make_points(rng, b, n, groups, spread, depth=4.0):
    """g-major grouped points: group g = base + g·spread along z (small
    spread ⇒ projections of a group stay within a small neighborhood)."""
    base = rng.randn(b, n, 3).astype(np.float32) * np.float32([1.5, 1.0, 0.6])
    base[..., 2] += depth
    pts = np.concatenate([base + np.float32([0, 0, g * spread])
                          for g in range(groups)], axis=1)
    return jnp.asarray(pts)
