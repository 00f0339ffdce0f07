"""Equivalence tests: pixel-grouped fetch == multilevel gather fetch.

The grouped path (``ops/grouped_fetch.py``) reads the IDENTICAL taps with
the IDENTICAL masks/weights as ``fetch_features_multilevel``; outputs agree
to a few f32 ulps (XLA fuses the two graphs' mul/add chains into different
FMA orders, so bit-equality across graphs is not a meaningful target —
measured max |Δ| = 2.4e-7 on unit-scale features). The per-view
``lax.cond`` fallback covers epipolar spans that overflow the patch.
Path-taken assertions use monkeypatched internals returning NaN: a clean
output then proves the OTHER path executed.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from pointmvsnet_tpu.ops import grouped_fetch
from pointmvsnet_tpu.ops.grouped_fetch import (
    fetch_features_grouped,
    grouped_miss_any,
    pad_levels,
    patch_sizes,
)
from pointmvsnet_tpu.ops.sampling import fetch_features_multilevel


def assert_feats_close(got, ref):
    assert got.dtype == ref.dtype
    assert not np.isnan(np.asarray(got, np.float32)).any()
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=1e-5, atol=1e-6)


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
    spread ⇒ projections of a group stay within the patch)."""
    base = rng.randn(b, n, 3).astype(np.float32) * np.float32([1.5, 1.0, 0.6])
    base[..., 2] += depth
    pts = np.concatenate([base + np.float32([0, 0, g * spread])
                          for g in range(groups)], axis=1)
    return jnp.asarray(pts)


@pytest.mark.parametrize("p0", [4, 5])
def test_patch_sizes(p0):
    ps = patch_sizes(p0, 3)
    assert ps[0] == p0
    # level-l floor-cell span of a (p0-2)-texel level-0 span, plus 2 taps
    for l in (1, 2):
        assert ps[l] == -(-(p0 - 2) // (1 << l)) + 2


@pytest.mark.parametrize("p0", [4, 5])
def test_grouped_matches_multilevel_fast(rng, p0, monkeypatch):
    """Tiny spans ⇒ fast path; values match the gather path."""
    # poison the slow path: if it runs, outputs become non-finite
    monkeypatch.setattr(
        grouped_fetch, "bilinear_sample",
        lambda feat, uv, valid=None: jnp.full(
            (*uv.shape[:-1], feat.shape[-1]), jnp.nan, feat.dtype))
    levels, cams = make_pyramid(rng)
    pts = make_points(rng, 1, 64, groups=5, spread=0.002)
    ref = fetch_features_multilevel(levels, pts, cams)
    got = fetch_features_grouped(levels, pts, cams, groups=5, p0=p0)
    assert got.shape == ref.shape
    assert_feats_close(got, ref)


def test_grouped_fallback_on_wide_span(rng, monkeypatch):
    """Huge spans overflow the patch ⇒ slow path runs and stays exact."""
    # poison the fast path: equality then proves the fallback executed
    monkeypatch.setattr(
        grouped_fetch, "_onehot_extract",
        lambda rows, by, bx, p, c: (jnp.full((*by.shape, c), jnp.nan),) * 4)
    levels, cams = make_pyramid(rng)
    pts = make_points(rng, 1, 32, groups=5, spread=0.8)   # wide epipolar span
    ref = fetch_features_multilevel(levels, pts, cams)
    got = fetch_features_grouped(levels, pts, cams, groups=5, p0=4)
    assert_feats_close(got, ref)


def test_grouped_outside_and_behind(rng):
    """Behind-camera, far-outside, and border-straddling points: grouped
    output equals the gather path everywhere (zeros where masked)."""
    levels, cams = make_pyramid(rng)
    pts = np.array(make_points(rng, 1, 48, groups=3, spread=0.01))
    pts[0, :8, 2] = -3.0          # behind every camera
    pts[0, 8:14, 0] += 100.0      # far outside the image
    pts[0, 14:20, 0] = 9.0        # near the right border at depth 4
    pts = jnp.asarray(pts)
    ref = fetch_features_multilevel(levels, pts, cams)
    got = fetch_features_grouped(levels, pts, cams, groups=3, p0=5)
    assert_feats_close(got, ref)


@pytest.mark.parametrize("band_rows", [8, 4])
def test_grouped_band_sliced(rng, band_rows, monkeypatch):
    """Vertically sliced table: exact when the needed rows fit the slice;
    exact via fallback when they don't."""
    levels, cams = make_pyramid(rng, h=32, w=16)
    padded = pad_levels(levels, 5)
    # cluster points so their projected rows span a narrow band
    pts = np.array(make_points(rng, 1, 40, groups=4, spread=0.002))
    pts[..., 1] = pts[..., 1] * 0.1 + 0.5     # tight vertical cluster
    pts = jnp.asarray(pts)
    ref = fetch_features_multilevel(levels, pts, cams)
    got = fetch_features_grouped(levels, pts, cams, groups=4, p0=5,
                                 padded=padded, band_rows=band_rows)
    assert_feats_close(got, ref)


def test_grouped_band_sliced_fallback(rng):
    """Points spread over the full height with a 4-row slice ⇒ out-of-slice
    fallback fires and the result is still exact."""
    levels, cams = make_pyramid(rng, h=32, w=16)
    pts = make_points(rng, 1, 64, groups=4, spread=0.002)
    ref = fetch_features_multilevel(levels, pts, cams)
    got = fetch_features_grouped(levels, pts, cams, groups=4, p0=5,
                                 band_rows=4)
    assert_feats_close(got, ref)


def test_miss_precheck_consistency(rng):
    """``grouped_miss_any`` is the hoisted fallback decision (same index
    math as the fetch): False on tight spans, True on patch overflow, and
    True when a 4-row table slice can't cover full-height projections."""
    levels, cams = make_pyramid(rng)
    tight = make_points(rng, 1, 64, groups=5, spread=0.002)
    assert not bool(grouped_miss_any(levels, tight, cams, groups=5, p0=4))
    wide = make_points(rng, 1, 32, groups=5, spread=0.8)
    assert bool(grouped_miss_any(levels, wide, cams, groups=5, p0=4))
    lv32, cams32 = make_pyramid(rng, h=32, w=16)
    spread_pts = make_points(rng, 1, 64, groups=4, spread=0.002)
    assert bool(grouped_miss_any(lv32, spread_pts, cams32, groups=4, p0=5,
                                 band_rows=4))


def test_fast_mode_matches_when_no_miss(rng, monkeypatch):
    """mode="fast" (guard-free, for vmapped callers) is exact when the
    precheck says no view misses — and never builds the slow path at all."""
    monkeypatch.setattr(
        grouped_fetch, "bilinear_sample",
        lambda feat, uv, valid=None: (_ for _ in ()).throw(
            AssertionError("slow path traced under mode='fast'")))
    levels, cams = make_pyramid(rng)
    pts = make_points(rng, 1, 64, groups=5, spread=0.002)
    assert not bool(grouped_miss_any(levels, pts, cams, groups=5, p0=4))
    monkeypatch.undo()
    ref = fetch_features_multilevel(levels, pts, cams)
    monkeypatch.setattr(
        grouped_fetch, "bilinear_sample",
        lambda feat, uv, valid=None: (_ for _ in ()).throw(
            AssertionError("slow path traced under mode='fast'")))
    got = fetch_features_grouped(levels, pts, cams, groups=5, p0=4,
                                 mode="fast")
    assert_feats_close(got, ref)


def test_fast_mode_under_vmap(rng):
    """The band-mesh composition shape: vmap the fast mode over a stacked
    band axis (where lax.cond would lower to a both-branches select) and
    match per-band serial cond-mode calls."""
    import jax

    levels, cams = make_pyramid(rng)
    bands = jnp.stack([make_points(rng, 1, 32, groups=5, spread=0.002)
                       for _ in range(4)])                   # (P, B, G·N, 3)
    for p in bands:
        assert not bool(grouped_miss_any(levels, p, cams, groups=5, p0=4))
    got = jax.vmap(lambda p: fetch_features_grouped(
        levels, p, cams, groups=5, p0=4, mode="fast"))(bands)
    for i in range(bands.shape[0]):
        ref = fetch_features_multilevel(levels, bands[i], cams)
        # vmap changes XLA's fusion/FMA-contraction order in the lerp, so
        # the bound is a-few-ulps rather than the serial path's 1e-6
        np.testing.assert_allclose(np.asarray(got[i], np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=1e-4, atol=1e-5)


def test_moments_reduce_matches_stack(rng):
    """reduce="moments" (per-view f32 Σf/Σf² accumulation) equals the
    stacked tensor's view reduction — for BOTH fetch engines."""
    from pointmvsnet_tpu.ops.sampling import (
        fetch_features_multilevel as fml,
    )

    levels, cams = make_pyramid(rng)
    pts = make_points(rng, 1, 64, groups=5, spread=0.002)
    for name, stack_fn, mom_fn in [
        ("grouped",
         lambda: fetch_features_grouped(levels, pts, cams, groups=5, p0=4),
         lambda: fetch_features_grouped(levels, pts, cams, groups=5, p0=4,
                                        reduce="moments")),
        ("multilevel",
         lambda: fml(levels, pts, cams),
         lambda: fml(levels, pts, cams, reduce="moments")),
    ]:
        src = np.asarray(stack_fn(), np.float32)
        s1, s2 = mom_fn()
        assert s1.dtype == jnp.float32 and s2.dtype == jnp.float32, name
        np.testing.assert_allclose(np.asarray(s1), src.sum(axis=1),
                                   rtol=1e-5, atol=1e-6, err_msg=name)
        np.testing.assert_allclose(np.asarray(s2),
                                   np.square(src).sum(axis=1),
                                   rtol=1e-5, atol=1e-6, err_msg=name)


def test_grouped_bf16_levels(rng):
    """bf16 feature maps (the production eval dtype) stay equal."""
    levels, cams = make_pyramid(rng)
    levels = [f.astype(jnp.bfloat16) for f in levels]
    pts = make_points(rng, 1, 64, groups=5, spread=0.002)
    ref = fetch_features_multilevel(levels, pts, cams)
    got = fetch_features_grouped(levels, pts, cams, groups=5, p0=5)
    assert got.dtype == ref.dtype
    assert_feats_close(got, ref)


def test_grouped_batch2(rng):
    levels, cams = make_pyramid(rng, b=2, v=2)
    pts = make_points(rng, 2, 32, groups=5, spread=0.003)
    ref = fetch_features_multilevel(levels, pts, cams)
    got = fetch_features_grouped(levels, pts, cams, groups=5, p0=5)
    assert_feats_close(got, ref)


def test_grouped_grad_parity_levels(rng):
    """d(fetch)/d(levels) matches the multilevel gather path — the
    training-time prerequisite for FLOW_FETCH=grouped: the one-hot
    extract's backward is an exact scatter of the same lerp weights."""
    import jax

    levels, cams = make_pyramid(rng)
    pts = make_points(rng, 1, 48, groups=5, spread=0.002)
    w_rand = jnp.asarray(rng.randn(1, 3, 48 * 5, 18).astype(np.float32))

    def loss(fetch_fn, lv):
        out = fetch_fn(lv, pts, cams)
        return jnp.sum(out * w_rand)

    g_ref = jax.grad(lambda lv: loss(
        lambda l, p, c: fetch_features_multilevel(l, p, c), lv))(levels)
    g_got = jax.grad(lambda lv: loss(
        lambda l, p, c: fetch_features_grouped(l, p, c, groups=5, p0=5),
        lv))(levels)
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_grouped_grad_parity_points(rng):
    """d(fetch)/d(points) (through projection + lerp weights) matches."""
    import jax

    levels, cams = make_pyramid(rng)
    pts = make_points(rng, 1, 48, groups=5, spread=0.002)
    w_rand = jnp.asarray(rng.randn(1, 3, 48 * 5, 18).astype(np.float32))

    def loss(fetch_fn, p):
        return jnp.sum(fetch_fn(p) * w_rand)

    g_ref = jax.grad(lambda p: loss(
        lambda q: fetch_features_multilevel(levels, q, cams), pts))(pts)
    g_got = jax.grad(lambda p: loss(
        lambda q: fetch_features_grouped(levels, q, cams, groups=5, p0=5),
        pts))(pts)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("p0", [4, 5])
def test_weighted_extract_matches(rng, p0):
    """extract="weighted" (factored one-hot × weight contraction) reads the
    same taps with the same masks/weights as "onehot" — equal up to fp
    reassociation of the lerp-weight products (~1 ulp)."""
    levels, cams = make_pyramid(rng)
    pts = make_points(rng, 1, 64, groups=5, spread=0.002)
    ref = fetch_features_multilevel(levels, pts, cams)
    got = fetch_features_grouped(levels, pts, cams, groups=5, p0=p0,
                                 extract="weighted")
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=1e-5, atol=1e-6)


def test_weighted_extract_outside_and_behind(rng):
    """Weighted extraction zeroes masked taps exactly (weight 0.0), so
    behind-camera / outside / border points match the gather path."""
    levels, cams = make_pyramid(rng)
    pts = np.array(make_points(rng, 1, 48, groups=3, spread=0.01))
    pts[0, :8, 2] = -3.0
    pts[0, 8:14, 0] += 100.0
    pts[0, 14:20, 0] = 9.0
    pts = jnp.asarray(pts)
    ref = fetch_features_multilevel(levels, pts, cams)
    got = fetch_features_grouped(levels, pts, cams, groups=3, p0=5,
                                 extract="weighted")
    assert_feats_close(got, ref)


def test_weighted_extract_grad_parity(rng):
    """extract="weighted" backward w.r.t. the feature maps equals the
    multilevel gather path (same scatter of the same weights)."""
    import jax

    levels, cams = make_pyramid(rng)
    pts = make_points(rng, 1, 48, groups=5, spread=0.002)
    w_rand = jnp.asarray(rng.randn(1, 3, 48 * 5, 18).astype(np.float32))

    def loss(fetch_fn, lv):
        return jnp.sum(fetch_fn(lv, pts, cams) * w_rand)

    g_ref = jax.grad(lambda lv: loss(
        lambda l, p, c: fetch_features_multilevel(l, p, c), lv))(levels)
    g_w = jax.grad(lambda lv: loss(
        lambda l, p, c: fetch_features_grouped(
            l, p, c, groups=5, p0=4, extract="weighted"), lv))(levels)
    for a, b in zip(g_ref, g_w):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_out_dtype_bf16(rng):
    """out_dtype=bf16: per-view features are the f32 fetch quantized to
    bf16 (both cond branches), so the result is within one bf16 ulp of the
    f32 path and the dtype is bf16 for both fast and fallback geometry."""
    levels, cams = make_pyramid(rng)
    for spread in (0.002, 0.8):               # fast path / fallback path
        pts = make_points(rng, 1, 32, groups=5, spread=spread)
        ref = fetch_features_grouped(levels, pts, cams, groups=5, p0=4)
        got = fetch_features_grouped(levels, pts, cams, groups=5, p0=4,
                                     out_dtype=jnp.bfloat16)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=8e-3, atol=1e-6)
