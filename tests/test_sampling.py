"""Bilinear sampling parity vs torch ``grid_sample`` (SURVEY.md §7 "hard
parts": sampling semantics must match or depth parity fails silently)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from pointmvsnet_tpu.ops.sampling import (
    bilinear_sample,
    fetch_features,
    fetch_features_multilevel,
    regular_grid_sample,
)


def torch_grid_sample(feat_nhwc: np.ndarray, uv: np.ndarray) -> np.ndarray:
    """torch reference: align_corners=True, zeros padding (the reference
    FeatureFetcher's effective semantics — SURVEY.md §2.6)."""
    n, h, w, c = feat_nhwc.shape
    t = torch.from_numpy(feat_nhwc).permute(0, 3, 1, 2)  # NCHW
    g = torch.from_numpy(uv).clone()
    g[..., 0] = g[..., 0] / (w - 1) * 2 - 1
    g[..., 1] = g[..., 1] / (h - 1) * 2 - 1
    g = g[:, None]  # (N, 1, P, 2)
    out = F.grid_sample(t, g, mode="bilinear", padding_mode="zeros",
                        align_corners=True)
    return out[:, :, 0].permute(0, 2, 1).numpy()  # (N, P, C)


def test_matches_torch_interior(rng):
    feat = rng.rand(2, 9, 13, 4).astype(np.float32)
    uv = np.stack([rng.uniform(0, 12, size=(2, 50)),
                   rng.uniform(0, 8, size=(2, 50))], axis=-1).astype(np.float32)
    ours = np.asarray(bilinear_sample(jnp.asarray(feat), jnp.asarray(uv)))
    ref = torch_grid_sample(feat, uv)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_matches_torch_out_of_bounds(rng):
    feat = rng.rand(1, 7, 8, 3).astype(np.float32)
    uv = np.stack([rng.uniform(-4, 12, size=(1, 200)),
                   rng.uniform(-4, 11, size=(1, 200))], axis=-1).astype(np.float32)
    ours = np.asarray(bilinear_sample(jnp.asarray(feat), jnp.asarray(uv)))
    ref = torch_grid_sample(feat, uv)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_exact_at_integer_pixels(rng):
    feat = rng.rand(1, 5, 6, 2).astype(np.float32)
    uv = np.array([[[2.0, 3.0], [0.0, 0.0], [5.0, 4.0]]], np.float32)
    out = np.asarray(bilinear_sample(jnp.asarray(feat), jnp.asarray(uv)))
    np.testing.assert_allclose(out[0, 0], feat[0, 3, 2], atol=1e-6)
    np.testing.assert_allclose(out[0, 1], feat[0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[0, 2], feat[0, 4, 5], atol=1e-6)


def test_gradient_flows(rng):
    import jax
    feat = jnp.asarray(rng.rand(1, 5, 6, 2).astype(np.float32))
    uv0 = jnp.asarray([[[2.3, 1.7]]])

    g = jax.grad(lambda uv: bilinear_sample(feat, uv).sum())(uv0)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.asarray(g) != 0)


def test_regular_grid_sample_matches_bilinear(rng):
    """The separable-matmul regular-grid path (the reference-view shortcut
    in the cost volume / PointFlow fetch) must agree with the gather-based
    ``bilinear_sample`` at the identical grid coordinates — including
    non-integer scale factors and a banded y_offset."""
    b, h, w, c = 2, 9, 13, 4
    feat = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32))
    for sx, sy, out_h, out_w, y_off in [
        (1.0, 1.0, h, w, 0),            # identity
        (0.5, 0.5, 12, 20, 0),          # upsample target grid
        (13 / 20, 9 / 16, 8, 20, 4),    # banded rows with offset
        (2.0, 2.0, 8, 10, 0),           # grid extends out of image → zeros
    ]:
        jj, ii = np.meshgrid(np.arange(out_w), np.arange(y_off, y_off + out_h))
        uv = np.stack([jj.ravel() * sx, ii.ravel() * sy],
                      axis=-1).astype(np.float32)
        uv = np.broadcast_to(uv, (b,) + uv.shape)
        want = np.asarray(bilinear_sample(feat, jnp.asarray(uv)))
        got = np.asarray(regular_grid_sample(feat, sx, sy, out_h, out_w, y_off))
        np.testing.assert_allclose(got, want, atol=1e-5,
                                   err_msg=f"sx={sx} sy={sy} y_off={y_off}")


def test_fetch_features_multilevel_matches_per_level(rng):
    """The one-gather multilevel fetch must be (bit-)exact vs per-level
    ``fetch_features`` with power-of-two scaled cams — including points
    behind cameras, outside images, and straddling level borders."""
    from pointmvsnet_tpu.models.pointmvsnet import scale_cams

    b, v, h0, w0 = 2, 3, 16, 24
    chans = (4, 8, 16)
    levels = [jnp.asarray(rng.rand(b, v, h0 >> l, w0 >> l, c)
                          .astype(np.float32))
              for l, c in enumerate(chans)]
    cams = np.zeros((b, v, 2, 4, 4), np.float32)
    for view in range(v):
        cams[:, view, 0] = np.eye(4)
        cams[:, view, 0, 0, 3] = -0.4 * view
        cams[:, view, 0, 1, 3] = 0.15 * view
        cams[:, view, 1, :3, :3] = [[25, 0, w0 / 2], [0, 25, h0 / 2], [0, 0, 1]]
    cams = jnp.asarray(cams)
    # points spanning in-view, out-of-view, and behind-camera regions
    pts = np.stack([rng.uniform(-8, 8, 500), rng.uniform(-6, 6, 500),
                    rng.uniform(-4, 12, 500)], -1).astype(np.float32)
    pts = jnp.asarray(np.broadcast_to(pts, (b, 500, 3)))

    per_level = [fetch_features(f, pts, scale_cams(cams, 0.5 ** l, 0.5 ** l))
                 for l, f in enumerate(levels)]
    want = np.asarray(jnp.concatenate(per_level, axis=-1))
    got = np.asarray(fetch_features_multilevel(levels, pts, cams))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_fetch_features_ref_view_identity(rng):
    """Fetching at points unprojected from the ref grid must return the ref
    feature map itself (warp identity — validates the full project→sample
    chain used by the cost volume)."""
    from pointmvsnet_tpu.ops.geometry import pixel_grid, unproject_pixels

    h, w, c = 6, 8, 3
    feat = rng.rand(1, 2, h, w, c).astype(np.float32)
    cams = np.zeros((1, 2, 2, 4, 4), np.float32)
    for v in range(2):
        cams[0, v, 0] = np.eye(4)
        cams[0, v, 0, 0, 3] = -0.3 * v
        cams[0, v, 1, :3, :3] = [[20, 0, w / 2], [0, 20, h / 2], [0, 0, 1]]
    pix = pixel_grid(h, w)[None]
    depth = jnp.full((1, h * w), 5.0)
    pts = unproject_pixels(pix, depth, jnp.asarray(cams[:, 0, 0]),
                           jnp.asarray(cams[:, 0, 1, :3, :3]))
    out = np.asarray(fetch_features(jnp.asarray(feat), pts, jnp.asarray(cams)))
    np.testing.assert_allclose(out[0, 0].reshape(h, w, c), feat[0, 0], atol=1e-4)
    # source view samples are shifted versions — finite and mostly nonzero
    assert np.isfinite(out).all()
    assert (np.abs(out[0, 1]) > 0).mean() > 0.5


def test_perlevel_matches_multilevel(rng):
    """fetch_features_perlevel (per-level 2×2-table bilinear — the shipped
    eval engine) equals the combined-table path, stack and moments
    reductions."""
    from pointmvsnet_tpu.ops.sampling import (
        fetch_features_multilevel,
        fetch_features_perlevel,
    )
    from tests.fetch_helpers import make_points, make_pyramid

    levels, cams = make_pyramid(rng)
    pts = make_points(rng, 1, 64, groups=5, spread=0.01)
    ref = fetch_features_multilevel(levels, pts, cams)
    got = fetch_features_perlevel(levels, pts, cams)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    s1, s2 = fetch_features_perlevel(levels, pts, cams, reduce="moments")
    np.testing.assert_allclose(np.asarray(s1),
                               np.asarray(ref).sum(axis=1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s2),
                               np.square(np.asarray(ref)).sum(axis=1),
                               rtol=1e-5, atol=1e-6)
    bf = fetch_features_perlevel(levels, pts, cams,
                                 out_dtype=jnp.bfloat16)
    assert bf.dtype == jnp.bfloat16


def test_multilevel_moments_matches_stack(rng):
    """reduce="moments" (per-view f32 Σf/Σf² accumulation) equals the
    stacked tensor's view reduction for the combined-table engine."""
    from pointmvsnet_tpu.ops.sampling import fetch_features_multilevel
    from tests.fetch_helpers import make_points, make_pyramid

    levels, cams = make_pyramid(rng)
    pts = make_points(rng, 1, 64, groups=5, spread=0.002)
    src = np.asarray(fetch_features_multilevel(levels, pts, cams), np.float32)
    s1, s2 = fetch_features_multilevel(levels, pts, cams, reduce="moments")
    assert s1.dtype == jnp.float32 and s2.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(s1), src.sum(axis=1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s2), np.square(src).sum(axis=1),
                               rtol=1e-5, atol=1e-6)
