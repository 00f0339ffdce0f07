"""Bilinear feature sampling (the differentiable-warp primitive).

Reference counterpart: ``pointmvsnet/utils/feature_fetcher.py ::
FeatureFetcher`` — project world points into every view, normalize to
[-1, 1], ``F.grid_sample`` (SURVEY.md §2.6). Here sampling takes raw pixel
coordinates directly (the normalize/denormalize roundtrip is the identity
under the align_corners=True convention; see ``ops/geometry.py``), with
zero padding outside the image — parity-tested against torch's
``grid_sample(align_corners=True, padding_mode="zeros")``.

TPU note: implemented as four gathers over a flattened (H·W) axis + a fused
weighted sum. XLA lowers ``jnp.take`` to a hardware gather; this is
bandwidth-bound, and the elementwise lerp fuses into the gather consumers.
Feature channel dim stays last (lane dimension).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pointmvsnet_tpu.ops.geometry import cam_extrinsics, cam_intrinsics, project_points


def patch_table_2x2(feat: jnp.ndarray) -> jnp.ndarray:
    """2×2 patch table of ``feat`` (..., H, W, C) → (..., (H+1)·(W+1), 4C).

    Row (jy, jx) with jy = y0+1 ∈ [0, H], jx = x0+1 ∈ [0, W] holds
    [F[y0,x0], F[y0,x0+1], F[y0+1,x0], F[y0+1,x0+1]] with zeros baked in
    for out-of-image positions — so samples straddling the border gather
    the correct (partially zero) 2×2 patch from a single row."""
    h, w, c = feat.shape[-3], feat.shape[-2], feat.shape[-1]
    pad = [(0, 0)] * (feat.ndim - 3) + [(1, 1), (1, 1), (0, 0)]
    fp = jnp.pad(feat, pad)                          # coords shifted by +1
    hp, wp = h + 1, w + 1
    patches = jnp.concatenate(
        [fp[..., :hp, :wp, :], fp[..., :hp, 1:wp + 1, :],
         fp[..., 1:hp + 1, :wp, :], fp[..., 1:hp + 1, 1:wp + 1, :]], axis=-1)
    return patches.reshape(*feat.shape[:-3], hp * wp, 4 * c)


def _lerp_2x2(g: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray, h: int, w: int,
              valid: jnp.ndarray | None) -> jnp.ndarray:
    """Bilinear combine of gathered 2×2 patch rows ``g`` (..., N, 4C) at
    coords (u, v) (..., N) — per-tap border masks, zero outside, zero where
    ``valid`` is False."""
    c = g.shape[-1] // 4
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = (u - u0)[..., None]
    dv = (v - v0)[..., None]
    i0 = u0.astype(jnp.int32)
    j0 = v0.astype(jnp.int32)
    f00 = g[..., 0 * c:1 * c]
    f01 = g[..., 1 * c:2 * c]
    f10 = g[..., 2 * c:3 * c]
    f11 = g[..., 3 * c:4 * c]

    # per-tap validity (idx clipping redirects out-of-range taps, and the
    # padded rows/cols already hold zeros for the +1 taps at the border)
    def inside(ui, vi):
        return ((ui >= 0) & (ui <= w - 1) & (vi >= 0) & (vi <= h - 1))[..., None]

    out = (jnp.where(inside(i0, j0), f00, 0) * ((1 - du) * (1 - dv))
           + jnp.where(inside(i0 + 1, j0), f01, 0) * (du * (1 - dv))
           + jnp.where(inside(i0, j0 + 1), f10, 0) * ((1 - du) * dv)
           + jnp.where(inside(i0 + 1, j0 + 1), f11, 0) * (du * dv))
    if valid is not None:
        out = jnp.where(valid[..., None], out, 0)
    return out


def _patch_row_idx(u: jnp.ndarray, v: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    i0 = jnp.floor(u).astype(jnp.int32)
    j0 = jnp.floor(v).astype(jnp.int32)
    return jnp.clip(j0 + 1, 0, h) * (w + 1) + jnp.clip(i0 + 1, 0, w)


def bilinear_sample(feat: jnp.ndarray, uv: jnp.ndarray,
                    valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Sample ``feat`` (..., H, W, C) at pixel coords ``uv`` (..., N, 2).

    Out-of-image samples (and entries where ``valid`` is False) return 0,
    matching torch ``grid_sample(padding_mode='zeros')``: contributions of
    out-of-bounds corner taps are dropped individually, so samples straddling
    the border are partially weighted.
    Leading dims of ``feat`` and ``uv`` must agree. → (..., N, C)

    TPU note: the four bilinear taps are served by ONE gather from a
    precomputed 2×2 "patch table" (each row holds the 4C values of a 2×2
    neighborhood). Random-access gathers are latency-bound on TPU, so
    quartering the gather count (and 4×-ing the row width) is ~4× faster
    than four independent taps; the patch table itself is a cheap fused
    pad+concat that XLA materializes once per feature map.
    """
    h, w = feat.shape[-3], feat.shape[-2]
    u, v = uv[..., 0], uv[..., 1]
    patches = patch_table_2x2(feat)
    idx = _patch_row_idx(u, v, h, w)
    g = jnp.take_along_axis(patches, idx[..., None], axis=-2)
    return _lerp_2x2(g, u, v, h, w, valid)


def regular_grid_sample(feat: jnp.ndarray, sx: float, sy: float,
                        out_h: int, out_w: int,
                        y_offset: int = 0) -> jnp.ndarray:
    """Bilinear-sample ``feat`` (B, H, W, C) at the regular grid
    u = j·sx, v = (y_offset + i)·sy — the reference-view case of the
    point-feature fetch, where projecting the hypothesis points back into
    the camera that generated them lands exactly on the (scaled) pixel
    grid for every hypothesis depth.

    Same semantics as ``bilinear_sample`` (align_corners pixel centers,
    zero contribution from out-of-image taps), but computed as two small
    interpolation matmuls (separable along W then H) — MXU work instead of
    G·N latency-bound gathers. → (B, out_h·out_w, C) float32.
    """
    b, h, w, c = feat.shape

    def interp_matrix(n_out, scale, offset, n_in):
        t = (jnp.arange(n_out, dtype=jnp.float32) + offset) * scale
        t0 = jnp.floor(t)
        dt = (t - t0)[:, None]
        i0 = t0.astype(jnp.int32)[:, None]
        cols = jnp.arange(n_in, dtype=jnp.int32)[None, :]
        m = (jnp.where((cols == i0) & (i0 >= 0) & (i0 <= n_in - 1), 1.0 - dt, 0.0)
             + jnp.where((cols == i0 + 1) & (i0 + 1 >= 0) & (i0 + 1 <= n_in - 1),
                         dt, 0.0))
        return m                                      # (n_out, n_in)

    mx = interp_matrix(out_w, sx, 0, w)
    my = interp_matrix(out_h, sy, y_offset, h)
    # f32 throughout to match the gather path's f32 lerp weights
    y = jnp.einsum("bhwc,ow->bhoc", feat.astype(jnp.float32), mx)
    y = jnp.einsum("bhoc,ph->bpoc", y, my)
    return y.reshape(b, out_h * out_w, c)


def _repeat_rows(t: jnp.ndarray, axis: int, factor: int) -> jnp.ndarray:
    """[row0, repeat(row1.., factor)] along ``axis`` — the padded-table
    upsampling pattern (cell jy of the fine grid reads coarse row
    ((jy−1) >> log2(factor)) + 1). Broadcast+reshape, NO gather."""
    if factor == 1:
        return t
    first = jax.lax.slice_in_dim(t, 0, 1, axis=axis)
    rest = jax.lax.slice_in_dim(t, 1, t.shape[axis], axis=axis)
    rest = jnp.repeat(rest, factor, axis=axis)
    return jnp.concatenate([first, rest], axis=axis)


def build_multilevel_table(levels: list) -> jnp.ndarray:
    """Combined per-cell patch table for ``fetch_features_multilevel``.

    levels: list of (B, V, h_l, w_l, C_l) maps forming an EXACT stride-2
    pyramid (h_0 = 2^l·h_l). → (B, V, (h0+1)·(w0+1), 4·ΣC): full-res cell
    (jy, jx) holds every level's zero-padded 2×2 patch at its own
    resolution (level row ((jy−1) >> l) + 1 — exact, see the fetch).
    Build it ONCE per flow iteration and reuse across row bands: the
    table is the big buffer (4·ΣC channels at level-0 resolution), and
    hoisting it out of the band loop keeps peak HBM flat."""
    b, v, h0, w0, _ = levels[0].shape
    tables = []
    for l, f in enumerate(levels):
        hl, wl = f.shape[2], f.shape[3]
        assert hl << l == h0 and wl << l == w0, (
            f"level {l} is {hl}x{wl}, not an exact /2^{l} of {h0}x{w0}")
        fp = jnp.pad(f, [(0, 0), (0, 0), (1, 1), (1, 1), (0, 0)])
        hp, wp = hl + 1, wl + 1
        t = jnp.concatenate(
            [fp[:, :, :hp, :wp], fp[:, :, :hp, 1:wp + 1],
             fp[:, :, 1:hp + 1, :wp], fp[:, :, 1:hp + 1, 1:wp + 1]], axis=-1)
        t = _repeat_rows(_repeat_rows(t, 2, 1 << l), 3, 1 << l)
        tables.append(t)
    table = jnp.concatenate(tables, axis=-1)
    return table.reshape(b, v, (h0 + 1) * (w0 + 1), -1)


def fetch_features_multilevel(levels: list, points: jnp.ndarray,
                              cams: jnp.ndarray,
                              table: jnp.ndarray | None = None,
                              reduce: str = "stack"):
    """Multi-scale point-feature fetch with ONE gather for all levels.

    levels: list of (B, V, h_l, w_l, C_l) feature maps forming an EXACT
    stride-2 pyramid (h_0 = 2^l · h_l); cams: (B, V, 2, 4, 4) at the
    LEVEL-0 resolution; points (B, N, 3); table: optional precomputed
    ``build_multilevel_table(levels)`` (pass it when sampling the same
    maps repeatedly, e.g. across row bands). → (B, V, N, ΣC_l), channel
    order = level order — bit-identical to concatenating per-level
    ``fetch_features`` results with per-level scaled cams.

    Why exact: with power-of-two level scales s = 2^-l, the projected
    coordinate u_l = s·u_0 is EXACT in fp32 (exponent shift), and the
    level cell index floor(u_l) equals floor(u_0) >> l (arithmetic
    shift), so one gather from a combined per-cell table — each full-res
    cell row stores every level's 2×2 zero-padded patch — retrieves all
    3·4 taps that the per-level gathers would. The per-level fractional
    lerp weights and border masks are recomputed from u_0 on the VPU.

    Why fast: TPU gathers are row-latency-bound (~16 cycles/row measured),
    so 1 wide gather ≈ 3× cheaper than 3 narrow ones; this is the
    dominant cost of the full-res PointFlow iteration (ablation: 309 ms
    of the 429 ms flow@1.0 marginal before this op existed).

    ``reduce="moments"`` → ``(Σ_v f, Σ_v f²)``, each (B, N, ΣC_l) float32,
    gathered and accumulated view-by-view so the (V, N, 4ΣC) row tensor
    never materializes (the variance aggregation needs only the moments).
    """
    b, v, h0, w0, _ = levels[0].shape
    if table is None:
        table = build_multilevel_table(levels)

    # --- project once at level-0 resolution ------------------------------
    cams32 = cams.astype(jnp.float32)
    extr = cam_extrinsics(cams32)
    intr = cam_intrinsics(cams32)
    uv, z = project_points(points.astype(jnp.float32)[:, None], extr, intr)
    valid = (z > 0)[..., None]                                # (B, V, N, 1)
    u, w_v = uv[..., 0], uv[..., 1]
    i0 = jnp.floor(u).astype(jnp.int32)
    j0 = jnp.floor(w_v).astype(jnp.int32)
    idx = (jnp.clip(j0 + 1, 0, h0) * (w0 + 1) + jnp.clip(i0 + 1, 0, w0))

    def combine(rows, u_, wv_, i0_, j0_, valid_):
        """Per-level lerp + border masks (VPU) over gathered rows
        (..., N, 4ΣC) with matching leading dims on the coords."""
        outs = []
        off = 0
        for l, f in enumerate(levels):
            c = f.shape[-1]
            hl, wl = f.shape[2], f.shape[3]
            scale = 1.0 / (1 << l)
            u_l, v_l = u_ * scale, wv_ * scale                # exact in fp32
            i0l, j0l = i0_ >> l, j0_ >> l
            du = (u_l - i0l.astype(jnp.float32))[..., None]
            dv = (v_l - j0l.astype(jnp.float32))[..., None]

            def inside(ui, vi):
                return ((ui >= 0) & (ui <= wl - 1)
                        & (vi >= 0) & (vi <= hl - 1))[..., None]

            g = rows[..., off:off + 4 * c]
            f00, f01 = g[..., 0 * c:1 * c], g[..., 1 * c:2 * c]
            f10, f11 = g[..., 2 * c:3 * c], g[..., 3 * c:4 * c]
            out = (jnp.where(inside(i0l, j0l), f00, 0) * ((1 - du) * (1 - dv))
                   + jnp.where(inside(i0l + 1, j0l), f01, 0) * (du * (1 - dv))
                   + jnp.where(inside(i0l, j0l + 1), f10, 0) * ((1 - du) * dv)
                   + jnp.where(inside(i0l + 1, j0l + 1), f11, 0) * (du * dv))
            outs.append(jnp.where(valid_, out, 0))
            off += 4 * c
        return jnp.concatenate(outs, axis=-1)

    if reduce == "moments":
        n = points.shape[1]
        s1 = jnp.zeros((b, n, sum(f.shape[-1] for f in levels)), jnp.float32)
        s2 = s1
        for vi in range(v):
            rows_v = jnp.take_along_axis(table[:, vi], idx[:, vi, :, None],
                                         axis=-2)             # (B, N, 4ΣC)
            f_v = combine(rows_v, u[:, vi], w_v[:, vi], i0[:, vi], j0[:, vi],
                          valid[:, vi]).astype(jnp.float32)
            s1 = s1 + f_v
            s2 = s2 + jnp.square(f_v)
        return s1, s2

    rows = jnp.take_along_axis(table, idx[..., None], axis=-2)  # (B,V,N,4ΣC)
    return combine(rows, u, w_v, i0, j0, valid)


def fetch_features_perlevel(levels: list, points: jnp.ndarray,
                            cams: jnp.ndarray, reduce: str = "stack",
                            out_dtype=None):
    """Per-level bilinear point fetch: one 2×2-patch-table
    ``bilinear_sample`` per (source view, pyramid level) — 3 narrow
    gathers per view instead of the combined-table path's 1 wide one.

    Same taps/masks/weights as ``fetch_features_multilevel`` (it IS the
    primitive the combined table is equivalence-tested against). The
    measured full-pipeline WINNER at the DTU headline and the eval
    default (round-5 same-session A/B: 219 ms/map vs the combined
    table's 311 and the excised pixel-grouped engine's 279 —
    benchmarks/results/fetch_ab_r5.json). Its working set is the
    smallest of the engines: per-level 2×2 tables (~1.3× the feature
    maps) and no wide patch rows.

    levels: stride-2 pyramid [(B, V, h_l, w_l, C_l)]; cams at level-0
    resolution; points (B, N, 3). → (B, V, N, ΣC_l), or the f32
    ``(Σ_v f, Σ_v f²)`` moments when ``reduce="moments"``.
    """
    b, v = levels[0].shape[0], levels[0].shape[1]
    cams32 = cams.astype(jnp.float32)
    extr = cam_extrinsics(cams32)
    intr = cam_intrinsics(cams32)
    uv, z = project_points(points.astype(jnp.float32)[:, None], extr, intr)
    valid = z > 0                                              # (B, V, N)

    def one_view(vi):
        parts = [bilinear_sample(f[:, vi], uv[:, vi] * (1.0 / (1 << l)),
                                 valid=valid[:, vi])
                 for l, f in enumerate(levels)]
        out = jnp.concatenate(parts, axis=-1)                  # (B, N, ΣC)
        return out.astype(out_dtype) if out_dtype is not None else out

    if reduce == "moments":
        n = points.shape[1]
        s1 = jnp.zeros((b, n, sum(f.shape[-1] for f in levels)), jnp.float32)
        s2 = s1
        for vi in range(v):
            f_v = one_view(vi).astype(jnp.float32)
            s1 = s1 + f_v
            s2 = s2 + jnp.square(f_v)
        return s1, s2
    return jnp.stack([one_view(vi) for vi in range(v)], axis=1)


def fetch_features(feats: jnp.ndarray, points: jnp.ndarray,
                   cams: jnp.ndarray) -> jnp.ndarray:
    """Multi-view point-feature fetch (the FeatureFetcher).

    feats:  (B, V, H, W, C) per-view feature maps
    points: (B, N, 3) world points
    cams:   (B, V, 2, 4, 4)
    → (B, V, N, C); points behind a camera or projecting outside its image
    contribute zeros (reference behavior via grid_sample zero padding).
    """
    # projection always in fp32: bf16 pixel coordinates quantize to ~2 px
    # at 640-wide maps, which silently destroys sampling accuracy
    cams32 = cams.astype(jnp.float32)
    extr = cam_extrinsics(cams32)   # (B, V, 4, 4)
    intr = cam_intrinsics(cams32)   # (B, V, 3, 3)
    uv, z = project_points(points.astype(jnp.float32)[:, None], extr, intr)
    return bilinear_sample(feats, uv, valid=z > 0)


def fetch_features_mxu(feats: jnp.ndarray, points: jnp.ndarray,
                       cams: jnp.ndarray, block: int = 512,
                       span: int = 0) -> jnp.ndarray:
    """``fetch_features`` with the patch-table gather served by the MXU
    slab-matmul gather (``ops.mxu_gather``) instead of a hardware row
    gather — bit-identical outputs (one-hot × slab sums x·1 with +0 in an
    fp32 accumulator).

    Built for the coarse plane-sweep warp (SURVEY.md §3.3), whose points
    come ordered (depth-plane, row, col): a block of ``block`` consecutive
    points covers a handful of image rows of ONE plane and projects into a
    narrow contiguous window of the source patch table (epipolar
    coherence). Views where any block overflows its ``span`` window (wild
    geometry, plane-straddling blocks at non-divisible shapes) fall back to
    the exact row gather via ``lax.cond`` — rare, never wrong.

    span=0 → auto: ``block`` plus 8 source image rows, rounded up to 128
    lanes (a block spans ceil(block/out_w) ref rows; source rows track ref
    rows 1:1-ish under small relative rotation, + jitter margin).
    """
    from pointmvsnet_tpu.ops.mxu_gather import gather_rows_mxu

    b, v, h, w, _ = feats.shape
    cams32 = cams.astype(jnp.float32)
    extr = cam_extrinsics(cams32)
    intr = cam_intrinsics(cams32)
    uv, z = project_points(points.astype(jnp.float32)[:, None], extr, intr)
    u, vv = uv[..., 0], uv[..., 1]
    valid = z > 0
    idx = _patch_row_idx(u, vv, h, w)                        # (B, V, N)
    rows_tab = (h + 1) * (w + 1)
    if span <= 0:
        span = block + 8 * (w + 1)
        span = -(-span // 128) * 128
    span = min(span, rows_tab)

    # per-(batch, view) span-overflow detection — the cond picks the exact
    # path whenever the MXU gather would zero a row
    n = idx.shape[-1]
    nb = -(-n // block)
    pad_n = nb * block - n
    ib = idx
    if pad_n:
        ib = jnp.concatenate(
            [ib, jnp.broadcast_to(ib[..., -1:], (b, v, pad_n))], axis=-1)
    ib = ib.reshape(b, v, nb, block)
    miss_v = ((jnp.max(ib, axis=-1) - jnp.min(ib, axis=-1)) >= span
              ).any(axis=-1).any(axis=0)                     # (V,)

    outs = []
    for vi in range(v):
        table = patch_table_2x2(feats[:, vi])                # (B, rows, 4C)

        def fast(vi=vi, table=table):
            g, _ = gather_rows_mxu(table, idx[:, vi], block=block, span=span)
            return _lerp_2x2(g, u[:, vi], vv[:, vi], h, w, valid[:, vi])

        def slow(vi=vi, table=table):
            g = jnp.take_along_axis(table, idx[:, vi, :, None], axis=-2)
            return _lerp_2x2(g, u[:, vi], vv[:, vi], h, w, valid[:, vi])

        outs.append(jax.lax.cond(miss_v[vi], slow, fast))
    return jnp.stack(outs, axis=1)
