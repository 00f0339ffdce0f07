"""Pixel-grouped multi-level point-feature fetch (TPU gather-row reduction).

Reference counterpart: ``pointmvsnet/utils/feature_fetcher.py ::
FeatureFetcher`` (SURVEY.md §2.6) — same job as
``ops.sampling.fetch_features_multilevel`` (project hypothesis points into
every source view, bilinear-sample a stride-2 feature pyramid), same
values, different gather shape.

Why: TPU gathers are ROW-latency-bound and the cost is flat in row width
far past 1 KB (measured ~40 ns/row from 128 B to 1120 B rows —
``benchmarks/gather_probe.py``). PointFlow evaluates G = 2m+1 hypothesis
points per reference pixel, and all G project onto a short epipolar
segment (span ≈ f·baseline·(G−1)·step / z², typically ~1 px on DTU), so
the G per-hypothesis gathers of one pixel almost always read the SAME
small neighborhood. This module gathers ONE row per (pixel, view) — a
P×P level-0 patch plus the derived patches of the coarser levels — and
reconstructs every hypothesis's bilinear taps from it on the VPU:
G× fewer gather rows for ~2.5× wider rows ⇒ ~G× cheaper fetch.

Exactness: reads the IDENTICAL texels with the IDENTICAL masks and lerp
weights as ``fetch_features_multilevel``. Tap values are extracted from
the patch by one-hot dot products (multiplying by 1.0/0.0 and adding 0.0
are exact), then combined with the same mask/lerp expression; outputs
agree to a few f32 ulps (XLA fuses the two graphs' mul/add chains into
different FMA orders — measured max |Δ| 2.4e-7 on unit-scale features).
Pixels whose epipolar span overflows the patch (wide baseline at near
depth) are detected per view, and a ``lax.cond`` falls back to the exact
per-level gather path for that view — rare on real geometry, never wrong.

Memory: with ``band_rows > 0`` the patch table is built over a dynamic
vertical slice of the source maps (per-view runtime offset, 4-aligned so
every pyramid level slices exactly), bounding table HBM independent of
image height — the band-local-table fix for superlinear high-res scaling
(VERDICT r2 weak #2). Out-of-slice projections are caught by the same
fallback.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from pointmvsnet_tpu.ops.geometry import cam_extrinsics, cam_intrinsics, project_points
from pointmvsnet_tpu.ops.mxu_gather import gather_rows_mxu
from pointmvsnet_tpu.ops.sampling import _repeat_rows, bilinear_sample

_BIG = jnp.int32(2 ** 30)


def patch_sizes(p0: int, num_levels: int) -> List[int]:
    """Per-level patch edge. Level 0 holds a p0×p0 texel patch (origin =
    min over hypotheses of the floor cell, so spans ≤ p0−2 fit); level l's
    floor cells then span ≤ ceil((p0−2)/2^l), needing patches of that +2."""
    return [p0] + [-(-(p0 - 2) // (1 << l)) + 2 for l in range(1, num_levels)]


def pad_levels(levels: Sequence[jnp.ndarray], p0: int) -> List[jnp.ndarray]:
    """Zero-pad each (B, V, h_l, w_l, C_l) map by 1 before / p_l−1 after in
    H and W (patch origins start at texel −1; the after-pad covers the
    widest patch). Hoist this across row bands — slices are views into it."""
    ps = patch_sizes(p0, len(levels))
    return [jnp.pad(f, [(0, 0), (0, 0), (1, p - 1), (1, p - 1), (0, 0)])
            for f, p in zip(levels, ps)]


def _build_table_one(padded: Sequence[jnp.ndarray], p0: int, h0: int, w0: int,
                     sc: int, r: jnp.ndarray) -> jnp.ndarray:
    """Grouped patch table for ONE view: padded maps (h_l+p_l, w_l+p_l, C_l),
    r = 4-aligned level-0 row offset (cells cover oj ∈ [r−1, r+sc−2]).
    → (sc·(w0+1), Σ p_l²·C_l): cell (a, oi+1) holds, for every level l, the
    p_l×p_l texel patch at origin (((r+a−1)>>l), oi>>l) — with cell a=0
    meaning origin row r−1, matching ``_repeat_rows``'s first-row rule."""
    ps = patch_sizes(p0, len(padded))
    wc = w0 + 1
    parts = []
    for l, (f, p) in enumerate(zip(padded, ps)):
        sc_l = ((sc - 3) >> l) + 2 if l else sc
        wc_l = ((w0 - 1) >> l) + 2 if l else wc
        sl = lax.dynamic_slice_in_dim(f, r >> l, sc_l - 1 + p, axis=0)
        taps = [sl[dy:dy + sc_l, dx:dx + wc_l]
                for dy in range(p) for dx in range(p)]
        t = jnp.concatenate(taps, axis=-1)          # (sc_l, wc_l, p²·C_l)
        t = _repeat_rows(t, 0, 1 << l)[:sc]
        t = _repeat_rows(t, 1, 1 << l)[:, :wc]
        parts.append(t)
    table = jnp.concatenate(parts, axis=-1)
    return table.reshape(sc * wc, -1)


def _onehot_extract(rows: jnp.ndarray, by: jnp.ndarray, bx: jnp.ndarray,
                    p: int, c: int):
    """Exact 2×2 tap extraction from p×p patch rows.

    rows: (..., p²·c) gathered patches; by/bx: (...,) in-patch origin of the
    2×2 window (0 ≤ b ≤ p−2). → (f00, f01, f10, f11), each (..., c).
    One-hot dots: every term is value·1.0 or value·0.0 summed with 0.0 —
    exact in fp, so the downstream lerp sees the gather path's exact taps.
    """
    patch = rows.reshape(*rows.shape[:-1], p, p, c)
    iy = jnp.arange(p, dtype=by.dtype)
    sel_y0 = (iy == by[..., None])[..., None, None]          # (..., p, 1, 1)
    sel_y1 = (iy == by[..., None] + 1)[..., None, None]
    row0 = jnp.sum(jnp.where(sel_y0, patch, 0), axis=-3)     # (..., p, c)
    row1 = jnp.sum(jnp.where(sel_y1, patch, 0), axis=-3)
    sel_x0 = (iy == bx[..., None])[..., None]                # (..., p, 1)
    sel_x1 = (iy == bx[..., None] + 1)[..., None]
    f00 = jnp.sum(jnp.where(sel_x0, row0, 0), axis=-2)       # (..., c)
    f01 = jnp.sum(jnp.where(sel_x1, row0, 0), axis=-2)
    f10 = jnp.sum(jnp.where(sel_x0, row1, 0), axis=-2)
    f11 = jnp.sum(jnp.where(sel_x1, row1, 0), axis=-2)
    return f00, f01, f10, f11


def _grouped_index(h0: int, w0: int, num_levels: int, points: jnp.ndarray,
                   cams: jnp.ndarray, groups: int, p0: int, band_rows: int,
                   gather_impl: str, gather_block: int, gather_span: int):
    """Projection + patch-origin index math shared by the fetch and the
    hoisted miss precheck (``grouped_miss_any``). Pure index arithmetic —
    no feature reads — so it is cheap to run standalone and is the SINGLE
    source of truth for the fallback decision (an out-of-band copy would
    drift). Returns everything the fast/slow paths consume."""
    b, v = cams.shape[0], cams.shape[1]
    n_all = points.shape[1]
    assert n_all % groups == 0
    n = n_all // groups
    sc = h0 + 1 if band_rows <= 0 or band_rows >= h0 else band_rows + 1
    assert (sc - 1) % 4 == 0, f"band_rows must be 4-aligned, got {sc - 1}"

    # --- project once at level-0 resolution (fp32, as the gather path) ----
    cams32 = cams.astype(jnp.float32)
    extr = cam_extrinsics(cams32)
    intr = cam_intrinsics(cams32)
    uv, z = project_points(points.astype(jnp.float32)[:, None], extr, intr)
    u, w_v = uv[..., 0], uv[..., 1]                           # (B, V, G·N)
    valid = z > 0
    i0 = jnp.floor(u).astype(jnp.int32)
    j0 = jnp.floor(w_v).astype(jnp.int32)

    # --- per-pixel patch origins + overflow detection ----------------------
    gi0 = i0.reshape(b, v, groups, n)
    gj0 = j0.reshape(b, v, groups, n)
    gval = valid.reshape(b, v, groups, n)
    # a hypothesis "needs" real texels only if some 2×2 tap AT SOME LEVEL is
    # inside the image; others (behind camera / fully outside) are zeroed by
    # the masks below, so they must not perturb the origin or trigger the
    # fallback. A point left of the image by up to 2^L level-0 texels still
    # straddles the border at the coarsest level L (i0>>L = −1, tap 0 valid),
    # and clip(i0, −1, ·)>>l = −1 = i0>>l there, so the clamped cell is the
    # TRUE coarse cell for every level where the masks are alive.
    reach = 1 << (num_levels - 1)
    need = (gval & (gi0 >= -reach) & (gi0 <= w0 - 1)
            & (gj0 >= -reach) & (gj0 <= h0 - 1))
    i0c = jnp.clip(gi0, -1, w0 - 1)
    j0c = jnp.clip(gj0, -1, h0 - 1)
    oi = jnp.min(jnp.where(need, i0c, w0 - 1), axis=2)        # (B, V, N)
    oj = jnp.min(jnp.where(need, j0c, h0 - 1), axis=2)
    di = jnp.where(need, i0c - oi[:, :, None], 0)
    dj = jnp.where(need, j0c - oj[:, :, None], 0)
    miss = (di > p0 - 2) | (dj > p0 - 2)                      # (B, V, G, N)

    if sc <= h0:
        # 4-aligned per-view slice offset from the lowest needed row
        min_oj = jnp.min(jnp.where(need, j0c, _BIG).reshape(b, v, -1), axis=-1)
        r0 = jnp.clip(min_oj - 3, 0, h0 + 1 - sc)
        r0 = (r0 >> 2) << 2                                    # (B, V)
        a = oj + 1 - r0[:, :, None]
        # out-of-slice only counts for pixels that actually need texels
        # (default origins of fully-masked pixels sit at h0−1 and would
        # otherwise flag a spurious fallback)
        out_of_slice = need.any(axis=2) & ((a < 0) | (a > sc - 1))
        miss = miss | out_of_slice[:, :, None]
    else:
        r0 = jnp.zeros((b, v), jnp.int32)
        a = oj + 1
    row_idx = jnp.clip(a, 0, sc - 1) * (w0 + 1) + (oi + 1)     # (B, V, N)

    # MXU slab gather (one-hot × slab matmul — ops/mxu_gather.py): exact
    # when every gather_block of consecutive pixels spans < gather_span
    # table rows (epipolar coherence). Blocks that straddle more fold into
    # the per-view exact-fallback, like patch overflows.
    #
    # DEAD pixels (no hypothesis needs a texel in this view — behind the
    # camera or fully outside) sit at the default corner origin
    # (h0−1, w0−1), tens of thousands of table rows from their alive
    # neighbors; left in place they blow up every block that straddles an
    # image border and veto the WHOLE view (measured: span_miss fired on
    # every band of every flow iteration at the DTU headline — the fast
    # path never ran). Their gathered rows are don't-care (every tap is
    # masked to 0 downstream), so snap them to the block's min alive index
    # — the span then reflects only rows the view actually reads.
    n_rows_tab = sc * (w0 + 1)
    span_eff = min(gather_span, n_rows_tab)
    alive = need.any(axis=2)                                   # (B, V, N)
    if gather_impl == "mxu":
        nb = -(-n // gather_block)
        pad_n = nb * gather_block - n
        ib, ia = row_idx, alive
        if pad_n:
            # last-index padding keeps the final block coherent (mirrors
            # gather_rows_mxu's internal padding)
            ib = jnp.concatenate(
                [ib, jnp.broadcast_to(ib[..., -1:], (b, v, pad_n))], axis=-1)
            ia = jnp.concatenate(
                [ia, jnp.broadcast_to(ia[..., -1:], (b, v, pad_n))], axis=-1)
        ib = ib.reshape(b, v, nb, gather_block)
        ia = ia.reshape(b, v, nb, gather_block)
        blockmin = jnp.min(jnp.where(ia, ib, _BIG), axis=-1)   # (B, V, nb)
        blockmin = jnp.where(blockmin == _BIG, 0, blockmin)    # all-dead block
        ib = jnp.where(ia, ib, blockmin[..., None])
        span_miss = ((jnp.max(ib, axis=-1) - jnp.min(ib, axis=-1))
                     >= span_eff).any(axis=-1)                  # (B, V)
        miss = miss | span_miss[..., None, None]
        row_idx = ib.reshape(b, v, nb * gather_block)[..., :n]
    miss_v = jnp.any(miss.reshape(b, v, -1), axis=-1).any(axis=0)  # (V,)
    return dict(uv=uv, u=u, w_v=w_v, valid=valid, gval=gval,
                gi0=gi0, gj0=gj0, i0c=i0c, j0c=j0c, oi=oi, oj=oj,
                di=di, dj=dj, r0=r0, row_idx=row_idx, miss_v=miss_v,
                sc=sc, span_eff=span_eff, n=n)


def _weighted_taps_shared(rows: jnp.ndarray, bj: jnp.ndarray, bi: jnp.ndarray,
                          du: jnp.ndarray, dv: jnp.ndarray,
                          iny0: jnp.ndarray, iny1: jnp.ndarray,
                          inx0: jnp.ndarray, inx1: jnp.ndarray,
                          p: int, c: int) -> jnp.ndarray:
    """``_weighted_taps`` for a patch SHARED across the group axis:
    rows (B, N, p²·c) — ONE patch per pixel; bj/bi/du/dv/masks (B, G, N)
    per hypothesis. Builds the combined one-hot × weight patch
    W = wy ⊗ wx (B, G, N, p²) and contracts the pixel's patch once —
    the patch is read once per PIXEL instead of once per hypothesis
    (the G-broadcast never materializes). Same weights as
    ``_weighted_taps`` (wy/wx carry lerp weights AND border masks; masked
    taps get weight exactly 0.0); values differ from the per-tap
    formulation only by fp reassociation (~1 ulp). → (B, G, N, c)."""
    b, n = rows.shape[0], rows.shape[1]
    patch = rows.reshape(b, n, p * p, c)
    ar = jnp.arange(p, dtype=bj.dtype)
    zero = jnp.zeros((), jnp.float32)
    wy = (jnp.where((ar == bj[..., None]) & iny0[..., None],
                    (1.0 - dv)[..., None], zero)
          + jnp.where((ar == bj[..., None] + 1) & iny1[..., None],
                      dv[..., None], zero))                    # (B, G, N, p)
    wx = (jnp.where((ar == bi[..., None]) & inx0[..., None],
                    (1.0 - du)[..., None], zero)
          + jnp.where((ar == bi[..., None] + 1) & inx1[..., None],
                      du[..., None], zero))
    w = (wy[..., :, None] * wx[..., None, :]).reshape(
        b, wy.shape[1], n, p * p)                              # (B, G, N, p²)
    return jnp.einsum("bgnk,bnkc->bgnc", w, patch)


def _weighted_taps(rows: jnp.ndarray, bj: jnp.ndarray, bi: jnp.ndarray,
                   du: jnp.ndarray, dv: jnp.ndarray,
                   iny0: jnp.ndarray, iny1: jnp.ndarray,
                   inx0: jnp.ndarray, inx1: jnp.ndarray,
                   p: int, c: int) -> jnp.ndarray:
    """Bilinear combine straight from p×p patch rows with FACTORED one-hot ×
    weight vectors: out = Σ_a wy[a] · Σ_b wx[b] · patch[a, b] — wy/wx carry
    the lerp weights AND the per-tap border masks (a masked-out tap gets
    weight exactly 0.0, and 0·x + 0 is exact), so only the 4 true taps
    contribute. Values equal the mask+lerp formulation up to fp
    reassociation (~1 ulp). Cost: p²·C + p·C MACs per point — ~3× fewer
    elementwise ops than separate extraction + lerp at p=4."""
    patch = rows.reshape(*rows.shape[:-1], p, p, c)
    ar = jnp.arange(p, dtype=bj.dtype)
    zero = jnp.zeros((), jnp.float32)
    wy = (jnp.where((ar == bj[..., None]) & iny0[..., None],
                    (1.0 - dv)[..., None], zero)
          + jnp.where((ar == bj[..., None] + 1) & iny1[..., None],
                      dv[..., None], zero))                    # (..., p)
    wx = (jnp.where((ar == bi[..., None]) & inx0[..., None],
                    (1.0 - du)[..., None], zero)
          + jnp.where((ar == bi[..., None] + 1) & inx1[..., None],
                      du[..., None], zero))
    t = jnp.einsum("...b,...abc->...ac", wx, patch)
    return jnp.einsum("...a,...ac->...c", wy, t)               # (..., c)


def fetch_features_dgrouped(feat: jnp.ndarray, points: jnp.ndarray,
                            cams: jnp.ndarray, groups: int, npix: int,
                            p0: int = 8, mode: str = "cond") -> jnp.ndarray:
    """Single-level, depth-block-grouped point fetch — the plane-sweep twin
    of ``fetch_features_grouped``: ``points`` (B, D·N, 3) is d-major over a
    fixed pixel grid and consecutive blocks of ``groups`` depth hypotheses
    of a pixel project onto a short epipolar segment, so each (pixel,
    block, view) gathers ONE p0×p0 patch row and reconstructs its
    ``groups`` bilinear samples from it — ``groups``× fewer gather rows
    than the per-point warp (the coarse stage's dominant cost).

    feat (B, V, h0, w0, C) source views; cams (B, V, 2, 4, 4) at feature
    resolution; ``npix`` = pixels per hypothesis plane (points are d-major:
    points[d·npix + n] = plane d of pixel n). The patch table is
    point-independent (full height) and hoisted per view. Blocks whose
    epipolar span overflows the patch fall back per VIEW to the exact
    per-point ``bilinear_sample`` (lax.cond; ``mode="fast"`` skips the
    guard for vmapped callers). Values equal the per-point path up to fp
    reassociation (factored lerp weights).
    → (B, V, D·N, C) float32.
    """
    b, v, h0, w0, c = feat.shape
    n_all = points.shape[1]
    assert n_all % (groups * npix) == 0

    cams32 = cams.astype(jnp.float32)
    extr = cam_extrinsics(cams32)
    intr = cam_intrinsics(cams32)
    uv, z = project_points(points.astype(jnp.float32)[:, None], extr, intr)
    u, w_v = uv[..., 0], uv[..., 1]                            # (B, V, D·N)
    valid = z > 0
    i0 = jnp.floor(u).astype(jnp.int32)
    j0 = jnp.floor(w_v).astype(jnp.int32)

    # d-major layout: (B, V, D·N) → (B, V, NB, groups, N) — the ``groups``
    # consecutive hypothesis planes of pixel n form one patch group
    nb = n_all // (groups * npix)
    gi0 = i0.reshape(b, v, nb, groups, npix)
    gj0 = j0.reshape(b, v, nb, groups, npix)
    gval = valid.reshape(b, v, nb, groups, npix)

    # "needs real texels" (same clamp rationale as _grouped_index at L=1:
    # a tap is alive only while the floor cell is within 1 texel of the map)
    need = (gval & (gi0 >= -1) & (gi0 <= w0 - 1)
            & (gj0 >= -1) & (gj0 <= h0 - 1))
    i0c = jnp.clip(gi0, -1, w0 - 1)
    j0c = jnp.clip(gj0, -1, h0 - 1)
    oi = jnp.min(jnp.where(need, i0c, w0 - 1), axis=3)         # (B,V,NB,N)
    oj = jnp.min(jnp.where(need, j0c, h0 - 1), axis=3)
    di = jnp.where(need, i0c - oi[:, :, :, None], 0)
    dj = jnp.where(need, j0c - oj[:, :, :, None], 0)
    miss_v = jnp.any((di > p0 - 2) | (dj > p0 - 2),
                     axis=(0, 2, 3, 4))                        # (V,)
    row_idx = ((oj + 1) * (w0 + 1) + (oi + 1)).reshape(b, v, nb * npix)

    padded = jnp.pad(feat, [(0, 0), (0, 0), (1, p0 - 1), (1, p0 - 1), (0, 0)])
    sc = h0 + 1

    du = (u.reshape(b, v, nb, groups, npix)
          - gi0.astype(jnp.float32))                           # in-cell frac
    dv = (w_v.reshape(b, v, nb, groups, npix)
          - gj0.astype(jnp.float32))
    bi = i0c - oi[:, :, :, None]                               # in-patch org
    bj = j0c - oj[:, :, :, None]
    inx0 = (gi0 >= 0) & (gi0 <= w0 - 1)
    inx1 = (gi0 + 1 >= 0) & (gi0 + 1 <= w0 - 1)
    iny0 = (gj0 >= 0) & (gj0 <= h0 - 1)
    iny1 = (gj0 + 1 >= 0) & (gj0 + 1 <= h0 - 1)

    def fast_view(vi):
        table = jax.vmap(
            lambda f: _build_table_one([f], p0, h0, w0, sc,
                                       jnp.zeros((), jnp.int32))
        )(padded[:, vi])                                       # (B, rows, p0²C)
        rows = jnp.take_along_axis(table, row_idx[:, vi, :, None], axis=-2)
        rows = rows.reshape(b, nb, 1, npix, p0 * p0 * c)
        out = _weighted_taps(
            jnp.broadcast_to(rows, (b, nb, groups, npix, p0 * p0 * c)),
            bj[:, vi], bi[:, vi], du[:, vi], dv[:, vi],
            iny0[:, vi], iny1[:, vi], inx0[:, vi], inx1[:, vi], p0, c)
        out = jnp.where(gval[:, vi, ..., None], out, 0.0)      # z>0 gate
        return out.reshape(b, n_all, c)

    def slow_view(vi):
        return bilinear_sample(feat[:, vi], uv[:, vi], valid=valid[:, vi])

    def one_view(vi):
        if mode == "fast":
            return fast_view(vi)
        return lax.cond(miss_v[vi],
                        lambda vi=vi: slow_view(vi).astype(jnp.float32),
                        lambda vi=vi: fast_view(vi).astype(jnp.float32))

    return jnp.stack([one_view(vi) for vi in range(v)], axis=1)


def grouped_miss_any(levels: Sequence[jnp.ndarray], points: jnp.ndarray,
                     cams: jnp.ndarray, groups: int, p0: int = 5,
                     band_rows: int = 0, gather_impl: str = "mxu",
                     gather_block: int = 512,
                     gather_span: int = 1536) -> jnp.ndarray:
    """Scalar bool: would ANY view of ``fetch_features_grouped`` (called
    with the same parameters) take the exact-gather fallback? Projection +
    index math only — no feature reads — so it can be hoisted OUTSIDE a
    vmapped/banded region where ``lax.cond`` would lower to a
    both-branches select (the grouped-fetch × band-mesh composition,
    VERDICT r3 #4). ``mode="fast"`` is exact iff this returns False."""
    h0, w0 = levels[0].shape[2], levels[0].shape[3]
    idx = _grouped_index(h0, w0, len(levels), points, cams, groups, p0,
                         band_rows, gather_impl, gather_block, gather_span)
    return idx["miss_v"].any()


def fetch_features_grouped(levels: Sequence[jnp.ndarray], points: jnp.ndarray,
                           cams: jnp.ndarray, groups: int, p0: int = 5,
                           padded: Sequence[jnp.ndarray] | None = None,
                           band_rows: int = 0, gather_impl: str = "mxu",
                           gather_block: int = 512,
                           gather_span: int = 1536,
                           mode: str = "cond",
                           reduce: str = "stack",
                           extract: str = "onehot",
                           out_dtype=None):
    """Drop-in for ``fetch_features_multilevel`` when ``points`` is a
    g-major stack of ``groups`` hypothesis sets over the same pixel grid
    (points[g·N + n] = hypothesis g of pixel n) — PointFlow's layout.

    levels: EXACT stride-2 pyramid [(B, V, h_l, w_l, C_l)]; cams at level-0
    resolution; points (B, groups·N, 3); padded: optional hoisted
    ``pad_levels(levels, p0)``; band_rows: > 0 builds the table over a
    band_rows-cell vertical slice (band_rows ≡ 0 mod 4) instead of full
    height. ``mode``: "cond" guards each view's fast path with a
    ``lax.cond`` fallback to the exact per-level gather; "fast" skips the
    guard (exact ONLY when the caller proved ``grouped_miss_any`` is False
    — required under vmap, where cond lowers to a both-branches select).
    → (B, V, groups·N, ΣC_l) — same taps/masks/weights as the multilevel
    path (equal to a few f32 ulps; see module docstring).

    ``reduce="moments"`` instead returns ``(Σ_v f, Σ_v f²)``, each
    (B, groups·N, ΣC_l) float32, accumulated view-by-view in view order —
    the variance aggregation's reduction, without ever materializing the
    (V, G·N, ΣC) stacked tensor (PointFlow only consumes the two moments;
    the per-view accumulate bounds peak HBM at ONE view's features).

    ``extract``: "onehot" reconstructs the 4 bilinear taps per level by
    one-hot dots and lerps them with separate mask/weight factors (values
    equal the gather path's mul/add chain); "weighted" folds masks + lerp
    weights into factored wy ⊗ wx one-hot×weight vectors and contracts the
    patch once (``_weighted_taps`` — p²C + pC MACs instead of extraction
    plus lerp, same taps, ~1 ulp reassociation difference).

    ``out_dtype``: optional dtype the per-view features are cast to before
    stacking (e.g. bfloat16 halves the fetch's dominant live buffer — the
    (V−1, G·N, ΣC) stack — at bf16 quantization of the lerped values; the
    cond fallback branch is cast identically so both paths agree in dtype).
    """
    b, v, h0, w0, _ = levels[0].shape
    n_all = points.shape[1]
    n = n_all // groups
    if padded is None:
        padded = pad_levels(levels, p0)
    ix = _grouped_index(h0, w0, len(levels), points, cams, groups, p0,
                        band_rows, gather_impl, gather_block, gather_span)
    uv, u, w_v, valid = ix["uv"], ix["u"], ix["w_v"], ix["valid"]
    gval, gi0, gj0 = ix["gval"], ix["gi0"], ix["gj0"]
    i0c, j0c, oi, oj = ix["i0c"], ix["j0c"], ix["oi"], ix["oj"]
    r0, row_idx, miss_v = ix["r0"], ix["row_idx"], ix["miss_v"]
    sc, span_eff = ix["sc"], ix["span_eff"]
    ps = patch_sizes(p0, len(levels))
    import os
    if os.environ.get("GROUPED_FETCH_DEBUG"):      # trace-time gate
        jax.debug.print(
            "grouped_fetch h0={h} miss_v={m} patch_overflow_frac={p:.5f}",
            h=h0, m=miss_v,
            p=((ix["di"] > p0 - 2) | (ix["dj"] > p0 - 2)).mean())

    import os
    barrier = os.environ.get("GROUPED_FETCH_BARRIER", "")  # trace-time probe
    def fast_view(vi):
        table = jax.vmap(
            lambda pl, r: _build_table_one(pl, p0, h0, w0, sc, r)
        )([f[:, vi] for f in padded], r0[:, vi])               # (B, rows, ΣW)
        if barrier in ("table", "both"):
            # scheduling probe: force the table to materialize ONCE instead
            # of letting XLA duplicate the "cheap" slice+concat build into
            # every consumer fusion (benchmarks/band_probe.py)
            table = jax.lax.optimization_barrier(table)
        if gather_impl == "mxu":
            rows, _ = gather_rows_mxu(table, row_idx[:, vi],
                                      block=gather_block, span=span_eff)
        else:
            rows = jnp.take_along_axis(table, row_idx[:, vi, :, None],
                                       axis=-2)
        if barrier in ("rows", "both"):
            rows = jax.lax.optimization_barrier(rows)
        outs = []                                              # rows: (B, N, ΣW)
        off = 0
        for l, f in enumerate(levels):
            c = f.shape[-1]
            hl, wl = f.shape[2], f.shape[3]
            p = ps[l]
            # true level-l floor cell (for masks/lerp) and in-patch origin
            il = gi0[:, vi] >> l                               # (B, G, N)
            jl = gj0[:, vi] >> l
            bi = (i0c[:, vi] >> l) - (oi[:, vi, None] >> l)
            bj = (j0c[:, vi] >> l) - (oj[:, vi, None] >> l)
            rows_l = jnp.broadcast_to(rows[:, None, :, off:off + p * p * c],
                                      (b, groups, n, p * p * c))
            scale = 1.0 / (1 << l)
            u_l = u[:, vi].reshape(b, groups, n) * scale
            v_l = w_v[:, vi].reshape(b, groups, n) * scale
            if extract == "weighted":
                # factored one-hot × weight contraction, patch read once
                # per pixel (see _weighted_taps_shared; ~1 ulp vs "onehot")
                out = _weighted_taps_shared(
                    rows[:, :, off:off + p * p * c], bj, bi,
                    u_l - il.astype(jnp.float32),
                    v_l - jl.astype(jnp.float32),
                    (jl >= 0) & (jl <= hl - 1),
                    (jl + 1 >= 0) & (jl + 1 <= hl - 1),
                    (il >= 0) & (il <= wl - 1),
                    (il + 1 >= 0) & (il + 1 <= wl - 1), p, c)
            else:
                f00, f01, f10, f11 = _onehot_extract(rows_l, bj, bi, p, c)
                du = (u_l - il.astype(jnp.float32))[..., None]
                dv = (v_l - jl.astype(jnp.float32))[..., None]

                def inside(ui, vi_):
                    return ((ui >= 0) & (ui <= wl - 1)
                            & (vi_ >= 0) & (vi_ <= hl - 1))[..., None]

                out = (jnp.where(inside(il, jl), f00, 0) * ((1 - du) * (1 - dv))
                       + jnp.where(inside(il + 1, jl), f01, 0) * (du * (1 - dv))
                       + jnp.where(inside(il, jl + 1), f10, 0) * ((1 - du) * dv)
                       + jnp.where(inside(il + 1, jl + 1), f11, 0) * (du * dv))
            out = jnp.where(gval[:, vi, ..., None], out, 0)
            outs.append(out.reshape(b, n_all, c))
            off += p * p * c
        return jnp.concatenate(outs, axis=-1)                  # (B, G·N, ΣC)

    def slow_view(vi):
        # exact per-level bilinear gathers (the torch-grid_sample-parity
        # primitive the multilevel path is equivalence-tested against)
        outs = []
        for l, f in enumerate(levels):
            scale = 1.0 / (1 << l)
            outs.append(bilinear_sample(f[:, vi], uv[:, vi] * scale,
                                        valid=valid[:, vi]))
        return jnp.concatenate(outs, axis=-1)

    def _cast(y):
        return y.astype(out_dtype) if out_dtype is not None else y

    def one_view(vi):
        if mode == "fast":
            return _cast(fast_view(vi))
        return lax.cond(miss_v[vi],
                        lambda vi=vi: _cast(slow_view(vi)),
                        lambda vi=vi: _cast(fast_view(vi)))

    if reduce == "moments":
        s1 = jnp.zeros((b, n_all, sum(f.shape[-1] for f in levels)),
                       jnp.float32)
        s2 = s1
        for vi in range(v):
            f = one_view(vi).astype(jnp.float32)
            s1 = s1 + f
            s2 = s2 + jnp.square(f)
        return s1, s2
    return jnp.stack([one_view(vi) for vi in range(v)], axis=1)
