"""Fused masked window-max — the TPU-native replacement for EdgeConv's
neighbor gather + max (reference ``pointmvsnet/functions/functions.py ::
gather_knn`` + the channel-wise max in ``modules/networks.py :: EdgeConv``,
SURVEY.md §2.7/§2.9).

Why: the XLA formulation gathers k=16 neighbor rows per point — ~7M random
row reads per full-res flow band, latency-bound at ~2 ns/row (~14 ms per
EdgeConv per band, the single largest cost of the full-res pipeline). But
PointFlow's kNN graph lives inside a G·win² window, so neighbor selection
is exactly a per-point 125-bit mask (emitted for free by the Pallas kNN
kernel). EdgeConv's ``max_k relu(affine(z_nbr + c))`` then factors as
``relu(max_k(affine_scale·z_nbr) + affine(c))`` — affine/relu are monotone
reassociations done densely in XLA — leaving only ``max_k`` irregular.
This kernel computes that masked max as lane/sublane *rolls* of the
feature grid + vectorized select/max: pure streaming VPU work, no random
access (~10× over the gather at full-res shapes). Each rolled slice is
shared by ALL G query levels via a per-(source, query)-level repacked
mask word, the win row-rolls are hoisted to a scratch buffer reused by
every (dx, query) pair, and the select/max chain accumulates in
registers over 8-row strips (measured 1.5× over the naive
roll-per-(query, candidate) form at 640×144 flow-band shapes).

Correctness of circular rolls: a roll wraps rows/columns at the block
edge, but the kNN never selects out-of-image (or out-of-band) candidates —
its padding assigns them +inf distance — so every wrapped lane is masked
off. Row-banded callers must discard a ≥(win//2)-row halo per stacked
EdgeConv (the model uses halo 8 ≥ 3·2, ``models/pointmvsnet.py``).

Layout: features ride (H, W) as (sublane, lane) with channels in a leading
grid-split dim — full 8×128 vreg utilization; channels-last would waste
3/4 of each register at F=32.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 13 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _repack_mask(mask: jnp.ndarray, g: int, window: int) -> jnp.ndarray:
    """(B, NW, G, H, W) packed bitplanes → (B, Gc, Gq, H, W): one uint32
    word per (source level, query level) pixel holding that source level's
    win² window-position bits [gc·win², gc·win² + win²).

    Why: the kernel shares each rolled feature slice across all G query
    levels; a per-(gc, gq) word lets the inner loop test one constant bit
    position per (dy, dx) instead of re-deriving word/bit splits that
    straddle the packed layout."""
    nsh = window * window
    nw = mask.shape[1]
    outs = []
    for gc in range(g):
        s0 = gc * nsh
        w0, shv = divmod(s0, 32)
        word = mask[:, w0] >> jnp.uint32(shv)
        if shv and w0 + 1 < nw:
            word = word | (mask[:, w0 + 1] << jnp.uint32(32 - shv))
        outs.append(word)                                # (B, G, H, W)
    return jnp.stack(outs, axis=1)                       # (B, Gc, Gq, H, W)


def _mwm_kernel(rmask_ref, z_ref, out_ref, zdy_scr, *, g: int, window: int,
                sh: int):
    """Per program: source level gc = program_id(2) (innermost), feature
    group fi = program_id(1).

    rmask_ref: (1, 1, G, H, Wp) uint32 — gc's per-query-level mask words
    z_ref:     (1, 1, Fg, H, Wp) — gc's scaled neighbor features
    out_ref:   (1, G, Fg, H, Wp) — accumulates max over gc grid steps
               (index map ignores gc → the block persists in VMEM across
               the revisit and is written back once per fi)
    zdy_scr:   (window, Fg, H, Wp) scratch — the win row-rolls of z, hoisted
               so every (dx, gq) shares them (win² → 6·win roll passes)

    The accumulation runs on ``sh``-row strips held in registers: the
    full 125-candidate max chain on whole blocks OOMs Mosaic's kernel
    stack, and per-strip accumulators keep the select/max payload out of
    VMEM load/store traffic."""
    r = window // 2
    gc = pl.program_id(2)
    hh, wp = z_ref.shape[3], z_ref.shape[4]
    neg = jnp.asarray(jnp.finfo(jnp.float32).min / 2, z_ref.dtype)

    @pl.when(gc == 0)
    def _init():
        out_ref[...] = jnp.full(out_ref.shape, neg, out_ref.dtype)

    zg = z_ref[0, 0]                                     # (Fg, H, Wp)
    for dy in range(-r, r + 1):
        zdy_scr[dy + r] = pltpu.roll(zg, (-dy) % hh, axis=1)

    for st in range(hh // sh):
        rows = slice(st * sh, (st + 1) * sh)
        accs = [out_ref[0, gq, :, rows] for gq in range(g)]
        words = [rmask_ref[0, 0, gq, rows] for gq in range(g)]
        for dy in range(window):
            zdy_s = zdy_scr[dy, :, rows]                 # (Fg, sh, Wp)
            for dx in range(-r, r + 1):
                zs = pltpu.roll(zdy_s, (-dx) % wp, axis=2)  # shifted by +d
                bitsel = jnp.uint32(1 << (dy * window + (dx + r)))
                for gq in range(g):
                    sel = (words[gq] & bitsel) != 0
                    accs[gq] = jnp.where(sel[None],
                                         jnp.maximum(accs[gq], zs), accs[gq])
        for gq in range(g):
            out_ref[0, gq, :, rows] = accs[gq]


def _edge_vmem_need(g: int, fg: int, h: int, w_pad: int,
                    itemsize: int) -> int:
    """Double-buffered z + repacked-mask blocks, the persistent out block,
    the win-row-roll scratch, plus ~4 strip-sized register-spill slices."""
    return (2 * (fg * h * w_pad * itemsize         # z block
                 + g * h * w_pad * 4)              # rmask block
            + g * fg * h * w_pad * itemsize        # out block (persistent)
            + 5 * fg * h * w_pad * itemsize        # zdy scratch (win rows)
            + 4 * fg * 8 * w_pad * itemsize)       # strip temporaries


def masked_window_max_fits(g: int, h: int, w: int, f: int,
                           window: int, itemsize: int) -> bool:
    """True if some feature-group split fits the VMEM budget (whole-height
    blocks; callers band taller maps via MODEL.FLOW_CHUNK_ROWS)."""
    w_pad = _round_up(w, 128)
    itemsize = max(itemsize, 4)  # sub-32-bit inputs run as f32 (rotate op)
    return h % 8 == 0 and any(
        f % fg == 0
        and _edge_vmem_need(g, fg, h, w_pad, itemsize) <= _VMEM_BUDGET
        for fg in range(1, f + 1))


@functools.partial(jax.jit, static_argnames=("grid_shape", "window",
                                             "interpret"))
def masked_window_max(z: jnp.ndarray, mask: jnp.ndarray,
                      grid_shape: Tuple[int, int, int], window: int = 5,
                      interpret: bool = False) -> jnp.ndarray:
    """z (B, P, F) g-major over ``grid_shape`` = (G, H, W); mask
    (B, NW, G, H, W) uint32 from ``pallas_window_knn_mask`` →
    out (B, P, F): out[p, f] = max over selected candidates s of
    z[neighbor_s(p), f] (−big where the mask is empty, which the kNN
    construction never produces)."""
    g, h, w = grid_shape
    b, p, f = z.shape
    assert p == g * h * w, (z.shape, grid_shape)
    assert mask.shape[1] == -(-(g * window * window) // 32)
    assert h % 8 == 0, f"masked_window_max needs H % 8 == 0, got {h}"
    w_pad = _round_up(w, 128)

    # Mosaic's rotate only handles 32-bit lanes; run the kernel in f32 —
    # exact for max (bf16 values are f32-representable, and the cast back
    # is lossless on values that started as bf16)
    out_dtype = z.dtype
    if z.dtype.itemsize != 4:
        z = z.astype(jnp.float32)

    # feature-group split: largest divisor of F that fits VMEM
    fg = max((c for c in range(1, f + 1) if f % c == 0
              and _edge_vmem_need(g, c, h, w_pad, z.dtype.itemsize)
              <= _VMEM_BUDGET), default=None)
    if fg is None:
        raise ValueError(
            f"masked_window_max: grid {grid_shape} too tall for VMEM even "
            f"at Fg=1 — band the rows (MODEL.FLOW_CHUNK_ROWS)")

    rmask = _repack_mask(mask, g, window)            # (B, Gc, Gq, H, W)
    # (B, P, F) → (B, G, F, H, W), lanes = W
    zg = z.reshape(b, g, h, w, f).transpose(0, 1, 4, 2, 3)
    if w_pad != w:
        zg = jnp.pad(zg, ((0, 0),) * 4 + ((0, w_pad - w),))
        rmask = jnp.pad(rmask, ((0, 0),) * 4 + ((0, w_pad - w),))

    out = pl.pallas_call(
        functools.partial(_mwm_kernel, g=g, window=window, sh=8),
        grid=(b, f // fg, g),
        in_specs=[
            pl.BlockSpec((1, 1, g, h, w_pad),
                         lambda bi, fi, gc: (bi, gc, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, fg, h, w_pad),
                         lambda bi, fi, gc: (bi, gc, fi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, fg, h, w_pad),
                               lambda bi, fi, gc: (bi, 0, fi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, g, f, h, w_pad), z.dtype),
        scratch_shapes=[pltpu.VMEM((window, fg, h, w_pad), z.dtype)],
        interpret=interpret,
    )(rmask, zg)
    out = out[..., :w].transpose(0, 1, 3, 4, 2).reshape(b, p, f)
    return out.astype(out_dtype)


def masked_window_max_xla(z: jnp.ndarray, mask: jnp.ndarray,
                          grid_shape: Tuple[int, int, int],
                          window: int = 5) -> jnp.ndarray:
    """Pure-XLA reference implementation (tests / CPU fallback): same
    semantics via win² shifted views + masked max."""
    g, h, w = grid_shape
    b, p, f = z.shape
    neg = jnp.asarray(jnp.finfo(jnp.float32).min / 2, z.dtype)
    zg = z.reshape(b, g, h, w, f)
    r = window // 2
    padded = jnp.pad(zg, ((0, 0), (0, 0), (r, r), (r, r), (0, 0)),
                     constant_values=neg)
    acc = jnp.full((b, g, h, w, f), neg, z.dtype)
    for gc in range(g):
        for dy in range(window):
            for dx in range(window):
                s = gc * window * window + dy * window + dx
                bit = (mask[:, s // 32] >> jnp.uint32(s % 32)) & jnp.uint32(1)
                shifted = padded[:, gc, dy:dy + h, dx:dx + w]  # (B, H, W, F)
                acc = jnp.where((bit == 1)[..., None],
                                jnp.maximum(acc, shifted[:, None]), acc)
    return acc.reshape(b, p, f)
