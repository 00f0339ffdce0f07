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
This kernel computes that masked max as win² lane/sublane *rolls* of the
feature grid + vectorized select/max: pure streaming VPU work, no random
access. ~10× over the gather at full-res shapes.

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


def _mwm_kernel(z_ref, mask_ref, out_ref, *, g: int, window: int):
    """Per program: query level gq = program_id(1), feature group fi.

    z_ref:    (1, G, Fg, H, Wp) — scaled neighbor features, grid layout
    mask_ref: (1, NW, 1, H, Wp) uint32 — query level's selection bitplanes
    out_ref:  (1, 1, Fg, H, Wp) — max over selected window candidates

    The out block doubles as the accumulator and rolls operate on per-gc
    (Fg, H, Wp) slices: bounds Mosaic's kernel-stack temporaries to a few
    slice-sized buffers (a full-block roll chain OOMs scoped VMEM).
    """
    r = window // 2
    hh, wp = z_ref.shape[3], z_ref.shape[4]
    neg = jnp.asarray(jnp.finfo(jnp.float32).min / 2, z_ref.dtype)
    out_ref[0, 0] = jnp.full(out_ref.shape[2:], neg, out_ref.dtype)
    for gc in range(g):
        zg = z_ref[0, gc]                               # (Fg, H, Wp)
        for dy in range(-r, r + 1):
            zdy = pltpu.roll(zg, (-dy) % hh, axis=1)
            for dx in range(-r, r + 1):
                zs = pltpu.roll(zdy, (-dx) % wp, axis=2)  # shifted by +d
                s = (gc * window * window
                     + (dy + r) * window + (dx + r))
                word, b = divmod(s, 32)
                bit = (mask_ref[0, word, 0] >> jnp.uint32(b)) & jnp.uint32(1)
                sel = (bit == 1)[None]                  # (1, H, Wp)
                out_ref[0, 0] = jnp.where(
                    sel, jnp.maximum(out_ref[0, 0], zs), out_ref[0, 0])


def _edge_vmem_need(g: int, nw: int, fg: int, h: int, w_pad: int,
                    itemsize: int) -> int:
    """Double-buffered z + mask + out blocks, plus ~4 slice-sized kernel
    temporaries (zg/zdy/zs/select rhs)."""
    return (2 * (g * fg * h * w_pad * itemsize     # z block
                 + nw * h * w_pad * 4              # mask block
                 + fg * h * w_pad * itemsize)      # out block
            + 4 * fg * h * w_pad * itemsize)       # kernel temporaries


def masked_window_max_fits(g: int, h: int, w: int, f: int,
                           window: int, itemsize: int) -> bool:
    """True if some feature-group split fits the VMEM budget (whole-height
    blocks; callers band taller maps via MODEL.FLOW_CHUNK_ROWS)."""
    nw = -(-(g * window * window) // 32)
    w_pad = _round_up(w, 128)
    itemsize = max(itemsize, 4)  # sub-32-bit inputs run as f32 (rotate op)
    return any(f % fg == 0
               and _edge_vmem_need(g, nw, fg, h, w_pad, itemsize) <= _VMEM_BUDGET
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
    nw = mask.shape[1]
    assert nw == -(-(g * window * window) // 32)
    w_pad = _round_up(w, 128)

    # Mosaic's rotate only handles 32-bit lanes; run the kernel in f32 —
    # exact for max (bf16 values are f32-representable, and the cast back
    # is lossless on values that started as bf16)
    out_dtype = z.dtype
    if z.dtype.itemsize != 4:
        z = z.astype(jnp.float32)

    # feature-group split: largest divisor of F that fits VMEM
    fg = max((c for c in range(1, f + 1) if f % c == 0
              and _edge_vmem_need(g, nw, c, h, w_pad, z.dtype.itemsize)
              <= _VMEM_BUDGET), default=None)
    if fg is None:
        raise ValueError(
            f"masked_window_max: grid {grid_shape} too tall for VMEM even "
            f"at Fg=1 — band the rows (MODEL.FLOW_CHUNK_ROWS)")

    # (B, P, F) → (B, G, F, H, W), lanes = W
    zg = z.reshape(b, g, h, w, f).transpose(0, 1, 4, 2, 3)
    if w_pad != w:
        zg = jnp.pad(zg, ((0, 0),) * 4 + ((0, w_pad - w),))
        mask = jnp.pad(mask, ((0, 0),) * 4 + ((0, w_pad - w),))

    out = pl.pallas_call(
        functools.partial(_mwm_kernel, g=g, window=window),
        grid=(b, g, f // fg),
        in_specs=[
            pl.BlockSpec((1, g, fg, h, w_pad),
                         lambda bi, gi, fi: (bi, 0, fi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nw, 1, h, w_pad),
                         lambda bi, gi, fi: (bi, 0, gi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, fg, h, w_pad),
                               lambda bi, gi, fi: (bi, gi, fi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, g, f, h, w_pad), z.dtype),
        interpret=interpret,
    )(zg, mask)
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
