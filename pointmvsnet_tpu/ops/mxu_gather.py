"""Coherent row gather as a one-hot × slab matmul (MXU-native gather).

Reference counterpart: none — this replaces the hardware gather that
``torch.gather``/``F.grid_sample`` map to on GPU (SURVEY.md §2.6, §3.4
hot-loop ranking). XLA lowers ``jnp.take_along_axis`` to a row-latency-
bound DMA gather on TPU: measured ~40 ns/row regardless of row width
(benchmarks/gather_probe.py), i.e. ~11 GB/s on 448 B rows — 70× under
HBM bandwidth. The MXU, meanwhile, streams dense tiles at full bandwidth.

This op exploits the *coherence* of projective sampling indices: pixels
that are adjacent along an image row project to adjacent table rows
(epipolar continuity), so a block of ``block`` consecutive indices spans
a narrow contiguous window of the table. For each block we slice one
``span``-row slab and compute

    out[b, j, :] = onehot(idx[b, j] - base[b], span) @ slab[b]

on the MXU. The one-hot rows make the matmul an EXACT gather: every
product is x·1 or x·0 and the fp32 accumulator adds zeros, so the result
bits equal the gathered row bits (for f32 tables likewise).

Out-of-window indices (wild geometry, degenerate blocks) yield zero rows
and are reported in the returned mask — callers keep their exact-fallback
path (e.g. ``ops/sampling.py::fetch_features_mxu``'s per-view ``lax.cond``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def gather_rows_mxu(table: jnp.ndarray, idx: jnp.ndarray, block: int = 512,
                    span: int = 1536) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gather ``table[..., idx, :]`` via per-block one-hot matmuls.

    table: (..., R, W); idx: (..., N) int32 with block-coherent values
    (consecutive entries land within ``span`` rows of each other, modulo
    the per-block min). → (out (..., N, W) in table dtype, ok (..., N)
    bool). Entries with ``ok=False`` (index outside the block's span
    window) come back as zero rows — the caller must fall back for them.

    ``block`` is the pixel-block size (padded internally if N % block);
    ``span`` the static slab height. FLOP cost ≈ 2·N·span·W — at the
    PointFlow fetch shapes this is a few ms of MXU time vs tens of ms of
    latency-bound hardware gather.
    """
    *lead, r, w = table.shape
    n = idx.shape[-1]
    span = min(span, r)
    nb = -(-n // block)
    pad = nb * block - n
    if pad:
        # pad with the LAST index: it is block-coherent with the real tail
        # entries (padding with idx[0] would drag the final block's min
        # far from the tail and falsely mask it out of the span window)
        idx = jnp.concatenate(
            [idx, jnp.broadcast_to(idx[..., -1:], (*idx.shape[:-1], pad))],
            axis=-1)
    ib = idx.reshape(*lead, nb, block)
    base = jnp.clip(jnp.min(ib, axis=-1), 0, r - span)          # (..., nb)
    rel = ib - base[..., None]                                   # (..., nb, block)
    ok = (rel >= 0) & (rel < span)
    iot = lax.broadcasted_iota(jnp.int32, (block, span), 1)
    onehot = ((rel[..., None] == iot) & ok[..., None]).astype(table.dtype)

    def slabs_one(tbl, bases):                                   # (R,W),(nb,)→(nb,span,W)
        # close over tbl: the nb-axis vmap must NOT batch the table (a
        # broadcast along nb would materialize nb copies — tens of GB at
        # full-res shapes); batching only the starts lowers to a gather
        # of contiguous slabs
        return jax.vmap(
            lambda b: lax.dynamic_slice(tbl, (b, 0), (span, w)))(bases)

    slabs = slabs_one
    for _ in range(len(lead)):                                   # leading dims
        slabs = jax.vmap(slabs)
    slab = slabs(table, base)                                    # (..., nb, span, W)
    out = lax.dot_general(
        onehot, slab,
        dimension_numbers=(((onehot.ndim - 1,), (slab.ndim - 2,)),
                           (tuple(range(onehot.ndim - 2)),
                            tuple(range(slab.ndim - 2)))),
        preferred_element_type=jnp.float32).astype(table.dtype)
    out = out.reshape(*lead, nb * block, w)
    ok = ok.reshape(*lead, nb * block)
    if pad:
        out, ok = out[..., :n, :], ok[..., :n]
    return out, ok
