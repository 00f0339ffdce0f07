"""Windowed VMEM row gather: stream coherent table slabs, serve rows on-chip.

The PointFlow fetch is a row gather from per-view patch tables
(``ops/sampling.py``; reference counterpart ``pointmvsnet/utils/
feature_fetcher.py :: FeatureFetcher``, SURVEY.md §2.6). XLA lowers it to a
hardware gather that is row-LATENCY-bound (~40 ns/row measured,
benchmarks/gather_probe.py) — ~30× under the HBM bandwidth a sequential
read sustains. But the index stream is epipolarly COHERENT: points are
ordered (hypothesis, row, col), so a block of consecutive points projects
into a narrow contiguous window of source-table rows.

This kernel exploits that: for each BLOCK of consecutive indices it DMAs
``slabs`` consecutive SPAN-row slabs of the table into VMEM (the window
``[q·span, (q+slabs)·span)`` with ``q = min(idx)//span``, scalar-prefetched
so Mosaic pipelines the copy behind the previous block's compute) and
serves the rows from VMEM with an in-kernel ``jnp.take``. Consecutive
blocks advance ``q`` monotonically, so each slab is fetched O(1) times and
the HBM traffic is the TABLE's bytes (sequential, full bandwidth), not
N × row-latency.

Narrow tables (width < 128 lanes) are lane-packed: ``pack = 128 // W``
table rows are reinterpreted as ONE 128-lane row (a pure reshape — rows
stay contiguous, DMA traffic unchanged) and the kernel selects the
``idx % pack`` column group after the take, so the VPU and the DMA both
run at full lane utilization.

Blocks whose index range overflows the window (wild geometry, border
clustering) make the whole call fall back to the exact XLA gather via
``lax.cond`` — rare at DTU shapes, never wrong. The fallback is decided
per CALL (per source view in the fetch), mirroring the excised MXU slab
gather's contract (git history of ``ops/mxu_gather.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _take_body(nslab, q_ref, rel_ref, *refs):
    """Serve BLOCK rows from the nslab×span VMEM window with one gather.

    Mosaic's only vector-gather primitive is the SAME-SHAPE
    ``tpu.dynamic_gather`` (out[i,j] = x[idx[i,j], j], idx.shape ==
    x.shape — jax/_src/pallas/mosaic/lowering.py::_gather_lowering_rule;
    a narrow ``jnp.take`` of BLOCK rows from the taller window fails its
    shape check, the exact error the r5 knob A/B recorded). So: pad the
    BLOCK indices up to the window height, gather the whole window onto
    itself, and statically slice the first BLOCK rows — the extra rows
    are VMEM-local VPU work, no HBM traffic."""
    slab_refs, out_ref = refs[:-1], refs[-1]
    span = slab_refs[0].shape[0]
    window = jnp.concatenate([r[:] for r in slab_refs], axis=0)
    s, wl = window.shape
    block = out_ref.shape[0]
    rel = jnp.clip(rel_ref[0, 0, :], 0, s - 1)             # (BLOCK,)
    idx2 = jnp.broadcast_to(jnp.pad(rel, (0, s - block))[:, None], (s, wl))
    g = jnp.take_along_axis(window, idx2, axis=0, mode="promise_in_bounds")
    out_ref[:] = g[:block]


def _loop_body(nslab, q_ref, rel_ref, *refs):
    """Per-row dynamic-slice copies (no materialized concat window)."""
    slab_refs, out_ref = refs[:-1], refs[-1]
    span = slab_refs[0].shape[0]
    block = out_ref.shape[0]
    top = nslab * span - 1

    def body(j, _):
        r = jnp.clip(rel_ref[0, 0, j], 0, top)
        s, o = r // span, r % span
        branches = [functools.partial(lambda k: slab_refs[k][pl.ds(o, 1), :], k)
                    for k in range(nslab)]
        out_ref[pl.ds(j, 1), :] = jax.lax.switch(s, branches)
        return 0

    jax.lax.fori_loop(0, block, body, 0)


_BODIES = {"take": _take_body, "loop": _loop_body}


def _windowed_call(table_p, q, rel, *, span, slabs, block, mechanism):
    nb, n_pad = rel.shape[0], rel.size
    width = table_p.shape[1]
    # rel is carried as (nb, 1, BLOCK): the TPU lowering requires the last
    # two dims of a block shape to be (sublane-multiple, lane-multiple) OR
    # equal to the array dims — a 2D (1, BLOCK) block over an (nb, BLOCK)
    # array violates the sublane rule for nb > 1 (the exact ValueError the
    # r5 knob A/B recorded); with the singleton axis the block's trailing
    # (1, BLOCK) matches the array's trailing dims exactly.
    rel3 = rel.reshape(nb, 1, block)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                       # q: per-block slab base
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, 1, block), lambda i, q: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((span, width),
                        functools.partial(lambda j, i, q: (q[i] + j, 0), j),
                        memory_space=pltpu.VMEM)
           for j in range(slabs)],
        out_specs=pl.BlockSpec((block, width), lambda i, q: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    body = functools.partial(_BODIES[mechanism], slabs)
    return pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, width), table_p.dtype),
    )(q, rel3, *([table_p] * slabs))


def gather_rows_windowed(table: jnp.ndarray, idx: jnp.ndarray, *,
                         span: int = 2048, slabs: int = 2, block: int = 512,
                         mechanism: str = "take",
                         interpret_fallback: bool = True) -> jnp.ndarray:
    """rows[i] = table[idx[i]] — windowed-VMEM Pallas gather with an exact
    XLA fallback.

    table (R, W) float; idx (N,) int32 in [0, R). Exact for ALL inputs: if
    any block's index range overflows the ``slabs·span`` window, the whole
    call takes the plain-gather branch of a ``lax.cond``. W must divide or
    be a multiple of 128; narrow tables are lane-packed (see module doc).
    On CPU (tests) the kernel runs in interpreter mode.
    """
    r, w = table.shape
    n = idx.shape[0]
    if 128 % w == 0 and w < 128:
        pack = 128 // w
    elif w % 128 == 0:
        pack = 1
    else:
        raise ValueError(f"table width {w} must divide or be a multiple "
                         f"of 128 (lane packing)")
    assert span % pack == 0, (span, pack)

    # ---- lane packing: (R, W) → (R/pack, 128), row r ↦ (r//pack, r%pack)
    r_pad = -(-r // pack) * pack
    table2 = jnp.pad(table, ((0, r_pad - r), (0, 0))).reshape(
        r_pad // pack, pack * w)
    span_p = span // pack                       # window rows in packed units
    assert slabs * span_p >= block, (
        f"window {slabs}x{span_p} shorter than block {block}: the same-"
        f"shape in-kernel gather needs window >= block rows")

    # pad the packed table to a multiple of span_p plus the extra slabs so
    # every q+j block index is valid
    rp = table2.shape[0]
    pad_rows = (-rp) % span_p + (slabs - 1) * span_p
    table_p = jnp.pad(table2, ((0, pad_rows), (0, 0)))

    # ---- per-block window base + window-relative indices ----------------
    nb = -(-n // block)
    idx_pad = idx
    if nb * block != n:
        idx_pad = jnp.concatenate(
            [idx, jnp.broadcast_to(idx[-1:], (nb * block - n,))])
    ib = jnp.clip(idx_pad, 0, r - 1).reshape(nb, block)
    ib_packed = ib // pack
    q = jnp.min(ib_packed, axis=1) // span_p                 # (nb,)
    rel = (ib_packed - (q * span_p)[:, None]).astype(jnp.int32)
    miss = jnp.any(rel >= slabs * span_p)

    def exact(_):
        return jnp.take(table, jnp.clip(idx_pad, 0, r - 1), axis=0)

    def fast(_):
        rows128 = _windowed_call(table_p, q.astype(jnp.int32), rel,
                                 span=span_p, slabs=slabs, block=block,
                                 mechanism=mechanism)        # (N_pad, 128)
        if pack == 1:
            return rows128
        # select the idx%pack column group — pure VPU, no gather
        lane = (ib.reshape(-1) % pack)[:, None]              # (N_pad, 1)
        groups = [rows128[:, k * w:(k + 1) * w] for k in range(pack)]
        out = groups[0]
        for k in range(1, pack):
            out = jnp.where(lane == k, groups[k], out)
        return out

    if interpret_fallback and jax.default_backend() != "tpu":
        # CPU (tests): run the kernel in interpreter mode, then apply the
        # miss fallback as a select (cond would skip tracing the kernel)
        with pltpu.force_tpu_interpret_mode():
            rows = fast(None)
        rows = jnp.where(miss, exact(None), rows)
        return rows[:n]

    rows = jax.lax.cond(miss, exact, fast, None)
    return rows[:n]
