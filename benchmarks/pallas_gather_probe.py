"""Probe: can a Pallas kernel beat XLA's row gather for the fetch?

VERDICT r4 #2: the PointFlow fetch is gather-ROW-LATENCY-bound (~40 ns/row
via XLA `take_along_axis` from an HBM-resident table, measured
benchmarks/gather_probe.py) — ~30× off the bandwidth ceiling. The fix idea:
stream the (epipolarly coherent) table slab into VMEM sequentially at full
HBM bandwidth, then serve the random row accesses FROM VMEM. This probe
measures the candidate in-kernel gather mechanisms against the XLA
baseline at flow3-like shapes:

  xla_take    — jnp.take from HBM (the production baseline)
  pl_onehot   — Pallas: per-block two-slab window (scalar-prefetched
                BlockSpec index_map → pipelined HBM→VMEM DMA) + one-hot ×
                slab matmuls on the MXU (gather_rows_mxu moved inside a
                kernel: no HBM re-reads, DMA overlaps compute)
  pl_loop     — Pallas: same window, per-row dynamic-slice copy loop
  pl_take     — Pallas: jnp.take of the VMEM window (does Mosaic lower a
                vectorized dynamic gather at all? if yes, the winner)

All variants must return bit-identical rows for in-window indices. Blocks
whose indices overflow the two-slab window are NOT handled here
(production needs the usual per-view exact fallback); the probe generates
coherent indices (epipolar-like monotone drift) so every block fits.

Window scheme: the table is padded to a multiple of SPAN plus one extra
SPAN; block i's window is slabs q and q+1 of SPAN rows, q = min(idx in
block) // SPAN, so rel = idx − q·SPAN ∈ [0, 2·SPAN) whenever the block's
row range < SPAN.

Run on TPU:  python benchmarks/pallas_gather_probe.py [N] [W] [SPAN]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 512          # points per grid step


def make_inputs(n_rows_table, n_points, width, seed=0):
    """Coherent index stream: monotone-ish rows like epipolar projections
    (consecutive points land within a few hundred table rows)."""
    rng = np.random.RandomState(seed)
    table = rng.randn(n_rows_table, width).astype(np.float32)
    base = np.linspace(0, n_rows_table - 700, n_points)
    idx = (base + rng.randint(0, 640, n_points)).astype(np.int32)
    idx = np.clip(idx, 0, n_rows_table - 1)
    return jnp.asarray(table), jnp.asarray(idx)


def xla_take(table, idx, span):
    return jnp.take(table, idx, axis=0)


def _mk_pallas(body_fn, span, width, n):
    nb = n // BLOCK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,            # per-block slab index q
        grid=(nb,),
        in_specs=[
            # two consecutive SPAN-row slabs — the window [q·S, (q+2)·S)
            pl.BlockSpec((span, width), lambda i, q: (q[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((span, width), lambda i, q: (q[i] + 1, 0),
                         memory_space=pltpu.VMEM),
            # per-block window-relative indices, carried (nb, 1, BLOCK):
            # a 2D (1, BLOCK) block over an (nb, BLOCK) array violates the
            # TPU sublane tiling rule for nb > 1 (the exact ValueError the
            # first probe run recorded) — the singleton axis makes the
            # block's trailing dims match the array's exactly
            pl.BlockSpec((1, 1, BLOCK), lambda i, q: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK, width), lambda i, q: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        body_fn,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, width), jnp.float32),
    )


def _onehot_body(q_ref, lo_ref, hi_ref, rel_ref, out_ref):
    span = lo_ref.shape[0]
    rel = rel_ref[0, 0, :]                               # (BLOCK,)
    rows = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, span), 1)
    oh_lo = (rows == rel[:, None]).astype(jnp.float32)
    oh_hi = (rows == (rel[:, None] - span)).astype(jnp.float32)
    dn = (((1,), (0,)), ((), ()))
    out_ref[:] = (
        jax.lax.dot_general(oh_lo, lo_ref[:], dimension_numbers=dn,
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(oh_hi, hi_ref[:], dimension_numbers=dn,
                              preferred_element_type=jnp.float32))


def _loop_body(q_ref, lo_ref, hi_ref, rel_ref, out_ref):
    span = lo_ref.shape[0]

    def body(j, _):
        r = rel_ref[0, 0, j]
        lo = r < span

        def take_lo():
            return lo_ref[pl.ds(r, 1), :]

        def take_hi():
            return hi_ref[pl.ds(r - span, 1), :]

        out_ref[pl.ds(j, 1), :] = jax.lax.cond(lo, take_lo, take_hi)
        return 0

    jax.lax.fori_loop(0, BLOCK, body, 0)


def _take_body(q_ref, lo_ref, hi_ref, rel_ref, out_ref):
    # Mosaic's gather is SAME-SHAPE dynamic_gather only: pad the indices
    # to the window height, gather the window onto itself, slice BLOCK
    span = lo_ref.shape[0]
    window = jnp.concatenate([lo_ref[:], hi_ref[:]], axis=0)
    s, wl = window.shape
    rel = jnp.clip(rel_ref[0, 0, :], 0, s - 1)
    idx2 = jnp.broadcast_to(jnp.pad(rel, (0, s - BLOCK))[:, None], (s, wl))
    g = jnp.take_along_axis(window, idx2, axis=0, mode="promise_in_bounds")
    out_ref[:] = g[:BLOCK]


def pallas_gather(table, idx, span, body):
    n, width = idx.shape[0], table.shape[1]
    nb = n // BLOCK
    # pad the table to a multiple of span, plus one extra slab so q+1 is
    # always a valid block
    r = table.shape[0]
    pad = (-r) % span + span
    table_p = jnp.pad(table, ((0, pad), (0, 0)))
    ib = idx.reshape(nb, BLOCK)
    q = jnp.min(ib, axis=1) // span                      # (nb,) slab index
    rel = (ib - (q * span)[:, None]).astype(jnp.int32)   # (nb, BLOCK)
    fn = _mk_pallas(body, span, width, n)
    return fn(q.astype(jnp.int32), table_p, table_p,
              rel.reshape(nb, 1, BLOCK))


def bench_one(name, fn, table, idx, span, iters=30):
    ref = np.asarray(jnp.take(table, idx, axis=0))
    f = jax.jit(functools.partial(fn, span=span))
    got = np.asarray(f(table, idx))
    ok = np.array_equal(got, ref)
    r = f(table, idx)
    r.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(table, idx)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    rows_per_s = idx.shape[0] / dt
    gbps = got.nbytes / dt / 1e9
    print(f"{name:10s}: {dt*1e3:7.3f} ms  {rows_per_s/1e6:8.1f} Mrows/s  "
          f"{gbps:6.1f} GB/s out  exact={ok}", flush=True)
    return dt, ok


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512 * 640       # one band
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 128         # lvl-0 4C
    span = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    n = (n // BLOCK) * BLOCK
    table, idx = make_inputs(641 * 513, n, width)
    print(f"N={n} width={width} span={span} table={table.shape} "
          f"platform={jax.devices()[0].platform}", flush=True)

    bench_one("xla_take", xla_take, table, idx, span)
    for name, body in [("pl_onehot", _onehot_body),
                       ("pl_loop", _loop_body),
                       ("pl_take", _take_body)]:
        try:
            bench_one(name, functools.partial(pallas_gather, body=body),
                      table, idx, span)
        except Exception as e:
            print(f"{name:10s}: FAILED {type(e).__name__}: {e}"[:300],
                  flush=True)


if __name__ == "__main__":
    main()
