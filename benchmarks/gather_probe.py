"""Probe: TPU gather cost vs row WIDTH (bytes), coherent indices.

Round-2 established the row-count cost model (~17 ns/row coherent,
~65 ns/row random, roughly width-independent up to 448 B). Round 3's
grouped fetch trades 5x fewer rows for ~2.5x wider rows (1120 B bf16),
so the design hinges on how cost scales PAST 448 B — this measures it.

Usage: python benchmarks/gather_probe.py  (runs on the default backend —
the axon TPU when tunneled).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def probe(n_rows_table: int, n_gather: int, width_ch: int, dtype,
          iters: int = 20, coherent: bool = True) -> float:
    """ns per gathered row for (n_gather) rows of width_ch channels."""
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.rand(n_rows_table, width_ch), dtype)
    if coherent:
        # epipolar-like: mostly-sorted indices with small jitter
        base = np.linspace(0, n_rows_table - 1, n_gather)
        idx = np.clip(base + rng.randint(-8, 8, n_gather), 0,
                      n_rows_table - 1).astype(np.int32)
    else:
        idx = rng.randint(0, n_rows_table, n_gather).astype(np.int32)
    idx = jnp.asarray(idx)

    @jax.jit
    def run(t, i):
        g = jnp.take(t, i, axis=0)
        return jnp.sum(g.astype(jnp.float32), axis=0)  # force materialization

    out = run(table, idx)
    np.asarray(out)
    t0 = time.perf_counter()
    outs = [run(table, idx) for _ in range(iters)]
    s = sum(float(o[0]) for o in outs)
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(s)
    return dt / n_gather * 1e9


def main():
    print("backend:", jax.devices())
    n_table = 330_000          # flow3-scale table rows
    n_gather = 1_310_720       # N rows/view at 640x512 (pixel-grouped)
    for dtype, dname in [(jnp.bfloat16, "bf16")]:
        for ch in [32, 64, 112, 224, 280, 432, 560, 1120]:
            ns = probe(n_table, n_gather, ch, dtype)
            by = ch * 2
            print(f"{dname} width={ch:5d}ch ({by:5d}B): {ns:6.1f} ns/row   "
                  f"({n_gather*by/ (ns*1e-9*n_gather) /1e9:7.1f} GB/s)")


if __name__ == "__main__":
    main()
