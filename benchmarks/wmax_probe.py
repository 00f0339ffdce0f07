"""Microbenchmark for the masked-window-max kernel at flow3 band shapes.

flow3 at the headline config runs PointFlow over 640x512 in 4 bands of
128+16 rows; each band's EdgeConv stack calls masked_window_max 3 times
(F = 32, 32, 64).  This probe times ONE call at those shapes so kernel
variants can be iterated without re-timing the whole pipeline.

Usage:  python benchmarks/wmax_probe.py [F ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pointmvsnet_tpu.ops.pallas.edge import masked_window_max
from pointmvsnet_tpu.ops.pallas.knn import pallas_window_knn_mask


def time_fn(fn, z, *args, iters=30):
    """Chained timing: each call consumes the previous call's output so the
    device executes them back-to-back (independent same-input dispatches
    through the axon tunnel get reordered/elided and under-measure)."""
    out = fn(z, *args)
    jax.block_until_ready(out)
    o = z
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(o, *args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters


def main():
    g, h, w, window, k = 5, 144, 640, 5, 16
    p = g * h * w
    rng = np.random.RandomState(0)

    # realistic mask: from the real kNN kernel over plausible hypothesis
    # points (depth field + g-spaced hypotheses), not random bits
    depth = 5.0 + 0.5 * np.sin(np.arange(h * w, dtype=np.float32) / 97.0)
    pts = np.zeros((1, p, 3), np.float32)
    ys, xs = np.divmod(np.arange(h * w), w)
    for gc in range(g):
        sl = slice(gc * h * w, (gc + 1) * h * w)
        pts[0, sl, 0] = xs * 0.01
        pts[0, sl, 1] = ys * 0.01
        pts[0, sl, 2] = depth + (gc - g // 2) * 0.08
    idx, mask = pallas_window_knn_mask(jnp.asarray(pts), (g, h, w), k, window)
    jax.block_until_ready(mask)

    fs = [int(a) for a in sys.argv[1:]] or [32, 32, 64]
    total = 0.0
    for f in fs:
        z = jnp.asarray(rng.randn(1, p, f).astype(np.float32)).astype(jnp.bfloat16)
        t = time_fn(lambda zz, m: masked_window_max(zz, m, (g, h, w), window),
                    z, mask)
        total += t
        print(f"F={f:3d}: {t * 1e3:7.3f} ms", flush=True)
    n_bands = 4
    print(f"stack total {total * 1e3:.3f} ms/band -> x{n_bands} bands = "
          f"{total * n_bands * 1e3:.1f} ms at flow3 (kernel only)")


if __name__ == "__main__":
    main()
