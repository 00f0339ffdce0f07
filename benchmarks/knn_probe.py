"""Microbenchmark for the fused windowed-kNN kernel at flow3 band shapes.

flow3 at the headline config runs PointFlow over 640x512 in 4 bands of
128+16 rows; each band calls ``pallas_window_knn_mask`` once (G=5, k=16,
window=5).  This probe times ONE call at that shape with chained
dependencies (independent same-input dispatches through the axon tunnel
get reordered/elided and under-measure).

Usage:  python benchmarks/knn_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pointmvsnet_tpu.ops.pallas.knn import pallas_window_knn_mask


def main():
    g, h, w, window, k = 5, 144, 640, 5, 16
    p = g * h * w
    depth = 5.0 + 0.5 * np.sin(np.arange(h * w, dtype=np.float32) / 97.0)
    pts = np.zeros((1, p, 3), np.float32)
    ys, xs = np.divmod(np.arange(h * w), w)
    for gc in range(g):
        sl = slice(gc * h * w, (gc + 1) * h * w)
        pts[0, sl, 0] = xs * 0.01
        pts[0, sl, 1] = ys * 0.01
        pts[0, sl, 2] = depth + (gc - g // 2) * 0.08

    @jax.jit
    def run(pts):
        idx, mask = pallas_window_knn_mask(pts, (g, h, w), k, window)
        # chain: fold the outputs into a TINY NONZERO drift of the input —
        # (a) integer x*0 is constant-folded by XLA (legal for ints), which
        # dead-code-eliminates the kernel, and (b) a bit-identical input
        # buffer lets the execution layer serve a cached result, so the
        # perturbation must actually change the value (1e-9 is far below
        # any kNN decision boundary at these point spacings).
        eps = (idx.ravel()[0].astype(pts.dtype)
               + mask.ravel()[0].astype(pts.dtype)) * 1e-12 + 1e-9
        return pts + eps

    x = jnp.asarray(pts)
    out = run(x)
    np.asarray(out[0, 0, 0])  # block_until_ready is unreliable through the
    iters = 30                # axon tunnel — materialize a scalar instead
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(out)
    assert np.isfinite(float(out[0, 0, 0]))
    t = (time.perf_counter() - t0) / iters
    print(f"windowed kNN+mask (G={g}, {h}x{w}, k={k}, win={window}): "
          f"{t * 1e3:7.3f} ms/call -> x4 bands = {t * 4e3:.1f} ms at flow3",
          flush=True)


if __name__ == "__main__":
    main()
