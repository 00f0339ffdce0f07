"""Plane-sweep warp microbenchmark at the coarse headline shape.

flow3_ablate attributes ~33 ms to the coarse sweep (nosweep marginal).
This times ``plane_sweep_volume`` standalone at the headline coarse shape
(V=5, 64x80 feature maps, C=32, D=96) for each gather impl, chained with a
materialized-scalar sync.

Run on the real chip:  python benchmarks/sweep_probe.py [impls ...]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from pointmvsnet_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from pointmvsnet_tpu.ops.cost_volume import plane_sweep_volume
from pointmvsnet_tpu.models.pointmvsnet import scale_cams
from pointmvsnet_tpu.dataset.synthetic import make_scene_batch
from pointmvsnet_tpu.ops.geometry import cam_depth_range, depth_hypotheses

B, V, H, W, D, C = 1, 5, 512, 640, 96, 32
FH, FW = H // 8, W // 8


def main():
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(B, V, FH, FW, C)
                        .astype(np.float32)).astype(jnp.bfloat16)
    _, cams, _ = make_scene_batch(B, V, H, W, D)
    cams = jnp.asarray(cams)
    cams_f = scale_cams(cams, FW / W, FH / H)
    d_min, d_int, _, _ = cam_depth_range(cams[:, 0])
    depths = depth_hypotheses(d_min, d_int, D)

    impls = sys.argv[1:] or ["take", "mxu"]
    results = {}
    ref = None
    for impl in impls:
        @jax.jit
        def fn(feats, impl=impl):
            cost = plane_sweep_volume(feats, cams_f, depths, impl=impl)
            return feats + (cost.ravel()[0] * 0).astype(feats.dtype) + 1e-6

        cost = plane_sweep_volume(feats, cams_f, depths, impl=impl)
        if ref is None:
            ref = cost.astype(jnp.float32)
        else:
            diff = float(jnp.max(jnp.abs(cost.astype(jnp.float32) - ref)))
            print(f"  max|{impl} - {impls[0]}| = {diff:.2e}", flush=True)
        o = fn(feats)
        np.asarray(o[0, 0, 0, 0, 0])
        iters = 30
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fn(o)
        assert np.isfinite(float(o[0, 0, 0, 0, 0]))
        t = (time.perf_counter() - t0) / iters
        results[impl] = round(t * 1e3, 2)
        print(f"{impl:8s}: {t * 1e3:7.2f} ms", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
