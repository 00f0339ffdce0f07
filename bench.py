"""Benchmark: DTU-shaped full-pipeline inference throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "depth_maps/sec/chip", "vs_baseline": N}

Baseline (BASELINE.md): the PyTorch reference runs the full pipeline in
~3 s per reference view on a 1080Ti-class GPU → 0.33 maps/sec. The
BASELINE.json target is ≥5× per-chip (≥1.67 maps/sec) on TPU v5e.

Config benched: paper eval shape — 640×512 input, 3 views, D=48 coarse
hypotheses, coarse + 2 PointFlow iterations (scales 0.25/0.5). Runs on the
real TPU via the axon tunnel (does NOT force the CPU backend).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_MAPS_PER_SEC = 1.0 / 3.0


def make_inputs(b, v, h, w, d):
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(b, v, h, w, 3).astype(np.float32))
    cams = np.zeros((b, v, 2, 4, 4), np.float32)
    f = 1000.0
    for vi in range(v):
        cams[:, vi, 0] = np.eye(4)
        cams[:, vi, 0, 0, 3] = -5.0 * vi
        cams[:, vi, 1, :3, :3] = [[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]]
        cams[:, vi, 1, 3] = [425.0, 2.5, d, 425.0 + (d - 1) * 2.5]
    return images, jnp.asarray(cams)


def main():
    import jax

    from pointmvsnet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from pointmvsnet_tpu.config import get_default_cfg
    from pointmvsnet_tpu.models import build_model

    cfg = get_default_cfg()
    cfg.MODEL.NORM = "gn"
    cfg.MODEL.DTYPE = "bfloat16"
    model, _, _ = build_model(cfg)

    b, v, h, w, d = 1, 3, 512, 640, 48
    img_scales, inter_scales = (0.25, 0.5), (0.75, 0.375)
    images, cams = make_inputs(b, v, h, w, d)
    kwargs = dict(is_flow=True, img_scales=img_scales,
                  inter_scales=inter_scales, num_virtual_plane=d)

    variables = model.init(jax.random.PRNGKey(0), *make_inputs(b, v, 64, 64, 8),
                           is_flow=True, img_scales=(0.25,),
                           inter_scales=(0.75,), num_virtual_plane=8)

    fwd = jax.jit(lambda var, im, cm: model.apply(var, im, cm, **kwargs))

    # compile + warmup (np.asarray forces real materialization — plain
    # block_until_ready has proven unreliable through the axon tunnel)
    out = fwd(variables, images, cams)
    np.asarray(out["flow2"])

    # sustained throughput: enqueue the whole batch stream, then force a
    # scalar out of EVERY output — each execution must really have run,
    # while device-side queuing overlaps dispatch (the eval engine
    # processes scans exactly this way)
    iters = 20
    t0 = time.perf_counter()
    outs = [fwd(variables, images, cams) for _ in range(iters)]
    checksum = sum(float(o["flow2"][0, 0, 0]) for o in outs)
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(checksum)

    maps_per_sec = b / dt

    # optional detail file (north-star PointFlow iteration latency)
    if os.environ.get("BENCH_DETAILS"):
        from pointmvsnet_tpu.utils.profiler import stage_latencies
        stages = stage_latencies(model, variables, images, cams,
                                 img_scales, inter_scales, d)
        with open("BENCH_DETAILS.json", "w") as f:
            json.dump({"stages_s": stages, "latency_s": dt}, f, indent=1)

    print(json.dumps({
        "metric": "dtu_depth_maps_per_sec_per_chip_640x512_V3_D48_2flow",
        "value": round(maps_per_sec, 4),
        "unit": "depth_maps/sec/chip",
        "vs_baseline": round(maps_per_sec / BASELINE_MAPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # never leave the driver without a JSON line
        print(json.dumps({
            "metric": "dtu_depth_maps_per_sec_per_chip_640x512_V3_D48_2flow",
            "value": 0.0,
            "unit": "depth_maps/sec/chip",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:300],
        }))
        sys.exit(0)
