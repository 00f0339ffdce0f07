"""Round-5 fetch-engine A/B at the headline config, ONE TPU session.

VERDICT r4 next-round #1: BENCH_r04 measured 1.346 maps/s at the newly
promoted ``FLOW_FETCH=bilinear`` eval default — 2.8× slower than the
266.7 ms the grouped(cond) configuration measured hours earlier in the
same round. Nobody knows whether that is an engine defect (e.g. XLA
re-materializing the per-level patch tables per band without the cond
computation boundary) or a degraded chip/tunnel (model init took 447 s
vs r03's 294 s). This harness answers it the only defensible way: all
three engines, same process, same chip, same inputs, interleaved with a
repeat of the first engine to detect session drift.

Writes benchmarks/results/fetch_ab_r5.json after EVERY engine (atomic),
so a timeout mid-queue still leaves a usable partial record.

Run from the repo root:  python benchmarks/r5_fetch_ab.py [engines...]
Default engine order: bilinear table bilinear(repeat). ("grouped" was a
valid engine when the committed r5 record was taken; excised since.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuse build/measure/make_inputs/watchdog)

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "results", "fetch_ab_r5.json")


def _flush(rec):
    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(rec, f, indent=1)
    os.replace(tmp, OUT)


def main():
    import jax

    engines = sys.argv[1:] or ["bilinear", "table", "bilinear"]

    t0 = time.perf_counter()
    done = bench._device_watchdog(420.0)
    jax.devices()
    done.set()
    init_s = time.perf_counter() - t0
    bench._progress(f"device up in {init_s:.1f}s")

    from pointmvsnet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    rec = {
        "purpose": "VERDICT r4 #1: same-session fetch-engine A/B, headline "
                   "config (640x512 V=5 D=96 3-flow bf16 chunk128)",
        "device_init_s": round(init_s, 1),
        "engines": {},
        "order": [],
        "complete": False,
    }
    _flush(rec)

    # one shared model init (tiny shapes) — engine choice only affects apply
    cfg0, model0 = bench.build(fetch="table")
    t = time.perf_counter()
    variables = model0.init(
        jax.random.PRNGKey(0), *bench.make_inputs(1, 2, 64, 64, 8),
        is_flow=True, img_scales=(0.25,), inter_scales=(0.75,),
        num_virtual_plane=8)
    rec["model_init_s"] = round(time.perf_counter() - t, 1)
    bench._progress(f"model init done in {rec['model_init_s']}s")

    b, v, h, w, d = 1, 5, 512, 640, 96
    images, cams = bench.make_inputs(b, v, h, w, d)

    for i, eng in enumerate(engines):
        key = eng if eng not in rec["engines"] else f"{eng}_repeat{i}"
        cfg, model = bench.build(fetch=eng)
        kwargs = dict(is_flow=True,
                      img_scales=tuple(cfg.MODEL.TEST.IMG_SCALES),
                      inter_scales=tuple(cfg.MODEL.TEST.INTER_SCALES),
                      num_virtual_plane=d)
        bench._progress(f"[{key}] compile+measure start")
        t = time.perf_counter()
        try:
            maps_per_sec, latency = bench.measure(model, variables, images,
                                                  cams, kwargs)
            rec["engines"][key] = {
                "maps_per_sec": round(maps_per_sec, 4),
                "latency_s": round(latency, 5),
                "compile_plus_measure_s": round(time.perf_counter() - t, 1),
            }
            bench._progress(f"[{key}] {maps_per_sec:.3f} maps/s "
                            f"({latency * 1e3:.1f} ms)")
        except Exception as e:  # HBM etc. — record and continue the queue
            rec["engines"][key] = {"error": f"{type(e).__name__}: {e}"[:300]}
            bench._progress(f"[{key}] FAILED: {e}")
        rec["order"].append(key)
        _flush(rec)

    rec["complete"] = True
    _flush(rec)
    bench._progress("A/B done")
    print(json.dumps(rec["engines"], indent=1))


if __name__ == "__main__":
    main()
