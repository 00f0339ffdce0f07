"""Round-5 cheap-knob A/B at the shipped eval default (FLOW_FETCH=bilinear).

VERDICT r4 #2 asks for the fetch to move toward its bandwidth roofline.
Before building anything new, measure what the EXISTING knobs buy at the
headline config (640x512 V=5 D=96 3-flow bf16), same session, same chip,
interleaved base repeat for drift detection:

  base      : chunk_rows=128 (the shipped default)
  chunk64   : half-height bands — smaller working set, 2x band count
  chunk256  : double-height bands — fewer per-band fixed costs
  chunk0    : unbanded full-height flow (may OOM at flow3; recorded)
  moments   : MODEL.FLOW_MOMENTS=1 — per-view f32 moment accumulation,
              never materializes the (V, G*N, sum_C) stack

Writes benchmarks/results/knob_ab_r5.json after every variant (atomic).
Run from the repo root:  python benchmarks/r5_knob_ab.py [variants...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

# wave 2 writes a FRESH artifact — wave 1's knob_ab_r5.json is committed
# history and must not be overwritten
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "results", "knob_ab_r5b.json")

VARIANTS = {
    # wave 1 (2026-08-20, committed in knob_ab_r5.json): base=chunk128
    # stacked; "moments" won 207.2 ms vs base's 217.9 (repeat) and became
    # the shipped eval default (FLOW_MOMENTS="auto"). Wave-2 variants
    # measure ON TOP of that default.
    "base": {},                           # shipped defaults (moments auto=on)
    "stack": {"moments": "off"},          # wave-1 "base" re-check
    "chunk64": {"chunk_rows": 64},
    "chunk256": {"chunk_rows": 256},
    "chunk0": {"chunk_rows": 0},
    "moments": {"moments": "on"},
    # (the Pallas windowed-gather "bilinear_p" variants were excised:
    # Mosaic internal compiler error on every in-kernel gather mechanism
    # — benchmarks/results + docs/STATUS.md, 2026-08-20)
    # bf16 per-view source features: halves the gather traffic (the f32
    # lerp weights and variance accumulation are unchanged); measured only
    # under the excised grouped engine so far
    "srcbf16": {"src_dtype": "bfloat16"},
}


def _flush(rec):
    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(rec, f, indent=1)
    os.replace(tmp, OUT)


def build_variant(chunk_rows=128, moments="auto", fetch="bilinear",
                  src_dtype=""):
    from pointmvsnet_tpu.config import get_default_cfg
    from pointmvsnet_tpu.models import build_model
    cfg = get_default_cfg()
    cfg.MODEL.NORM = "bn"
    cfg.MODEL.DTYPE = "bfloat16"
    cfg.MODEL.FLOW_CHUNK_ROWS = chunk_rows
    cfg.MODEL.FLOW_FETCH = fetch
    cfg.MODEL.FLOW_MOMENTS = moments
    cfg.MODEL.FLOW_SRC_DTYPE = src_dtype
    model, _, _ = build_model(cfg)
    return cfg, model


def main():
    import jax

    names = sys.argv[1:] or ["base", "stack", "chunk64",
                             "srcbf16", "base"]

    t0 = time.perf_counter()
    done = bench._device_watchdog(420.0)
    jax.devices()
    done.set()
    init_s = time.perf_counter() - t0
    bench._progress(f"device up in {init_s:.1f}s")

    from pointmvsnet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    rec = {
        "purpose": "r5 knob A/B wave 2 at the shipped defaults (bilinear + "
                   "moments auto), headline config (640x512 V=5 D=96 3-flow "
                   "bf16)",
        "device_init_s": round(init_s, 1),
        "variants": {},
        "order": [],
        "complete": False,
    }
    # merge into an existing record (separate waves must not clobber it);
    # re-measured names land as <name>_repeatN
    if os.path.exists(OUT):
        with open(OUT) as f:
            prev = json.load(f)
        rec["variants"] = prev.get("variants", {})
        rec["order"] = prev.get("order", [])
    _flush(rec)

    cfg0, model0 = build_variant()
    t = time.perf_counter()
    variables = model0.init(
        jax.random.PRNGKey(0), *bench.make_inputs(1, 2, 64, 64, 8),
        is_flow=True, img_scales=(0.25,), inter_scales=(0.75,),
        num_virtual_plane=8)
    rec["model_init_s"] = round(time.perf_counter() - t, 1)
    bench._progress(f"model init done in {rec['model_init_s']}s")

    b, v, h, w, d = 1, 5, 512, 640, 96
    images, cams = bench.make_inputs(b, v, h, w, d)

    for i, name in enumerate(names):
        key = name if name not in rec["variants"] else f"{name}_repeat{i}"
        cfg, model = build_variant(**VARIANTS[name])
        kwargs = dict(is_flow=True,
                      img_scales=tuple(cfg.MODEL.TEST.IMG_SCALES),
                      inter_scales=tuple(cfg.MODEL.TEST.INTER_SCALES),
                      num_virtual_plane=d)
        bench._progress(f"[{key}] compile+measure start")
        t = time.perf_counter()
        try:
            maps_per_sec, latency = bench.measure(model, variables, images,
                                                  cams, kwargs)
            rec["variants"][key] = {
                "maps_per_sec": round(maps_per_sec, 4),
                "latency_s": round(latency, 5),
                "compile_plus_measure_s": round(time.perf_counter() - t, 1),
            }
            bench._progress(f"[{key}] {maps_per_sec:.3f} maps/s "
                            f"({latency * 1e3:.1f} ms)")
        except Exception as e:  # OOM at chunk0 is a plausible, useful result
            rec["variants"][key] = {"error": f"{type(e).__name__}: {e}"[:300]}
            bench._progress(f"[{key}] FAILED: {e}")
        rec["order"].append(key)
        _flush(rec)

    rec["complete"] = True
    _flush(rec)
    bench._progress("knob A/B done")
    print(json.dumps(rec["variants"], indent=1))


if __name__ == "__main__":
    main()
