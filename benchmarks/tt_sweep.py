"""Tanks & Temples-shape throughput sweep (BASELINE config #5).

Runs the full eval pipeline (coarse + 3 PointFlow iterations, V=5, D=96)
across T&T-relevant input resolutions on the real chip and prints one
JSON line per shape. The T&T release ships larger frames than DTU
(1920×1056 class); `crop_mvs_input(base=64)` brings them to these grids.

PRE-FIX measurement 2026-08-17 (TPU v5e, 1 chip, bf16, 128-row bands,
BEFORE the band-local grouped-fetch tables landed — kept for comparison):
  640×512  → 0.375 s/map (the DTU headline config)
  1280×1024 → 5.82 s/map (superlinear: the per-view patch tables reached
  ~0.6 GB and the fetch gathers lost cache locality)
Post-fix numbers land in the round-4 measurement record (docs/STATUS.md);
run this file on-chip to reproduce.
"""

from __future__ import annotations

import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from bench import build, make_inputs, measure
from pointmvsnet_tpu.utils.cache import enable_compilation_cache


OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "results", "tt_sweep_r5.json")


def main():
    enable_compilation_cache()
    # The r5 knob A/B found a CLIFF in per-band point count: at 640×512,
    # 128-row bands (82k pts) run 218 ms/map but 256-row bands (164k pts)
    # run 1296 ms — a ~6× nonlinearity, not a gradual slope. At 1280×1024
    # a 128-row band is 164k points, i.e. the historic 6 s/map "superlinear
    # wall" sits exactly on the bad side of that cliff. Sweep band heights
    # at the big shape to find the per-shape optimum (constant ~80k points
    # per band predicts chunk64 ≈ the DTU regime).
    # tokens: engine[:chunk_rows]@WxH   (argv overrides the default sweep)
    tokens = sys.argv[1:] or [
        "bilinear:128@640x512",     # DTU anchor (the headline config)
        "bilinear:64@1280x1024",    # same pts/band as the DTU optimum
        "bilinear:32@1280x1024",
        "bilinear:128@1280x1024",   # the historic wall, for attribution
    ]
    variables = None
    # resume: merge into the existing record and skip measured tokens, so
    # a timed-out sweep finishes in the next queue window
    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)
    kwargs = dict(is_flow=True, img_scales=(0.25, 0.5, 1.0),
                  inter_scales=(0.75, 0.375, 0.1875),
                  num_virtual_plane=96)
    for tok in tokens:
        if "maps_per_sec" in results.get(tok, {}):
            print(json.dumps({"variant": tok, "skip": "already measured",
                              **results[tok]}), flush=True)
            continue
        spec, shape = tok.split("@")
        engine, _, chunk = spec.partition(":")
        chunk = int(chunk or 128)
        w, h = (int(x) for x in shape.split("x"))
        cfg, model = build(fetch=engine, chunk_rows=chunk)
        if variables is None:
            variables = model.init(
                jax.random.PRNGKey(0), *make_inputs(1, 2, 64, 64, 8),
                is_flow=True, img_scales=(0.25,), inter_scales=(0.75,),
                num_virtual_plane=8)
        images, cams = make_inputs(1, 5, h, w, 96)
        try:
            mps, lat = measure(model, variables, images, cams, kwargs,
                               iters=6)
            rec = {"maps_per_sec": round(mps, 4),
                   "latency_s": round(lat, 4)}
        except Exception as e:  # record OOMs instead of dying
            rec = {"error": f"{type(e).__name__}: {e}"[:300]}
        results[tok] = rec
        print(json.dumps({"variant": tok, **rec}), flush=True)
        tmp = OUT + ".tmp"
        with open(tmp, "w") as f:
            json.dump(results, f, indent=1)
        os.replace(tmp, OUT)


if __name__ == "__main__":
    main()
