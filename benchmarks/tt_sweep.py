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
    engines = sys.argv[1:] or ["bilinear", "bilinear_p"]
    variables = None
    results = {}
    for engine in engines:
        cfg, model = build(fetch=engine)
        if variables is None:
            variables = model.init(
                jax.random.PRNGKey(0), *make_inputs(1, 2, 64, 64, 8),
                is_flow=True, img_scales=(0.25,), inter_scales=(0.75,),
                num_virtual_plane=8)
        kwargs = dict(is_flow=True, img_scales=(0.25, 0.5, 1.0),
                      inter_scales=(0.75, 0.375, 0.1875),
                      num_virtual_plane=96)
        for h, w in [(512, 640), (1024, 1280)]:
            images, cams = make_inputs(1, 5, h, w, 96)
            try:
                mps, lat = measure(model, variables, images, cams, kwargs,
                                   iters=6)
                rec = {"maps_per_sec": round(mps, 4),
                       "latency_s": round(lat, 4)}
            except Exception as e:  # record OOMs instead of dying
                rec = {"error": f"{type(e).__name__}: {e}"[:300]}
            results[f"{engine}@{w}x{h}"] = rec
            print(json.dumps({"engine": engine, "shape": f"{w}x{h}", **rec}),
                  flush=True)
            tmp = OUT + ".tmp"
            with open(tmp, "w") as f:
                json.dump(results, f, indent=1)
            os.replace(tmp, OUT)


if __name__ == "__main__":
    main()
