"""Train-step latency A/B at the reference train config (V=3, D=48,
640x512, scales .25/.5, bf16+BN+REMAT, B=1): flow-fetch engine x remat
save policy. Variant syntax: ``<fetch>[+feat]`` — the ``+feat`` suffix
sets MODEL.REMAT_SAVE=('knn','feat') so the remat policy keeps the
variance point-feature instead of re-gathering it in the backward.

Run on the real chip:
    python benchmarks/train_fetch_bench.py [table bilinear table+feat ...]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pointmvsnet_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import bench
from bench import measure_train_step

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "results", "train_ab_r5.json")


def main():
    # merge into the existing record: separate waves (e.g. the r5c +feat/
    # +mom run after the r5b table/bilinear run) must not clobber each other
    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)
    orig_build = bench.build
    for variant in (sys.argv[1:] or ["table", "bilinear", "table+feat"]):
        # <fetch>[+feat][+mom]: feat = remat policy saves the variance
        # point-feature; mom = FLOW_MOMENTS=on at train (auto is off there
        # pending exactly this measurement)
        parts = variant.split("+")
        fetch, mods = parts[0], set(parts[1:])
        unknown = mods - {"feat", "mom"}
        if unknown:
            raise SystemExit(f"unknown variant modifier(s) {unknown} "
                             f"in {variant!r}")
        remat_save = ("knn", "feat") if "feat" in mods else ("knn",)
        moments = "on" if "mom" in mods else None

        def build_f(norm="bn", dtype="bfloat16", chunk_rows=128,
                    fetch_=fetch, save_=remat_save, mom_=moments, **kw):
            cfg, model = orig_build(norm, dtype, chunk_rows, fetch=fetch_)
            if save_ != tuple(cfg.MODEL.REMAT_SAVE) or mom_ is not None:
                from pointmvsnet_tpu.models import build_model
                cfg.MODEL.REMAT_SAVE = save_
                if mom_ is not None:
                    cfg.MODEL.FLOW_MOMENTS = mom_
                model, _, _ = build_model(cfg)
            return cfg, model
        bench.build = build_f
        try:
            out = measure_train_step(iters=8)
        except Exception as e:  # OOM is a useful recorded result
            out = {"error": f"{type(e).__name__}: {e}"[:300]}
        finally:
            bench.build = orig_build
        results[variant] = out
        print(variant, json.dumps(out), flush=True)
        tmp = OUT + ".tmp"
        with open(tmp, "w") as f:
            json.dump(results, f, indent=1)
        os.replace(tmp, OUT)
    print(json.dumps({k: round(v["step_latency_s"], 4)
                      for k, v in results.items() if "step_latency_s" in v}))


if __name__ == "__main__":
    main()
