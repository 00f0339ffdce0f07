"""Train-step latency A/B at the reference train config (V=3, D=48,
640x512, scales .25/.5, bf16+BN+REMAT, B=1): table vs bilinear flow fetch
(MODEL.FLOW_FETCH), under the default remat-with-knn-save policy.

Run on the real chip:  python benchmarks/train_fetch_bench.py [table|bilinear ...]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pointmvsnet_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import bench
from bench import measure_train_step


def main():
    results = {}
    orig_build = bench.build
    for fetch in (sys.argv[1:] or ["table", "bilinear"]):
        def build_f(norm="bn", dtype="bfloat16", chunk_rows=128,
                    fetch_=fetch, **kw):
            return orig_build(norm, dtype, chunk_rows, fetch=fetch_)
        bench.build = build_f
        try:
            out = measure_train_step(iters=8)
        finally:
            bench.build = orig_build
        results[fetch] = out
        print(fetch, json.dumps(out), flush=True)
    print(json.dumps({k: round(v["step_latency_s"], 4)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
