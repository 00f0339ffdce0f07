"""Train-step ablation-differencing at the reference train config.

VERDICT r4 #5: the 0.96 s train step is 74% backward (0.71 s) with no
committed attribution. This extends the eval-side honest-profiler protocol
(``flow3_ablate.py``: dependency-preserving stubs — zeros + opaque-zero
scalar, so XLA can neither DCE the producers nor constant-fold the
consumers) to the FULL train step: stub one component, re-init, re-time
fwd+loss+bwd+RMSprop; the marginal is ``full − stubbed`` and includes the
component's backward. Cotangents still flow around a stub (through the
opaque scalar), so upstream backward stays alive — the marginal isolates
the component, not its whole upstream cone.

Config: V=3, D=48, 640×512, scales .25/.5, bf16+BN+REMAT, B=1 (the
production per-chip train shard — bench.measure_train_step's config).

Run on the real chip:  python benchmarks/train_ablate.py [stub ...]
Stubs: full noknn nowmax nopyr noref nosweep nofetch noedge nohead novol
(see flow3_ablate.py).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pointmvsnet_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from bench import measure_train_step
from flow3_ablate import set_stub  # noqa: E402  (same-dir import)


def main():
    import jax
    jax.devices()
    results = {}
    names = sys.argv[1:] or ["full", "nofetch", "noedge", "nowmax", "noknn",
                             "nohead", "nopyr", "nosweep", "novol"]
    for name in names:
        set_stub(name)
        try:
            out = measure_train_step(iters=6)
            results[name] = round(out["step_latency_s"] * 1000, 1)
        except Exception as e:   # a stub may change memory/HLO enough to fail
            results[name] = f"{type(e).__name__}: {e}"[:160]
        print(f"{name:8s}: {results[name]}", flush=True)
    full = results.get("full")
    if isinstance(full, float):
        marg = {k: round(full - v, 1) for k, v in results.items()
                if k != "full" and isinstance(v, float)}
        print(json.dumps({"full_ms": full, "marginal_ms": marg}, indent=1))
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results", "train_ablate_r5.json")
    with open(out_path, "w") as f:
        json.dump({"config": "V3 D48 640x512 bf16+BN+REMAT B=1 train step",
                   "stubbed_ms": results}, f, indent=1)


if __name__ == "__main__":
    main()
