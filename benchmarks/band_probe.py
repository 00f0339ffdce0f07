"""One flow3 band, end-to-end, as ONE jit region — in-situ composition probe.

``fetch_probe`` times the grouped fetch standalone (~11-13 ms/band);
``flow3_ablate`` attributes ~150-190 ms (~38-48 ms/band) to it in the full
pipeline.  This probe jits a single PointFlowCore band call (the exact
composition the model runs per band) and ablates inside it, to tell
in-core composition cost from whole-pipeline scheduling effects.

Run on the real chip:  python benchmarks/band_probe.py [full nofetch ...]
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

import pointmvsnet_tpu.models.pointmvsnet as pm
import pointmvsnet_tpu.ops.pallas.edge as pe
from flow3_ablate import set_stub  # dependency-preserving stubs
from pointmvsnet_tpu.models.pointmvsnet import PointFlowCore, scale_cams
from pointmvsnet_tpu.ops.grouped_fetch import pad_levels

B, V, H, W = 1, 5, 512, 640
CR, HALO, Y0 = 128, 8, 120          # one interior band (bs = 144)
BAND_ROWS = 168
CS = (8, 16, 32)


def main():
    rng = np.random.RandomState(0)
    levels = [jnp.asarray(rng.randn(B, V, H >> l, W >> l, c)
                          .astype(np.float32)).astype(jnp.bfloat16)
              for l, c in enumerate(CS)]
    from pointmvsnet_tpu.dataset.synthetic import make_scene_batch
    _, cams, gt = make_scene_batch(B, V, H, W, 48)
    cams = jnp.asarray(cams)
    gt = jnp.asarray(gt).astype(jnp.float32)
    d_int = cams[0, 0, 1, 3, 1]
    step = (d_int * 0.1875).astype(jnp.float32)[None]
    ref_cam = scale_cams(cams[:, 0], 1.0, 1.0).astype(jnp.float32)
    cams_levels = [scale_cams(cams, lvl.shape[3] / W, lvl.shape[2] / H)
                   for lvl in levels]
    band = gt[:, Y0:Y0 + CR + 2 * HALO, :]

    names = sys.argv[1:] or ["full", "nofetch", "nowmax", "noknn", "nohead",
                             "noedge"]
    # extra variants: "fastmode" (fetch_mode="fast" — no per-view cond);
    # "notable"/"noextract"/"nogather" (fetch-internal stubs, in-core)
    import fetch_probe as fp
    results = {}
    for name in names:
        mode = "cond"
        core_kw = {}
        import os as _os
        _os.environ.pop("POINTFLOW_BARRIER", None)
        _os.environ.pop("GROUPED_FETCH_BARRIER", None)
        if name.startswith("fast_"):
            # forced-fast-path composition-fix candidates: weighted taps,
            # bf16 src features, table/rows optimization barriers
            fp.set_stub("none")
            set_stub("none")
            mode = "fast"
            for tag in name.split("_")[1:]:
                if tag == "weighted":
                    core_kw["fetch_extract"] = "weighted"
                elif tag == "bf16":
                    core_kw["src_dtype"] = jnp.bfloat16
                elif tag in ("btab", "brow", "bboth"):
                    _os.environ["GROUPED_FETCH_BARRIER"] = {
                        "btab": "table", "brow": "rows", "bboth": "both"}[tag]
                elif tag == "take":
                    core_kw["fetch_gather"] = "take"
        elif name in ("notable", "noextract", "nogather"):
            set_stub("none")
            fp.set_stub(name)
        elif name in ("weighted", "bf16src", "wbf16", "barrier",
                      "moments_core"):
            # composition-fix candidates (round 4): factored weighted-tap
            # extraction, bf16 per-view source features, scheduling barrier
            # after point_feat, fused per-view moments IN-CORE
            fp.set_stub("none")
            set_stub("none")
            if name in ("weighted", "wbf16"):
                core_kw["fetch_extract"] = "weighted"
            if name in ("bf16src", "wbf16"):
                core_kw["src_dtype"] = jnp.bfloat16
            if name == "barrier":
                _os.environ["POINTFLOW_BARRIER"] = "1"
            if name == "moments_core":
                core_kw["moments"] = True
        else:
            fp.set_stub("none")
            set_stub(name if name != "fastmode" else "none")
            if name == "fastmode":
                mode = "fast"
        core_kw.setdefault("fetch_gather", "mxu")
        core = PointFlowCore(dtype=jnp.bfloat16, **core_kw)
        src_padded = pad_levels([f[:, 1:] for f in levels], 4)
        var = core.init(jax.random.PRNGKey(0), levels, cams_levels, ref_cam,
                        band, step, Y0, H, False, None, "grouped",
                        BAND_ROWS, src_padded, mode)

        @jax.jit
        def fn(depth_band, mode=mode):
            out = core.apply(var, levels, cams_levels, ref_cam, depth_band,
                             step, Y0, H, False, None, "grouped", BAND_ROWS,
                             src_padded, mode)
            # chain through the refined band (float -> x*0 can't fold)
            return depth_band + (out.ravel()[0] * 0) + 1e-6

        o = fn(band)
        np.asarray(o[0, 0, 0])
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fn(o)
        assert np.isfinite(float(o[0, 0, 0]))
        t = (time.perf_counter() - t0) / iters
        results[name] = round(t * 1e3, 2)
        print(f"{name:8s}: {t * 1e3:7.2f} ms/band", flush=True)
    if "full" in results:
        for nm, ms in results.items():
            if nm != "full":
                print(f"marginal[{nm}] = {results['full'] - ms:+.2f} ms/band")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
