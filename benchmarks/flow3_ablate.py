"""Ablation-differencing of the NON-fetch flow3 components at headline shapes.

Honest-profiler protocol (same as the round-3 fetch ablations): stub ONE
component in the module namespace with a shape-preserving cheap op, re-init,
re-time the WHOLE headline pipeline; the component's marginal cost is
``full - stubbed``.  This measures what removing the component buys in situ
(after XLA fusion/overlap), not an isolated microbenchmark.

Stubs:
  full    : untouched pipeline
  noknn   : window_knn_mask_auto -> (zero idx, all-ones mask)  [kNN kernel off]
  nowmax  : masked_window_max -> identity on z                 [EdgeConv reduction off]
  nopyr   : PointMVSNet._pyramid -> zeros                      [flow-scale ImageConv off]
  noref   : regular_grid_sample -> zeros                       [ref-view resample off]
  nosweep : plane_sweep_volume -> zeros                        [coarse warp off]

Run on the real chip:  python benchmarks/flow3_ablate.py [stub ...]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pointmvsnet_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import pointmvsnet_tpu.models.pointmvsnet as pm
import pointmvsnet_tpu.ops.pallas.edge as pe
from bench import build, make_inputs, measure
from pointmvsnet_tpu.models import build_model

orig_knn_mask = pm.window_knn_mask_auto
orig_wmax = pe.masked_window_max
orig_pyr = pm.PointMVSNet._pyramid
orig_ref = pm.regular_grid_sample
orig_sweep = pm.plane_sweep_volume


def set_stub(name):
    pm.window_knn_mask_auto = orig_knn_mask
    pe.masked_window_max = orig_wmax
    pm.PointMVSNet._pyramid = orig_pyr
    pm.regular_grid_sample = orig_ref
    pm.plane_sweep_volume = orig_sweep
    if name == "nosweep":
        def sweep_stub(feats, cams, depths, impl="mxu"):
            b, v, fh, fw, c = feats.shape
            d = depths.shape[1]
            return jnp.zeros((b, d, fh, fw, c), feats.dtype)
        pm.plane_sweep_volume = sweep_stub
    elif name == "noknn":
        def knn_stub(points, grid_shape, k, window=5, impl="auto"):
            b, n, _ = points.shape
            g, h, w = grid_shape
            nw = -(-(g * window * window) // 32)
            idx = jnp.zeros((b, n, k), jnp.int32)
            mask = jnp.full((b, nw, g, h, w), 0xFFFFFFFF, jnp.uint32)
            return idx, mask
        pm.window_knn_mask_auto = knn_stub
    elif name == "nowmax":
        def wmax_stub(z, mask, grid_shape, window=5, interpret=False):
            return z
        pe.masked_window_max = wmax_stub
    elif name == "nopyr":
        def pyr_stub(self, images, train):
            b, v, h, w, c = images.shape
            cb = self.img_base_channels
            dt = self.dtype
            return {"conv0": jnp.zeros((b, v, h, w, cb), dt),
                    "conv1": jnp.zeros((b, v, h // 2, w // 2, 2 * cb), dt),
                    "conv2": jnp.zeros((b, v, h // 4, w // 4, 4 * cb), dt)}
        pm.PointMVSNet._pyramid = pyr_stub
    elif name == "noref":
        def ref_stub(fmap, sx, sy, h, w, y_offset=0):
            return jnp.zeros((fmap.shape[0], h * w, fmap.shape[-1]),
                             fmap.dtype)
        pm.regular_grid_sample = ref_stub


def main():
    b, v, h, w, d = 1, 5, 512, 640, 96
    images, cams = make_inputs(b, v, h, w, d)
    kwargs = dict(is_flow=True, img_scales=(0.25, 0.5, 1.0),
                  inter_scales=(0.75, 0.375, 0.1875), num_virtual_plane=d)

    results = {}
    names = sys.argv[1:] or ["full", "noknn", "nowmax", "nopyr", "noref"]
    for name in names:
        set_stub(name)
        cfg, _ = build(fetch="grouped")
        model, _, _ = build_model(cfg)
        variables = model.init(jax.random.PRNGKey(0),
                               *make_inputs(1, 2, 64, 64, 8),
                               is_flow=True, img_scales=(0.25,),
                               inter_scales=(0.75,), num_virtual_plane=8)
        mps, lat = measure(model, variables, images, cams, kwargs, iters=10)
        results[name] = round(lat * 1000, 1)
        print(f"{name:8s}: {lat*1000:7.1f} ms  ({mps:.3f} maps/s)", flush=True)
    if "full" in results:
        for name, ms in results.items():
            if name != "full":
                print(f"marginal[{name}] = {results['full'] - ms:+.1f} ms")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
