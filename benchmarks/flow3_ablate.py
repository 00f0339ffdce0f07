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
  nofetch : both source-view fetch engines -> zeros            [bilinear/table fetch off]
  noedge  : EdgeConv -> zeros                                  [full EdgeConv stack off]
  nohead  : SharedMLP -> zeros                                 [flow MLP head off]
  novol   : VolumeConv -> zeros                                [coarse 3D U-Net off]

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
orig_perlevel = pm.fetch_features_perlevel
orig_multilevel = pm.fetch_features_multilevel
orig_edge = pm.EdgeConv
orig_head = pm.SharedMLP
orig_vol = pm.VolumeConv


def _dep0(dtype, *tensors):
    """A scalar that is provably-zero at runtime but opaque to XLA, derived
    from ``tensors``: float x·0 cannot be constant-folded (inf/NaN), so a
    stub returning ``zeros + _dep0(...)`` keeps its producers ALIVE and its
    consumers un-foldable. Without this, a constant-zero stub lets XLA
    dead-code-eliminate the whole upstream subgraph and constant-fold the
    downstream one — the 'marginal' then measures a cascade, not the
    component (observed: a constant flow-head stub erased fetch+EdgeConv+
    kNN entirely, reporting a +227 ms 'head marginal')."""
    eps = jnp.zeros((), jnp.float32)
    for t in tensors:
        eps = eps + t.ravel()[0].astype(jnp.float32) * 0
    return eps.astype(dtype)


def set_stub(name):
    import flax.linen as nn

    pm.window_knn_mask_auto = orig_knn_mask
    pe.masked_window_max = orig_wmax
    pm.PointMVSNet._pyramid = orig_pyr
    pm.regular_grid_sample = orig_ref
    pm.plane_sweep_volume = orig_sweep
    pm.fetch_features_perlevel = orig_perlevel
    pm.fetch_features_multilevel = orig_multilevel
    pm.EdgeConv = orig_edge
    pm.SharedMLP = orig_head
    pm.VolumeConv = orig_vol
    if name == "nofetch":
        def fetch_stub(levels, x, cams, *args, reduce="stack", **kw):
            b = x.shape[0]
            gn = x.shape[1]
            nv = levels[0].shape[1]
            sc = sum(f.shape[-1] for f in levels)
            dt = levels[0].dtype
            if reduce == "moments":
                s = (jnp.zeros((b, gn, sc), jnp.float32)
                     + _dep0(jnp.float32, x, *levels))
                return s, s
            return (jnp.zeros((b, nv, gn, sc), dt)
                    + _dep0(dt, x, *levels))
        pm.fetch_features_perlevel = (
            lambda levels, x, cams, **kw: fetch_stub(
                levels, x, cams, **kw))
        pm.fetch_features_multilevel = (
            lambda levels, x, cams, table=None, **kw: fetch_stub(
                levels, x, cams, **kw))
    elif name == "noedge":
        class EdgeStub(nn.Module):
            features: int
            norm: str = "bn"
            use_center: bool = True
            dtype: object = jnp.float32

            @nn.compact
            def __call__(self, x, knn_idx, train=False, mask=None, **kw):
                deps = (x, knn_idx) + (() if mask is None else (mask,))
                return (jnp.zeros(x.shape[:-1] + (self.features,), self.dtype)
                        + _dep0(self.dtype, *deps))
        pm.EdgeConv = EdgeStub
    elif name == "nohead":
        class HeadStub(nn.Module):
            channels: tuple
            norm: str = "bn"
            last_relu: bool = False
            last_norm: bool = False
            dtype: object = jnp.float32

            @nn.compact
            def __call__(self, x, train=False):
                return (jnp.zeros(x.shape[:-1] + (self.channels[-1],),
                                  self.dtype) + _dep0(self.dtype, x))
        pm.SharedMLP = HeadStub
    elif name == "novol":
        class VolStub(nn.Module):
            base: int = 8
            norm: str = "bn"
            dtype: object = jnp.float32

            @nn.compact
            def __call__(self, cost, train=False):
                return (jnp.zeros(cost.shape[:-1] + (1,), self.dtype)
                        + _dep0(self.dtype, cost))
        pm.VolumeConv = (
            lambda base, norm, dtype: VolStub(base, norm, dtype))
    if name == "nosweep":
        def sweep_stub(feats, cams, depths, impl="mxu"):
            b, v, fh, fw, c = feats.shape
            d = depths.shape[1]
            return (jnp.zeros((b, d, fh, fw, c), feats.dtype)
                    + _dep0(feats.dtype, feats, depths))
        pm.plane_sweep_volume = sweep_stub
    elif name == "noknn":
        def knn_stub(points, grid_shape, k, window=5, impl="auto"):
            b, n, _ = points.shape
            g, h, w = grid_shape
            nw = -(-(g * window * window) // 32)
            idx = (jnp.zeros((b, n, k), jnp.int32)
                   + _dep0(jnp.int32, points))
            mask = jnp.full((b, nw, g, h, w), 0xFFFFFFFF, jnp.uint32) - (
                _dep0(jnp.uint32, points))
            return idx, mask
        pm.window_knn_mask_auto = knn_stub
    elif name == "nowmax":
        def wmax_stub(z, mask, grid_shape, window=5, interpret=False):
            return z + _dep0(z.dtype, mask)
        pe.masked_window_max = wmax_stub
    elif name == "nopyr":
        def pyr_stub(self, images, train):
            b, v, h, w, c = images.shape
            cb = self.img_base_channels
            dt = self.dtype
            eps = _dep0(dt, images)
            return {"conv0": jnp.zeros((b, v, h, w, cb), dt) + eps,
                    "conv1": jnp.zeros((b, v, h // 2, w // 2, 2 * cb), dt) + eps,
                    "conv2": jnp.zeros((b, v, h // 4, w // 4, 4 * cb), dt) + eps}
        pm.PointMVSNet._pyramid = pyr_stub
    elif name == "noref":
        def ref_stub(fmap, sx, sy, h, w, y_offset=0):
            return (jnp.zeros((fmap.shape[0], h * w, fmap.shape[-1]),
                              fmap.dtype) + _dep0(fmap.dtype, fmap))
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
        cfg, _ = build()
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
