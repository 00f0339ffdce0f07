"""Decompose the grouped-fetch cost at flow3 band shapes.

``flow3_ablate`` attributes ~150 ms of the 267 ms headline pipeline to the
source-view fetch.  This probe times ``fetch_features_grouped`` standalone
at one band's shapes (V-1=4 source views, 640x512 level-0 maps, 144-row
band of hypothesis points, G=5, band-local tables) and ablates its internal
stages with dependency-preserving stubs:

  full      : the production fast path (mode="fast", mxu gather)
  take      : row gather via take_along_axis instead of the MXU matmul
  moments   : reduce="moments" (fused per-view f32 accumulation)
  notable   : _build_table_one -> zeros + dep      [table build off]
  noextract : _onehot_extract -> broadcast + dep   [tap extraction off]
  nogather  : gather_rows_mxu/take -> zeros + dep  [row gather off]
  table     : the ungrouped multilevel-table fetch (round-2 engine)

Run on the real chip:  python benchmarks/fetch_probe.py [names ...]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from pointmvsnet_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import pointmvsnet_tpu.ops.grouped_fetch as gf
from pointmvsnet_tpu.ops.sampling import build_multilevel_table, fetch_features_multilevel

B, V, H0, W0 = 1, 4, 512, 640
BH, Y0 = 144, 128          # one interior band
G, P0, BAND_ROWS = 5, 4, 168
CS = (8, 16, 32)

orig_table = gf._build_table_one
orig_extract = gf._onehot_extract
orig_gather = gf.gather_rows_mxu


def _dep0(dtype, *tensors):
    eps = jnp.zeros((), jnp.float32)
    for t in tensors:
        eps = eps + t.ravel()[0].astype(jnp.float32) * 0
    return eps.astype(dtype)


def set_stub(name):
    gf._build_table_one = orig_table
    gf._onehot_extract = orig_extract
    gf.gather_rows_mxu = orig_gather
    if name == "notable":
        def table_stub(padded, p0, h0, w0, sc, r):
            ps = gf.patch_sizes(p0, len(padded))
            wtot = sum(p * p * f.shape[-1] for f, p in zip(padded, ps))
            return (jnp.zeros((sc * (w0 + 1), wtot), padded[0].dtype)
                    + _dep0(padded[0].dtype, *padded, r))
        gf._build_table_one = table_stub
    elif name == "noextract":
        def extract_stub(rows, by, bx, p, c):
            f = (jnp.zeros(rows.shape[:-1] + (c,), rows.dtype)
                 + _dep0(rows.dtype, rows, by, bx))
            return f, f, f, f
        gf._onehot_extract = extract_stub
    elif name == "nogather":
        def gather_stub(table, idx, block=512, span=1536):
            b, n = idx.shape
            return (jnp.zeros((b, n, table.shape[-1]), table.dtype)
                    + _dep0(table.dtype, table, idx)), None
        gf.gather_rows_mxu = gather_stub


def main():
    rng = np.random.RandomState(0)
    levels = [jnp.asarray(rng.randn(B, V, H0 >> l, W0 >> l, c)
                          .astype(np.float32)).astype(jnp.bfloat16)
              for l, c in enumerate(CS)]
    # coherent hypothesis points: a DTU-like cam ring projecting a smooth
    # depth band (reuses the synthetic scene generator's cams)
    from pointmvsnet_tpu.dataset.synthetic import make_scene_batch
    _, cams, gt = make_scene_batch(B, V + 1, H0, W0, 48)
    cams = jnp.asarray(cams)
    gt = jnp.asarray(gt)
    d_int = cams[0, 0, 1, 3, 1]
    from pointmvsnet_tpu.models.pointmvsnet import hypothesis_points
    band = gt[:, Y0:Y0 + BH, :]
    step = (d_int * 0.1875).astype(jnp.float32)[None]
    pts, _ = hypothesis_points(band, step, 2, cams[:, 0], Y0)

    src_cams = cams[:, 1:]
    padded = gf.pad_levels([f[:, 1:] for f in levels], P0)

    names = sys.argv[1:] or ["full", "take", "moments", "notable",
                             "noextract", "nogather", "table"]
    # extra variants: "cond" / "cond_take" run mode="cond" (per-view
    # lax.cond wrapper) to measure whether XLA executes both branches
    results = {}
    for name in names:
        set_stub(name if name in ("notable", "noextract", "nogather")
                 else "none")
        kw = dict(groups=G, p0=P0, padded=padded, band_rows=BAND_ROWS,
                  mode="fast")
        if name in ("take", "cond_take"):
            kw["gather_impl"] = "take"
        if name == "moments":
            kw["reduce"] = "moments"
        if name.startswith("cond"):
            kw["mode"] = "cond"
        if name in ("weighted", "wbf16"):   # factored one-hot×weight taps
            kw["extract"] = "weighted"
        if name in ("bf16", "wbf16"):       # bf16 per-view source features
            kw["out_dtype"] = jnp.bfloat16

        if name == "table":
            table = build_multilevel_table([f[:, 1:] for f in levels])

            @jax.jit
            def fn(pts, table=table):
                out = fetch_features_multilevel(
                    [f[:, 1:] for f in levels], pts, src_cams, table=table)
                return pts + (out.ravel()[0].astype(jnp.float32)
                              * 0).astype(pts.dtype) + 1e-6
        else:
            @jax.jit
            def fn(pts, kw=kw):
                out = gf.fetch_features_grouped(
                    [f[:, 1:] for f in levels], pts, src_cams, **kw)
                if isinstance(out, tuple):
                    dep = out[0].ravel()[0] + out[1].ravel()[0]
                else:
                    dep = out.ravel()[0].astype(jnp.float32)
                return pts + (dep * 0).astype(pts.dtype) + 1e-6

        o = fn(pts)
        np.asarray(o[0, 0, 0])
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fn(o)
        assert np.isfinite(float(o[0, 0, 0]))
        t = (time.perf_counter() - t0) / iters
        results[name] = round(t * 1e3, 2)
        print(f"{name:10s}: {t * 1e3:7.2f} ms/band -> x4 = {t * 4e3:6.1f} ms "
              f"at flow3", flush=True)
    if "full" in results:
        for nm, ms in results.items():
            if nm != "full":
                print(f"delta[{nm}] = {results['full'] - ms:+.2f} ms/band")
    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main()
