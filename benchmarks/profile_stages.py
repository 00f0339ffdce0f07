"""Per-stage TPU latency breakdown (north-star: PointFlow iter latency).

Times each pipeline stage as its own jitted region at the paper eval shape
(640×512, V=3, D=48) to direct kernel-optimization effort. Run on the real
chip: ``python benchmarks/profile_stages.py [--dtype bf16]``.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=640)
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    from pointmvsnet_tpu.models.image_conv import ImageConv
    from pointmvsnet_tpu.models.volume_conv import VolumeConv
    from pointmvsnet_tpu.models.edge_conv import EdgeConv
    from pointmvsnet_tpu.ops.cost_volume import plane_sweep_volume
    from pointmvsnet_tpu.ops.knn import gather_knn, window_knn
    from pointmvsnet_tpu.ops.sampling import fetch_features

    rng = np.random.RandomState(0)
    b, v, h, w, d = 1, 3, args.height, args.width, 48
    print(f"shape: B={b} V={v} {w}x{h} D={d} dtype={args.dtype}")

    # ---- ImageConv over all views at coarse scale (0.5) ------------------
    ic = ImageConv(8, norm="gn", dtype=dtype)
    x = jnp.asarray(rng.rand(b * v, h // 2, w // 2, 3), dtype)
    icv = ic.init(jax.random.PRNGKey(0), x)
    f = jax.jit(lambda p, x: ic.apply(p, x))
    t = timeit(f, icv, x)
    print(f"image_conv(coarse {w//2}x{h//2}, {v} views): {t*1e3:8.2f} ms")

    feats2 = np.asarray(f(icv, x)["conv2"], np.float32)  # (BV, h/8, w/8, 32)
    fh, fw = feats2.shape[1:3]

    cams = np.zeros((b, v, 2, 4, 4), np.float32)
    fl = 1000.0 * fw / w
    for vi in range(v):
        cams[:, vi, 0] = np.eye(4)
        cams[:, vi, 0, 0, 3] = -5.0 * vi
        cams[:, vi, 1, :3, :3] = [[fl, 0, fw / 2], [0, fl, fh / 2], [0, 0, 1]]
    cams_j = jnp.asarray(cams, dtype)
    feats_j = jnp.asarray(feats2.reshape(b, v, fh, fw, -1), dtype)
    depths = jnp.asarray(425.0 + 2.5 * np.arange(d, dtype=np.float32))[None].astype(dtype)

    psv = jax.jit(plane_sweep_volume)
    t = timeit(psv, feats_j, cams_j, depths)
    print(f"plane_sweep ({d}x{fh}x{fw}x32, V={v}):      {t*1e3:8.2f} ms")

    cost = psv(feats_j, cams_j, depths)
    vc = VolumeConv(8, norm="gn", dtype=dtype)
    vcv = vc.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8, 32), dtype))
    g = jax.jit(lambda p, x: vc.apply(p, x))
    t = timeit(g, vcv, cost)
    print(f"volume_conv ({d}x{fh}x{fw}):                {t*1e3:8.2f} ms")

    # ---- PointFlow pieces at flow scale 0.5 ------------------------------
    for s, tag in [(0.25, "flow1"), (0.5, "flow2")]:
        th, tw = int(h * s), int(w * s)
        n = th * tw
        gg = 5
        pts = jnp.asarray(rng.rand(b, gg * n, 3) * 10, dtype)
        t = timeit(jax.jit(lambda p: window_knn(p, (gg, th, tw), 16, 5)), pts)
        print(f"{tag} window_knn ({gg}x{th}x{tw}, k=16): {t*1e3:8.2f} ms")

        idx = jax.jit(lambda p: window_knn(p, (gg, th, tw), 16, 5))(pts)
        featpt = jnp.asarray(rng.rand(b, gg * n, 56), dtype)
        t = timeit(jax.jit(gather_knn), featpt, idx)
        print(f"{tag} gather_knn (N={gg*n}, k=16, C=56): {t*1e3:8.2f} ms")

        ec = EdgeConv(32, norm="gn", dtype=dtype)
        ecv = ec.init(jax.random.PRNGKey(0), featpt, idx)
        t = timeit(jax.jit(lambda p, x, i: ec.apply(p, x, i)), ecv, featpt, idx)
        print(f"{tag} edge_conv (C=56->32):              {t*1e3:8.2f} ms")

        # multi-view multi-scale feature fetch at this scale
        lv = [jnp.asarray(rng.rand(b, v, th, tw, 8), dtype),
              jnp.asarray(rng.rand(b, v, th // 2, tw // 2, 16), dtype),
              jnp.asarray(rng.rand(b, v, th // 4, tw // 4, 32), dtype)]
        camf = cams.copy()
        camf[:, :, 1, :3, :3] *= tw / fw
        camf[:, :, 1, 2, 2] = 1
        camj = jnp.asarray(camf, dtype)
        wpts = jnp.asarray(rng.rand(b, gg * n, 3) * 10 + [0, 0, 400], dtype)

        def fetch_all(levels, pts, cams):
            return [fetch_features(l, pts, cams) for l in levels]
        t = timeit(jax.jit(fetch_all), lv, wpts, camj)
        print(f"{tag} fetch_features x3 levels:          {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
