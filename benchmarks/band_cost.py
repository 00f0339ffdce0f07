"""XLA cost analysis of one flow3 band (compile-only; no timing run).

Prints the compiler's flops / bytes-accessed / peak-memory estimates for
the single-band PointFlowCore jit region, full vs nofetch — if the fetch's
marginal bytes explain its ~39 ms/band in-situ cost at HBM bandwidth, the
optimization target is materialization, not kernels.

Usage:  python benchmarks/band_cost.py
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

import jax
import jax.numpy as jnp
import numpy as np

from pointmvsnet_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from flow3_ablate import set_stub
from pointmvsnet_tpu.models.pointmvsnet import PointFlowCore, scale_cams
from pointmvsnet_tpu.ops.grouped_fetch import pad_levels

B, V, H, W = 1, 5, 512, 640
CR, HALO, Y0 = 128, 8, 120
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
    step = (cams[0, 0, 1, 3, 1] * 0.1875).astype(jnp.float32)[None]
    ref_cam = scale_cams(cams[:, 0], 1.0, 1.0).astype(jnp.float32)
    cams_levels = [scale_cams(cams, lvl.shape[3] / W, lvl.shape[2] / H)
                   for lvl in levels]
    band = gt[:, Y0:Y0 + CR + 2 * HALO, :]

    for name in (sys.argv[1:] or ["full", "nofetch"]):
        set_stub(name)
        core = PointFlowCore(dtype=jnp.bfloat16)
        src_padded = pad_levels([f[:, 1:] for f in levels], 4)
        var = core.init(jax.random.PRNGKey(0), levels, cams_levels, ref_cam,
                        band, step, Y0, H, False, None, "grouped",
                        BAND_ROWS, src_padded, "cond")

        def fn(depth_band):
            return core.apply(var, levels, cams_levels, ref_cam, depth_band,
                              step, Y0, H, False, None, "grouped", BAND_ROWS,
                              src_padded, "cond")

        compiled = jax.jit(fn).lower(band).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        ma = compiled.memory_analysis()
        flops = ca.get("flops", float("nan"))
        byts = ca.get("bytes accessed", float("nan"))
        print(f"{name:8s}: flops={flops/1e9:8.2f} G  "
              f"bytes={byts/1e9:8.2f} GB  "
              f"(~{byts/820e9*1e3:6.2f} ms at 820 GB/s)  "
              f"peak_hbm={getattr(ma, 'temp_size_in_bytes', 0)/1e6:7.1f} MB",
              flush=True)


if __name__ == "__main__":
    main()
