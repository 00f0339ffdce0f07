"""Bisect the B>=2 bf16+BN flow-training backward NaN (docs/STATUS.md).

Repro config (STATUS.md "known anomaly"): B=2, V=3, 512x640, D=48,
MODEL.NORM=bn, DTYPE=bfloat16, img_scales=(0.25,), RMSprop. Forward stays
finite; grads go NaN after 1-3 steps on XLA:TPU only (CPU clean, B=1
clean, coarse-only clean, not-Pallas, not-remat, not-fetch).

Usage (real TPU):
    python debug/nan_bisect.py --steps 6                    # baseline repro
    python debug/nan_bisect.py --ablate f32_knn_gather      # scatter dtype
    python debug/nan_bisect.py --ablate sg_var              # variance path
    python debug/nan_bisect.py --ablate f32_softmax
    python debug/nan_bisect.py --ablate sg_edge_gather
    python debug/nan_bisect.py --ablate bn_free_flow        # flow norm=none
    python debug/nan_bisect.py --ablate sg_edge_in          # conv-stack walls
    python debug/nan_bisect.py --ablate f32_var             # bf16 cancellation
    python debug/nan_bisect.py --ablate sg_softmax_in       # flow head
    python debug/nan_bisect.py --debug_nans                 # op-level hunt
    python debug/nan_bisect.py --dump_hlo /tmp/step.hlo     # optimized HLO

Each step prints per-top-level-subtree grad health (#nonfinite leaves,
max|g|) — the boundary between finite and NaN subtrees brackets the
originating op in the backward chain (cotangents flow loss -> flow head ->
edge convs -> variance/fetch -> pyramids -> img_conv).
"""

from __future__ import annotations

import argparse
import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

print = functools.partial(print, flush=True)  # timeout-killed runs keep logs


def grad_report(grads, prefix=""):
    import jax

    out = []
    for name, sub in sorted(grads.items()):
        leaves = jax.tree_util.tree_leaves(sub)
        flat = [np.asarray(l, np.float32).ravel() for l in leaves]
        allv = np.concatenate(flat) if flat else np.zeros(1)
        n_bad = int(np.sum(~np.isfinite(allv)))
        out.append(f"{prefix}{name}: bad={n_bad}/{allv.size} "
                   f"max|g|={np.max(np.abs(allv[np.isfinite(allv)])) if np.isfinite(allv).any() else float('nan'):.3e}")
        if n_bad:
            # leaf-level bracket: WHICH parameters are non-finite (the
            # layer/stat names localize the originating backward op)
            for path, leaf in jax.tree_util.tree_leaves_with_path(sub):
                a = np.asarray(leaf, np.float32)
                nb = int(np.sum(~np.isfinite(a)))
                if nb:
                    fin = a[np.isfinite(a)]
                    out.append(
                        f"{prefix}  BAD {jax.tree_util.keystr(path)}: "
                        f"{nb}/{a.size} maxfinite="
                        f"{np.max(np.abs(fin)) if fin.size else 0:.3e}")
    return out


def apply_ablations(names):
    """Monkeypatch the model's op bindings before build. Returns a note."""
    import jax
    import jax.numpy as jnp

    import pointmvsnet_tpu.models.edge_conv as ec
    import pointmvsnet_tpu.models.pointmvsnet as pm

    notes = []
    for name in names:
        if name == "f32_knn_gather":
            # EdgeConv neighbor gather (and its scatter-add backward) in f32
            orig = ec.gather_knn

            def g32(features, indices, _orig=orig):
                return _orig(features.astype(jnp.float32),
                             indices).astype(features.dtype)

            ec.gather_knn = g32
            notes.append("EdgeConv gather_knn (fwd gather + bwd scatter) in f32")
        elif name == "sg_edge_gather":
            # cut the backward through the neighbor gather entirely (cterm
            # path stays live, so edge convs still train their center term)
            orig = ec.gather_knn

            def gsg(features, indices, _orig=orig):
                return jax.lax.stop_gradient(_orig(features, indices))

            ec.gather_knn = gsg
            notes.append("stop_gradient on EdgeConv neighbor gather")
        elif name == "sg_var":
            # cut the backward into the variance feature -> fetch -> pyramid
            orig_fetch = pm.fetch_features_multilevel

            def fsg(*a, **k):
                return jax.lax.stop_gradient(orig_fetch(*a, **k))

            pm.fetch_features_multilevel = fsg
            notes.append("stop_gradient on multilevel fetch (variance path)")
        elif name == "f32_softmax":
            orig_sm = jax.nn.softmax

            def sm32(x, axis=-1):
                return orig_sm(x.astype(jnp.float32), axis=axis)

            pm.jax.nn.softmax = sm32  # pm binds jax at module level
            notes.append("flow softmax in f32")
        elif name == "f32_edge_mm":
            # EdgeConv z/cterm matmuls in f32 (kernel cast skipped)
            notes.append("(handled via MODEL.DTYPE float32 run instead)")
        elif name == "bn_free_flow":
            # flow stages with norm="none" (coarse keeps BN): does the NaN
            # live in the flow-side BatchNorm backward?
            orig_pf = pm.PointFlow

            def pf_nonorm(*a, **k):
                a = list(a)
                if len(a) > 5:
                    a[5] = "none"
                else:
                    k["norm"] = "none"
                return orig_pf(*a, **k)

            pm.PointFlow = pf_nonorm
            notes.append("flow modules norm=none (coarse keeps bn)")
        elif name == "bn_free_edge":
            # EdgeConv keeps norm="none", flow-head SharedMLP keeps BN:
            # splits bn_free_flow's CLEAN between the two flow-side BN
            # implementations (EdgeConv's custom f32 path vs flax BatchNorm)
            orig_edge2 = pm.EdgeConv

            def edge_nonorm(features, norm="bn", **k):
                return orig_edge2(features, norm="none", **k)

            pm.EdgeConv = edge_nonorm
            notes.append("EdgeConv norm=none (flow head keeps bn)")
        elif name == "bn_free_head":
            # flow-head SharedMLP norm="none", EdgeConv keeps BN
            orig_mlp = pm.SharedMLP

            def mlp_nonorm(features, norm="bn", **k):
                return orig_mlp(features, norm="none", **k)

            pm.SharedMLP = mlp_nonorm
            notes.append("flow-head SharedMLP norm=none (EdgeConv keeps bn)")
        elif name == "sg_edge_in":
            # stop_gradient on every EdgeConv INPUT: cuts the backward
            # between stacked convs and into the variance feature, while
            # each conv still trains its own kernel/BN
            orig_edge = pm.EdgeConv

            class SGEdge(orig_edge):
                def __call__(self, x, *a, **k):
                    return super().__call__(jax.lax.stop_gradient(x), *a, **k)

            pm.EdgeConv = SGEdge
            notes.append("stop_gradient on each EdgeConv input")
        elif name == "f32_var":
            # variance feature (sq_mean - mean²: bf16 cancellation suspect)
            # computed in f32: force f32 fetch outputs; EdgeConv casts its
            # input back to compute dtype, so ONLY the variance math changes
            orig_fetch2 = pm.fetch_features_multilevel
            orig_ref = pm.regular_grid_sample

            def f32fetch(*a, **k):
                return orig_fetch2(*a, **k).astype(jnp.float32)

            def f32ref(*a, **k):
                return orig_ref(*a, **k).astype(jnp.float32)

            pm.fetch_features_multilevel = f32fetch
            pm.regular_grid_sample = f32ref
            notes.append("variance feature computed in f32")
        elif name == "sg_flow_depth":
            # cut the cotangent flowing from the flow stages back into
            # coarse_depth (the only 3-D resize in the model is the flow
            # input depth; _resize_views is 5-D). If vol_conv goes clean
            # under this, the NaN originates flow-side and merely floods
            # everything upstream of coarse_depth in the backward.
            orig_rs = jax.image.resize

            def rs_sg(x, shape, method="linear", **k):
                if getattr(x, "ndim", 0) == 3:
                    x = jax.lax.stop_gradient(x)
                return orig_rs(x, shape, method=method, **k)

            jax.image.resize = rs_sg
            notes.append("stop_gradient flow->coarse_depth (3-D resize)")
        elif name == "sg_cost":
            # cut the backward between vol_conv and the cost volume /
            # pyramids: isolates whether img_conv badness is all
            # propagated through the cost path
            orig_psv = pm.plane_sweep_volume

            def psv_sg(*a, **k):
                return jax.lax.stop_gradient(orig_psv(*a, **k))

            pm.plane_sweep_volume = psv_sg
            notes.append("stop_gradient on the plane-sweep cost volume")
        elif name == "bn_free_coarse":
            # vol_conv with norm="none" (flow keeps BN): does the NaN live
            # in the volume U-Net's BatchNorm backward?
            orig_vc = pm.VolumeConv

            def vc_nonorm(ch, norm="bn", dtype=None, *a, **k):
                return orig_vc(ch, "none", dtype, *a, **k)

            pm.VolumeConv = vc_nonorm
            notes.append("vol_conv norm=none (flow keeps bn)")
        elif name == "f32_vol":
            # the volume U-Net in f32 (bf16 3-D conv backward suspect)
            orig_vc2 = pm.VolumeConv

            def vc_f32(ch, norm="bn", dtype=None, *a, **k):
                return orig_vc2(ch, norm, jnp.float32, *a, **k)

            pm.VolumeConv = vc_f32
            notes.append("vol_conv in f32 (input cast by the module)")
        elif name == "sg_softmax_in":
            # cut the backward through the flow softmax/expectation head
            orig_sm2 = jax.nn.softmax

            def smsg(x, axis=-1):
                return orig_sm2(jax.lax.stop_gradient(x), axis=axis)

            pm.jax.nn.softmax = smsg
            notes.append("stop_gradient into the flow softmax")
        elif name == "edge_bn_2pass":
            # EdgeConv train BN variance as E[(x−mean)²]: kills the
            # E[x²]−E[x]² cancellation inside the compiled reduce
            ec.BN_STATS_TWOPASS = True
            notes.append("EdgeConv BN two-pass variance")
        elif name == "edge_bn_barrier":
            # optimization_barrier on EdgeConv BN (mean, var): pins the
            # compiled schedule at the stats boundary — if CLEAN, the NaN
            # is an XLA cross-boundary fusion artifact (consistent with
            # the jax_debug_nans de-optimized-clean verdict)
            ec.BN_STATS_BARRIER = True
            notes.append("EdgeConv BN stats optimization_barrier")
        elif name == "edge_bn_sgstats":
            # frozen-stats normalization backward (localizer only)
            ec.BN_STATS_STOPGRAD = True
            notes.append("EdgeConv BN stats stop_gradient")
        elif name == "edge_bn_noupdate":
            # batch moments computed + used for normalize, running-stat
            # momentum blend SKIPPED: splits frozen-CLEAN between the
            # moment reduction and the batch_stats mutation
            ec.BN_STATS_NOUPDATE = True
            notes.append("EdgeConv BN no running-stat update")
        elif name == "edge_bn_flat":
            # moments over a flattened (B·N·K, F) view — same math,
            # different XLA reduce shape/fusion
            ec.BN_STATS_FLAT = True
            notes.append("EdgeConv BN flattened moment reduction")
        elif name == "edge_bn_frozen":
            # normalize by the STORED running stats at train (no batch
            # moments, no batch_stats update): isolates the moment
            # reduction + variable-mutation machinery wholesale
            ec.BN_STATS_FROZEN = True
            notes.append("EdgeConv BN frozen running stats at train")
        else:
            raise SystemExit(f"unknown ablation: {name}")
    return notes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--norm", default="bn")
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--planes", type=int, default=48)
    ap.add_argument("--scales", default="0.25")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--scene", action="store_true",
                    help="consistent synthetic scene instead of noise")
    ap.add_argument("--ablate", default="",
                    help="comma list: f32_knn_gather,sg_edge_gather,sg_var,"
                         "f32_softmax")
    ap.add_argument("--debug_nans", action="store_true")
    ap.add_argument("--dump_hlo", default="",
                    help="write the optimized grad-step HLO to this path")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    ablations = [a for a in args.ablate.split(",") if a]
    notes = apply_ablations(ablations)
    for n in notes:
        print(f"[ablate] {n}")

    import jax.numpy as jnp

    from pointmvsnet_tpu.config import get_default_cfg
    from pointmvsnet_tpu.models import build_model
    from pointmvsnet_tpu.parallel import create_train_state
    from pointmvsnet_tpu.utils.cache import enable_compilation_cache
    from pointmvsnet_tpu.utils.solver import build_optimizer

    enable_compilation_cache()
    cfg = get_default_cfg()
    cfg.MODEL.NORM = args.norm
    cfg.MODEL.DTYPE = args.dtype
    cfg.MODEL.FLOW_CHUNK_ROWS = 0
    # pin the flow knobs: the bisect graph must not shift under default
    # flips mid-hunt (FLOW_MOMENTS went "auto" in round 5; auto is off at
    # train anyway, but the repro is frozen explicitly)
    cfg.MODEL.FLOW_MOMENTS = "off"
    cfg.MODEL.FLOW_FETCH = "table"
    cfg.MODEL.REMAT = args.remat
    cfg.SOLVER.SKIP_NONFINITE = False  # raw grads, no guard
    model, loss_fn, _ = build_model(cfg)

    b, v, h, w, d = args.batch, 3, args.height, args.width, args.planes
    scales = tuple(float(s) for s in args.scales.split(","))
    inters = tuple({0.25: 0.75, 0.5: 0.375, 1.0: 0.1875}[s] for s in scales)
    if args.scene:
        from pointmvsnet_tpu.dataset.synthetic import make_scene_batch
        images, cams, gt = make_scene_batch(b, v, h, w, d)
    else:
        rng = np.random.RandomState(0)
        images = rng.rand(b, v, h, w, 3).astype(np.float32)
        from pointmvsnet_tpu.dataset.synthetic import make_scene_batch
        _, cams, gt = make_scene_batch(b, v, h, w, d)
    batch = {"images": jnp.asarray(images), "cams": jnp.asarray(cams),
             "gt_depth": jnp.asarray(np.asarray(gt)[..., None])}
    kwargs = dict(is_flow=True, img_scales=scales, inter_scales=inters,
                  num_virtual_plane=d)

    opt = build_optimizer(cfg, steps_per_epoch=100)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), batch,
                               kwargs)

    def loss_and_grads(params, batch_stats):
        def compute(p):
            variables = {"params": p}
            if batch_stats:
                variables["batch_stats"] = batch_stats
                preds, mut = model.apply(variables, batch["images"],
                                         batch["cams"], train=True,
                                         mutable=["batch_stats"], **kwargs)
                stats = mut["batch_stats"]
            else:
                preds = model.apply(variables, batch["images"],
                                    batch["cams"], train=True, **kwargs)
                stats = batch_stats
            losses = loss_fn(preds, batch["gt_depth"], batch["cams"])
            return losses["total_loss"], stats

        (loss, stats), grads = jax.value_and_grad(
            compute, has_aux=True)(params)
        return loss, grads, stats

    import optax
    step_fn = jax.jit(loss_and_grads)
    opt_state = opt.init(state.params)
    params, batch_stats = state.params, state.batch_stats
    if args.dump_hlo:
        txt = (jax.jit(loss_and_grads)
               .lower(params, batch_stats).compile().as_text())
        with open(args.dump_hlo, "w") as f:
            f.write(txt)
        print(f"wrote optimized HLO ({len(txt)} bytes) to {args.dump_hlo}")
    upd = jax.jit(lambda g, s, p: opt.update(g, s, p))
    for i in range(args.steps):
        loss, grads, batch_stats = step_fn(params, batch_stats)
        loss = float(loss)
        lines = grad_report(grads)
        bad = any("bad=0/" not in ln for ln in lines)
        print(f"step {i}: loss={loss:.4f} grads_bad={bad}")
        for ln in lines:
            print(f"  {ln}")
        if bad:
            print("NONFINITE GRADS at step", i)
            break
        updates, opt_state = upd(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
    else:
        print(f"CLEAN: {args.steps} steps, all grads finite "
              f"(ablate={ablations or 'none'})")


if __name__ == "__main__":
    main()
