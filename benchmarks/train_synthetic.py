"""End-to-end learning validation: train on synthetic DTU-format scenes and
verify depth accuracy improves through both curriculum phases.

This is the functional-correctness benchmark (no real DTU on this host):
the synthetic scenes are exact homography renders, so a working pipeline
must drive the <1-interval accuracy up sharply. Run on TPU:
``python benchmarks/train_synthetic.py [--steps 30]``.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30, help="steps per epoch")
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--width", type=int, default=128)
    args = ap.parse_args()

    import jax
    from pointmvsnet_tpu.config import get_default_cfg
    from pointmvsnet_tpu.dataset.synthetic import make_synthetic_dtu
    from pointmvsnet_tpu.dataset.build import build_data_loader
    from pointmvsnet_tpu.models import build_model
    from pointmvsnet_tpu.parallel import (
        create_train_state, make_eval_step, make_train_step, make_mesh,
        replicate, shard_batch)
    from pointmvsnet_tpu.utils.solver import build_optimizer

    root = tempfile.mkdtemp(prefix="synth_dtu_")
    d = 16
    make_synthetic_dtu(root, scans=[2, 6], num_views=4, height=args.height,
                       width=args.width, num_depth=d, depth_min=425.0,
                       depth_interval=2.5)

    cfg = get_default_cfg()
    cfg.DATA.TRAIN.ROOT_DIR = root
    cfg.DATA.TRAIN.NUM_VIRTUAL_PLANE = d
    cfg.DATA.TRAIN.INTERVAL_SCALE = 1.0
    cfg.MODEL.NUM_VIRTUAL_PLANE = d
    cfg.MODEL.NORM = "gn"
    cfg.MODEL.TRAIN.IMG_SCALES = (0.25, 0.5)
    cfg.MODEL.TRAIN.INTER_SCALES = (0.75, 0.375)
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.SOLVER.BASE_LR = 1e-3

    model, loss_fn, metric_fn = build_model(cfg)
    loader = build_data_loader(cfg, "train")
    opt = build_optimizer(cfg, steps_per_epoch=args.steps)
    mesh = make_mesh(1)

    kw_coarse = dict(is_flow=False, img_scales=(), inter_scales=(),
                     num_virtual_plane=d)
    kw_flow = dict(is_flow=True,
                   img_scales=tuple(cfg.MODEL.TRAIN.IMG_SCALES),
                   inter_scales=tuple(cfg.MODEL.TRAIN.INTER_SCALES),
                   num_virtual_plane=d)

    example = next(iter(loader))
    example = {k: example[k] for k in ("images", "cams", "gt_depth")}
    state = create_train_state(model, opt, jax.random.PRNGKey(0), example,
                               kw_flow)
    state = replicate(state, mesh)

    def run_phase(name, kw, epochs):
        nonlocal state
        step = make_train_step(model, loss_fn, opt, mesh, kw)
        ev = make_eval_step(model, loss_fn, metric_fn, mesh, kw)
        first = last = None
        for ep in range(epochs):
            loader.set_epoch(ep)
            for i, batch in enumerate(loader):
                if i >= args.steps:
                    break
                batch = {k: batch[k] for k in ("images", "cams", "gt_depth")}
                sb = shard_batch(batch, mesh)
                state, losses = step(state, sb)
                _, _, mets = ev(state, sb)
                snap = {k: float(v) for k, v in {**losses, **mets}.items()}
                if first is None:
                    first = snap
                last = snap
            print(f"[{name}] epoch {ep}: loss {last['total_loss']:.4f} "
                  f"<1int {last.get('<1_pct_cor', 0):.3f}")
        return first, last

    c_first, c_last = run_phase("coarse", kw_coarse, 2)
    f_first, f_last = run_phase("flow", kw_flow, 2)

    print("\ncoarse phase:  loss %.4f -> %.4f   <1int %.3f -> %.3f" % (
        c_first["total_loss"], c_last["total_loss"],
        c_first["<1_pct_cor"], c_last["<1_pct_cor"]))
    print("flow  phase:  loss %.4f -> %.4f   <1int(flow2) %.3f -> %.3f" % (
        f_first["total_loss"], f_last["total_loss"],
        f_first.get("<1_pct_flow2", 0), f_last.get("<1_pct_flow2", 0)))

    ok = (c_last["total_loss"] < c_first["total_loss"]
          and c_last["<1_pct_cor"] > c_first["<1_pct_cor"])
    print("LEARNING:", "OK" if ok else "NOT IMPROVING")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
