"""Training entry point.

Reference counterpart: ``pointmvsnet/train.py`` (SURVEY.md §2.16, §3.1):
``python -m pointmvsnet_tpu.train --cfg configs/dtu_wde3.yaml TRAIN.BATCH_SIZE 4``

Epoch loop with the reference's coarse-only curriculum (flow off for the
first ``SCHEDULER.INIT_EPOCH`` epochs), per-epoch validation, epoch-granular
checkpoints with auto-resume. Device-side the step is the fused sharded jit
from ``parallel/train_step.py``; host-side we keep the reference's meters /
log cadence.
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Dict, Optional

import jax
import numpy as np

from pointmvsnet_tpu.config import load_cfg_from_file
from pointmvsnet_tpu.dataset.build import build_data_loader
from pointmvsnet_tpu.models import build_model
from pointmvsnet_tpu.parallel import (
    create_train_state,
    make_eval_step,
    make_train_step,
    make_mesh,
    replicate,
    shard_batch,
)
from pointmvsnet_tpu.utils.checkpoint import Checkpointer
from pointmvsnet_tpu.utils.logger import setup_logger
from pointmvsnet_tpu.utils.metric_logger import MetricLogger
from pointmvsnet_tpu.utils.solver import (
    MAX_CONSECUTIVE_NONFINITE,
    build_optimizer,
)
from pointmvsnet_tpu.utils.tensorboard_logger import TensorboardLogger


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Point-MVSNet TPU training")
    p.add_argument("--cfg", required=True, help="config YAML path")
    p.add_argument("opts", nargs=argparse.REMAINDER,
                   help="dotted-path config overrides, e.g. TRAIN.BATCH_SIZE 2")
    return p.parse_args(argv)


def _model_kwargs(cfg, is_flow: bool) -> Dict:
    return dict(
        is_flow=is_flow,
        img_scales=tuple(cfg.MODEL.TRAIN.IMG_SCALES),
        inter_scales=tuple(cfg.MODEL.TRAIN.INTER_SCALES),
        num_virtual_plane=cfg.MODEL.NUM_VIRTUAL_PLANE,
    )


def train(cfg, output_dir: str, max_steps_per_epoch: Optional[int] = None,
          mesh=None):
    """Returns the final TrainState (for tests)."""
    logger = setup_logger("pointmvsnet_tpu.train", output_dir)
    tb = TensorboardLogger(os.path.join(output_dir, "tb"))

    model, loss_fn, metric_fn = build_model(cfg)
    flow_capable = cfg.MODEL.NAME != "mvsnet"

    train_loader = build_data_loader(cfg, "train")
    val_loader = build_data_loader(cfg, "val")
    steps_per_epoch = (min(len(train_loader), max_steps_per_epoch)
                       if max_steps_per_epoch else len(train_loader))
    optimizer = build_optimizer(cfg, steps_per_epoch=max(1, steps_per_epoch))

    if mesh is None:
        mesh = make_mesh(cfg.PARALLEL.DATA)
    logger.info("mesh: %s over %d device(s)", mesh.axis_names, mesh.size)

    try:
        example = next(iter(train_loader))
    except StopIteration:
        raise RuntimeError(
            f"empty train loader: {len(train_loader)} batches — dataset "
            f"smaller than TRAIN.BATCH_SIZE={cfg.TRAIN.BATCH_SIZE} with "
            f"drop_last, or ROOT_DIR={cfg.DATA.TRAIN.ROOT_DIR!r} has no scans")
    example = {k: v for k, v in example.items()
               if k in ("images", "cams", "gt_depth")}
    # init with flow ON (when the model supports it) so PointFlow params
    # exist before the curriculum enables them at INIT_EPOCH
    state = create_train_state(model, optimizer, jax.random.PRNGKey(cfg.RNG_SEED),
                               example, _model_kwargs(cfg, is_flow=flow_capable))

    checkpointer = Checkpointer(os.path.join(output_dir, "checkpoints"))
    state, start_epoch = checkpointer.load(state, resume=cfg.AUTO_RESUME)
    state = replicate(state, mesh)
    if start_epoch:
        logger.info("auto-resumed at epoch %d", start_epoch)

    step_fns: Dict[bool, callable] = {}
    eval_fns: Dict[bool, callable] = {}

    for epoch in range(start_epoch, cfg.SCHEDULER.MAX_EPOCH):
        is_flow = flow_capable and epoch >= cfg.SCHEDULER.INIT_EPOCH
        if is_flow not in step_fns:
            step_fns[is_flow] = make_train_step(
                model, loss_fn, optimizer, mesh, _model_kwargs(cfg, is_flow))
            eval_fns[is_flow] = make_eval_step(
                model, loss_fn, metric_fn, mesh, _model_kwargs(cfg, is_flow))

        # ---- train epoch -------------------------------------------------
        # losses are materialized (host sync) only at LOG_PERIOD: a per-step
        # float() costs a full device round-trip (~100 ms through the
        # tunnel) and would serialize the async dispatch pipeline
        train_loader.set_epoch(epoch)
        meters = MetricLogger()
        window_start = time.time()
        window_data = 0.0
        window_steps = 0
        losses = {}  # stays empty if the loader yields zero batches
        tic = time.time()
        for it, batch in enumerate(train_loader):
            if max_steps_per_epoch and it >= max_steps_per_epoch:
                break
            window_data += time.time() - tic
            batch = {k: batch[k] for k in ("images", "cams", "gt_depth")}
            state, losses = step_fns[is_flow](state, shard_batch(batch, mesh))
            window_steps += 1
            if it % cfg.TRAIN.LOG_PERIOD == 0:
                losses_f = {k: float(v) for k, v in losses.items()}  # syncs
                consec = losses_f.pop("consecutive_skipped", 0.0)
                if losses_f.get("skipped_steps", 0.0) > 0:
                    logger.warning(
                        "epoch %d iter %d: %d non-finite step(s) skipped so "
                        "far (%d consecutive)", epoch, it,
                        int(losses_f["skipped_steps"]), int(consec))
                if consec >= MAX_CONSECUTIVE_NONFINITE // 2:
                    raise RuntimeError(
                        f"{int(consec)} consecutive non-finite gradient steps "
                        f"(SKIP_NONFINITE guard); aborting before "
                        f"apply_if_finite(max_consecutive_errors="
                        f"{MAX_CONSECUTIVE_NONFINITE}) would apply a "
                        f"non-finite update. See docs/STATUS.md for the "
                        f"known B>=2 bf16+BN anomaly and mitigations.")
                elapsed = time.time() - window_start
                meters.update(
                    batch_time=(elapsed - window_data) / window_steps,
                    data_time=window_data / window_steps, **losses_f)
                logger.info("epoch %d iter %d/%d  %s", epoch, it,
                            steps_per_epoch, meters)
                window_start = time.time()
                window_data = 0.0
                window_steps = 0
            tic = time.time()
        # final sync so the epoch boundary is real
        if window_steps == 0 and not meters.summary:
            logger.warning("epoch %d: train loader yielded zero batches "
                           "(dataset smaller than batch size?)", epoch)
        meters.update(**{k: float(v) for k, v in losses.items()})
        tb.add_scalars(meters.summary, epoch, prefix="train/")

        # ---- validation --------------------------------------------------
        if cfg.TRAIN.VAL_PERIOD and (epoch + 1) % cfg.TRAIN.VAL_PERIOD == 0 \
                and len(val_loader) > 0:
            vmeters = MetricLogger()
            for it, batch in enumerate(val_loader):
                if max_steps_per_epoch and it >= max_steps_per_epoch:
                    break
                batch = {k: batch[k] for k in ("images", "cams", "gt_depth")}
                _, losses, metrics = eval_fns[is_flow](state, shard_batch(batch, mesh))
                vmeters.update(**{k: float(v) for k, v in losses.items()},
                               **{k: float(v) for k, v in metrics.items()})
            logger.info("epoch %d VAL  %s", epoch, vmeters)
            tb.add_scalars(vmeters.summary, epoch, prefix="val/")

        if (epoch + 1) % cfg.TRAIN.CHECKPOINT_PERIOD == 0 \
                or epoch + 1 == cfg.SCHEDULER.MAX_EPOCH:
            checkpointer.save(state, epoch)
            logger.info("saved checkpoint for epoch %d", epoch)

    tb.close()
    checkpointer.close()
    return state


def main(argv=None):
    from pointmvsnet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    args = parse_args(argv)
    cfg = load_cfg_from_file(args.cfg)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    output_dir = cfg.OUTPUT_DIR
    if output_dir == "@":
        stem = os.path.splitext(os.path.basename(args.cfg))[0]
        output_dir = os.path.join("outputs", stem)
    os.makedirs(output_dir, exist_ok=True)
    logger = setup_logger("pointmvsnet_tpu", output_dir)
    logger.info("devices: %s", jax.devices())
    logger.info("config:\n%s", cfg.dump())
    np.random.seed(cfg.RNG_SEED)
    train(cfg, output_dir)


if __name__ == "__main__":
    main()
