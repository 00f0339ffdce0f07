"""Evaluation / depth-map export entry point.

Reference counterpart: ``pointmvsnet/test.py`` (SURVEY.md §2.17, §3.2):
``python -m pointmvsnet_tpu.test --cfg configs/dtu_wde3.yaml TEST.WEIGHT <ckpt>``

No-grad loop over the test split at eval settings (V=5, D=96, 640×512),
per-batch metrics when GT exists, MVSNet-format artifact export for the
fusion stage. Downstream (fusion → point-cloud metrics) lives in
``pointmvsnet_tpu/fusion.py``.
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Optional

import jax
import numpy as np

from pointmvsnet_tpu.config import load_cfg_from_file
from pointmvsnet_tpu.dataset.build import build_data_loader
from pointmvsnet_tpu.models import build_model
from pointmvsnet_tpu.parallel import (
    create_train_state,
    make_eval_step,
    make_mesh,
    replicate,
    shard_batch,
)
from pointmvsnet_tpu.utils.checkpoint import Checkpointer
from pointmvsnet_tpu.utils.eval_file_logger import eval_file_logger
from pointmvsnet_tpu.utils.logger import setup_logger
from pointmvsnet_tpu.utils.metric_logger import MetricLogger
from pointmvsnet_tpu.utils.solver import build_optimizer


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Point-MVSNet TPU evaluation")
    p.add_argument("--cfg", required=True)
    p.add_argument("opts", nargs=argparse.REMAINDER)
    return p.parse_args(argv)


def test(cfg, output_dir: str, max_batches: Optional[int] = None, mesh=None):
    logger = setup_logger("pointmvsnet_tpu.test", output_dir)
    band = max(1, cfg.PARALLEL.BAND)
    view = max(1, cfg.PARALLEL.VIEW)
    if mesh is None:
        # Clamp the eval mesh to the batch size: shard_batch with P("data")
        # needs the leading dim divisible by the mesh; TEST.BATCH_SIZE is
        # typically 1 while PARALLEL.DATA=-1 would grab every device.
        n_dev = len(jax.devices()) if cfg.PARALLEL.DATA == -1 else cfg.PARALLEL.DATA
        data = min(max(1, n_dev // (band * view)), max(1, cfg.TEST.BATCH_SIZE))
        if band > 1 or view > 1:
            from pointmvsnet_tpu.parallel import make_mesh_eval
            mesh = make_mesh_eval(data, band, view)
        else:
            mesh = make_mesh(data)
    band_mesh = mesh if band > 1 and "band" in mesh.axis_names else None
    view_mesh = mesh if view > 1 and "view" in mesh.axis_names else None
    model, loss_fn, metric_fn = build_model(cfg, band_mesh=band_mesh,
                                            view_mesh=view_mesh)
    loader = build_data_loader(cfg, "test")

    kwargs = dict(
        is_flow=cfg.MODEL.NAME != "mvsnet",
        img_scales=tuple(cfg.MODEL.TEST.IMG_SCALES),
        inter_scales=tuple(cfg.MODEL.TEST.INTER_SCALES),
        num_virtual_plane=cfg.DATA.TEST.NUM_VIRTUAL_PLANE,
    )

    example = next(iter(loader))
    optimizer = build_optimizer(cfg, 1)
    state = create_train_state(
        model, optimizer, jax.random.PRNGKey(cfg.RNG_SEED),
        {k: example[k] for k in ("images", "cams")},
        dict(kwargs, img_scales=kwargs["img_scales"][:1],
             inter_scales=kwargs["inter_scales"][:1]))
    ckpt_dir = os.path.join(output_dir, "checkpoints")
    checkpointer = Checkpointer(ckpt_dir)
    state, _ = checkpointer.load(state, resume=not cfg.TEST.WEIGHT,
                                 path=cfg.TEST.WEIGHT)
    state = replicate(state, mesh)

    eval_step = make_eval_step(model, loss_fn, metric_fn, mesh, kwargs)
    meters = MetricLogger()
    depth_dir = os.path.join(output_dir, "depths")
    os.makedirs(depth_dir, exist_ok=True)

    n_maps = 0
    t_start = time.time()
    for it, batch in enumerate(loader):
        if max_batches and it >= max_batches:
            break
        dev_batch = {k: batch[k] for k in ("images", "cams", "gt_depth")
                     if k in batch}
        preds, losses, metrics = eval_step(state, shard_batch(dev_batch, mesh))
        preds = jax.device_get(preds)
        for b in range(np.asarray(batch["images"]).shape[0]):
            eval_file_logger(batch, preds, depth_dir, batch_index=b)
            n_maps += 1
        meters.update(**{k: float(v) for k, v in losses.items()},
                      **{k: float(v) for k, v in metrics.items()})
        if it % cfg.TEST.LOG_PERIOD == 0:
            logger.info("test iter %d/%d  %s", it, len(loader), meters)
    elapsed = time.time() - t_start
    if n_maps:
        logger.info("exported %d depth maps in %.1fs (%.3f maps/s)",
                    n_maps, elapsed, n_maps / elapsed)
    checkpointer.close()
    return meters.summary, depth_dir


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
    test(cfg, output_dir)


if __name__ == "__main__":
    main()
