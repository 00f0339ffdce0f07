"""Serving front-end: a shape-cached, pre-jitted depth predictor.

No reference counterpart (the reference has no serving layer — SURVEY.md
§1); this is the framework's production inference API:

    pred = Predictor(cfg, checkpoint_dir="outputs/dtu_wde3/checkpoints")
    out = pred(images, cams)          # numpy in → numpy out
    out["depth"], out["confidence"]

Handles host-side preprocessing (stride-64 crop + per-image normalization
if requested), jit-compiles once per input shape and caches the
executable, and keeps everything else on device.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np

from pointmvsnet_tpu.dataset.preprocess import crop_mvs_input, norm_image
from pointmvsnet_tpu.models import build_model
from pointmvsnet_tpu.parallel import create_train_state
from pointmvsnet_tpu.utils.checkpoint import Checkpointer
from pointmvsnet_tpu.utils.solver import build_optimizer


class Predictor:
    def __init__(self, cfg, checkpoint_dir: str = "", weight_path: str = "",
                 normalize: bool = True, mesh=None):
        """``mesh``: optional eval mesh (``make_mesh_eval``) — a "band"
        and/or "view" axis parallelizes each prediction across chips."""
        self.cfg = cfg
        self.normalize = normalize
        band_mesh = mesh if mesh is not None and "band" in mesh.axis_names \
            and mesh.shape["band"] > 1 else None
        view_mesh = mesh if mesh is not None and "view" in mesh.axis_names \
            and mesh.shape["view"] > 1 else None
        self.model, _, _ = build_model(cfg, band_mesh=band_mesh,
                                       view_mesh=view_mesh)
        self.kwargs = dict(
            is_flow=cfg.MODEL.NAME != "mvsnet",
            img_scales=tuple(cfg.MODEL.TEST.IMG_SCALES),
            inter_scales=tuple(cfg.MODEL.TEST.INTER_SCALES),
            num_virtual_plane=cfg.DATA.TEST.NUM_VIRTUAL_PLANE,
        )
        self._fns: Dict[Tuple[int, ...], callable] = {}
        self._variables = None
        self._ckpt = (checkpoint_dir, weight_path)

    def _init_variables(self, images: np.ndarray, cams: np.ndarray):
        init_kwargs = dict(self.kwargs,
                           img_scales=self.kwargs["img_scales"][:1],
                           inter_scales=self.kwargs["inter_scales"][:1])
        opt = build_optimizer(self.cfg, 1)
        state = create_train_state(
            self.model, opt, jax.random.PRNGKey(self.cfg.RNG_SEED),
            {"images": images, "cams": cams}, init_kwargs)
        ckpt_dir, weight = self._ckpt
        if ckpt_dir or weight:
            cp = Checkpointer(ckpt_dir or ".")
            state, _ = cp.load(state, resume=bool(ckpt_dir), path=weight)
            cp.close()
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        return variables

    def _fn(self, shape):
        if shape not in self._fns:
            kwargs = self.kwargs
            self._fns[shape] = jax.jit(
                lambda var, im, cm: self.model.apply(var, im, cm,
                                                     train=False, **kwargs))
        return self._fns[shape]

    def __call__(self, images: np.ndarray, cams: np.ndarray) -> Dict[str, np.ndarray]:
        """images (V, H, W, 3) float or uint8; cams (V, 2, 4, 4) → dict with
        ``depth`` (h, w), ``confidence`` (hc, wc) and every raw stage."""
        images = np.asarray(images, np.float32)
        cams = np.asarray(cams, np.float32)
        imgs, cms = crop_mvs_input(list(images), list(cams),
                                   images.shape[1], images.shape[2], base=64)
        if self.normalize:
            imgs = [norm_image(im) for im in imgs]
        batch_imgs = np.stack(imgs)[None]
        batch_cams = np.stack(cms)[None]
        if self._variables is None:
            self._variables = self._init_variables(batch_imgs, batch_cams)
        fn = self._fn(batch_imgs.shape)
        preds = fn(self._variables, batch_imgs, batch_cams)
        preds = {k: np.asarray(v)[0] for k, v in preds.items()}
        flow_keys = sorted(k for k in preds
                           if k.startswith("flow") and not k.endswith("_input"))
        final = flow_keys[-1] if flow_keys else "coarse_depth_map"
        preds["depth"] = preds[final]
        preds["confidence"] = preds["coarse_prob_map"]
        return preds
