"""Model zoo + build factory.

Reference counterpart: ``pointmvsnet/model.py :: build_pointmvsnet``
(SURVEY.md §2.10), generalized into a small registry so additional model
families (e.g. the coarse-only MVSNet) are first-class.
"""

from __future__ import annotations

import functools

from typing import Callable, Dict, Tuple

import jax.numpy as jnp

from pointmvsnet_tpu.models.pointmvsnet import PointFlow, PointMVSNet
from pointmvsnet_tpu.models.image_conv import ImageConv
from pointmvsnet_tpu.models.volume_conv import VolumeConv
from pointmvsnet_tpu.models.edge_conv import EdgeConv
from pointmvsnet_tpu.models.loss import pointmvsnet_loss, pointmvsnet_metrics

MODEL_REGISTRY: Dict[str, Callable] = {}


def register_model(name: str):
    def deco(fn):
        MODEL_REGISTRY[name] = fn
        return fn
    return deco


def _dtype(cfg) -> jnp.dtype:
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[cfg.MODEL.DTYPE]


@register_model("pointmvsnet")
def build_pointmvsnet(cfg, band_mesh=None,
                      view_mesh=None) -> Tuple[PointMVSNet, Callable, Callable]:
    """cfg → (model, loss_fn, metric_fn) — the reference's build triple.

    ``band_mesh``: optional Mesh with a "band" axis — shards the flow row
    bands across chips for single-map eval latency (PARALLEL.BAND).
    ``view_mesh``: optional Mesh with a "view" axis — shards the coarse
    cost volume's view moments across chips (PARALLEL.VIEW)."""
    model = PointMVSNet(
        img_base_channels=cfg.MODEL.IMG_BASE_CHANNELS,
        vol_base_channels=cfg.MODEL.VOL_BASE_CHANNELS,
        edge_channels=tuple(cfg.MODEL.EDGE_CHANNELS),
        flow_channels=tuple(cfg.MODEL.FLOW_CHANNELS),
        flow_m=cfg.MODEL.FLOW_INTERVAL_M,
        knn=cfg.MODEL.KNN,
        knn_window=cfg.MODEL.KNN_WINDOW,
        norm=cfg.MODEL.NORM,
        dtype=_dtype(cfg),
        knn_impl=cfg.MODEL.KNN_IMPL,
        flow_chunk_rows=cfg.MODEL.FLOW_CHUNK_ROWS,
        remat=cfg.MODEL.REMAT,
        remat_save=tuple(cfg.MODEL.REMAT_SAVE),
        band_mesh=band_mesh,
        view_mesh=view_mesh,
        flow_fetch=cfg.MODEL.FLOW_FETCH,
        coarse_fetch=cfg.MODEL.COARSE_FETCH,
        flow_moments=cfg.MODEL.FLOW_MOMENTS,
        flow_src_dtype=(jnp.dtype(cfg.MODEL.FLOW_SRC_DTYPE)
                        if cfg.MODEL.FLOW_SRC_DTYPE else None),
    )
    loss_fn = functools.partial(pointmvsnet_loss,
                                valid_threshold=cfg.MODEL.VALID_THRESHOLD
                                if cfg.MODEL.MASKED_LOSS else 0.0)
    return model, loss_fn, pointmvsnet_metrics


@register_model("mvsnet")
def build_mvsnet(cfg, band_mesh=None, view_mesh=None):
    """Coarse-only family (plane-sweep MVSNet, arXiv:1804.02505): the same
    architecture run with PointFlow permanently off — the engine passes
    ``is_flow=False`` whenever ``cfg.MODEL.NAME == "mvsnet"``."""
    return build_pointmvsnet(cfg, band_mesh, view_mesh)


def build_model(cfg, band_mesh=None, view_mesh=None):
    name = cfg.MODEL.NAME
    if name not in MODEL_REGISTRY:
        raise KeyError(f"Unknown MODEL.NAME {name!r}; have {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name](cfg, band_mesh, view_mesh)


__all__ = [
    "PointMVSNet", "PointFlow", "ImageConv", "VolumeConv", "EdgeConv",
    "pointmvsnet_loss", "pointmvsnet_metrics",
    "build_model", "build_pointmvsnet", "build_mvsnet", "MODEL_REGISTRY",
    "register_model",
]
