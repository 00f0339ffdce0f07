"""Device mesh construction and batch sharding helpers."""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over ICI (axis name "data").

    ``data=-1`` → all visible devices. The model is small (≈1 M params);
    batch/scan parallelism is the only profitable axis at this scale
    (SURVEY.md §2.12) — parameters are replicated, gradients all-reduced.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices) if data == -1 else data
    return Mesh(np.asarray(devices[:n]).reshape(n), ("data",))


def make_mesh_2d(data: int = 1, band: int = 1,
                 devices: Optional[Sequence] = None) -> Mesh:
    """("data", "band") mesh: batch sharding × band-parallel PointFlow
    (the flow row-bands are independent given the shared feature pyramid,
    so splitting them over chips divides single-map flow latency — the
    spatial/sequence-parallel axis of this model, SURVEY.md §5)."""
    if devices is None:
        devices = jax.devices()
    assert data * band <= len(devices), (
        f"mesh {data}x{band} needs {data * band} devices, "
        f"have {len(devices)}")
    dev = np.asarray(devices[:data * band]).reshape(data, band)
    return Mesh(dev, ("data", "band"))


def make_mesh_eval(data: int = 1, band: int = 1, view: int = 1,
                   devices: Optional[Sequence] = None) -> Mesh:
    """("data", "band", "view") eval mesh — the three parallel axes of
    this model: batch over scans, flow row-bands of one map, and source
    views of the cost volume (PARALLEL.{DATA,BAND,VIEW}). Size-1 axes are
    legal, so this subsumes the 1-D/2-D cases."""
    if devices is None:
        devices = jax.devices()
    n = data * band * view
    assert n <= len(devices), (
        f"mesh {data}x{band}x{view} needs {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(data, band, view)
    return Mesh(dev, ("data", "band", "view"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Device-put a host batch with the leading dim split over "data"."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Device-put a pytree fully replicated over the mesh."""
    s = replicate_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
