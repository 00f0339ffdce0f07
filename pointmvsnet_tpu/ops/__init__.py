"""Compute ops: geometry, sampling, cost volumes, kNN/EdgeConv kernels.

This layer replaces the reference's L1/L3 compute internals
(``pointmvsnet/utils/feature_fetcher.py``, ``pointmvsnet/functions/``,
``pointmvsnet/ops/`` CUDA — SURVEY.md §2.6/§2.9) with pure-JAX ops plus
Pallas TPU kernels for the hot paths.
"""

from pointmvsnet_tpu.ops.geometry import (
    cam_depth_range,
    cam_extrinsics,
    cam_intrinsics,
    depth_hypotheses,
    pixel_grid,
    project_points,
    unproject_pixels,
)
from pointmvsnet_tpu.ops.sampling import bilinear_sample, fetch_features
from pointmvsnet_tpu.ops.cost_volume import (
    depth_regression,
    photometric_confidence,
    plane_sweep_volume,
)

__all__ = [
    "cam_depth_range",
    "cam_extrinsics",
    "cam_intrinsics",
    "depth_hypotheses",
    "pixel_grid",
    "project_points",
    "unproject_pixels",
    "bilinear_sample",
    "fetch_features",
    "plane_sweep_volume",
    "depth_regression",
    "photometric_confidence",
]
