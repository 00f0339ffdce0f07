"""Post-processing: multi-view depth fusion → point cloud → metrics.

The reference stops at per-view depth maps and defers to external tools
(modified fusibile/Gipuma for fusion, DTU MATLAB for point-cloud metrics —
SURVEY.md §2.19). This package brings both in-repo: a vectorized
visibility/consistency fusion and chamfer-style accuracy/completeness
metrics, so the full paper pipeline runs end-to-end here.
"""

from pointmvsnet_tpu.postprocess.fusion import fuse_depth_maps
from pointmvsnet_tpu.postprocess.ply import read_ply, write_ply
from pointmvsnet_tpu.postprocess.metrics import (
    apply_obs_mask,
    apply_plane_mask,
    point_cloud_metrics,
)

__all__ = ["fuse_depth_maps", "write_ply", "read_ply", "point_cloud_metrics",
           "apply_obs_mask", "apply_plane_mask"]
