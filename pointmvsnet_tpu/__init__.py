"""pointmvsnet_tpu — a TPU-native multi-view-stereo framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the public
``callmeray/PointMVSNet`` repository (Point-Based Multi-View Stereo Network,
ICCV 2019, arXiv:1908.04422):

* coarse plane-sweep stage: differentiable homography warping, variance-based
  multi-view cost aggregation, 3D-CNN cost-volume regularization, soft-argmin
  depth regression (reference: ``pointmvsnet/model.py :: PointMVSNet`` coarse
  branch);
* PointFlow stage: iterative point-based depth refinement with windowed 3D kNN
  + DGCNN-style edge convolutions, replacing the reference's custom CUDA
  ``gather_knn`` op (reference: ``pointmvsnet/functions/functions.py``,
  ``pointmvsnet/ops/``) with Pallas TPU kernels;
* the surrounding framework: yacs-compatible config system, DTU / Tanks &
  Temples data plane, optax training engine, orbax checkpointing, mesh/pjit
  data parallelism, MVSNet-format eval artifact export, and depth fusion.

NOTE ON CITATIONS: ``/root/reference`` was empty at build time (see
``SURVEY.md`` §0); reference anchors throughout this package are given as
``path :: Symbol`` greppable anchors into the *public* repo layout, not
``file:line``.
"""

__version__ = "0.1.0"

from pointmvsnet_tpu.config import CfgNode, get_default_cfg, load_cfg_from_file

__all__ = [
    "CfgNode",
    "get_default_cfg",
    "load_cfg_from_file",
    "__version__",
]
