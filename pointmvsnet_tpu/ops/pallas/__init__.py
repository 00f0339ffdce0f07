"""Pallas TPU kernels for the hot ops.

These replace the reference's CUDA extension (``pointmvsnet/ops/`` —
SURVEY.md §2.9) *and* the XLA fallbacks in ``ops/knn.py`` where profiling
showed XLA's generic lowering leaves bandwidth on the table (windowed kNN:
the 125-candidate distance tensor round-trips HBM; here it lives in VMEM).
"""

from pointmvsnet_tpu.ops.pallas.knn import pallas_window_knn

__all__ = ["pallas_window_knn"]
