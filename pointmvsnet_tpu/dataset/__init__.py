"""Data plane: MVSNet-format I/O, preprocessing, and dataset loaders.

Reference counterparts: ``pointmvsnet/dataset/dtu.py``,
``pointmvsnet/utils/preprocess.py`` (see SURVEY.md §2.2/§2.3). Formats are
defined by the MVSNet data release (arXiv:1804.02505 §3).
"""

from pointmvsnet_tpu.dataset.io import (
    load_cam,
    load_pair,
    load_pfm,
    write_cam,
    write_pfm,
)
from pointmvsnet_tpu.dataset.build import build_data_loader

__all__ = [
    "load_cam",
    "load_pair",
    "load_pfm",
    "write_cam",
    "write_pfm",
    "build_data_loader",
]
