"""MVSNet-format file I/O: PFM depth maps, cam.txt cameras, pair.txt view lists.

Reference counterpart: ``pointmvsnet/utils/preprocess.py :: load_cam_dtu,
load_pfm, write_pfm`` (SURVEY.md §2.3). The on-disk formats are specified by
the MVSNet data release (arXiv:1804.02505 §3 / Yao Yao's preprocessed DTU):

cam.txt::

    extrinsic
    <4x4 world-to-camera matrix, row-major, 4 lines>
    (blank)
    intrinsic
    <3x3 K matrix, 3 lines>
    (blank)
    DEPTH_MIN DEPTH_INTERVAL [NUM_DEPTH DEPTH_MAX]

The in-memory camera layout mirrors the reference's ``(2, 4, 4)`` array:
``cam[0] = extrinsic (4,4)``; ``cam[1, :3, :3] = K``;
``cam[1, 3, 0] = depth_min``; ``cam[1, 3, 1] = depth_interval``;
``cam[1, 3, 2] = num_depth``; ``cam[1, 3, 3] = depth_max``.

PFM: header ``Pf`` (1-channel) / ``PF`` (3-channel), ``width height`` line,
scale line (sign encodes endianness), rows stored bottom-up.
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Tuple

import numpy as np

_NATIVE = None


def _native():
    """The C++ data plane, if built (bit-exact equivalent — tests/test_native).
    Disable with PMVS_NO_NATIVE=1."""
    global _NATIVE
    if _NATIVE is None:
        if os.environ.get("PMVS_NO_NATIVE"):
            _NATIVE = False
        else:
            try:
                from pointmvsnet_tpu import native as n
                _NATIVE = n if n.available() else False
            except Exception:
                _NATIVE = False
    return _NATIVE


# ---------------------------------------------------------------------------
# PFM
# ---------------------------------------------------------------------------

def load_pfm(path: str) -> np.ndarray:
    """Read a PFM file → float32 array (H, W) or (H, W, 3), top-down rows."""
    n = _native()
    if n:
        try:
            return n.load_pfm(path)
        except RuntimeError:
            pass  # re-parse in python for a precise exception
    return _load_pfm_py(path)


def _load_pfm_py(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        header = f.readline().rstrip()
        if header == b"PF":
            channels = 3
        elif header == b"Pf":
            channels = 1
        else:
            raise ValueError(f"Not a PFM file: {path!r} (header {header!r})")
        dim_line = f.readline()
        while dim_line.startswith(b"#"):  # tolerate comment lines
            dim_line = f.readline()
        m = re.match(rb"^\s*(\d+)\s+(\d+)\s*$", dim_line)
        if not m:
            raise ValueError(f"Malformed PFM dimension line in {path!r}: {dim_line!r}")
        width, height = int(m.group(1)), int(m.group(2))
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.frombuffer(f.read(width * height * channels * 4), dtype=endian + "f4")
    data = data.reshape(height, width, channels) if channels == 3 else data.reshape(height, width)
    # PFM stores rows bottom-to-top.
    data = np.flipud(data).astype(np.float32)
    if scale not in (0.0, -1.0, 1.0):
        data = data * abs(scale)
    return np.ascontiguousarray(data)


def write_pfm(path: str, image: np.ndarray, scale: float = 1.0) -> None:
    """Write a float32 array (H, W) or (H, W, 1|3) as little-endian PFM."""
    image = np.asarray(image, dtype=np.float32)
    if image.ndim == 3 and image.shape[2] == 1:
        image = image[:, :, 0]
    if image.ndim == 3 and image.shape[2] == 3:
        header = b"PF"
    elif image.ndim == 2:
        header = b"Pf"
    else:
        raise ValueError(f"PFM supports (H,W) or (H,W,3); got {image.shape}")
    with open(path, "wb") as f:
        f.write(header + b"\n")
        f.write(f"{image.shape[1]} {image.shape[0]}\n".encode())
        f.write(f"{-abs(scale)}\n".encode())  # negative → little-endian
        np.flipud(image).astype("<f4").tofile(f)


# ---------------------------------------------------------------------------
# Cameras
# ---------------------------------------------------------------------------

def load_cam(path: str, interval_scale: float = 1.0,
             num_depth: int | None = None, max_d: int = 0) -> np.ndarray:
    """Parse an MVSNet ``*_cam.txt`` → (2, 4, 4) float32 camera.

    ``interval_scale`` multiplies the depth interval (reference behavior:
    ``DATA.*.INTERVAL_SCALE``). If the file's depth line has fewer than 4
    numbers, ``num_depth``/``max_d`` fill in the hypothesis count and
    ``depth_max`` is derived as ``depth_min + (num_depth-1) * interval``.
    """
    n = _native()
    if n:
        nd = num_depth if num_depth is not None else (max_d or 0)
        try:
            return n.load_cam(path, interval_scale, int(nd))
        except RuntimeError:
            pass  # re-parse in python for a precise exception
    return _load_cam_py(path, interval_scale, num_depth, max_d)


def _load_cam_py(path: str, interval_scale: float = 1.0,
                 num_depth: int | None = None, max_d: int = 0) -> np.ndarray:
    with open(path, "r") as f:
        words = f.read().split()
    cam = np.zeros((2, 4, 4), dtype=np.float32)
    try:
        ei = words.index("extrinsic")
        vals = [float(w) for w in words[ei + 1: ei + 17]]
        cam[0] = np.array(vals, dtype=np.float32).reshape(4, 4)
        ki = words.index("intrinsic")
        vals = [float(w) for w in words[ki + 1: ki + 10]]
        cam[1, :3, :3] = np.array(vals, dtype=np.float32).reshape(3, 3)
        depth_words = words[ki + 10:]
    except (ValueError, IndexError) as e:
        raise ValueError(f"Malformed cam file {path!r}") from e

    nums = [float(w) for w in depth_words]
    if len(nums) >= 1:
        cam[1, 3, 0] = nums[0]                        # depth_min
    if len(nums) >= 2:
        cam[1, 3, 1] = nums[1] * interval_scale       # depth_interval
    if len(nums) >= 4:
        cam[1, 3, 2] = nums[2]                        # num_depth
        cam[1, 3, 3] = nums[3]                        # depth_max
    elif num_depth is not None or max_d:
        nd = float(num_depth if num_depth is not None else max_d)
        cam[1, 3, 2] = nd
        cam[1, 3, 3] = cam[1, 3, 0] + (nd - 1) * cam[1, 3, 1]
    return cam


def write_cam(path: str, cam: np.ndarray) -> None:
    """Write a (2, 4, 4) camera in MVSNet cam.txt format (reference
    ``eval_file_logger`` emits these for the fusion step)."""
    cam = np.asarray(cam)
    lines = ["extrinsic"]
    for r in range(4):
        lines.append(" ".join(repr(float(v)) for v in cam[0, r]))
    lines.append("")
    lines.append("intrinsic")
    for r in range(3):
        lines.append(" ".join(repr(float(v)) for v in cam[1, r, :3]))
    lines.append("")
    lines.append(" ".join(repr(float(v)) for v in cam[1, 3]))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


# ---------------------------------------------------------------------------
# View-pair lists
# ---------------------------------------------------------------------------

def load_pair(path: str) -> Dict[int, List[Tuple[int, float]]]:
    """Parse ``pair.txt`` → {ref_view: [(src_view, score), ...] best-first}.

    Format (MVSNet data release)::

        NUM_VIEWPOINTS
        ref_id
        NUM_SRC src0 score0 src1 score1 ...
        ...
    """
    with open(path, "r") as f:
        words = f.read().split()
    n = int(words[0])
    out: Dict[int, List[Tuple[int, float]]] = {}
    i = 1
    for _ in range(n):
        ref = int(words[i]); i += 1
        k = int(words[i]); i += 1
        srcs = []
        for _ in range(k):
            srcs.append((int(words[i]), float(words[i + 1])))
            i += 2
        out[ref] = srcs
    return out
