"""ctypes bindings for the native C++ data plane.

Builds ``libdataplane.so`` from ``src/dataplane.cpp`` on first use (g++,
no external deps) and exposes PFM/cam loading, standardization, and the
parallel batch PFM loader. Falls back cleanly: callers must check
``available()`` and use the pure-Python ``dataset.io`` otherwise.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "dataplane.cpp")
_LIB = os.path.join(_HERE, "libdataplane.so")

_HASH = _LIB + ".srchash"

_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _src_hash() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _build() -> Optional[str]:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-o", _LIB, _SRC, "-lpthread"],
            check=True, capture_output=True, text=True, timeout=120)
        with open(_HASH, "w") as f:
            f.write(_src_hash())
        return None
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired) as e:
        return getattr(e, "stderr", str(e)) or str(e)


def _stale() -> bool:
    # Content-hash gate: a .so not built from the current source on this
    # machine (foreign binary, different ISA, edited source) is always
    # rebuilt — mtime comparisons can't catch a foreign/stale binary.
    if not os.path.isfile(_LIB) or not os.path.isfile(_HASH):
        return True
    with open(_HASH) as f:
        return f.read().strip() != _src_hash()


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    if _lib is not None:
        return _lib
    if _stale():
        _build_error = _build()
        if _build_error:
            return None
    lib = ctypes.CDLL(_LIB)
    lib.pfm_shape.argtypes = [ctypes.c_char_p] + [ctypes.POINTER(ctypes.c_int)] * 3
    lib.pfm_load.argtypes = [ctypes.c_char_p,
                             np.ctypeslib.ndpointer(np.float32, flags="C"),
                             ctypes.c_int64]
    lib.pfm_load_batch.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                   ctypes.c_int64,
                                   np.ctypeslib.ndpointer(np.float32, flags="C"),
                                   ctypes.c_int]
    lib.cam_load.argtypes = [ctypes.c_char_p,
                             np.ctypeslib.ndpointer(np.float32, flags="C"),
                             ctypes.c_double, ctypes.c_int]
    lib.image_standardize.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C"),
        ctypes.c_int64, ctypes.c_int]
    lib.resize_nearest.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C"),
        ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32, flags="C"),
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    for fn in ["pfm_shape", "pfm_load", "pfm_load_batch", "cam_load",
               "image_standardize", "resize_nearest"]:
        getattr(lib, fn).restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


def _check(rc: int, what: str) -> None:
    if rc != 0:
        raise RuntimeError(f"native {what} failed with code {rc}")


def load_pfm(path: str) -> np.ndarray:
    lib = _load()
    assert lib is not None
    h, w, c = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
    _check(lib.pfm_shape(path.encode(), ctypes.byref(h), ctypes.byref(w),
                         ctypes.byref(c)), f"pfm_shape({path})")
    shape = (h.value, w.value) if c.value == 1 else (h.value, w.value, c.value)
    out = np.empty(shape, np.float32)
    _check(lib.pfm_load(path.encode(), out.reshape(-1), out.size),
           f"pfm_load({path})")
    return out


def load_pfm_batch(paths: List[str], height: int, width: int,
                   channels: int = 1, n_threads: int = 0) -> np.ndarray:
    """Parallel load of same-shaped PFMs → (N, H, W[, C]) float32."""
    lib = _load()
    assert lib is not None
    n = len(paths)
    plane = height * width * channels
    out = np.empty((n, plane), np.float32)
    blob = b"\0".join(p.encode() for p in paths) + b"\0"
    _check(lib.pfm_load_batch(blob, n, plane, out, n_threads), "pfm_load_batch")
    shape = (n, height, width) if channels == 1 else (n, height, width, channels)
    return out.reshape(shape)


def load_cam(path: str, interval_scale: float = 1.0,
             num_depth: int = 0) -> np.ndarray:
    lib = _load()
    assert lib is not None
    out = np.empty(32, np.float32)
    _check(lib.cam_load(path.encode(), out, interval_scale, num_depth),
           f"cam_load({path})")
    return out.reshape(2, 4, 4)


def standardize(img: np.ndarray) -> np.ndarray:
    """In-place per-channel standardization of (H, W, C) float32."""
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.float32)
    h, w = img.shape[:2]
    c = img.shape[2] if img.ndim == 3 else 1
    _check(lib.image_standardize(img.reshape(-1), h * w, c), "standardize")
    return img


def resize_nearest(img: np.ndarray, dh: int, dw: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.float32)
    sh, sw = img.shape[:2]
    c = img.shape[2] if img.ndim == 3 else 1
    out = np.empty((dh, dw, c) if img.ndim == 3 else (dh, dw), np.float32)
    _check(lib.resize_nearest(img.reshape(-1), sh, sw, out.reshape(-1),
                              dh, dw, c), "resize_nearest")
    return out
