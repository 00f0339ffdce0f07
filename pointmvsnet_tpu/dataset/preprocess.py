"""Image/camera preprocessing (reference ``pointmvsnet/utils/preprocess.py``,
SURVEY.md §2.3): per-image normalization, camera/image scaling, stride
crops, depth masking, and GT depth pyramids.

All functions are pure numpy (runs in loader workers / the native data plane,
never on TPU).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is present in the target image
    cv2 = None


def norm_image(img: np.ndarray) -> np.ndarray:
    """Per-image, per-channel standardization: (x - mean) / std.

    Reference ``preprocess.py :: norm_image`` (MVSNet ``center_image``):
    statistics are computed over H×W independently per channel.
    """
    img = np.asarray(img, dtype=np.float32)
    axis = (0, 1)
    mean = img.mean(axis=axis, keepdims=True)
    # MVSNet uses np.var + sqrt with eps guard; match that.
    var = img.var(axis=axis, keepdims=True)
    return (img - mean) / (np.sqrt(var) + 1e-7)


def scale_camera(cam: np.ndarray, scale: float | Tuple[float, float]) -> np.ndarray:
    """Scale intrinsics for an image resize by ``scale`` (sx, sy).

    fx, s, cx scale by sx; fy, cy by sy. Extrinsics and depth range untouched.
    """
    sx, sy = (scale, scale) if np.isscalar(scale) else scale
    out = cam.copy()
    out[1, 0, :3] = cam[1, 0, :3] * sx
    out[1, 1, :3] = cam[1, 1, :3] * sy
    return out


def scale_image(img: np.ndarray, scale: float, interpolation: str = "linear") -> np.ndarray:
    """Resize by a scale factor (cv2 semantics to match the reference's
    cv2.resize pipeline; falls back to numpy nearest if cv2 missing)."""
    h, w = img.shape[:2]
    nw, nh = int(round(w * scale)), int(round(h * scale))
    return resize_image(img, (nh, nw), interpolation)


def resize_image(img: np.ndarray, shape_hw: Tuple[int, int], interpolation: str = "linear") -> np.ndarray:
    nh, nw = shape_hw
    if cv2 is not None:
        interp = {"linear": cv2.INTER_LINEAR, "nearest": cv2.INTER_NEAREST,
                  "area": cv2.INTER_AREA}[interpolation]
        out = cv2.resize(img, (nw, nh), interpolation=interp)
        return out
    # nearest fallback
    h, w = img.shape[:2]
    ys = np.clip((np.arange(nh) * h / nh).astype(np.int64), 0, h - 1)
    xs = np.clip((np.arange(nw) * w / nw).astype(np.int64), 0, w - 1)
    return img[ys][:, xs]


def scale_mvs_input(images: Sequence[np.ndarray], cams: Sequence[np.ndarray],
                    scale: float) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """Jointly scale all views' images and intrinsics (reference
    ``scale_mvs_input``)."""
    out_imgs = [scale_image(im, scale) for im in images]
    out_cams = [scale_camera(c, scale) for c in cams]
    return out_imgs, out_cams


def crop_mvs_input(images: Sequence[np.ndarray], cams: Sequence[np.ndarray],
                   max_h: int, max_w: int, base: int = 64,
                   depths: Sequence[np.ndarray] | None = None):
    """Center-crop every view to stride-divisible dims ≤ (max_h, max_w),
    adjusting principal points (reference ``crop_dtu_input``).

    ``base`` is the required divisibility (coarse stage downsamples 8×, flow
    up to full res ⇒ 64 keeps every scale integral).
    """
    h, w = images[0].shape[:2]
    new_h = min(max_h, h) // base * base
    new_w = min(max_w, w) // base * base
    start_h = (h - new_h) // 2
    start_w = (w - new_w) // 2
    out_imgs, out_cams = [], []
    for im, cam in zip(images, cams):
        out_imgs.append(im[start_h:start_h + new_h, start_w:start_w + new_w])
        c = cam.copy()
        c[1, 0, 2] -= start_w
        c[1, 1, 2] -= start_h
        out_cams.append(c)
    if depths is not None:
        out_depths = [d[start_h:start_h + new_h, start_w:start_w + new_w] for d in depths]
        return out_imgs, out_cams, out_depths
    return out_imgs, out_cams


def mask_depth_image(depth: np.ndarray, min_depth: float, max_depth: float) -> np.ndarray:
    """Zero out depth outside [min, max] (reference ``mask_depth_image``;
    zeros are the invalid-pixel convention throughout)."""
    out = np.where((depth >= min_depth) & (depth <= max_depth), depth, 0.0)
    return out.astype(np.float32)


def depth_pyramid(depth: np.ndarray, scales: Sequence[float]) -> List[np.ndarray]:
    """Build GT depth maps at each scale of the coarse/flow outputs.

    Nearest-neighbor resampling: depth values must not be blended across
    occlusion boundaries, and invalid zeros must stay exact zeros (linear
    interpolation would smear both).
    """
    outs = []
    for s in scales:
        if s == 1.0:
            outs.append(depth.astype(np.float32))
        else:
            outs.append(scale_image(depth, s, interpolation="nearest").astype(np.float32))
    return outs
