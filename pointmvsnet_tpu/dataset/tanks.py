"""Tanks & Temples dataset (MVSNet-format preprocessed release).

The reference repo is DTU-centric; its MVSNet camera format generalizes to
the preprocessed T&T release (SURVEY.md §6 — BASELINE config #5). Layout::

    <root>/<scene>/pair.txt
    <root>/<scene>/cams/{view:08d}_cam.txt
    <root>/<scene>/images/{view:08d}.jpg

Same item contract as the DTU test set (NHWC images, (V, 2, 4, 4) cams).

Real-release quirks this loader defends against (SURVEY.md §6 T&T row):

- **Per-scene depth sampling**: each ``cam.txt``'s depth line carries its
  own ``num_depth`` (line 12, 3rd number — e.g. 256 for Family vs 96 for
  DTU). The model's hypothesis count is a STATIC shape on TPU, so instead
  of honoring it dynamically, ``rescale_depth=True`` stretches the
  interval so the configured D hypotheses span the file's full
  [depth_min, depth_max] range — same coverage, one compiled program.
- **Ragged per-scene resolutions**: scenes ship at different sizes
  (1920×1080 intermediate set, but advanced/self-captured sets vary).
  ``shape_set`` holds a small set of (H, W) targets; each scene picks the
  one preserving the most content after scale+crop. Downstream, jit
  compiles one program per distinct shape (the precompiled-shape-set
  pattern) instead of failing or over-cropping everything to one box.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from pointmvsnet_tpu.dataset.io import load_cam, load_pair
from pointmvsnet_tpu.dataset.preprocess import (
    crop_mvs_input,
    norm_image,
    scale_mvs_input,
)

INTERMEDIATE_SCENES = ["Family", "Francis", "Horse", "Lighthouse", "M60",
                       "Panther", "Playground", "Train"]


def pick_shape(h: int, w: int, shape_set: Sequence[Tuple[int, int]],
               base: int = 64) -> Tuple[int, int]:
    """Best (th, tw) from ``shape_set`` for a source image of (h, w) under
    scale-to-COVER + center-crop (``s = max(th/h, tw/w)``, capped at 1 —
    never upsample): among targets the source can actually cover (the
    final crop then equals (th, tw) EXACTLY, keeping the compiled-shape
    set bounded), maximize the fraction of source pixels retained,
    ``(th·tw)/(sh·sw)`` — i.e. prefer aspect-matched, then largest.
    Targets the source cannot cover score below every coverable one,
    ranked by the area the crop would actually yield."""
    best, best_key = None, None
    for th, tw in shape_set:
        th, tw = (th // base) * base, (tw // base) * base
        if th <= 0 or tw <= 0:
            continue
        s = min(max(th / h, tw / w), 1.0)
        sh, sw = int(round(h * s)), int(round(w * s))
        fh, fw = min(th, sh) // base * base, min(tw, sw) // base * base
        coverable = (fh == th and fw == tw)
        key = (coverable,
               (th * tw) / (sh * sw) if coverable else fh * fw / (h * w))
        if best_key is None or key > best_key:
            best, best_key = (th, tw), key
    assert best is not None, "empty shape_set"
    return best


class TanksDataset:
    def __init__(self, root_dir: str, num_view: int = 5,
                 num_virtual_plane: int = 96, interval_scale: float = 1.0,
                 img_height: int = 512, img_width: int = 640,
                 scenes: Optional[Sequence[str]] = None, base: int = 64,
                 rescale_depth: bool = True,
                 shape_set: Optional[Sequence[Tuple[int, int]]] = None):
        self.root = root_dir
        self.num_view = num_view
        self.num_virtual_plane = num_virtual_plane
        self.interval_scale = interval_scale
        self.img_height = img_height
        self.img_width = img_width
        self.base = base
        self.rescale_depth = rescale_depth
        self.shape_set = [tuple(s) for s in shape_set] if shape_set else None
        self._scene_shape: Dict[str, Tuple[int, int]] = {}
        if scenes is None:
            scenes = INTERMEDIATE_SCENES
        self.scenes = [s for s in scenes
                       if os.path.isdir(os.path.join(root_dir, s))]
        self.pairs = {s: load_pair(os.path.join(root_dir, s, "pair.txt"))
                      for s in self.scenes}
        self.index = [
            (s, ref) for s in self.scenes
            for ref in self.pairs[s]
            if len(self.pairs[s][ref]) >= num_view - 1
        ]

    def _target_shape(self, scene: str, h: int, w: int) -> Tuple[int, int]:
        """Per-scene (img_height, img_width): fixed unless a shape_set is
        configured, in which case the best-fitting member is chosen once
        per scene (all views of a scene share a resolution)."""
        if self.shape_set is None:
            return self.img_height, self.img_width
        if scene not in self._scene_shape:
            self._scene_shape[scene] = pick_shape(h, w, self.shape_set,
                                                  self.base)
        return self._scene_shape[scene]

    def _rescale_cam_depth(self, cam: np.ndarray) -> np.ndarray:
        """Honor the cam file's own num_depth (line 12) under static
        shapes: stretch the (already interval_scale-d) interval so the
        configured ``num_virtual_plane`` hypotheses cover the SAME
        [depth_min, depth_max] span the file's num_depth did."""
        nd_file = float(cam[1, 3, 2])
        d = self.num_virtual_plane
        if self.rescale_depth and nd_file >= 2 and int(nd_file) != d:
            cam = cam.copy()
            cam[1, 3, 1] *= (nd_file - 1.0) / (d - 1.0)
            cam[1, 3, 2] = d
        return cam

    def __len__(self) -> int:
        return len(self.index)

    def _image_path(self, scene: str, view: int) -> str:
        for ext in (".jpg", ".png"):
            p = os.path.join(self.root, scene, "images", f"{view:08d}{ext}")
            if os.path.isfile(p):
                return p
        raise FileNotFoundError(
            os.path.join(self.root, scene, "images", f"{view:08d}.jpg"))

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        import cv2
        scene, ref = self.index[idx]
        views = [ref] + [v for v, _ in self.pairs[scene][ref][: self.num_view - 1]]
        images, cams = [], []
        for v in views:
            img = cv2.imread(self._image_path(scene, v), cv2.IMREAD_COLOR)
            images.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32))
            cams.append(self._rescale_cam_depth(load_cam(
                os.path.join(self.root, scene, "cams", f"{v:08d}_cam.txt"),
                interval_scale=self.interval_scale,
                num_depth=self.num_virtual_plane)))
        h, w = images[0].shape[:2]
        th, tw = self._target_shape(scene, h, w)
        if self.shape_set is None:
            scale = min(th / h, tw / w)    # legacy fixed-shape: scale-to-fit
        else:
            # shape_set mode: scale-to-COVER (capped at 1) so the crop hits
            # (th, tw) exactly — see pick_shape
            scale = min(max(th / h, tw / w), 1.0)
        if scale != 1.0:
            images, cams = scale_mvs_input(images, cams, scale)
        images, cams = crop_mvs_input(images, cams, th, tw, base=self.base)
        images = [norm_image(im) for im in images]
        # scene id = stable index into the configured scene list
        scan_id = self.scenes.index(scene)
        return {
            "images": np.stack(images).astype(np.float32),
            "cams": np.stack(cams).astype(np.float32),
            "scan": np.int32(scan_id),
            "ref_view": np.int32(ref),
        }
