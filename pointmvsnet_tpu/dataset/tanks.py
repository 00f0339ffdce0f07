"""Tanks & Temples dataset (MVSNet-format preprocessed release).

The reference repo is DTU-centric; its MVSNet camera format generalizes to
the preprocessed T&T release (SURVEY.md §6 — BASELINE config #5). Layout::

    <root>/<scene>/pair.txt
    <root>/<scene>/cams/{view:08d}_cam.txt
    <root>/<scene>/images/{view:08d}.jpg

Same item contract as the DTU test set (NHWC images, (V, 2, 4, 4) cams).
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Optional, Sequence

import numpy as np

from pointmvsnet_tpu.dataset.io import load_cam, load_pair
from pointmvsnet_tpu.dataset.preprocess import (
    crop_mvs_input,
    norm_image,
    scale_mvs_input,
)

INTERMEDIATE_SCENES = ["Family", "Francis", "Horse", "Lighthouse", "M60",
                       "Panther", "Playground", "Train"]


class TanksDataset:
    def __init__(self, root_dir: str, num_view: int = 5,
                 num_virtual_plane: int = 96, interval_scale: float = 1.0,
                 img_height: int = 512, img_width: int = 640,
                 scenes: Optional[Sequence[str]] = None, base: int = 64):
        self.root = root_dir
        self.num_view = num_view
        self.num_virtual_plane = num_virtual_plane
        self.interval_scale = interval_scale
        self.img_height = img_height
        self.img_width = img_width
        self.base = base
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
            cams.append(load_cam(
                os.path.join(self.root, scene, "cams", f"{v:08d}_cam.txt"),
                interval_scale=self.interval_scale,
                num_depth=self.num_virtual_plane))
        h, w = images[0].shape[:2]
        scale = min(self.img_height / h, self.img_width / w)
        if scale != 1.0:
            images, cams = scale_mvs_input(images, cams, scale)
        images, cams = crop_mvs_input(images, cams, self.img_height,
                                      self.img_width, base=self.base)
        images = [norm_image(im) for im in images]
        # scene id = stable index into the configured scene list
        scan_id = self.scenes.index(scene)
        return {
            "images": np.stack(images).astype(np.float32),
            "cams": np.stack(cams).astype(np.float32),
            "scan": np.int32(scan_id),
            "ref_view": np.int32(ref),
        }
