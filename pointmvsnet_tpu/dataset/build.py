"""Batch loader: collation, shuffling, background prefetch.

Replaces the reference's ``torch.utils.data.DataLoader`` usage
(``pointmvsnet/dataset/__init__.py :: build_data_loader``, SURVEY.md §2.2).
TPU-native stance: the loader emits fixed-shape numpy batches ready for a
single host→device transfer; heavy decode runs in a thread pool (cv2/numpy
release the GIL) or in the optional native C++ data plane
(``pointmvsnet_tpu/native``).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np


def collate(items: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack a list of sample dicts into a batch dict (adds leading B dim)."""
    keys = items[0].keys()
    return {k: np.stack([np.asarray(it[k]) for it in items]) for k in keys}


class DataLoader:
    """Minimal epoch-based loader.

    ``drop_last`` defaults True: fixed batch shapes avoid XLA recompiles
    (a TPU constraint with no reference counterpart).
    """

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 seed: int = 0, drop_last: bool = True,
                 num_workers: int = 0, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def _batch_indices(self) -> List[np.ndarray]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + self._epoch).shuffle(idx)
        nb = len(self)
        return [idx[i * self.batch_size:(i + 1) * self.batch_size] for i in range(nb)]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = self._batch_indices()
        if self.num_workers <= 0:
            for b in batches:
                yield collate([self.dataset[int(i)] for i in b])
            return
        yield from self._threaded_iter(batches)

    def _threaded_iter(self, batches):
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            try:
                for b in batches:
                    if stop.is_set():
                        return
                    q.put(collate([self.dataset[int(i)] for i in b]))
            except Exception as e:  # surface loader errors in the main thread
                q.put(e)
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


def build_data_loader(cfg, mode: str = "train"):
    """Factory mirroring the reference's ``build_data_loader(cfg, mode)``."""
    from pointmvsnet_tpu.dataset.dtu import DTUTestDataset, DTUTrainValDataset

    assert mode in ("train", "val", "test")
    if mode == "train":
        ds = DTUTrainValDataset(
            cfg.DATA.TRAIN.ROOT_DIR, mode="train",
            num_view=cfg.DATA.TRAIN.NUM_VIEW,
            num_virtual_plane=cfg.DATA.TRAIN.NUM_VIRTUAL_PLANE,
            interval_scale=cfg.DATA.TRAIN.INTERVAL_SCALE)
        return DataLoader(ds, cfg.TRAIN.BATCH_SIZE, shuffle=True,
                          seed=cfg.RNG_SEED, num_workers=cfg.DATA.NUM_WORKERS)
    if mode == "val":
        ds = DTUTrainValDataset(
            cfg.DATA.VAL.ROOT_DIR, mode="val",
            num_view=cfg.DATA.VAL.NUM_VIEW,
            num_virtual_plane=cfg.DATA.TRAIN.NUM_VIRTUAL_PLANE,
            interval_scale=cfg.DATA.TRAIN.INTERVAL_SCALE)
        return DataLoader(ds, cfg.TRAIN.BATCH_SIZE, shuffle=False,
                          num_workers=cfg.DATA.NUM_WORKERS)
    if cfg.DATA.TEST.DATASET == "tanks":
        from pointmvsnet_tpu.dataset.tanks import TanksDataset
        ds = TanksDataset(
            cfg.DATA.TEST.ROOT_DIR,
            num_view=cfg.DATA.TEST.NUM_VIEW,
            num_virtual_plane=cfg.DATA.TEST.NUM_VIRTUAL_PLANE,
            interval_scale=cfg.DATA.TEST.INTERVAL_SCALE,
            img_height=cfg.DATA.TEST.IMG_HEIGHT,
            img_width=cfg.DATA.TEST.IMG_WIDTH,
            rescale_depth=cfg.DATA.TEST.RESCALE_DEPTH,
            shape_set=tuple(cfg.DATA.TEST.SHAPE_SET) or None)
    else:
        ds = DTUTestDataset(
            cfg.DATA.TEST.ROOT_DIR,
            num_view=cfg.DATA.TEST.NUM_VIEW,
            num_virtual_plane=cfg.DATA.TEST.NUM_VIRTUAL_PLANE,
            interval_scale=cfg.DATA.TEST.INTERVAL_SCALE,
            img_height=cfg.DATA.TEST.IMG_HEIGHT,
            img_width=cfg.DATA.TEST.IMG_WIDTH)
    return DataLoader(ds, cfg.TEST.BATCH_SIZE, shuffle=False, drop_last=False,
                      num_workers=cfg.DATA.NUM_WORKERS)
