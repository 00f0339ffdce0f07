"""Checkpoint save/load with auto-resume.

Reference counterpart: ``pointmvsnet/utils/checkpoint.py :: Checkpointer``
(SURVEY.md §2.13): epoch-granular model+optimizer+scheduler state with a
``last_checkpoint`` pointer. Rebuilt on orbax (atomic, async-capable,
sharding-aware restores on multi-chip meshes).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, state: Any, epoch: int, wait: bool = True) -> None:
        """Save the full TrainState under integer step = epoch."""
        state = jax.device_get(state)
        self._mgr.save(epoch, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def load(self, template: Any, resume: bool = True,
             path: str = "") -> Tuple[Any, int]:
        """→ (state, next_epoch). ``path`` (reference ``TEST.WEIGHT``)
        overrides auto-resume; it may point at the manager root (latest
        step is picked), a step dir, or the item dir itself."""
        if path:
            path = os.path.abspath(path)
            # manager root → newest integer step dir
            steps = sorted(int(d) for d in os.listdir(path)
                           if d.isdigit()) if os.path.isdir(path) else []
            if steps:
                path = os.path.join(path, str(steps[-1]))
            # CheckpointManager step dirs nest the pytree under "default"
            if os.path.isdir(os.path.join(path, "default")):
                path = os.path.join(path, "default")
            restored = ocp.StandardCheckpointer().restore(
                path, target=template)
            return restored, 0
        if resume:
            last = self.latest_epoch()
            if last is not None:
                restored = self._mgr.restore(
                    last, args=ocp.args.StandardRestore(template))
                return restored, last + 1
        return template, 0

    def close(self):
        self._mgr.close()
