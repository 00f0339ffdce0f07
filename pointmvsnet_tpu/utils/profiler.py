"""Profiling utilities: per-stage latency decomposition + xprof tracing.

Reference status (SURVEY.md §5): the reference only tracked
``batch_time``/``data_time`` meters. Here the north-star metrics
(depth-maps/sec/chip, PointFlow iteration latency) get first-class
support:

* ``stage_latencies`` — times nested pipeline prefixes (coarse-only,
  +flow1, +flow2, …) as separate jit executions and differences them; the
  deltas are the true marginal cost of each PointFlow iteration including
  its feature pyramid (stages inside one jit region cannot be timed
  individually without breaking fusion — differencing whole pipelines is
  the honest decomposition).
* ``trace`` — context manager around ``jax.profiler`` for xprof dumps.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Sequence

import jax
import numpy as np


def _timed(fn: Callable, *args, iters: int = 5) -> float:
    """Median wall latency with per-iteration host sync (plain
    block_until_ready is unreliable through the axon tunnel)."""
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def stage_latencies(model, variables, images, cams,
                    img_scales: Sequence[float],
                    inter_scales: Sequence[float],
                    num_virtual_plane: int,
                    iters: int = 5) -> Dict[str, float]:
    """→ {"coarse_s": ..., "flow1_iter_s": ..., "flow2_iter_s": ..., "total_s": ...}."""
    def make(n_flow: int):
        kwargs = dict(is_flow=n_flow > 0,
                      img_scales=tuple(img_scales[:n_flow]),
                      inter_scales=tuple(inter_scales[:n_flow]),
                      num_virtual_plane=num_virtual_plane)
        return jax.jit(lambda v, im, cm: model.apply(v, im, cm, **kwargs))

    out: Dict[str, float] = {}
    prev = _timed(make(0), variables, images, cams, iters=iters)
    out["coarse_s"] = prev
    for n in range(1, len(img_scales) + 1):
        cur = _timed(make(n), variables, images, cams, iters=iters)
        out[f"flow{n}_iter_s"] = cur - prev
        prev = cur
    out["total_s"] = prev
    return out


@contextlib.contextmanager
def trace(log_dir: str):
    """xprof trace of the enclosed block: view with tensorboard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
