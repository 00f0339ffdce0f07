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


_SYNC_OVERHEAD: float | None = None


def sync_overhead() -> float:
    """Measured constant cost of one dispatch + scalar materialization
    through the host↔device path (~37 ms via the axon TPU tunnel, ~0 on a
    local backend). Per-iteration-synced timings carry this constant; it
    cancels in prefix DIFFERENCES but must be subtracted from absolute
    stage numbers."""
    global _SYNC_OVERHEAD
    if _SYNC_OVERHEAD is None:
        import jax.numpy as jnp

        f = jax.jit(lambda x: x + 1.0)
        x = jnp.zeros((8, 128), jnp.float32)
        float(np.asarray(f(x)).ravel()[0])      # compile + warm
        times = []
        for _ in range(7):
            t0 = time.perf_counter()
            float(np.asarray(f(x)).ravel()[0])
            times.append(time.perf_counter() - t0)
        _SYNC_OVERHEAD = float(np.median(times))
    return _SYNC_OVERHEAD


def _timed(fn: Callable, *args, iters: int = 5) -> float:
    """Median wall latency with per-iteration host sync (plain
    block_until_ready is unreliable through the axon tunnel), minus the
    measured sync-overhead constant — the device-time estimate."""
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        times.append(time.perf_counter() - t0)
    return max(float(np.median(times)) - sync_overhead(), 0.0)


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


def train_stage_latencies(model, loss_fn, optimizer, state, batch,
                          model_kwargs: Dict[str, Any],
                          iters: int = 5) -> Dict[str, float]:
    """Train-step decomposition by pipeline differencing (same honesty
    rule as ``stage_latencies``: stages inside one jit can't be timed
    individually without breaking fusion, so time nested prefixes).

    → fwd_s (loss forward), bwd_s (= grad − fwd), opt_s (= step − grad),
    coarse_step_s (is_flow=False full step), flow_step_s (= step −
    coarse_step: the marginal train cost of the flow stages), step_s.
    None of the timed functions donate state (unlike the production step),
    so step_s here can read a few ms above the engine's sustained rate.
    """
    def compute_loss(params, kwargs):
        if state.batch_stats:
            variables = {"params": params, "batch_stats": state.batch_stats}
            preds, _ = model.apply(variables, batch["images"], batch["cams"],
                                   train=True, mutable=["batch_stats"],
                                   **kwargs)
        else:
            preds = model.apply({"params": params}, batch["images"],
                                batch["cams"], train=True, **kwargs)
        return loss_fn(preds, batch["gt_depth"], batch["cams"])["total_loss"]

    def full_step(params, opt_state, kwargs):
        grads = jax.grad(compute_loss)(params, kwargs)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax
        return optax.apply_updates(params, updates), opt_state

    import functools
    kw = dict(model_kwargs)
    kw_coarse = dict(model_kwargs, is_flow=False, img_scales=(),
                     inter_scales=())
    out: Dict[str, float] = {}
    out["fwd_s"] = _timed(
        jax.jit(functools.partial(compute_loss, kwargs=kw)),
        state.params, iters=iters)
    grad_s = _timed(
        jax.jit(functools.partial(jax.grad(compute_loss), kwargs=kw)),
        state.params, iters=iters)
    out["bwd_s"] = grad_s - out["fwd_s"]
    out["step_s"] = _timed(
        jax.jit(functools.partial(full_step, kwargs=kw)),
        state.params, state.opt_state, iters=iters)
    out["opt_s"] = out["step_s"] - grad_s
    out["coarse_step_s"] = _timed(
        jax.jit(functools.partial(full_step, kwargs=kw_coarse)),
        state.params, state.opt_state, iters=iters)
    out["flow_step_s"] = out["step_s"] - out["coarse_step_s"]
    return out


@contextlib.contextmanager
def trace(log_dir: str):
    """xprof trace of the enclosed block: view with tensorboard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
