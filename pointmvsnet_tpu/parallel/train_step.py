"""Sharded train/eval step factories.

The reference's inner loop (``train.py :: train_model`` — SURVEY.md §3.1)
moved device-side: forward + loss + backward + RMSprop update is ONE jit
region compiled against the mesh. The batch enters sharded over "data";
parameters/optimizer state are replicated; XLA inserts the gradient
all-reduce over ICI (the pjit replacement for DataParallel's scatter/gather,
with identical global-batch-mean loss semantics — SURVEY.md §7 "hard
parts").

BatchNorm under data parallelism: flax computes batch stats over the
*global* (sharded) batch via XLA collectives — this is sync-BN, a strict
upgrade over the reference's per-replica DataParallel BN.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(model, optimizer: optax.GradientTransformation,
                       rng: jax.Array, example_batch: Dict[str, jnp.ndarray],
                       model_kwargs: Dict[str, Any]) -> TrainState:
    variables = model.init(rng, example_batch["images"], example_batch["cams"],
                           **model_kwargs)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
    )


def make_train_step(model, loss_fn: Callable, optimizer: optax.GradientTransformation,
                    mesh: Optional[Mesh],
                    model_kwargs: Dict[str, Any]) -> Callable:
    """→ ``step(state, batch) -> (state, losses)``, jit-compiled.

    ``model_kwargs`` are the static forward args (is_flow, img_scales,
    inter_scales, num_virtual_plane). A new step function per curriculum
    phase (coarse-only → flow) is expected — two compiles per run, matching
    the reference's INIT_EPOCH switch.
    """

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        def compute_loss(params):
            if state.batch_stats:
                variables = {"params": params, "batch_stats": state.batch_stats}
                preds, mut = model.apply(variables, batch["images"], batch["cams"],
                                         train=True, mutable=["batch_stats"],
                                         **model_kwargs)
                new_stats = mut["batch_stats"]
            else:
                preds = model.apply({"params": params}, batch["images"],
                                    batch["cams"], train=True, **model_kwargs)
                new_stats = state.batch_stats
            losses = loss_fn(preds, batch["gt_depth"], batch["cams"])
            return losses["total_loss"], (losses, new_stats)

        (_, (losses, new_stats)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               batch_stats=new_stats, opt_state=opt_state)
        # surface SKIP_NONFINITE counters as metrics so skipped steps are
        # visible in the log/TB instead of silently accumulating toward
        # apply_if_finite's max_consecutive_errors limit
        from pointmvsnet_tpu.utils.solver import nonfinite_counts
        counts = nonfinite_counts(opt_state)
        if counts is not None:
            losses = dict(losses, skipped_steps=counts[0],
                          consecutive_skipped=counts[1])
        return new_state, losses

    if mesh is None:
        return jax.jit(step, donate_argnums=0)

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=0,
    )


def make_eval_step(model, loss_fn: Optional[Callable], metric_fn: Optional[Callable],
                   mesh: Optional[Mesh],
                   model_kwargs: Dict[str, Any]) -> Callable:
    """→ ``eval_step(state, batch) -> (preds, losses, metrics)`` (no grad).

    Used by both validation (with GT) and test export (loss_fn/metric_fn
    None). Batch-sharded over the mesh for multi-scan throughput eval
    (BASELINE config #4)."""

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        preds = model.apply(variables, batch["images"], batch["cams"],
                            train=False, **model_kwargs)
        losses = (loss_fn(preds, batch["gt_depth"], batch["cams"])
                  if loss_fn is not None and "gt_depth" in batch else {})
        metrics = (metric_fn(preds, batch["gt_depth"], batch["cams"])
                   if metric_fn is not None and "gt_depth" in batch else {})
        return preds, losses, metrics

    if mesh is None:
        return jax.jit(step)

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(step, in_shardings=(repl, data),
                   out_shardings=(data, repl, repl))
