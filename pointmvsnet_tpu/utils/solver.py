"""Optimizer + LR schedule factories.

Reference counterpart: ``pointmvsnet/utils/solver.py :: build_optimizer,
build_scheduler`` (SURVEY.md §2.11): RMSprop (torch alpha=0.9) with weight
decay, StepLR epoch decay. Rebuilt on optax; the epoch-granular torch
scheduler becomes a per-step staircase schedule (identical trajectory when
``steps_per_epoch`` matches the loader length).
"""

from __future__ import annotations

import optax


def build_lr_schedule(cfg, steps_per_epoch: int):
    base = cfg.SOLVER.BASE_LR
    if cfg.SCHEDULER.TYPE == "StepLR":
        return optax.exponential_decay(
            init_value=base,
            transition_steps=max(1, cfg.SCHEDULER.STEP_LR.STEP_SIZE * steps_per_epoch),
            decay_rate=cfg.SCHEDULER.STEP_LR.GAMMA,
            staircase=True,
        )
    if cfg.SCHEDULER.TYPE == "none":
        return base
    raise ValueError(f"Unknown SCHEDULER.TYPE {cfg.SCHEDULER.TYPE!r}")


def build_optimizer(cfg, steps_per_epoch: int = 1) -> optax.GradientTransformation:
    from pointmvsnet_tpu.utils.freezer import with_frozen

    sched = build_lr_schedule(cfg, steps_per_epoch)
    if cfg.SOLVER.TYPE == "RMSprop":
        opt = optax.rmsprop(sched, decay=cfg.SOLVER.RMSPROP.ALPHA,
                            eps=cfg.SOLVER.RMSPROP.EPS)
    elif cfg.SOLVER.TYPE == "Adam":
        opt = optax.adam(sched)
    elif cfg.SOLVER.TYPE == "SGD":
        opt = optax.sgd(sched, momentum=0.9)
    else:
        raise ValueError(f"Unknown SOLVER.TYPE {cfg.SOLVER.TYPE!r}")
    if cfg.SOLVER.WEIGHT_DECAY > 0:
        # torch-style decoupled-from-schedule L2: grad += wd · param
        opt = optax.chain(optax.add_decayed_weights(cfg.SOLVER.WEIGHT_DECAY), opt)
    # reference `nn/freezer.py` equivalence: zero updates for matching params
    opt = with_frozen(opt, tuple(cfg.TRAIN.FROZEN_PATTERNS))
    if getattr(cfg.SOLVER, "SKIP_NONFINITE", True):
        # production guard: a step with non-finite grads is SKIPPED (params
        # and optimizer state untouched) instead of poisoning the run —
        # standard mixed-precision practice, and it contains an observed
        # XLA:TPU-only backward NaN at batch≥2 bf16+BN flow training
        # (identical graph+data is finite on CPU; see docs/STATUS.md)
        opt = optax.apply_if_finite(opt, max_consecutive_errors=MAX_CONSECUTIVE_NONFINITE)
    return opt


# after this many CONSECUTIVE non-finite steps, optax.apply_if_finite stops
# skipping and applies the (poisoned) update — the train loop aborts well
# before that (see nonfinite_counts consumers)
MAX_CONSECUTIVE_NONFINITE = 100


def nonfinite_counts(opt_state):
    """(total_notfinite, consecutive_notfinite) from an apply_if_finite-
    wrapped optimizer state, or ``None`` when SKIP_NONFINITE is off.
    Used to surface skipped steps in training metrics and to abort before
    apply_if_finite's max_consecutive_errors lets a NaN update land."""
    if isinstance(opt_state, optax.ApplyIfFiniteState):
        return opt_state.total_notfinite, opt_state.notfinite_count
    return None
