"""Parameter freezing by path pattern.

Reference counterpart: ``pointmvsnet/nn/freezer.py :: Freezer``
(SURVEY.md §2.8): freeze params/BN whose names match patterns during
fine-tuning. Functional rebuild: an ``optax.multi_transform`` wrapper that
routes matching params to ``set_to_zero`` (no update), everything else to
the real optimizer. BN running stats of frozen modules still update only
if the forward runs in train mode — pass ``train=False`` for full
reference-Freezer semantics on those modules.
"""

from __future__ import annotations

import re
from typing import Any, Sequence

import jax
import optax


def freeze_mask_labels(params: Any, patterns: Sequence[str]) -> Any:
    """params pytree → same-shaped tree of labels 'frozen'/'train'."""
    pats = [re.compile(p) for p in patterns]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label(path) -> str:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        return "frozen" if any(p.search(name) for p in pats) else "train"

    labels = {jax.tree_util.keystr(path): label(path) for path, _ in flat}

    def lookup(path, _):
        return labels[jax.tree_util.keystr(path)]

    return jax.tree_util.tree_map_with_path(lookup, params)


def with_frozen(optimizer: optax.GradientTransformation,
                patterns: Sequence[str]) -> optax.GradientTransformation:
    """Wrap ``optimizer`` so params matching any regex in ``patterns`` get
    zero updates."""
    if not patterns:
        return optimizer
    return optax.multi_transform(
        {"train": optimizer, "frozen": optax.set_to_zero()},
        lambda params: freeze_mask_labels(params, patterns))
