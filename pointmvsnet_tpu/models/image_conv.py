"""Shared-weight 2D feature pyramid.

Reference counterpart: ``pointmvsnet/modules/networks.py :: ImageConv``
(SURVEY.md §2.4): per-view CNN with stride-2 stages from ``base_channels``,
doubling per stage; pyramid levels feed the cost volume (deepest) and
PointFlow's multi-scale point features (all levels).

Views are folded into the batch dim (B·V) before calling — the TPU-native
replacement for the reference's per-view Python loop: one big NHWC conv
batch saturates the MXU instead of V small launches.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from pointmvsnet_tpu.models.blocks import ConvBlock


class ImageConv(nn.Module):
    """4-level pyramid: conv0 (C @1/1), conv1 (2C @1/2), conv2 (4C @1/4),
    conv3 (8C @1/8). The cost volume consumes ``conv2`` (reference uses its
    deepest pre-bottleneck level); PointFlow concatenates conv0..conv2."""

    base_channels: int = 8
    norm: str = "bn"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        c = self.base_channels
        kw = dict(norm=self.norm, dtype=self.dtype)

        x = ConvBlock(c, 3, 1, **kw)(x, train)
        conv0 = ConvBlock(c, 3, 1, **kw)(x, train)

        x = ConvBlock(2 * c, 5, 2, **kw)(conv0, train)
        x = ConvBlock(2 * c, 3, 1, **kw)(x, train)
        conv1 = ConvBlock(2 * c, 3, 1, **kw)(x, train)

        x = ConvBlock(4 * c, 5, 2, **kw)(conv1, train)
        x = ConvBlock(4 * c, 3, 1, **kw)(x, train)
        conv2 = ConvBlock(4 * c, 3, 1, **kw)(x, train)

        x = ConvBlock(8 * c, 5, 2, **kw)(conv2, train)
        x = ConvBlock(8 * c, 3, 1, **kw)(x, train)
        conv3 = ConvBlock(8 * c, 3, 1, **kw)(x, train)

        return {"conv0": conv0, "conv1": conv1, "conv2": conv2, "conv3": conv3}
