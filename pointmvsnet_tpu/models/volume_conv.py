"""3D cost-volume regularizer (U-Net over D×H×W).

Reference counterpart: ``pointmvsnet/modules/networks.py :: VolumeConv``
(SURVEY.md §2.5): 3 stride-2 3D-conv down stages + transposed-3D-conv up
path with additive skips, 1-channel output → probability volume logits.

Layout (B, D, H, W, C): channels-last 3D convs lower to MXU contractions;
the volume never changes layout between stages so XLA fuses norm+relu into
the conv epilogues.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from pointmvsnet_tpu.models.blocks import ConvBlock, DeconvBlock


class VolumeConv(nn.Module):
    base_channels: int = 8
    norm: str = "bn"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: (B, D, H, W, C) variance cost volume → logits (B, D, H, W, 1)."""
        c = self.base_channels
        kw = dict(norm=self.norm, dtype=self.dtype)

        conv0 = ConvBlock(c, 3, 1, **kw)(x, train)

        x1 = ConvBlock(2 * c, 3, 2, **kw)(conv0, train)
        conv1 = ConvBlock(2 * c, 3, 1, **kw)(x1, train)

        x2 = ConvBlock(4 * c, 3, 2, **kw)(conv1, train)
        conv2 = ConvBlock(4 * c, 3, 1, **kw)(x2, train)

        x3 = ConvBlock(8 * c, 3, 2, **kw)(conv2, train)
        conv3 = ConvBlock(8 * c, 3, 1, **kw)(x3, train)

        up2 = DeconvBlock(4 * c, 3, 2, **kw)(conv3, train) + conv2
        up1 = DeconvBlock(2 * c, 3, 2, **kw)(up2, train) + conv1
        up0 = DeconvBlock(c, 3, 2, **kw)(up1, train) + conv0

        # final projection to 1 channel, no norm/relu (raw logits)
        return ConvBlock(1, 3, 1, norm="none", relu=False, dtype=self.dtype)(up0, train)
