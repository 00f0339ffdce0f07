"""NN primitive wrappers: conv + norm + activation.

Reference counterpart: ``pointmvsnet/nn/{conv.py,init.py}`` and the
GroupNorm twins in ``pointmvsnet/nn_gn/`` (SURVEY.md §2.8). One module
covers both via the ``norm`` switch ("bn" | "gn" | "none") instead of
duplicated module trees.

TPU-first conventions:
* channels-last everywhere — (B, H, W, C) / (B, D, H, W, C) / (B, N, C) —
  so C rides the 128-lane dimension and convs map onto the MXU;
* compute dtype is a parameter (bfloat16 on TPU), params stay float32;
* BatchNorm matches torch semantics (momentum 0.9 ≙ torch 0.1, eps 1e-5)
  for checkpoint-convertibility of running stats.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def _norm_layer(norm: str, dtype, train: bool, num_groups: int = 8,
                channels: int | None = None):
    # Normalization math runs in fp32 during TRAINING regardless of the
    # compute dtype: the backward through a half-precision rsqrt × large
    # reduction chain can overflow to inf and poison every gradient
    # (observed with bf16 BatchNorm at 640×512 flow shapes). Eval keeps
    # the compute dtype — no backward, and EdgeConv folds eval BN into
    # its masked-max affine anyway.
    norm_dtype = jnp.float32 if train else dtype
    if norm == "bn":
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=norm_dtype)
    if norm == "gn":
        if channels is not None:
            import math
            num_groups = math.gcd(num_groups, channels)
        return nn.GroupNorm(num_groups=num_groups, epsilon=1e-5,
                            dtype=norm_dtype)
    if norm == "none":
        return None
    raise ValueError(f"Unknown norm {norm!r}")


# torch's default conv init (kaiming_uniform, a=√5) — matches the reference's
# `init_uniform` so converted checkpoints sit in the same parameter scale.
conv_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class ConvBlock(nn.Module):
    """N-d conv (+norm)(+relu). Spatial rank inferred from the input:
    (B, *spatial, C). Replaces reference ``Conv1d/Conv2d/Conv3d``."""

    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    strides: Union[int, Sequence[int]] = 1
    norm: str = "bn"
    relu: bool = True
    dtype: Dtype = jnp.float32
    gn_groups: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        rank = x.ndim - 2
        ks = (self.kernel_size,) * rank if isinstance(self.kernel_size, int) else tuple(self.kernel_size)
        st = (self.strides,) * rank if isinstance(self.strides, int) else tuple(self.strides)
        use_norm = self.norm != "none"
        # explicit symmetric k//2 padding = torch Conv(padding=k//2) exactly;
        # XLA "SAME" pads asymmetrically under stride 2 and would break
        # converted-checkpoint parity (verified empirically)
        pad = [(k // 2, k // 2) for k in ks]
        x = nn.Conv(self.features, ks, st, padding=pad,
                    use_bias=not use_norm, dtype=self.dtype,
                    kernel_init=conv_kernel_init)(x)
        layer = _norm_layer(self.norm, self.dtype, train, self.gn_groups, self.features)
        if layer is not None:
            x = layer(x)
        if self.relu:
            x = nn.relu(x)
        return x


class DeconvBlock(nn.Module):
    """N-d transposed conv (+norm)(+relu). Replaces reference
    ``Deconv2d/Deconv3d`` (VolumeConv up path)."""

    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    strides: Union[int, Sequence[int]] = 2
    norm: str = "bn"
    relu: bool = True
    dtype: Dtype = jnp.float32
    gn_groups: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        rank = x.ndim - 2
        ks = (self.kernel_size,) * rank if isinstance(self.kernel_size, int) else tuple(self.kernel_size)
        st = (self.strides,) * rank if isinstance(self.strides, int) else tuple(self.strides)
        use_norm = self.norm != "none"
        # torch ConvTranspose(k, s, padding=k//2, output_padding=s-1)
        # equivalence (verified empirically): transpose_kernel=True with
        # per-dim padding (k-1-p, k-1-p+op)
        pad = [(k - 1 - k // 2, k - 1 - k // 2 + s - 1) for k, s in zip(ks, st)]
        x = nn.ConvTranspose(self.features, ks, st, padding=pad,
                             transpose_kernel=True,
                             use_bias=not use_norm, dtype=self.dtype,
                             kernel_init=conv_kernel_init)(x)
        layer = _norm_layer(self.norm, self.dtype, train, self.gn_groups, self.features)
        if layer is not None:
            x = layer(x)
        if self.relu:
            x = nn.relu(x)
        return x


class SharedMLP(nn.Module):
    """Per-point MLP: a stack of 1×1 "convs" over (B, ..., N, C) — the
    reference's Conv1d/Conv2d usage inside EdgeConv and the flow head.
    On TPU these are straight matmuls on the MXU (dense over last axis)."""

    features: Sequence[int]
    norm: str = "bn"
    last_relu: bool = True
    last_norm: bool = True
    dtype: Dtype = jnp.float32
    gn_groups: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        n = len(self.features)
        for i, f in enumerate(self.features):
            last = i == n - 1
            use_norm = self.norm if (self.last_norm or not last) else "none"
            x = nn.Dense(f, use_bias=use_norm == "none", dtype=self.dtype,
                         kernel_init=conv_kernel_init)(x)
            layer = _norm_layer(use_norm, self.dtype, train, self.gn_groups, f)
            if layer is not None:
                x = layer(x)
            if self.last_relu or not last:
                x = nn.relu(x)
        return x
