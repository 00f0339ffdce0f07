"""DGCNN-style edge convolution over PointFlow's hypothesis point cloud.

Reference counterpart: ``pointmvsnet/modules/networks.py :: EdgeConv,
EdgeConvNoC`` (SURVEY.md §2.7): gather k neighbors (custom CUDA
``gather_knn`` in the reference; ``ops/knn.py`` / Pallas here), form edge
features, shared MLP, channel-wise max over neighbors.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from pointmvsnet_tpu.models.blocks import SharedMLP
from pointmvsnet_tpu.ops.knn import gather_knn


class EdgeConv(nn.Module):
    """x (B, N, C), knn_idx (B, N, K) → (B, N, features).

    ``use_center=True`` (reference ``EdgeConv``): edge feature is
    ``concat(x_i, x_j − x_i)``; ``False`` (``EdgeConvNoC``): just
    ``x_j − x_i``.
    """

    features: int
    norm: str = "bn"
    use_center: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, knn_idx: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        neigh = gather_knn(x, knn_idx)                  # (B, N, K, C)
        center = x[:, :, None, :]
        edge = neigh - center
        if self.use_center:
            edge = jnp.concatenate(
                [jnp.broadcast_to(center, neigh.shape), edge], axis=-1)
        y = SharedMLP([self.features], norm=self.norm, dtype=self.dtype)(edge, train)
        return jnp.max(y, axis=2)                       # max over K
