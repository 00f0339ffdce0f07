"""DGCNN-style edge convolution over PointFlow's hypothesis point cloud.

Reference counterpart: ``pointmvsnet/modules/networks.py :: EdgeConv,
EdgeConvNoC`` (SURVEY.md §2.7): gather k neighbors (custom CUDA
``gather_knn`` in the reference; ``ops/knn.py`` here), form edge features
``concat(x_i, x_j − x_i)``, shared MLP, channel-wise max over neighbors.

TPU formulation, two algebraic steps past the reference:

1. **Split matmul + post-matmul gather** ("z-trick"): with the reference's
   single (2C, F) kernel split as W_c / W_n,
   ``W·concat(x_i, x_j − x_i) = gather(x·W_n)_j + x_i·(W_c − W_n)`` —
   the matmul runs once per point (not per neighbor), the (N, K, 2C) edge
   tensor never exists, and the gather moves F-wide rows instead of
   C-wide features.

2. **Masked window max** (eval fast path): the row gather is still
   latency-bound (~14 ms per conv per full-res flow band). But eval-mode
   BatchNorm is a per-channel affine, and ``max_k relu(a·v_k + b)`` =
   ``relu(max_k(a·v_k) + b)`` (relu is monotone, a·v+b is per-channel) —
   so the whole neighbor reduction collapses to a max over the kNN-selected
   members of the G·win² window, computed by the roll-based Pallas kernel
   ``ops/pallas/edge.py :: masked_window_max`` with zero random access.
   Exact up to float reassociation; training and GroupNorm (whose
   statistics need the materialized (N, K, F) tensor) use path 1.

The parameter keeps the reference's single (2C, F) kernel layout and the
``BatchNorm_0/{scale,bias}`` + ``batch_stats`` tree that ``nn.BatchNorm``
would create, so converted checkpoints are path-independent.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pointmvsnet_tpu.models.blocks import _norm_layer, conv_kernel_init
from pointmvsnet_tpu.ops.knn import gather_knn

# --- NaN-hunt seams (debug/nan_bisect.py flips these module flags) --------
# The B=2 bf16+BN train backward NaN is COMPILED-ONLY (jax_debug_nans: the
# de-optimized rerun is clean) and localized to the flow-side BN backward
# (bn_free_flow CLEAN, bn_free_coarse NAN — docs/STATUS.md). These seams
# isolate candidate mechanisms inside the train-mode BN below; a seam that
# comes back CLEAN on-chip names the mechanism and becomes the fix.
BN_STATS_TWOPASS = False   # var = E[(x−mean)²] (no E[x²]−E[x]² cancellation)
BN_STATS_BARRIER = False   # optimization_barrier on (mean, var): pins the
#                            compiled schedule, blocking cross-boundary fusion
BN_STATS_STOPGRAD = False  # stop_gradient on (mean, var): frozen-stats
#                            normalization backward (semantics change —
#                            localizer only, not a shippable default)
BN_STATS_FROZEN = False    # train-mode normalize reads the STORED running
#                            stats (no batch moments computed, no variable
#                            update): isolates the moment-reduction +
#                            batch_stats-mutation machinery wholesale
#                            (2pass/barrier/sgstats all NAN'd — r5c).
#                            r5e verdict: CLEAN — the trigger is in this
#                            machinery, and since sgstats (moments present,
#                            zero gradient through them) still NAN'd, a
#                            gradient-FREE side computation corrupts the
#                            compiled backward: XLA TPU miscompile.
BN_STATS_NOUPDATE = False  # batch moments computed + normalized by, but
#                            the running-stat momentum blend (batch_stats
#                            variable mutation) is SKIPPED: splits the
#                            frozen-CLEAN between reduction and update
BN_STATS_FLAT = False      # moments via a flattened (B·N·K, F) reduction
#                            instead of mean(axis=(0,1,2)): same math,
#                            different XLA reduce shape/fusion


class _BNStats(nn.Module):
    """Parameter/stat twin of ``nn.BatchNorm`` (same variable tree:
    params ``scale``/``bias``, batch_stats ``mean``/``var``) that exposes
    the raw values so EdgeConv can fold the eval-mode affine into the
    masked-max formulation. Passing batch statistics updates the running
    stats exactly like flax (momentum convex blend)."""

    features: int
    momentum: float = 0.9

    @nn.compact
    def __call__(self, batch_mean: Optional[jnp.ndarray] = None,
                 batch_var: Optional[jnp.ndarray] = None):
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.features,), jnp.float32))
        if batch_mean is not None and not self.is_initializing():
            mean.value = (self.momentum * mean.value
                          + (1.0 - self.momentum) * batch_mean)
            var.value = (self.momentum * var.value
                         + (1.0 - self.momentum) * batch_var)
        return scale, bias, mean.value, var.value


class EdgeConv(nn.Module):
    """x (B, N, C), knn_idx (B, N, K) → (B, N, features).

    ``use_center=True`` (reference ``EdgeConv``): edge feature is
    ``concat(x_i, x_j − x_i)``; ``False`` (``EdgeConvNoC``): just
    ``x_j − x_i``.

    ``mask``/``grid_shape``/``window``: optional window-selection bitmask
    from ``ops.knn.window_knn_mask_auto`` enabling the eval fast path;
    ``impl`` mirrors ``MODEL.KNN_IMPL`` for the Pallas/XLA choice.
    """

    features: int
    norm: str = "bn"
    use_center: bool = True
    dtype: jnp.dtype = jnp.float32
    gn_groups: int = 8
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, knn_idx: jnp.ndarray,
                 train: bool = False, *,
                 mask: Optional[jnp.ndarray] = None,
                 grid_shape: Optional[Tuple[int, int, int]] = None,
                 window: int = 5, impl: str = "auto") -> jnp.ndarray:
        c = x.shape[-1]
        in_dim = 2 * c if self.use_center else c
        kernel = self.param("kernel", conv_kernel_init,
                            (in_dim, self.features), jnp.float32)
        kernel = kernel.astype(self.dtype)
        x = x.astype(self.dtype)

        # z-trick: pre[n, k] = z[idx[n, k]] + cterm[n] with one per-point
        # matmul; identical math to (x·W_c) + (x_nbr − x)·W_n
        if self.use_center:
            w_c, w_n = kernel[:c], kernel[c:]
            z = x @ w_n                                  # (B, N, F)
            cterm = x @ (w_c - w_n)
        else:
            z = x @ kernel
            cterm = -z

        bn_vals = None
        bnp = (_BNStats(self.features, name="BatchNorm_0")
               if self.norm == "bn" else None)
        if bnp is not None and (not train or BN_STATS_FROZEN):
            bn_vals = bnp()                              # read-only

        fast_ok = (mask is not None and grid_shape is not None
                   and not train and self.norm in ("bn", "none"))
        if fast_ok:
            out = self._fast_masked_max(z, cterm, mask, grid_shape,
                                        window, impl, bn_vals)
            if out is not None:
                return out

        # ---- gather path (training, GroupNorm, or no mask) ----------------
        pre = gather_knn(z, knn_idx) + cterm[:, :, None, :]  # (B, N, K, F)
        if self.norm == "bn":
            if train and not BN_STATS_FROZEN:
                f32 = pre.astype(jnp.float32)
                if BN_STATS_FLAT:
                    flat = f32.reshape(-1, f32.shape[-1])
                    bm = jnp.mean(flat, axis=0)
                    bv = jnp.maximum(jnp.mean(jnp.square(flat), axis=0)
                                     - jnp.square(bm), 0.0)
                elif BN_STATS_TWOPASS:
                    bm = jnp.mean(f32, axis=(0, 1, 2))
                    bv = jnp.mean(jnp.square(f32 - bm), axis=(0, 1, 2))
                else:
                    bm = jnp.mean(f32, axis=(0, 1, 2))
                    # clamp: E[x²]−E[x]² can cancel below −eps in fp32, and
                    # rsqrt(<0) NaNs (flax's BatchNorm clamps the same way)
                    bv = jnp.maximum(
                        jnp.mean(jnp.square(f32), axis=(0, 1, 2))
                        - jnp.square(bm), 0.0)
                if BN_STATS_BARRIER:
                    bm, bv = jax.lax.optimization_barrier((bm, bv))
                if BN_STATS_STOPGRAD:
                    bm = jax.lax.stop_gradient(bm)
                    bv = jax.lax.stop_gradient(bv)
                if BN_STATS_NOUPDATE:
                    scale, bias, _, _ = bnp()   # no running-stat mutation
                else:
                    scale, bias, _, _ = bnp(bm, bv)
                # normalize in fp32 during training: the backward through a
                # bf16 rsqrt×large-reduction chain overflows to inf → NaN
                # grads (observed at 640×512 train shapes); eval folds the
                # affine into the masked-max fast path in compute dtype
                pre = self._bn_normalize(f32, scale, bias, bm, bv,
                                         dtype=jnp.float32).astype(self.dtype)
            else:
                scale, bias, mean, var = bn_vals
                pre = self._bn_normalize(pre, scale, bias, mean, var)
        elif self.norm == "gn":
            layer = _norm_layer(self.norm, self.dtype, train, self.gn_groups,
                                self.features)
            pre = layer(pre)
        pre = nn.relu(pre)
        return jnp.max(pre, axis=2)                      # max over K

    def _bn_normalize(self, pre, scale, bias, mean, var, dtype=None):
        """flax ``nn.BatchNorm`` normalization order, in compute dtype
        (or an explicit ``dtype`` — fp32 for the training backward)."""
        dt = dtype or self.dtype
        mul = jax.lax.rsqrt(var.astype(dt) + jnp.asarray(self.bn_eps, dt))
        mul = mul * scale.astype(dt)
        return (pre - mean.astype(dt)) * mul + bias.astype(dt)

    def _fast_masked_max(self, z, cterm, mask, grid_shape, window, impl,
                         bn_vals):
        """relu(max_k(z₂) + c₂) formulation; → None if no impl fits."""
        from pointmvsnet_tpu.ops.knn import _use_pallas
        from pointmvsnet_tpu.ops.pallas.edge import (
            masked_window_max, masked_window_max_fits, masked_window_max_xla)
        g, h, w = grid_shape
        dt = self.dtype
        if bn_vals is not None:
            scale, bias, mean, var = bn_vals
            mul = jax.lax.rsqrt(var.astype(dt) + jnp.asarray(self.bn_eps, dt))
            mul = mul * scale.astype(dt)
            z2 = z * mul
            c2 = (cterm - mean.astype(dt)) * mul + bias.astype(dt)
        else:
            z2, c2 = z, cterm
        if _use_pallas(impl, h):
            if not masked_window_max_fits(g, h, w, self.features, window,
                                          z2.dtype.itemsize):
                return None                              # too tall: gather
            mx = masked_window_max(z2, mask, grid_shape, window)
        else:
            mx = masked_window_max_xla(z2, mask, grid_shape, window)
        return nn.relu(mx + c2)
