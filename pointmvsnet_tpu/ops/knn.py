"""kNN graph construction + neighbor gather for PointFlow's EdgeConv.

Reference counterparts (SURVEY.md §2.7/§2.9): the reference computes kNN
indices with a dense pairwise-distance matrix + ``topk`` restricted to a
local spatial window over the hypothesis volume (``get_knn_3d``-style
unfold), and gathers neighbor features with the custom CUDA op
``pointmvsnet/functions/functions.py :: gather_knn``.

TPU-native rebuild:
* ``window_knn`` — the production path. PointFlow's point cloud is a
  structured (G hypotheses × H × W) grid; true nearest neighbors are
  (near-)certainly inside a small spatial window, so candidates are the
  G·win² points of the window and the dense N² matrix never exists. All
  shapes static; distances are VPU elementwise ops; top-k over the (small)
  candidate axis.
* ``blockwise_knn`` — global exact kNN for unstructured point sets: streams
  key blocks through a running top-k so the (N, N) matrix is never
  materialized (the reference's O(N²) memory wall, SURVEY.md §5
  "long-context" row). Distance blocks are MXU matmuls (−2·Q·Kᵀ + norms).
* ``gather_knn`` — ``take_along_axis`` (XLA gather); the Pallas fused
  variant lives in ``ops/pallas/``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_BIG = jnp.float32(1e30)


def gather_knn(features: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """features (B, P, C), indices (B, N, K) → (B, N, K, C).

    out[b, n, k] = features[b, indices[b, n, k]] — the reference CUDA op's
    forward; backward is XLA's scatter-add of the gather transpose (the
    reference implemented this by hand with atomics).
    """
    b, p, c = features.shape
    _, n, k = indices.shape
    flat_idx = indices.reshape(b, n * k, 1)
    out = jnp.take_along_axis(features, flat_idx, axis=1)
    return out.reshape(b, n, k, c)


def window_knn(points: jnp.ndarray, grid_shape: Tuple[int, int, int], k: int,
               window: int = 5, with_mask: bool = False) -> jnp.ndarray:
    """Windowed 3D kNN over a structured hypothesis grid.

    points: (B, P, 3) with P = G·H·W, ordered g-major then row-major pixels
            (g, y, x) — the layout PointFlow produces.
    grid_shape: (G, H, W); ``window``: odd spatial extent (candidates =
    hypotheses of the win×win pixel neighborhood, all G levels).
    → indices (B, P, k) into the flattened P axis, nearest-first. With
    ``with_mask``, also the (B, NW, G, H, W) uint32 selection bitplanes
    (bit s = candidate gc·win² + dy·win + dx chosen) consumed by the fused
    EdgeConv path (``ops/pallas/edge.py``).

    Corner pixels still have G·⌈win/2⌉² ≥ k valid candidates for the default
    (G=5, win=5, k=16). Invalid (padded) candidates get +inf distance.
    """
    g, h, w = grid_shape
    b = points.shape[0]
    r = window // 2
    assert window % 2 == 1
    assert g * ((r + 1) ** 2) >= k, "not enough in-bounds candidates at corners"
    pts = points.reshape(b, g, h, w, 3)

    # Pad spatially; sentinel coords far away → +inf-ish distances.
    pad = ((0, 0), (0, 0), (r, r), (r, r), (0, 0))
    padded = jnp.pad(pts, pad, constant_values=1e15)

    # Candidate stack: (B, G·win², H, W, 3), plus each candidate's flat index.
    cand_list = []
    idx_list = []
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    for gg in range(g):
        for dy in range(window):
            for dx in range(window):
                cand_list.append(padded[:, gg, dy:dy + h, dx:dx + w])
                yy = row_ids + (dy - r)
                xx = col_ids + (dx - r)
                inside = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
                flat = gg * h * w + jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
                idx_list.append(jnp.where(inside, flat, -1))
    cand = jnp.stack(cand_list, axis=1)                      # (B, C, H, W, 3)
    cand_idx = jnp.stack(idx_list, axis=0)                   # (C, H, W)
    c = cand.shape[1]

    # Distances query-hypothesis-wise: (B, G, C, H, W)
    d2 = jnp.sum(jnp.square(pts[:, :, None] - cand[:, None]), axis=-1)
    d2 = jnp.where((cand_idx < 0)[None, None], _BIG, d2)
    # top-k smallest along the candidate axis, ordered by the same packed
    # key the Pallas kernel minimizes (ops/pallas/knn.py): candidate id in
    # the low 7 mantissa bits of the non-negative-f32 bit pattern — ties
    # and sub-quantum distance differences resolve to the lower candidate
    # id identically in both implementations.
    d2 = jnp.moveaxis(d2, 2, -1)                             # (B, G, H, W, C)
    if c <= 128:
        key = ((jax.lax.bitcast_convert_type(d2, jnp.int32)
                & jnp.int32(~0x7F)) | jnp.arange(c, dtype=jnp.int32))
        _, nn = jax.lax.top_k(-key, k)                       # (B, G, H, W, k)
    else:  # window too large to pack ids (test/debug-only configs):
        _, nn = jax.lax.top_k(-d2, k)                        # plain ordering
    flat_nn = jnp.take_along_axis(
        jnp.broadcast_to(cand_idx.transpose(1, 2, 0)[None, None], (b, g, h, w, c)),
        nn, axis=-1)
    idx = flat_nn.reshape(b, g * h * w, k)
    if not with_mask:
        return idx
    # nn holds candidate ids in (gg, dy, dx) stack order = the shift id s;
    # OR k one-bit words together per uint32 plane
    import functools as _ft
    nw = -(-c // 32)
    planes = []
    for wi in range(nw):
        bits = jnp.where(nn // 32 == wi,
                         jnp.left_shift(jnp.uint32(1),
                                        (nn % 32).astype(jnp.uint32)),
                         jnp.uint32(0))
        planes.append(_ft.reduce(jnp.bitwise_or,
                                 [bits[..., i] for i in range(k)]))
    mask = jnp.stack(planes, axis=1)                         # (B, NW, G, H, W)
    return idx, mask


def blockwise_knn(queries: jnp.ndarray, keys: jnp.ndarray, k: int,
                  block: int = 2048) -> jnp.ndarray:
    """Exact global kNN without materializing the (N, M) distance matrix.

    queries (B, N, 3), keys (B, M, 3) → indices (B, N, k) into M,
    nearest-first. Keys stream in ``block``-sized chunks; a running
    (k + block) merge keeps peak memory at O(N·block).
    """
    b, n, _ = queries.shape
    m = keys.shape[1]
    nblk = -(-m // block)
    pad_m = nblk * block
    keys_p = jnp.pad(keys, ((0, 0), (0, pad_m - m), (0, 0)))
    q_sq = jnp.sum(jnp.square(queries), axis=-1, keepdims=True)      # (B, N, 1)

    def body(i, state):
        best_d, best_i = state
        kb = jax.lax.dynamic_slice_in_dim(keys_p, i * block, block, axis=1)
        k_sq = jnp.sum(jnp.square(kb), axis=-1)                      # (B, blk)
        # −2·q·kᵀ on the MXU
        cross = jnp.einsum("bnc,bmc->bnm", queries, kb)
        d2 = q_sq + k_sq[:, None, :] - 2.0 * cross                   # (B, N, blk)
        idx = i * block + jax.lax.broadcasted_iota(jnp.int32, (1, 1, block), 2)
        d2 = jnp.where(idx >= m, _BIG, d2)
        cat_d = jnp.concatenate([best_d, d2], axis=-1)
        cat_i = jnp.concatenate([best_i, jnp.broadcast_to(idx, d2.shape)], axis=-1)
        neg_top, pos = jax.lax.top_k(-cat_d, k)
        return -neg_top, jnp.take_along_axis(cat_i, pos, axis=-1)

    init_d = jnp.full((b, n, k), _BIG)
    init_i = jnp.zeros((b, n, k), jnp.int32)
    _, best_i = jax.lax.fori_loop(0, nblk, body, (init_d, init_i))
    return best_i


def _use_pallas(impl: str, h: int) -> bool:
    return impl == "pallas" or (
        impl == "auto" and jax.default_backend() == "tpu" and h % 8 == 0)


def window_knn_auto(points: jnp.ndarray, grid_shape: Tuple[int, int, int],
                    k: int, window: int = 5, impl: str = "auto") -> jnp.ndarray:
    """Dispatch between the XLA reference and the Pallas TPU kernel
    (``MODEL.KNN_IMPL``): "auto" → Pallas on TPU when the grid qualifies."""
    if _use_pallas(impl, grid_shape[1]):
        from pointmvsnet_tpu.ops.pallas.knn import pallas_window_knn
        return pallas_window_knn(points, grid_shape, k, window)
    return window_knn(points, grid_shape, k, window)


def window_knn_mask_auto(points: jnp.ndarray,
                         grid_shape: Tuple[int, int, int],
                         k: int, window: int = 5, impl: str = "auto"):
    """``window_knn_auto`` + the window-selection bitmask → (idx, mask).
    The Pallas kernel emits the mask for free during top-k; the XLA path
    derives it from the candidate ids."""
    if _use_pallas(impl, grid_shape[1]):
        from pointmvsnet_tpu.ops.pallas.knn import pallas_window_knn_mask
        return pallas_window_knn_mask(points, grid_shape, k, window)
    return window_knn(points, grid_shape, k, window, with_mask=True)


def knn_indices_bruteforce(points: jnp.ndarray, k: int) -> jnp.ndarray:
    """Dense O(N²) reference implementation (tests only): the semantics the
    reference's plain-torch distance-matrix + topk path computes."""
    d2 = jnp.sum(jnp.square(points[:, :, None] - points[:, None]), axis=-1)
    _, idx = jax.lax.top_k(-d2, k)
    return idx
