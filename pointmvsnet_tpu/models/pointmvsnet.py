"""Point-MVSNet model assembly: coarse plane-sweep + iterative PointFlow.

Reference counterpart: ``pointmvsnet/model.py :: PointMVSNet,
PointMVSNetLoss, build_pointmvsnet`` (SURVEY.md §2.10, §3.3, §3.4).

Scale bookkeeping (reconstructed; reference constants were unverifiable —
SURVEY.md §0): input images (e.g. 640×512) are resized by
``coarse_img_scale`` (0.5) for the coarse stage; features come out at 1/4
of that, so the coarse depth map is 1/8 input resolution. Flow iterations
then run at ``img_scales`` of the input (train (0.25, 0.5); test adds 1.0),
each upsampling the previous depth and refining it by an expected residual
over 2m+1 per-pixel hypotheses spaced ``inter_scale · depth_interval``
apart along the viewing ray.

The whole forward (coarse + all flow iterations) is one jit region: depth
maps, hypothesis points, kNN graphs and edge convs all stay on device.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from pointmvsnet_tpu.models.edge_conv import EdgeConv
from pointmvsnet_tpu.models.blocks import SharedMLP
from pointmvsnet_tpu.models.image_conv import ImageConv
from pointmvsnet_tpu.models.volume_conv import VolumeConv
from pointmvsnet_tpu.ops.cost_volume import (
    depth_regression,
    photometric_confidence,
    plane_sweep_volume,
)
from pointmvsnet_tpu.ops.geometry import (
    cam_depth_range,
    cam_extrinsics,
    cam_intrinsics,
    depth_hypotheses,
    pixel_grid,
    unproject_pixels,
)
from pointmvsnet_tpu.ops.knn import window_knn_auto, window_knn_mask_auto
from pointmvsnet_tpu.ops.sampling import (
    build_multilevel_table,
    fetch_features_multilevel,
    fetch_features_perlevel,
    regular_grid_sample,
)


def scale_cams(cams: jnp.ndarray, sx: float, sy: float) -> jnp.ndarray:
    """jnp version of ``dataset.preprocess.scale_camera`` for on-device use."""
    cams = jnp.asarray(cams)
    k = cams[..., 1, :, :]
    k = k.at[..., 0, :3].multiply(sx)
    k = k.at[..., 1, :3].multiply(sy)
    return jnp.stack([cams[..., 0, :, :], k], axis=-3)


def _resize_views(images: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(B, V, H, W, C) → (B, V, h, w, C) bilinear."""
    b, v, _, _, c = images.shape
    return jax.image.resize(images, (b, v, h, w, c), method="bilinear")


def hypothesis_points(cur_depth: jnp.ndarray, step: jnp.ndarray, m: int,
                      ref_cam: jnp.ndarray,
                      y_offset=0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hypothesis points along the ref viewing ray for a (band of a) depth
    map: cur_depth (B, h, w) → (pts (B, G·N, 3) g-major, hyp_depth
    (B, G, N)), G = 2m+1."""
    b, h, w = cur_depth.shape
    g = 2 * m + 1
    n = h * w
    offsets = (jnp.arange(g, dtype=cur_depth.dtype) - m)      # (G,)
    hyp_depth = (cur_depth.reshape(b, 1, n)
                 + offsets[None, :, None] * step[:, None, None])  # (B, G, N)
    pix = pixel_grid(h, w, dtype=cur_depth.dtype)             # (N, 3)
    # y_offset may be a traced scalar under the band-parallel vmap —
    # the add is unconditional (XLA folds the +0 of the unbanded case)
    pix = pix + (jnp.asarray(y_offset, cur_depth.dtype)
                 * jnp.asarray([0.0, 1.0, 0.0], cur_depth.dtype))
    pts = unproject_pixels(pix[None, None], hyp_depth,
                           cam_extrinsics(ref_cam)[:, None],
                           cam_intrinsics(ref_cam)[:, None])  # (B, G, N, 3)
    return pts.reshape(b, g * n, 3), hyp_depth


class PointFlowCore(nn.Module):
    """One PointFlow evaluation over a (band of a) depth map: hypothesis
    points → multi-view variance features → windowed kNN → EdgeConvs →
    per-hypothesis probabilities → expected residual."""

    edge_channels: Sequence[int] = (32, 32, 64)
    flow_channels: Sequence[int] = (64, 64, 16, 1)
    m: int = 2
    k: int = 16
    window: int = 5
    norm: str = "bn"
    dtype: jnp.dtype = jnp.float32
    knn_impl: str = "auto"
    moments: object = "auto"        # "on" | "off" | "auto" (on at eval) | bool
    src_dtype: object = None        # cast per-view source features (e.g. bf16)

    @nn.compact
    def __call__(self, levels: List[jnp.ndarray], cams_levels: List[jnp.ndarray],
                 ref_cam: jnp.ndarray, cur_depth: jnp.ndarray, step: jnp.ndarray,
                 y_offset: int = 0, full_h: int = 0,
                 train: bool = False,
                 src_table: jnp.ndarray | None = None,
                 fetch: str = "table") -> jnp.ndarray:
        """cur_depth (B, h, w) is rows [y_offset, y_offset+h) of the full
        flow-resolution depth map (height ``full_h``, defaulting to h);
        ``src_table`` is the precomputed multilevel patch table over the
        source views (shared across bands); ``fetch`` selects the source
        fetch kernel ("table" = ONE combined-table gather per hypothesis
        point; "bilinear" = per-level 2×2-table gathers — the measured
        full-pipeline winner, see benchmarks/results/fetch_ab_r5.json).
        A pixel-grouped third engine (one patch row per PIXEL, hypotheses
        reconstructed on the VPU) was built, measured, and excised in
        round 5: it lost to "bilinear" at eval (279 vs 219 ms/map) and
        OOM'd under the train backward — see docs/STATUS.md and git
        history of ops/grouped_fetch.py. Returns the refined band."""
        b, h, w = cur_depth.shape
        g = 2 * self.m + 1
        n = h * w
        full_h = full_h or h

        # --- hypothesis points along the ref viewing ray ------------------
        offsets = (jnp.arange(g, dtype=cur_depth.dtype) - self.m)  # (G,)
        x, hyp_depth = hypothesis_points(cur_depth, step, self.m, ref_cam,
                                         y_offset)

        # --- multi-scale multi-view point features (variance over views) --
        # Reference-view shortcut: view 0's projection of the hypothesis
        # points is the (scaled) pixel grid for every hypothesis depth, so
        # its fetch is one dense regular-grid resample shared across the G
        # hypotheses (masked where the hypothesis depth is non-positive,
        # matching the z>0 gate of the projective path) — only the V−1
        # source views pay for point gathers.
        nv = levels[0].shape[1]
        ref_valid = (hyp_depth > 0).reshape(b, g, n)[..., None]       # (B,G,N,1)
        ref_parts = []
        for fmap in levels:
            rh, rw = fmap.shape[2], fmap.shape[3]
            ref_s = regular_grid_sample(fmap[:, 0], rw / w, rh / full_h,
                                        h, w, y_offset)               # (B, N, C)
            ref_s = jnp.where(ref_valid, ref_s[:, None], 0.0)         # (B,G,N,C)
            ref_parts.append(ref_s.reshape(b, g * n, -1))
        ref_all = jnp.concatenate(ref_parts, axis=-1)                 # (B, G·N, ΣC)
        # All 3 pyramid levels in ONE gather per source view (bit-exact to
        # per-level fetches — see fetch_features_multilevel); variance over
        # views is per-channel, so concat-then-reduce == reduce-then-concat.
        # MODEL.FLOW_MOMENTS "auto": fused f32 moments EVERYWHERE — the
        # measured full-pipeline winner at eval (207 vs 218 ms/map,
        # benchmarks/results/knob_ab_r5.json) AND at train (backward
        # measured r5: bilinear+mom 0.8305 vs bilinear 0.8492 s/step,
        # composing with REMAT_SAVE=feat to 0.8238 — train_ab_r5.json).
        moments = (self.moments if isinstance(self.moments, bool)
                   else {"on": True, "off": False}.get(self.moments, True))
        reduce = "moments" if moments else "stack"
        if fetch == "bilinear":
            # per-level 2×2-table bilinear gathers — no wide patch table,
            # no fallback cond (vmap-safe); the measured in-situ winner at
            # the DTU headline (see ops/sampling.py::fetch_features_perlevel).
            src = fetch_features_perlevel(
                [fmap[:, 1:] for fmap in levels], x, cams_levels[0][:, 1:],
                reduce=reduce, out_dtype=self.src_dtype)
        else:
            src = fetch_features_multilevel(
                [fmap[:, 1:] for fmap in levels], x,
                cams_levels[0][:, 1:], table=src_table,
                reduce=reduce)                                        # (B,V-1,G·N,ΣC)
        if moments:
            # Σf / Σf² accumulated per view in f32 (never materializes the
            # V-view stack; slightly MORE precise than the stacked bf16
            # square-sum — intentional, MODEL.FLOW_MOMENTS)
            s1, s2 = src
            mean = (ref_all + s1) / nv
            sq_mean = (jnp.square(ref_all) + s2) / nv
        else:
            # reductions promote to f32 (fused into the reduce by XLA), so
            # a bf16 ``src_dtype`` only quantizes the stored features, not
            # the accumulation
            mean = (ref_all
                    + jnp.sum(src, axis=1, dtype=jnp.float32)) / nv
            sq_mean = (jnp.square(ref_all)
                       + jnp.sum(jnp.square(src.astype(jnp.float32)),
                                 axis=1)) / nv
        point_feat = sq_mean - jnp.square(mean)                       # (B, G·N, ΣC)
        # under MODEL.REMAT with "feat" in MODEL.REMAT_SAVE the policy keeps
        # this tensor, so the backward skips recomputing the multi-view
        # fetch + variance (the forward's dominant chunk) at the cost of
        # one (B, G·N, ΣC) buffer per iteration
        point_feat = checkpoint_name(point_feat, "feat")
        import os as _os
        if _os.environ.get("POINTFLOW_BARRIER"):   # trace-time scheduling probe
            point_feat = jax.lax.optimization_barrier(point_feat)

        # --- kNN graph over the structured hypothesis grid ----------------
        # stop_gradient on the INPUT: indices are non-differentiable and the
        # Pallas kernel has no JVP rule — don't let tangents reach it
        pts32 = jax.lax.stop_gradient(x).astype(jnp.float32)
        # eval + BatchNorm/none: also take the window-selection bitmask so
        # EdgeConv can use the masked-window-max fast path (no row gathers)
        fast = not train and self.norm in ("bn", "none")
        if fast:
            idx, mask = window_knn_mask_auto(pts32, (g, h, w), self.k,
                                             self.window, impl=self.knn_impl)
        else:
            idx = window_knn_auto(pts32, (g, h, w), self.k, self.window,
                                  impl=self.knn_impl)
            mask = None
        # under MODEL.REMAT the backward recomputes this core; the kNN
        # top-k is pure integer output (no tangents flow through it), so
        # saving it skips the distance+selection kernel in the recompute
        # (PointFlow.setup's save_only_these_names policy) at the cost of
        # one small int buffer per iteration
        idx = checkpoint_name(idx, "knn")
        if mask is not None:
            mask = checkpoint_name(mask, "knn")

        # --- EdgeConv stack + flow head -----------------------------------
        edge_outs = []
        y = point_feat
        for c in self.edge_channels:
            y = EdgeConv(c, norm=self.norm, dtype=self.dtype)(
                y, idx, train, mask=mask, grid_shape=(g, h, w),
                window=self.window, impl=self.knn_impl)
            edge_outs.append(y)
        cat = jnp.concatenate(edge_outs, axis=-1)
        logits = SharedMLP(self.flow_channels, norm=self.norm,
                           last_relu=False, last_norm=False,
                           dtype=self.dtype)(cat, train)              # (B, G·N, 1)
        prob = jax.nn.softmax(logits.reshape(b, g, n), axis=1)
        residual = jnp.einsum("bgn,g->bn", prob, offsets) * step[:, None]
        return cur_depth + residual.reshape(b, h, w)


def resolve_chunk_rows(h: int, w: int, g: int, f_max: int) -> int:
    """AUTO flow band height: 0 (unbanded) when the full-height EdgeConv
    masked-window-max fits its VMEM budget, else the best band height in
    {64, 128, 32, 16, 8} (preference order) that divides ``h`` and whose
    band (+2·8 halo) fits. Keeping the Pallas fast path engaged is worth
    ~6× at eval (the knob-A/B chunk cliff). 64 leads the order: it beat
    128 in BOTH knob A/B waves at 640×512 (202.2 vs 207.2 ms with
    moments, 214.9 vs 217.9 stacked — knob_ab_r5{,b}.json) and beat 32
    at 1280×1024 (1.20 vs 1.37 s — tt_sweep_r5.json); past 64 the order
    is by size (amortize per-band fixed costs). Falls back to 8 if
    nothing fits (never observed: a 24-row band fits at any width a TPU
    can hold the pyramid for)."""
    from pointmvsnet_tpu.ops.pallas.edge import masked_window_max_fits
    if masked_window_max_fits(g, h, w, f_max, 5, 4):
        return 0
    for cr in (64, 128, 32, 16, 8):
        if h % cr == 0 and h > cr + 16 and masked_window_max_fits(
                g, cr + 16, w, f_max, 5, 4):
            return cr
    return 8


class PointFlow(nn.Module):
    """PointFlow refinement step (weights shared across iterations, as in
    the reference's single flow module applied iteratively).

    ``chunk_rows``: when > 0 and the map is taller, the depth map is
    processed in row bands of that height with an 8-row halo, bounding
    peak memory so the 640×512 full-resolution test iteration fits one
    chip (the reference's O(N²) memory wall, SURVEY.md §5).
    Exactness: bit-identical to the unchunked pass with BatchNorm in eval
    mode (the halo covers the ±6-row receptive field of the three stacked
    EdgeConvs plus the kNN window); with GroupNorm (whose statistics
    reduce over the point axis) band boundaries perturb results by
    ~1e-2 depth units — chunking is an eval-memory feature, leave it 0
    for GN training parity."""

    edge_channels: Sequence[int] = (32, 32, 64)
    flow_channels: Sequence[int] = (64, 64, 16, 1)
    m: int = 2
    k: int = 16
    window: int = 5
    norm: str = "bn"
    dtype: jnp.dtype = jnp.float32
    knn_impl: str = "auto"
    chunk_rows: int = 0
    remat: bool = False
    remat_save: Sequence[str] = ("knn",)  # checkpoint names the policy saves
    band_mesh: object = None   # jax.sharding.Mesh with a "band" axis, or None
    fetch: str = "auto"        # "table" | "bilinear" | "auto"
    moments: object = "auto"   # per-view Σf/Σf² accumulation (MODEL.FLOW_MOMENTS)
    src_dtype: object = None   # per-view source-feature dtype (MODEL.FLOW_SRC_DTYPE)

    def setup(self):
        core_cls = PointFlowCore
        if self.remat:
            # trade FLOPs for memory: recompute the flow activations in the
            # backward pass (MODEL.REMAT; useful for large train batches).
            # MODEL.REMAT_SAVE picks the saved residuals: "knn" keeps the
            # kNN graph (integer idx/mask — cheap to store, expensive to
            # recompute); "feat" additionally keeps the variance point-
            # feature (skips the fetch+variance recompute); everything else
            # rematerializes as with the default nothing-saved policy.
            core_cls = nn.remat(
                PointFlowCore, static_argnums=(6, 7, 8, 10),
                policy=jax.checkpoint_policies.save_only_these_names(
                    *self.remat_save))
        self.core = core_cls(self.edge_channels, self.flow_channels,
                             self.m, self.k, self.window, self.norm,
                             self.dtype, self.knn_impl,
                             moments=self.moments,
                             src_dtype=self.src_dtype)

    def __call__(self, levels: List[jnp.ndarray], cams_levels: List[jnp.ndarray],
                 ref_cam: jnp.ndarray, cur_depth: jnp.ndarray, step: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        b, h, w = cur_depth.shape
        cr = self.chunk_rows
        if cr == -1:
            # AUTO band height (MODEL.FLOW_CHUNK_ROWS=-1): pick the largest
            # band that keeps EdgeConv's Pallas masked-window-max inside its
            # VMEM budget. The r5 knob A/B found a ~6× CLIFF between 128-
            # and 256-row bands at 640 wide (218 → 1296 ms/map) — the fit
            # check fails and eval silently falls back to the latency-bound
            # neighbor-gather path. A 128-row band at 1280 wide sits on the
            # same bad side (it equals 256@640 in area), which is the
            # historic 6 s/map T&T wall (benchmarks/results/knob_ab_r5.json,
            # tt_sweep_r5.json). Resolved per flow iteration: each scale has
            # its own (h, w). Train stays UNBANDED: per-band BN batch
            # statistics would diverge from the reference's whole-map BN
            # semantics (banding is an eval memory/VMEM feature).
            cr = 0 if train else resolve_chunk_rows(h, w, 2 * self.m + 1,
                                                    max(self.edge_channels))
        if self.fetch == "auto":
            # per-level bilinear everywhere — the measured winner at eval
            # (r5 same-session A/B, 219 vs table's 311 ms/map —
            # benchmarks/results/fetch_ab_r5.json) AND at train (backward
            # measured r5: 0.8492 vs table's 0.8547 s/step at the reference
            # train config — benchmarks/results/train_ab_r5.json; it also
            # skips the combined patch table, the train graph's widest
            # buffer).
            fetch = "bilinear"
        else:
            fetch = self.fetch
        if fetch not in ("table", "bilinear"):
            raise ValueError(
                f"MODEL.FLOW_FETCH={fetch!r}: valid engines are 'table', "
                f"'bilinear', 'auto'. Two engines were built, measured, "
                f"and excised in round 5: the pixel-'grouped' fetch "
                f"(slower at eval, OOM at train) and the Pallas windowed-"
                f"VMEM gather 'bilinear_p' (Mosaic has no usable in-kernel "
                f"row gather: internal compiler error — see docs/STATUS.md "
                f"and git history)")

        if cr <= 0 or h <= cr + 16:  # too short to band (bs = cr + 2·halo)
            return self.core(levels, cams_levels, ref_cam, cur_depth, step,
                             0, h, train, None, fetch)
        if fetch == "bilinear":
            # per-level 2×2 tables are built inside bilinear_sample (cheap
            # fused pad+concat, band-independent); nothing to hoist
            src_table = None
        else:
            # the multilevel source patch table is band-independent — build
            # it once here so every band samples the same buffer (peak HBM
            # stays one table, and the queued eval stream doesn't rebuild it)
            src_table = build_multilevel_table([f[:, 1:] for f in levels])
        assert h % cr == 0 and cr % 8 == 0, (
            f"FLOW_CHUNK_ROWS={cr} must divide the flow height {h} and be a "
            f"multiple of 8")
        # fixed-size 8-aligned bands: halo 8 ≥ 3·(window//2) covers the full
        # receptive field of the THREE stacked EdgeConvs (±2 rows each), so
        # banded == unbanded exactly under eval BatchNorm; (cr + 16) % 8 == 0
        # keeps the Pallas kernels eligible, and a clamped window makes every
        # band the SAME shape (one compile).
        halo = 8
        bs = cr + 2 * halo
        y0s = list(range(0, h, cr))
        los = [min(max(0, y0 - halo), h - bs) for y0 in y0s]

        if self.band_mesh is not None:
            # band-parallel eval: the bands are independent given the
            # (replicated) pyramid, so vmap them into a leading axis and
            # shard that axis over the mesh's "band" dimension — each chip
            # refines its own rows; XLA all-gathers at the final concat.
            # This is the model's spatial/sequence-parallel scaling axis
            # (SURVEY.md §5): single-map flow latency ÷ mesh band size.
            assert not self.remat, "band-parallel flow is eval-only"
            from jax.sharding import NamedSharding, PartitionSpec
            spec = NamedSharding(self.band_mesh, PartitionSpec("band"))
            stacked = jnp.stack([cur_depth[:, lo:lo + bs] for lo in los])
            stacked = jax.lax.with_sharding_constraint(stacked, spec)
            lo_arr = jnp.asarray(los, jnp.int32)

            out = nn.vmap(
                lambda core, depth_b, lo_b: core(
                    levels, cams_levels, ref_cam, depth_b, step, lo_b,
                    h, train, src_table, fetch),
                in_axes=(0, 0), out_axes=0,
                variable_axes={"params": None, "batch_stats": None},
                split_rngs={"params": False},
            )(self.core, stacked, lo_arr)                  # (P, B, bs, w)
            out = jax.lax.with_sharding_constraint(out, spec)
            bands = [out[i][:, y0 - lo: y0 - lo + cr]
                     for i, (y0, lo) in enumerate(zip(y0s, los))]
            return jnp.concatenate(bands, axis=1)

        outs = []
        for y0, lo in zip(y0s, los):
            band = self.core(levels, cams_levels, ref_cam,
                             cur_depth[:, lo:lo + bs], step, lo, h, train,
                             src_table, fetch)
            outs.append(band[:, y0 - lo: y0 - lo + cr])
        return jnp.concatenate(outs, axis=1)


class PointMVSNet(nn.Module):
    """Full model. ``__call__`` args after ``cams`` are static (Python)."""

    img_base_channels: int = 8
    vol_base_channels: int = 8
    edge_channels: Sequence[int] = (32, 32, 64)
    flow_channels: Sequence[int] = (64, 64, 16, 1)
    flow_m: int = 2
    knn: int = 16
    knn_window: int = 5
    norm: str = "bn"
    coarse_img_scale: float = 0.5
    dtype: jnp.dtype = jnp.float32
    knn_impl: str = "auto"
    flow_chunk_rows: int = 0
    remat: bool = False
    remat_save: Sequence[str] = ("knn",)  # MODEL.REMAT_SAVE
    band_mesh: object = None   # Mesh with a "band" axis → band-parallel flow
    view_mesh: object = None   # Mesh with a "view" axis → view-parallel cost
    flow_fetch: str = "auto"   # "table" | "bilinear" | "auto"
    coarse_fetch: str = "mxu"  # plane-sweep warp: "mxu" | "take"
    flow_moments: object = "auto"  # fused per-view moment accumulation
    flow_src_dtype: object = None  # per-view source-feature dtype (None = f32)

    def setup(self):
        self.img_conv = ImageConv(self.img_base_channels, self.norm, self.dtype)
        self.vol_conv = VolumeConv(self.vol_base_channels, self.norm, self.dtype)
        self.point_flow = PointFlow(self.edge_channels, self.flow_channels,
                                    self.flow_m, self.knn, self.knn_window,
                                    self.norm, self.dtype, self.knn_impl,
                                    self.flow_chunk_rows, self.remat,
                                    self.remat_save,
                                    self.band_mesh, fetch=self.flow_fetch,
                                    moments=self.flow_moments,
                                    src_dtype=self.flow_src_dtype)

    def _pyramid(self, images: jnp.ndarray, train: bool) -> Dict[str, jnp.ndarray]:
        """Run the shared 2D CNN over all views folded into batch."""
        b, v, h, w, c = images.shape
        out = self.img_conv(images.reshape(b * v, h, w, c), train)
        return {k: f.reshape(b, v, *f.shape[1:]) for k, f in out.items()}

    def __call__(self, images: jnp.ndarray, cams: jnp.ndarray,
                 is_flow: bool = True,
                 img_scales: Sequence[float] = (0.25, 0.5),
                 inter_scales: Sequence[float] = (0.75, 0.375),
                 num_virtual_plane: int = 48,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        """images (B, V, H, W, 3) normalized; cams (B, V, 2, 4, 4) at image
        resolution; view 0 is the reference view."""
        b, v, height, width, _ = images.shape
        if height % 64 or width % 64:
            raise ValueError(
                f"input {height}x{width} must be divisible by 64 (coarse "
                f"stage 1/8 + 3-level volume U-Net); crop_mvs_input(base=64) "
                f"in the data plane produces compliant shapes")
        if num_virtual_plane % 8:
            raise ValueError(f"num_virtual_plane={num_virtual_plane} must be "
                             f"divisible by 8 (volume U-Net strides)")
        dtype = self.dtype
        images = images.astype(dtype)

        # ---------------- coarse stage (SURVEY §3.3) ----------------------
        ch = int(height * self.coarse_img_scale)
        cw = int(width * self.coarse_img_scale)
        coarse_imgs = _resize_views(images, ch, cw)
        # the shared CNN emits the whole pyramid; keep it so an eval flow
        # iteration at the same scale (0.5 matches coarse_img_scale at the
        # standard TEST.IMG_SCALES) reuses it instead of re-running the
        # 5-view ImageConv — exact (same module/params/inputs; eval BN has
        # no stats side-effects, so only the eval path shares)
        coarse_pyr = self._pyramid(coarse_imgs, train)
        feats = coarse_pyr["conv2"]                           # (B, V, fh, fw, C)
        fh, fw = feats.shape[2], feats.shape[3]
        cams_feat = scale_cams(cams, fw / width, fh / height)  # stays fp32

        d_min, d_int, _, _ = cam_depth_range(cams[:, 0])
        depths = depth_hypotheses(d_min, d_int, num_virtual_plane)  # fp32

        if self.view_mesh is not None:
            # shard the V axis over the mesh's "view" dimension: each chip
            # warps only its own views; two psums combine the variance
            # moments over ICI (PARALLEL.VIEW, high-view-count eval)
            from pointmvsnet_tpu.parallel.view_parallel import (
                view_sharded_plane_sweep,
            )
            n_view = self.view_mesh.shape["view"]
            if v % n_view:
                raise ValueError(
                    f"PARALLEL.VIEW={n_view} must divide the view count {v}")
            cost = view_sharded_plane_sweep(feats, cams_feat, cams_feat[:, 0],
                                            depths, self.view_mesh,
                                            impl=self.coarse_fetch)
        else:
            cost = plane_sweep_volume(feats, cams_feat, depths,
                                      impl=self.coarse_fetch)
        logits = self.vol_conv(cost, train)[..., 0]               # (B, D, fh, fw)
        prob = jax.nn.softmax(logits.astype(jnp.float32), axis=1)
        coarse_depth = depth_regression(prob, depths.astype(jnp.float32))
        preds: Dict[str, jnp.ndarray] = {
            "coarse_depth_map": coarse_depth,
            "coarse_prob_map": photometric_confidence(prob),
        }

        if not is_flow:
            return preds

        # ---------------- PointFlow iterations (SURVEY §3.4) --------------
        cur = coarse_depth
        for it, (s, inter_s) in enumerate(zip(img_scales, inter_scales)):
            th, tw = int(height * s), int(width * s)
            if not train and (th, tw) == (ch, cw):
                pyr = coarse_pyr
            else:
                imgs_s = _resize_views(images, th, tw)
                pyr = self._pyramid(imgs_s, train)
            levels = [pyr["conv0"], pyr["conv1"], pyr["conv2"]]
            cams_levels = [
                scale_cams(cams, lvl.shape[3] / width, lvl.shape[2] / height)
                for lvl in levels
            ]
            ref_cam = scale_cams(cams[:, 0], tw / width, th / height).astype(jnp.float32)
            cur = jax.image.resize(cur, (b, th, tw), method="bilinear")
            # the iteration's input depth, for VALID_THRESHOLD loss masking
            preds[f"flow{it + 1}_input"] = jax.lax.stop_gradient(cur)
            step = (d_int * inter_s).astype(jnp.float32)
            cur = self.point_flow(levels, cams_levels, ref_cam, cur, step, train)
            preds[f"flow{it + 1}"] = cur
        return preds
