"""Complete PyTorch mirror of PointMVSNet, in the reference's idiom.

Reference counterpart: ``pointmvsnet/model.py :: PointMVSNet`` plus
``modules/networks.py`` and ``utils/feature_fetcher.py`` (SURVEY.md §2.4–2.10,
§3.3–3.4). The real reference mount is empty (SURVEY.md §0), so this mirror —
NCHW tensors, ``F.grid_sample``, dense torch ops, ``nn.DataParallel``-style
single-module forward — is the executable reconstruction of the reference
used to prove END-TO-END weight convertibility and numerical parity of the
TPU rebuild (SURVEY.md §7 steps 4–5): torch weights → ``convert_state_dict``
→ flax → identical depth maps.

Module registration order matters: the converter's greedy same-shape match
consumes torch tensors in state_dict order against naturally-sorted flax
paths, so attributes are declared in the flax sort order (img_conv <
point_flow < vol_conv; within VolumeConv the final conv before the deconvs).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# building blocks (mirror models/blocks.py semantics in torch idiom)
# ---------------------------------------------------------------------------

def conv_bn(cin, cout, k, s):
    return [tnn.Conv2d(cin, cout, k, s, padding=k // 2, bias=False),
            tnn.BatchNorm2d(cout), tnn.ReLU()]


def conv3d_bn(cin, cout, k, s):
    return [tnn.Conv3d(cin, cout, k, s, padding=k // 2, bias=False),
            tnn.BatchNorm3d(cout), tnn.ReLU()]


class TorchImageConv(tnn.Module):
    """Mirror of models/image_conv.py :: ImageConv (reference ImageConv,
    SURVEY.md §2.4): 4-level shared-weight pyramid."""

    def __init__(self, c=8):
        super().__init__()
        self.net0 = tnn.Sequential(*conv_bn(3, c, 3, 1), *conv_bn(c, c, 3, 1))
        self.net1 = tnn.Sequential(*conv_bn(c, 2 * c, 5, 2),
                                   *conv_bn(2 * c, 2 * c, 3, 1),
                                   *conv_bn(2 * c, 2 * c, 3, 1))
        self.net2 = tnn.Sequential(*conv_bn(2 * c, 4 * c, 5, 2),
                                   *conv_bn(4 * c, 4 * c, 3, 1),
                                   *conv_bn(4 * c, 4 * c, 3, 1))
        self.net3 = tnn.Sequential(*conv_bn(4 * c, 8 * c, 5, 2),
                                   *conv_bn(8 * c, 8 * c, 3, 1),
                                   *conv_bn(8 * c, 8 * c, 3, 1))

    def forward(self, x):
        c0 = self.net0(x)
        c1 = self.net1(c0)
        c2 = self.net2(c1)
        c3 = self.net3(c2)
        return c0, c1, c2, c3


class TorchEdgeConv(tnn.Module):
    """Mirror of models/edge_conv.py :: EdgeConv (reference EdgeConv,
    SURVEY.md §2.7): gather k neighbors, edge = concat(x_i, x_j − x_i),
    1×1 Conv2d over (B, 2C, N, K), BN, ReLU, max over K."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv = tnn.Conv2d(2 * cin, cout, 1, bias=False)
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, x, idx):
        # x (B, C, N); idx (B, N, K) flat indices into N
        b, c, n = x.shape
        k = idx.shape[-1]
        flat = idx.reshape(b, 1, n * k).expand(b, c, n * k)
        neigh = torch.gather(x, 2, flat).reshape(b, c, n, k)
        center = x[..., None].expand(b, c, n, k)
        edge = torch.cat([center, neigh - center], dim=1)   # (B, 2C, N, K)
        return F.relu(self.bn(self.conv(edge))).max(dim=3).values


class TorchFlowHead(tnn.Module):
    """Mirror of the SharedMLP flow head (models/blocks.py :: SharedMLP with
    last_relu=False, last_norm=False): 1×1 Conv1d stack, final layer raw."""

    def __init__(self, cin, channels: Sequence[int] = (64, 64, 16, 1)):
        super().__init__()
        layers: List[tnn.Module] = []
        prev = cin
        for f in channels[:-1]:
            layers += [tnn.Conv1d(prev, f, 1, bias=False),
                       tnn.BatchNorm1d(f), tnn.ReLU()]
            prev = f
        layers.append(tnn.Conv1d(prev, channels[-1], 1, bias=True))
        self.net = tnn.Sequential(*layers)

    def forward(self, x):
        return self.net(x)


class TorchPointFlow(tnn.Module):
    """Mirror of models/pointmvsnet.py :: PointFlowCore — weights shared
    across iterations as in the reference's single flow module."""

    def __init__(self, cin, edge_channels=(32, 32, 64),
                 flow_channels=(64, 64, 16, 1), m=2, k=16, window=5):
        super().__init__()
        self.m, self.k, self.window = m, k, window
        chans = [cin] + list(edge_channels)
        # flax sort order within point_flow/core: EdgeConv_0..2, SharedMLP_0
        self.edge0 = TorchEdgeConv(chans[0], chans[1])
        self.edge1 = TorchEdgeConv(chans[1], chans[2])
        self.edge2 = TorchEdgeConv(chans[2], chans[3])
        self.head = TorchFlowHead(sum(edge_channels), flow_channels)

    def forward(self, levels, cams_levels, ref_cam, cur_depth, step):
        # levels: [(B, V, C, h_l, w_l)]; cur_depth (B, h, w); step (B,)
        b, h, w = cur_depth.shape
        g = 2 * self.m + 1
        n = h * w
        offsets = torch.arange(g, dtype=cur_depth.dtype) - self.m
        hyp = cur_depth.reshape(b, 1, n) + offsets[None, :, None] * step[:, None, None]
        pix = pixel_grid_torch(h, w)                               # (N, 3)
        pts = unproject_torch(pix[None, None], hyp,
                              ref_cam[:, None, 0], ref_cam[:, None, 1, :3, :3])
        x = pts.reshape(b, g * n, 3)

        feats = []
        for fmap, cams_l in zip(levels, cams_levels):
            sampled = fetch_features_torch(fmap, x, cams_l)        # (B, V, C, G·N)
            mean = sampled.mean(dim=1)
            var = sampled.pow(2).mean(dim=1) - mean.pow(2)
            feats.append(var)
        point_feat = torch.cat(feats, dim=1)                       # (B, ΣC, G·N)

        idx = window_knn_torch(x, (g, h, w), self.k, self.window)

        outs = []
        y = point_feat
        for ec in (self.edge0, self.edge1, self.edge2):
            y = ec(y, idx)
            outs.append(y)
        logits = self.head(torch.cat(outs, dim=1))                 # (B, 1, G·N)
        prob = torch.softmax(logits.reshape(b, g, n), dim=1)
        residual = torch.einsum("bgn,g->bn", prob, offsets) * step[:, None]
        return cur_depth + residual.reshape(b, h, w)


class TorchVolumeConv(tnn.Module):
    """Mirror of models/volume_conv.py :: VolumeConv (reference VolumeConv,
    SURVEY.md §2.5). ``final`` registered before the deconvs to match the
    flax natural-sort order (ConvBlock_7 < DeconvBlock_0)."""

    def __init__(self, c=8, cin=32):
        super().__init__()
        self.conv0 = tnn.Sequential(*conv3d_bn(cin, c, 3, 1))
        self.down1a = tnn.Sequential(*conv3d_bn(c, 2 * c, 3, 2))
        self.down1b = tnn.Sequential(*conv3d_bn(2 * c, 2 * c, 3, 1))
        self.down2a = tnn.Sequential(*conv3d_bn(2 * c, 4 * c, 3, 2))
        self.down2b = tnn.Sequential(*conv3d_bn(4 * c, 4 * c, 3, 1))
        self.down3a = tnn.Sequential(*conv3d_bn(4 * c, 8 * c, 3, 2))
        self.down3b = tnn.Sequential(*conv3d_bn(8 * c, 8 * c, 3, 1))
        self.final = tnn.Conv3d(c, 1, 3, 1, padding=1, bias=True)
        self.up2 = tnn.Sequential(
            tnn.ConvTranspose3d(8 * c, 4 * c, 3, 2, padding=1,
                                output_padding=1, bias=False),
            tnn.BatchNorm3d(4 * c), tnn.ReLU())
        self.up1 = tnn.Sequential(
            tnn.ConvTranspose3d(4 * c, 2 * c, 3, 2, padding=1,
                                output_padding=1, bias=False),
            tnn.BatchNorm3d(2 * c), tnn.ReLU())
        self.up0 = tnn.Sequential(
            tnn.ConvTranspose3d(2 * c, c, 3, 2, padding=1,
                                output_padding=1, bias=False),
            tnn.BatchNorm3d(c), tnn.ReLU())

    def forward(self, x):
        c0 = self.conv0(x)
        c1 = self.down1b(self.down1a(c0))
        c2 = self.down2b(self.down2a(c1))
        c3 = self.down3b(self.down3a(c2))
        u2 = self.up2(c3) + c2
        u1 = self.up1(u2) + c1
        u0 = self.up0(u1) + c0
        return self.final(u0)


# ---------------------------------------------------------------------------
# geometry + sampling (mirror ops/geometry.py + ops/sampling.py semantics)
# ---------------------------------------------------------------------------

def pixel_grid_torch(h: int, w: int) -> torch.Tensor:
    v, u = torch.meshgrid(torch.arange(h, dtype=torch.float32),
                          torch.arange(w, dtype=torch.float32), indexing="ij")
    return torch.stack([u, v, torch.ones_like(u)], dim=-1).reshape(h * w, 3)


def intrinsic_inverse_torch(K: torch.Tensor) -> torch.Tensor:
    """Analytic pinhole K⁻¹ (matches ops/geometry.py :: intrinsic_inverse
    bit-for-bit in fp32; a generic LU inverse injects ~1e-4 noise)."""
    fx, s, cx = K[..., 0, 0], K[..., 0, 1], K[..., 0, 2]
    fy, cy = K[..., 1, 1], K[..., 1, 2]
    zero, one = torch.zeros_like(fx), torch.ones_like(fx)
    inv_fx, inv_fy = 1.0 / fx, 1.0 / fy
    row0 = torch.stack([inv_fx, -s * inv_fx * inv_fy,
                        (s * cy - cx * fy) * inv_fx * inv_fy], dim=-1)
    row1 = torch.stack([zero, inv_fy, -cy * inv_fy], dim=-1)
    row2 = torch.stack([zero, zero, one], dim=-1)
    return torch.stack([row0, row1, row2], dim=-2)


def unproject_torch(pixels_h, depth, extrinsic, intrinsic):
    """pixels_h (..., N, 3), depth (..., N), extrinsic (..., 4, 4),
    intrinsic (..., 3, 3) → world (..., N, 3)."""
    k_inv = intrinsic_inverse_torch(intrinsic)
    cam_pts = torch.einsum("...ij,...nj->...ni", k_inv, pixels_h) * depth[..., None]
    r = extrinsic[..., :3, :3]
    t = extrinsic[..., :3, 3]
    return torch.einsum("...ji,...nj->...ni", r, cam_pts - t[..., None, :])


def fetch_features_torch(feats, pts, cams):
    """Reference FeatureFetcher: project + grid_sample(align_corners=True,
    zeros), mask points behind the camera.

    feats (B, V, C, H, W), pts (B, N, 3), cams (B, V, 2, 4, 4)
    → (B, V, C, N)
    """
    b, v, c, h, w = feats.shape
    E = cams[:, :, 0]
    K = cams[:, :, 1, :3, :3]
    R, t = E[..., :3, :3], E[..., :3, 3]
    cam_pts = torch.einsum("bvij,bnj->bvni", R, pts) + t[:, :, None]
    proj = torch.einsum("bvij,bvnj->bvni", K, cam_pts)
    z = proj[..., 2]
    safe_z = torch.where(z.abs() < 1e-6, torch.full_like(z, 1e-6), z)
    uv = proj[..., :2] / safe_z[..., None]
    grid = torch.stack([2 * uv[..., 0] / (w - 1) - 1,
                        2 * uv[..., 1] / (h - 1) - 1], dim=-1)
    sampled = F.grid_sample(feats.reshape(b * v, c, h, w),
                            grid.reshape(b * v, 1, -1, 2), mode="bilinear",
                            padding_mode="zeros", align_corners=True)
    sampled = sampled.reshape(b, v, c, -1)
    return sampled * (z[:, :, None] > 0)


def window_knn_torch(points, grid_shape: Tuple[int, int, int], k: int,
                     window: int = 5) -> torch.Tensor:
    """Mirror of ops/knn.py :: window_knn (the reference's get_knn_3d-style
    windowed kNN): candidates = all G hypotheses of the win×win pixel
    neighborhood, same candidate ordering and sentinel semantics."""
    g, h, w = grid_shape
    b = points.shape[0]
    r = window // 2
    pts = points.reshape(b, g, h, w, 3)
    padded = F.pad(pts.permute(0, 1, 4, 2, 3), (r, r, r, r), value=1e15)

    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    cand_list, idx_list = [], []
    for gg in range(g):
        for dy in range(window):
            for dx in range(window):
                cand_list.append(padded[:, gg, :, dy:dy + h, dx:dx + w])
                y2, x2 = yy + (dy - r), xx + (dx - r)
                inside = (y2 >= 0) & (y2 < h) & (x2 >= 0) & (x2 < w)
                flat = gg * h * w + np.clip(y2, 0, h - 1) * w + np.clip(x2, 0, w - 1)
                idx_list.append(np.where(inside, flat, -1))
    cand = torch.stack(cand_list, dim=1)                  # (B, C, 3, H, W)
    cand_idx = torch.from_numpy(np.stack(idx_list)).long()  # (C, H, W)
    nc = cand.shape[1]

    d2 = (pts.permute(0, 1, 4, 2, 3)[:, :, None] - cand[:, None]).pow(2).sum(3)
    d2 = torch.where((cand_idx < 0)[None, None], torch.full_like(d2, 1e30), d2)
    d2 = d2.permute(0, 1, 3, 4, 2)                        # (B, G, H, W, C)
    nn = torch.topk(d2, k, dim=-1, largest=False).indices
    flat_nn = torch.gather(
        cand_idx.permute(1, 2, 0)[None, None].expand(b, g, h, w, nc), -1, nn)
    return flat_nn.reshape(b, g * h * w, k)


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

def scale_cams_np(cams: torch.Tensor, sx: float, sy: float) -> torch.Tensor:
    out = cams.clone()
    out[:, :, 1, 0, :3] *= sx
    out[:, :, 1, 1, :3] *= sy
    return out


def photometric_confidence_torch(prob):
    """Mirror of ops/cost_volume.py :: photometric_confidence."""
    pad = F.pad(prob, (0, 0, 0, 0, 1, 2))
    csum = torch.cumsum(pad, dim=1)
    csum = F.pad(csum, (0, 0, 0, 0, 1, 0))
    win4 = csum[:, 4:] - csum[:, :-4]
    idx = prob.argmax(dim=1, keepdim=True)
    return torch.gather(win4, 1, idx)[:, 0]


class TorchPointMVSNet(tnn.Module):
    """Mirror of models/pointmvsnet.py :: PointMVSNet — coarse plane sweep
    + iterative PointFlow, reference idiom (NCHW, grid_sample)."""

    def __init__(self, img_base=8, vol_base=8, edge_channels=(32, 32, 64),
                 flow_channels=(64, 64, 16, 1), m=2, k=16, window=5,
                 coarse_img_scale=0.5):
        super().__init__()
        self.coarse_img_scale = coarse_img_scale
        cin_flow = img_base + 2 * img_base + 4 * img_base
        # attribute order = flax natural sort: img_conv < point_flow < vol_conv
        self.img_conv = TorchImageConv(img_base)
        self.point_flow = TorchPointFlow(cin_flow, edge_channels,
                                         flow_channels, m, k, window)
        self.vol_conv = TorchVolumeConv(vol_base, 4 * img_base)

    def _pyramid(self, images):
        b, v, _, h, w = images.shape
        c0, c1, c2, _ = self.img_conv(images.reshape(b * v, 3, h, w))
        return [f.reshape(b, v, *f.shape[1:]) for f in (c0, c1, c2)]

    def forward(self, images, cams, img_scales=(0.25, 0.5),
                inter_scales=(0.75, 0.375), num_virtual_plane=48,
                is_flow=True):
        """images (B, V, 3, H, W) normalized; cams (B, V, 2, 4, 4)."""
        b, v, _, height, width = images.shape

        # coarse stage: jax.image.resize(bilinear) == antialiased bilinear
        ch = int(height * self.coarse_img_scale)
        cw = int(width * self.coarse_img_scale)
        imgs_c = F.interpolate(images.reshape(b * v, 3, height, width),
                               (ch, cw), mode="bilinear", align_corners=False,
                               antialias=True)
        feats = self.img_conv(imgs_c)[2]                    # conv2, 1/4 of coarse
        fh, fw = feats.shape[-2:]
        feats = feats.reshape(b, v, -1, fh, fw)
        cams_feat = scale_cams_np(cams, fw / width, fh / height)

        d_min = cams[:, 0, 1, 3, 0]
        d_int = cams[:, 0, 1, 3, 1]
        d = num_virtual_plane
        depths = d_min[:, None] + torch.arange(d, dtype=torch.float32) * d_int[:, None]

        grid = pixel_grid_torch(fh, fw)
        pts = unproject_torch(grid[None, None], depths[..., None].expand(b, d, fh * fw),
                              cams_feat[:, None, 0, 0],
                              cams_feat[:, None, 0, 1, :3, :3])
        pts = pts.reshape(b, d * fh * fw, 3)
        sampled = fetch_features_torch(feats, pts, cams_feat)  # (B, V, C, D·hw)
        mean = sampled.mean(dim=1)
        var = sampled.pow(2).mean(dim=1) - mean.pow(2)
        cost = var.reshape(b, -1, d, fh, fw)

        logits = self.vol_conv(cost)[:, 0]                  # (B, D, fh, fw)
        prob = torch.softmax(logits, dim=1)
        coarse_depth = torch.einsum("bdhw,bd->bhw", prob, depths)
        preds = {"coarse_depth_map": coarse_depth,
                 "coarse_prob_map": photometric_confidence_torch(prob)}
        if not is_flow:
            return preds

        cur = coarse_depth
        for it, (s, inter_s) in enumerate(zip(img_scales, inter_scales)):
            th, tw = int(height * s), int(width * s)
            imgs_s = F.interpolate(images.reshape(b * v, 3, height, width),
                                   (th, tw), mode="bilinear",
                                   align_corners=False, antialias=True)
            levels = self._pyramid(imgs_s.reshape(b, v, 3, th, tw))
            cams_levels = [scale_cams_np(cams, lvl.shape[-1] / width,
                                         lvl.shape[-2] / height)
                           for lvl in levels]
            ref_cam = scale_cams_np(cams, tw / width, th / height)[:, 0]
            cur = F.interpolate(cur[:, None], (th, tw), mode="bilinear",
                                align_corners=False)[:, 0]
            step = d_int * inter_s
            cur = self.point_flow(levels, cams_levels, ref_cam, cur, step)
            preds[f"flow{it + 1}"] = cur
        return preds
