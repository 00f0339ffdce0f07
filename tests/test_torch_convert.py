"""Weight-converter parity tests: torch module mirrors → converted flax
params → OUTPUT equality in eval mode (SURVEY.md §7 step 5; the layout
transposes and padding semantics are where parity silently dies)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn

from pointmvsnet_tpu.models.image_conv import ImageConv
from pointmvsnet_tpu.models.volume_conv import VolumeConv
from pointmvsnet_tpu.utils.torch_convert import (
    convert_state_dict,
    load_pth,
    torch_conv_to_flax,
    torch_deconv_to_flax,
    torch_linear_to_flax,
)

C = 4  # base channels for mirrors


def conv_bn(cin, cout, k, s):
    return [tnn.Conv2d(cin, cout, k, s, padding=k // 2, bias=False),
            tnn.BatchNorm2d(cout), tnn.ReLU()]


class TorchImageConv(tnn.Module):
    """Mirror of models/image_conv.py :: ImageConv (reference ImageConv
    layout, SURVEY.md §2.4)."""

    def __init__(self, c=C):
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


def conv3d_bn(cin, cout, k, s):
    return [tnn.Conv3d(cin, cout, k, s, padding=k // 2, bias=False),
            tnn.BatchNorm3d(cout), tnn.ReLU()]


class TorchVolumeConv(tnn.Module):
    """Mirror of models/volume_conv.py :: VolumeConv (reference VolumeConv,
    SURVEY.md §2.5)."""

    def __init__(self, c=C):
        super().__init__()
        self.conv0 = tnn.Sequential(*conv3d_bn(3, c, 3, 1))
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


def randomize_bn_stats(module, rng):
    """Non-trivial running stats so eval-mode BN actually tests mean/var."""
    for m in module.modules():
        if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm3d)):
            m.running_mean.copy_(torch.from_numpy(
                rng.randn(*m.running_mean.shape).astype(np.float32) * 0.3))
            m.running_var.copy_(torch.from_numpy(
                0.5 + rng.rand(*m.running_var.shape).astype(np.float32)))


def test_image_conv_parity(rng):
    tm = TorchImageConv().eval()
    with torch.no_grad():
        randomize_bn_stats(tm, rng)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}

    x = rng.rand(2, 32, 48, 3).astype(np.float32)
    fm = ImageConv(base_channels=C, norm="bn")
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    converted = convert_state_dict(sd, variables)

    out = fm.apply(converted, jnp.asarray(x))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    for got, want, name in zip(
            [out["conv0"], out["conv1"], out["conv2"], out["conv3"]],
            ref, ["conv0", "conv1", "conv2", "conv3"]):
        np.testing.assert_allclose(
            np.asarray(got), want.numpy().transpose(0, 2, 3, 1),
            atol=2e-5, err_msg=name)


def test_volume_conv_parity(rng):
    tm = TorchVolumeConv().eval()
    with torch.no_grad():
        randomize_bn_stats(tm, rng)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}

    x = rng.rand(1, 8, 16, 16, 3).astype(np.float32)  # (B, D, H, W, C)
    fm = VolumeConv(base_channels=C, norm="bn")
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    converted = convert_state_dict(sd, variables)

    out = fm.apply(converted, jnp.asarray(x))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 4, 1, 2, 3))
    np.testing.assert_allclose(np.asarray(out),
                               ref.numpy().transpose(0, 2, 3, 4, 1), atol=5e-5)


def test_leaf_conversions(rng):
    w = rng.rand(8, 3, 5, 5).astype(np.float32)
    assert torch_conv_to_flax(w).shape == (5, 5, 3, 8)
    w3 = rng.rand(8, 3, 3, 5, 5).astype(np.float32)
    assert torch_conv_to_flax(w3).shape == (3, 5, 5, 3, 8)
    d = rng.rand(3, 8, 5, 5).astype(np.float32)   # (I, O, kh, kw)
    assert torch_deconv_to_flax(d).shape == (5, 5, 8, 3)
    l = rng.rand(16, 32).astype(np.float32)
    np.testing.assert_array_equal(torch_linear_to_flax(l), l.T)


def test_load_pth_strips_dataparallel(tmp_path, rng):
    sd = {"module.conv.weight": torch.from_numpy(rng.rand(4, 3, 3, 3).astype(np.float32))}
    p = tmp_path / "m.pth"
    torch.save({"model": sd}, str(p))
    out = load_pth(str(p))
    assert list(out) == ["conv.weight"]


def test_convert_checkpoint_cli_roundtrip(tmp_path, rng):
    """CLI chain: full-mirror .pth → convert_checkpoint → Checkpointer
    TEST.WEIGHT load — restored params match the direct conversion."""
    from tests.torch_mirror import TorchPointMVSNet

    from pointmvsnet_tpu.config import get_default_cfg
    from pointmvsnet_tpu.utils import torch_convert as tc
    from pointmvsnet_tpu.utils.checkpoint import Checkpointer

    cfg = get_default_cfg()   # full default arch — the mirror's layout
    cfg.MODEL.NORM = "bn"
    tm = TorchPointMVSNet()
    pth = str(tmp_path / "ref.pth")
    torch.save({"model": tm.state_dict()}, pth)

    out_dir = tc.convert_checkpoint(pth, cfg, str(tmp_path / "ckpt"))

    # the converted dir loads through the TEST.WEIGHT path
    from pointmvsnet_tpu.models import build_model
    from pointmvsnet_tpu.parallel import create_train_state
    from pointmvsnet_tpu.utils.solver import build_optimizer
    model, _, _ = build_model(cfg)
    d = 8
    images = jnp.asarray(rng.rand(1, 2, 64, 64, 3).astype(np.float32))
    cams = np.zeros((1, 2, 2, 4, 4), np.float32)
    cams[:, :, 0] = np.eye(4)
    cams[:, :, 1, :3, :3] = [[80, 0, 32], [0, 80, 32], [0, 0, 1]]
    cams[:, :, 1, 3] = [8.0, 0.5, d, 8.0 + (d - 1) * 0.5]
    template = create_train_state(
        model, build_optimizer(cfg, 1), jax.random.PRNGKey(1),
        {"images": images, "cams": jnp.asarray(cams)},
        dict(is_flow=True, img_scales=(0.25,), inter_scales=(0.75,),
             num_virtual_plane=d))
    restored, _ = Checkpointer(str(tmp_path / "unused")).load(
        template, path=out_dir)

    want = convert_state_dict(
        tc.load_pth(pth),
        {"params": template.params, "batch_stats": template.batch_stats})
    flat_r = jax.tree_util.tree_leaves_with_path(restored.params)
    flat_w = dict(jax.tree_util.tree_leaves_with_path(want["params"]))
    assert flat_r
    for path, v in flat_r:
        np.testing.assert_array_equal(np.asarray(v), np.asarray(flat_w[path]),
                                      err_msg=jax.tree_util.keystr(path))


def test_unmatched_raises(rng):
    fm = ImageConv(base_channels=C, norm="bn")
    variables = fm.init(jax.random.PRNGKey(0),
                        jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32)))
    with pytest.raises(ValueError, match="unmatched"):
        convert_state_dict({}, variables)
