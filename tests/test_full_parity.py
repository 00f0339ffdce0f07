"""END-TO-END parity: full torch PointMVSNet mirror → converted weights →
flax model → identical depth maps (SURVEY.md §7 steps 4–5; BASELINE.md
"<2 mm depth-map accuracy parity").

The reference mount is empty (SURVEY.md §0), so the torch mirror in
``torch_mirror.py`` stands in for the real reference: it uses the
reference's idiom (NCHW, F.grid_sample, dense torch kNN+gather). Passing
here proves the whole conversion + numerics chain — coarse plane sweep,
VolumeConv, PointFlow fetch/kNN/EdgeConv/head, iterative refinement — is
exact up to float noise, leaving only the reconstructed constants at risk.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from pointmvsnet_tpu.dataset.build import collate
from pointmvsnet_tpu.dataset.dtu import DTUTestDataset
from pointmvsnet_tpu.dataset.synthetic import make_synthetic_dtu
from pointmvsnet_tpu.models.pointmvsnet import PointMVSNet
from pointmvsnet_tpu.utils.torch_convert import convert_state_dict

from torch_mirror import TorchPointMVSNet, window_knn_torch, fetch_features_torch

H, W, D = 128, 192, 48
SCALES = (0.25, 0.5, 1.0)
INTER = (0.75, 0.375, 0.1875)


@pytest.fixture(scope="module")
def batch(tmp_path_factory):
    root = tmp_path_factory.mktemp("parity_dtu")
    make_synthetic_dtu(str(root), scans=[1], num_views=3, height=H, width=W,
                       num_depth=D, layout="eval")
    ds = DTUTestDataset(str(root), num_view=3, num_virtual_plane=D,
                        interval_scale=1.0, img_height=H, img_width=W,
                        scans=[1], base=64)
    return collate([ds[0]])


@pytest.fixture(scope="module")
def models(batch):
    torch.manual_seed(7)
    tm = TorchPointMVSNet().eval()
    rng = np.random.RandomState(3)
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d,
                              torch.nn.BatchNorm3d)):
                m.running_mean.copy_(torch.from_numpy(
                    rng.randn(*m.running_mean.shape).astype(np.float32) * 0.3))
                m.running_var.copy_(torch.from_numpy(
                    0.5 + rng.rand(*m.running_var.shape).astype(np.float32)))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}

    fm = PointMVSNet(norm="bn")
    variables = fm.init(jax.random.PRNGKey(0),
                        jnp.asarray(batch["images"][:, :, :64, :64]),
                        jnp.asarray(batch["cams"]), is_flow=True,
                        img_scales=(0.25,), inter_scales=(0.75,),
                        num_virtual_plane=8)
    converted = convert_state_dict(sd, variables)
    return tm, fm, converted


def test_sub_op_parity(batch):
    """kNN + fetch mirrors agree with the jax ops on identical inputs —
    isolates graph-construction parity from the network parity below."""
    from pointmvsnet_tpu.ops.knn import window_knn
    from pointmvsnet_tpu.ops.sampling import fetch_features

    rng = np.random.RandomState(0)
    g, h, w = 5, 16, 24
    pts = (rng.rand(2, g * h * w, 3) * 8).astype(np.float32)
    ji = np.asarray(window_knn(jnp.asarray(pts), (g, h, w), 16, 5))
    ti = window_knn_torch(torch.from_numpy(pts), (g, h, w), 16, 5).numpy()
    # neighbor SETS must agree (topk tie order may differ)
    assert (np.sort(ji, -1) == np.sort(ti, -1)).mean() > 0.999

    feats = rng.rand(1, 3, h, w, 8).astype(np.float32)
    cams = np.asarray(batch["cams"])[:, :, :, :, :]
    camsf = cams.copy()
    camsf[:, :, 1, 0, :3] *= w / W
    camsf[:, :, 1, 1, :3] *= h / H
    wpts = (rng.rand(1, 500, 3).astype(np.float32) * 20
            + np.array([0, 0, 430], np.float32))
    jf = np.asarray(fetch_features(jnp.asarray(feats), jnp.asarray(wpts),
                                   jnp.asarray(camsf)))
    tf = fetch_features_torch(torch.from_numpy(feats).permute(0, 1, 4, 2, 3),
                              torch.from_numpy(wpts),
                              torch.from_numpy(camsf)).numpy()
    np.testing.assert_allclose(jf, tf.transpose(0, 1, 3, 2), atol=2e-5)


def test_full_pipeline_depth_parity(batch, models):
    tm, fm, converted = models
    images = np.asarray(batch["images"], np.float32)   # (B, V, H, W, 3)
    cams = np.asarray(batch["cams"], np.float32)

    with torch.no_grad():
        ref = tm(torch.from_numpy(images).permute(0, 1, 4, 2, 3),
                 torch.from_numpy(cams), img_scales=SCALES,
                 inter_scales=INTER, num_virtual_plane=D)

    out = fm.apply(converted, jnp.asarray(images), jnp.asarray(cams),
                   is_flow=True, img_scales=SCALES, inter_scales=INTER,
                   num_virtual_plane=D)

    # BASELINE.md parity bar: < 2 mm (interval 2.5, DTU mm scale). Observed
    # parity is ~2e-4 — assert well under the bar so regressions surface.
    report = {}
    for key in ["coarse_depth_map", "flow1", "flow2", "flow3"]:
        got = np.asarray(out[key], np.float32)
        want = ref[key].numpy()
        diff = np.abs(got - want)
        report[key] = (float(diff.max()), float(diff.mean()))
        assert diff.max() < 0.05, f"{key}: max|Δdepth| = {diff.max():.4f}"
        assert diff.mean() < 0.005, f"{key}: mean|Δdepth| = {diff.mean():.4f}"
    # confidence map parity too (drives fusion thresholds)
    conf = np.abs(np.asarray(out["coarse_prob_map"])
                  - ref["coarse_prob_map"].numpy())
    assert conf.max() < 0.02
    print("parity:", {k: (f"max {a:.2e}", f"mean {b:.2e}")
                      for k, (a, b) in report.items()})
