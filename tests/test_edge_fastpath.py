"""Masked-window-max EdgeConv fast path: mask emission + kernel + module
equivalence vs the gather formulation (reference semantics: gather_knn +
concat-MLP + max, ``pointmvsnet/modules/networks.py :: EdgeConv``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointmvsnet_tpu.ops.knn import gather_knn, window_knn
from pointmvsnet_tpu.ops.pallas.edge import (
    masked_window_max,
    masked_window_max_xla,
)
from pointmvsnet_tpu.ops.pallas.knn import pallas_window_knn_mask
from pointmvsnet_tpu.models.edge_conv import EdgeConv

G, H, W, K, WIN = 5, 16, 24, 16, 5
P = G * H * W


@pytest.fixture(scope="module")
def graph():
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.rand(2, P, 3).astype(np.float32) * 10)
    idx, mask = window_knn(pts, (G, H, W), K, WIN, with_mask=True)
    return pts, idx, mask


def test_mask_matches_pallas_kernel(graph):
    pts, idx, mask = graph
    idx_p, mask_p = pallas_window_knn_mask(pts, (G, H, W), K, WIN,
                                           interpret=True)
    assert (np.sort(np.asarray(idx), -1) == np.sort(np.asarray(idx_p), -1)).all()
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(mask_p))


def test_mask_popcount_is_k(graph):
    _, _, mask = graph
    pop = np.vectorize(lambda v: bin(v).count("1"))(np.asarray(mask))
    np.testing.assert_array_equal(pop.sum(axis=1), K)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_masked_window_max_equals_gather_max(graph, impl):
    pts, idx, mask = graph
    rng = np.random.RandomState(1)
    z = jnp.asarray(rng.randn(2, P, 8).astype(np.float32))
    truth = jnp.max(gather_knn(z, idx), axis=2)
    if impl == "xla":
        out = masked_window_max_xla(z, mask, (G, H, W), WIN)
    else:
        out = masked_window_max(z, mask, (G, H, W), WIN, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(truth), atol=1e-6)


@pytest.mark.parametrize("norm", ["bn", "none"])
@pytest.mark.parametrize("use_center", [True, False])
def test_edgeconv_fast_path_matches_gather_path(graph, norm, use_center):
    """Eval fast path (mask + folded affine + masked max) vs the gather
    formulation — same module, same params, two code paths."""
    pts, idx, mask = graph
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, P, 12).astype(np.float32))
    mod = EdgeConv(10, norm=norm, use_center=use_center)
    var = mod.init(jax.random.PRNGKey(0), x, idx)
    if norm == "bn":  # make the affine non-trivial (incl. negative scales)
        var = jax.tree_util.tree_map(lambda v: v, var)
        var = {"params": {**var["params"]},
               "batch_stats": {"BatchNorm_0": {
                   "mean": jnp.asarray(rng.randn(10), jnp.float32),
                   "var": jnp.asarray(rng.rand(10) + 0.5, jnp.float32)}}}
        var["params"]["BatchNorm_0"] = {
            "scale": jnp.asarray(rng.randn(10), jnp.float32),
            "bias": jnp.asarray(rng.randn(10), jnp.float32)}
        var["params"]["kernel"] = mod.init(
            jax.random.PRNGKey(0), x, idx)["params"]["kernel"]
    slow = mod.apply(var, x, idx)  # no mask → gather path
    fast = mod.apply(var, x, idx, mask=mask, grid_shape=(G, H, W),
                     window=WIN, impl="xla")
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               atol=1e-5, rtol=1e-5)


def test_manual_bn_matches_flax_batchnorm():
    """EdgeConv's inlined BatchNorm (train + eval) must reproduce
    flax ``nn.BatchNorm`` including running-stat updates."""
    import flax.linen as nn
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 40, 6, 10).astype(np.float32))
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    rv = ref.init(jax.random.PRNGKey(0), x)
    ry, rmut = ref.apply(rv, x, mutable=["batch_stats"])

    from pointmvsnet_tpu.models.edge_conv import _BNStats
    class Manual(nn.Module):
        @nn.compact
        def __call__(self, x):
            f32 = x.astype(jnp.float32)
            bm = jnp.mean(f32, axis=(0, 1, 2))
            bv = jnp.mean(jnp.square(f32), axis=(0, 1, 2)) - jnp.square(bm)
            scale, bias, _, _ = _BNStats(x.shape[-1], name="bn")(bm, bv)
            mul = jax.lax.rsqrt(bv + 1e-5) * scale
            return (x - bm) * mul + bias
    man = Manual()
    mv = man.init(jax.random.PRNGKey(0), x)
    my, mmut = man.apply(mv, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(my), np.asarray(ry), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mmut["batch_stats"]["bn"]["mean"]),
        np.asarray(rmut["batch_stats"]["mean"]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mmut["batch_stats"]["bn"]["var"]),
        np.asarray(rmut["batch_stats"]["var"]), atol=1e-6)
