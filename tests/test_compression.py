"""Compression tests: SVD factorization accuracy, channel pruning,
greedy ratio selection (reference: test_compress_example_torch.py and
DlCompression gtest strategy)."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aimet_tpu.compression.compressor import ModelCompressor
from aimet_tpu.compression.cost import (
    layer_cost,
    rank_for_comp_ratio,
    spatial_svd_cost,
)
from aimet_tpu.compression.greedy import monotonic_fit
from aimet_tpu.compression.svd import (
    spatial_svd_factor,
    weight_svd_factor_linear,
)
from aimet_tpu.graph.connected_graph import ConnectedGraph
from aimet_tpu.models.cnn import TinyCNN, TinyMLP, init_model


class SmallConvNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(16, (3, 3), padding="SAME")(x)
        x = nn.relu(x)
        x = nn.Conv(16, (3, 3), padding="SAME")(x)
        x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))
        return nn.Dense(4)(x)


def test_monotonic_fit():
    r = np.linspace(0.1, 0.9, 9)
    s = np.array([0.1, 0.3, 0.2, 0.5, 0.4, 0.6, 0.9, 0.8, 1.0])
    f = monotonic_fit(r, s)
    assert np.all(np.diff(f) >= -1e-12)
    # fit preserves mean
    np.testing.assert_allclose(f.mean(), s.mean(), rtol=1e-6)


def test_spatial_svd_full_rank_exact(rng):
    model = SmallConvNet()
    v, x = init_model(model, (1, 8, 8, 3))
    g = ConnectedGraph(lambda v, x: model.apply(v, x), (v, x))
    op = g.get_op("conv_1")
    w = v["params"]["Conv_1"]["kernel"]
    w1, w2 = spatial_svd_factor(op, w, rank=10_000)  # full rank
    # composing the two factors reproduces the original kernel:
    # w[kh,kw,i,o] = sum_r w1[kh,0,i,r] * w2[0,kw,r,o]
    recon = jnp.einsum("haif,bwfo->hwio", w1, w2)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(w),
                               rtol=1e-3, atol=1e-4)


def test_weight_svd_linear_full_rank(rng):
    w = jnp.asarray(rng.randn(32, 16).astype(np.float32))
    w1, w2 = weight_svd_factor_linear(w, rank=16)
    np.testing.assert_allclose(np.asarray(w1 @ w2), np.asarray(w),
                               rtol=1e-4, atol=1e-5)


def test_manual_spatial_svd_model(rng):
    model = SmallConvNet()
    v, x = init_model(model, (2, 8, 8, 3))
    fn = lambda v, x: model.apply(v, x)
    compressed, stats = ModelCompressor.compress_model(
        fn, (v, x), v, "spatial_svd",
        manual_ratios={"conv_1": 0.5})
    xb = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))
    out_c = compressed(v, xb)
    out_o = model.apply(v, xb)
    assert out_c.shape == out_o.shape
    # mild rank reduction keeps outputs roughly similar
    rel = float(jnp.mean(jnp.abs(out_c - out_o)) / (jnp.mean(jnp.abs(out_o)) + 1e-9))
    assert rel < 0.5
    assert stats.mac_compression_ratio < 1.0
    # compressed model is jittable
    out_j = jax.jit(lambda v, x: compressed(v, x))(v, xb)
    np.testing.assert_allclose(np.asarray(out_j), np.asarray(out_c), rtol=1e-5)


def test_manual_weight_svd_mlp(rng):
    model = TinyMLP(features=32)
    v, x = init_model(model, (4, 16))
    fn = lambda v, x: model.apply(v, x)
    compressed, stats = ModelCompressor.compress_model(
        fn, (v, x), v, "weight_svd",
        manual_ratios={"linear_1": 0.5})
    out = compressed(v, x)
    assert out.shape == (4, 10)
    assert stats.mac_compression_ratio < 1.0


def test_channel_pruning_with_reconstruction(rng):
    model = SmallConvNet()
    v, x = init_model(model, (4, 8, 8, 3))
    fn = lambda v, x: model.apply(v, x)
    xb = jnp.asarray(rng.randn(4, 8, 8, 3).astype(np.float32))

    # sample (input, output) activations of conv_1 for reconstruction
    g = ConnectedGraph(fn, (v, x))
    from aimet_tpu.quantsim.qsim import QuantizationSimModel
    sim = QuantizationSimModel(fn, (v, x), quant_scheme="minmax")
    caps = sim.collect_activations(v, (xb,), ["relu_0.out", "conv_1.out"])
    act_samples = {"conv_1": (caps["relu_0.out"], caps["conv_1.out"])}

    compressed, stats = ModelCompressor.compress_model(
        fn, (v, x), v, "channel_pruning",
        manual_ratios={"conv_1": 0.5}, act_samples=act_samples)
    out = compressed(v, xb)
    ref = model.apply(v, xb)
    assert out.shape == ref.shape
    rel = float(jnp.mean(jnp.abs(out - ref)) / (jnp.mean(jnp.abs(ref)) + 1e-9))
    assert rel < 0.6

    # without reconstruction the error should typically be larger
    compressed2, _ = ModelCompressor.compress_model(
        fn, (v, x), v, "channel_pruning", manual_ratios={"conv_1": 0.5})
    out2 = compressed2(v, xb)
    rel2 = float(jnp.mean(jnp.abs(out2 - ref)) / (jnp.mean(jnp.abs(ref)) + 1e-9))
    assert rel <= rel2 * 1.2


def test_greedy_auto_selection(rng):
    model = SmallConvNet()
    v, x = init_model(model, (2, 8, 8, 3))
    fn = lambda v, x: model.apply(v, x)
    xb = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))
    ref = model.apply(v, xb)

    def eval_fn(m):
        out = m(v, xb)
        return -float(jnp.mean((out - ref) ** 2))

    compressed, stats = ModelCompressor.compress_model(
        fn, (v, x), v, "spatial_svd", eval_fn=eval_fn,
        target_comp_ratio=0.6, num_candidates=5)
    assert 0 < stats.mac_compression_ratio <= 1.0
    out = compressed(v, xb)
    assert np.isfinite(np.asarray(out)).all()


def test_rank_cost_monotone():
    model = SmallConvNet()
    v, x = init_model(model, (1, 8, 8, 3))
    g = ConnectedGraph(lambda v, x: model.apply(v, x), (v, x))
    op = g.get_op("conv_1")
    costs = [spatial_svd_cost(op, r).mac for r in (1, 4, 8, 16)]
    assert all(np.diff(costs) > 0)
    r_half = rank_for_comp_ratio(op, 0.5, "spatial_svd")
    assert spatial_svd_cost(op, r_half).mac <= 0.5 * layer_cost(op).mac


def test_successive_svd_full_rank_exact(rng):
    """SSVD at full (r, s) reproduces the conv exactly (ISVD.hpp:69-71
    TYPE_SUCCESSIVE; three-layer 1x1 / kxk / 1x1 factorization)."""
    from aimet_tpu.compression.svd import make_successive_svd_replacement
    from aimet_tpu.graph.connected_graph import ConnectedGraph

    model = SmallConvNet()
    v, x = init_model(model, (1, 8, 8, 3))
    fn = lambda v, x: model.apply(v, x)
    g = ConnectedGraph(fn, (v, x))
    op = next(o for o in g.ops if o.type == "conv")
    import jax.tree_util as jtu
    leaves = jtu.tree_leaves(v)
    w = leaves[g._param_leaf_index[op.param_products["kernel"].param_path]]
    bias = leaves[g._param_leaf_index[op.param_products["bias"].param_path]] \
        if "bias" in op.param_products else None
    kh, kw, I, O = w.shape[-4], w.shape[-3], w.shape[-2], w.shape[-1]
    full_r, full_s = min(I * kh * kw, O), I
    rep = make_successive_svd_replacement(op, w, bias, full_r, full_s)
    xs = jnp.asarray(rng.randn(1, 8, 8, 3).astype(np.float32))
    from aimet_tpu.graph.interpreter import evaluate_with_replacements
    got = evaluate_with_replacements(g, v, (xs,), {op.name: rep})
    want = fn(v, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_successive_svd_cost_and_compress(rng):
    from aimet_tpu.compression.cost import (layer_cost,
                                            ranks_for_comp_ratio_ssvd,
                                            successive_svd_cost)
    from aimet_tpu.compression.compressor import ModelCompressor
    from aimet_tpu.graph.connected_graph import ConnectedGraph

    model = SmallConvNet()
    v, x = init_model(model, (2, 8, 8, 3))
    fn = lambda v, x: model.apply(v, x)
    g = ConnectedGraph(fn, (v, x))
    op = next(o for o in g.ops if o.type == "conv")
    r, s = ranks_for_comp_ratio_ssvd(op, 0.5)
    assert successive_svd_cost(op, r, s).mac <= 0.5 * layer_cost(op).mac

    conv_names = [o.name for o in g.ops if o.type == "conv"]
    model_c, stats = ModelCompressor.compress_model(
        fn, (v, x), v, "successive_svd",
        manual_ratios={n: 0.5 for n in conv_names})
    out = model_c(v, jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32)))
    assert np.isfinite(np.asarray(out)).all()
    assert stats.mac_compression_ratio < 1.0
