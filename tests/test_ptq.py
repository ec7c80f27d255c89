"""PTQ algorithm tests: BN fold, CLE, high-bias fold, bias correction.

Mirrors the reference's test_batch_norm_fold.py /
test_cross_layer_equalization.py strategy: model outputs must be preserved
(FP) by the transforms, and weight ranges must actually equalize.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aimet_tpu.algorithms.bias_correction import correct_bias
from aimet_tpu.algorithms.bn_fold import (
    bn_affine_params,
    find_foldable_pairs,
    fold_all_batch_norms,
)
from aimet_tpu.algorithms.cle import (
    equalize_model,
    find_cls_sets,
    high_bias_fold,
    scale_cls_sets,
)
from aimet_tpu.graph.connected_graph import ConnectedGraph
from aimet_tpu.models.cnn import ConvBnRelu, TinyCNN, init_model
from aimet_tpu.quantsim.qsim import QuantizationSimModel


class ConvBnConv(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(8, (3, 3), padding="SAME")(x)
        x = nn.BatchNorm(use_running_average=True)(x)
        x = nn.relu(x)
        x = nn.Conv(4, (3, 3), padding="SAME")(x)
        return x


class DwSeparable(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(8, (3, 3), padding="SAME")(x)
        x = nn.relu(x)
        x = nn.Conv(8, (3, 3), padding="SAME", feature_group_count=8)(x)
        x = nn.relu(x)
        x = nn.Conv(4, (1, 1))(x)
        return x


def randomize_bn(variables, rng, scale=2.0):
    """Give BN non-trivial statistics so folding is a real test."""
    import jax.tree_util as jtu

    def mutate(path, leaf):
        p = jtu.keystr(path)
        if "BatchNorm" in p:
            if "mean" in p:
                return jnp.asarray(rng.randn(*leaf.shape).astype(np.float32))
            if "var" in p:
                return jnp.asarray(
                    np.abs(rng.randn(*leaf.shape)).astype(np.float32) * scale + 0.1)
            if "scale" in p:
                return jnp.asarray(
                    (rng.rand(*leaf.shape).astype(np.float32) * 2 + 0.5))
            if "bias" in p:
                return jnp.asarray(rng.randn(*leaf.shape).astype(np.float32))
        return leaf

    return jtu.tree_map_with_path(mutate, variables)


class TestBnFold:
    def test_affine_extraction_matches_formula(self, rng):
        model = ConvBnRelu()
        v, x = init_model(model, (1, 8, 8, 3))
        v = randomize_bn(v, rng)
        g = ConnectedGraph(lambda v, x: model.apply(v, x), (v, x))
        bn = g.ops_of_type("batchnorm")[0]
        a, b = bn_affine_params(g, v, bn, channel_axis=3)
        eps = 1e-5
        stats = v["batch_stats"]["BatchNorm_0"]
        p = v["params"]["BatchNorm_0"]
        a_ref = np.asarray(p["scale"]) / np.sqrt(np.asarray(stats["var"]) + eps)
        b_ref = np.asarray(p["bias"]) - np.asarray(stats["mean"]) * a_ref
        np.testing.assert_allclose(np.asarray(a), a_ref, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(b), b_ref, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("use_bias", [True, False])
    def test_fold_preserves_outputs(self, rng, use_bias):
        model = ConvBnRelu(use_bias=use_bias)
        v, x = init_model(model, (2, 8, 8, 3))
        v = randomize_bn(v, rng)
        g = ConnectedGraph(lambda v, x: model.apply(v, x), (v, x))
        assert len(find_foldable_pairs(g)) == 1
        folded = fold_all_batch_norms(g, v)
        xb = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(model.apply(v, xb)), np.asarray(model.apply(folded, xb)),
            rtol=1e-4, atol=1e-5)
        # folded BN is (near-)identity scaling: scale/sqrt(var+eps) ~= 1
        g2 = ConnectedGraph(lambda v, x: model.apply(v, x), (folded, x))
        a, _ = bn_affine_params(g2, folded, g2.ops_of_type("batchnorm")[0], 3)
        np.testing.assert_allclose(np.asarray(a), np.ones_like(a), rtol=1e-4)

    def test_fold_tinycnn(self, rng):
        model = TinyCNN()
        v, x = init_model(model, (2, 8, 8, 1))
        v = randomize_bn(v, rng)
        g = ConnectedGraph(lambda v, x: model.apply(v, x), (v, x))
        folded = fold_all_batch_norms(g, v)
        xb = jnp.asarray(rng.randn(2, 8, 8, 1).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(model.apply(v, xb)), np.asarray(model.apply(folded, xb)),
            rtol=1e-4, atol=1e-5)


class TestCle:
    def test_find_cls_sets(self):
        model = ConvBnConv()
        v, x = init_model(model, (1, 8, 8, 3))
        g = ConnectedGraph(lambda v, x: model.apply(v, x), (v, x))
        sets = find_cls_sets(g)
        assert len(sets) == 1
        assert sets[0][0].type == "conv" and sets[0][1].type == "conv"

    def test_depthwise_triple(self):
        model = DwSeparable()
        v, x = init_model(model, (1, 8, 8, 3))
        g = ConnectedGraph(lambda v, x: model.apply(v, x), (v, x))
        sets = find_cls_sets(g)
        assert any(len(s) == 3 for s in sets)
        triple = next(s for s in sets if len(s) == 3)
        assert triple[1].type == "depthwise_conv"

    def test_scaling_preserves_output_and_equalizes(self, rng):
        model = ConvBnConv()
        v, x = init_model(model, (2, 8, 8, 3))
        v = randomize_bn(v, rng)
        # make channel ranges wildly unequal
        import jax.tree_util as jtu
        k0 = v["params"]["Conv_0"]["kernel"]
        scale_vec = jnp.asarray(
            np.logspace(-2, 2, k0.shape[-1]).astype(np.float32))
        v = jtu.tree_map(lambda l: l, v)
        v["params"]["Conv_0"]["kernel"] = k0 * scale_vec

        g = ConnectedGraph(lambda v, x: model.apply(v, x), (v, x))
        folded, bn_info = fold_all_batch_norms(g, v, return_bn_info=True)
        scaled, scale_info = scale_cls_sets(g, folded)

        xb = jnp.asarray(np.abs(rng.randn(2, 8, 8, 3)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(model.apply(folded, xb)), np.asarray(model.apply(scaled, xb)),
            rtol=1e-3, atol=1e-4)

        # equalization: per-channel ranges of W1 much closer after scaling
        def spread(w):
            r = np.max(np.abs(np.asarray(w)), axis=(0, 1, 2))
            return r.max() / r.min()

        assert spread(scaled["params"]["Conv_0"]["kernel"]) < \
            spread(folded["params"]["Conv_0"]["kernel"]) / 10

    def test_equalize_model_pipeline(self, rng):
        model = ConvBnConv()
        v, x = init_model(model, (2, 8, 8, 3))
        v = randomize_bn(v, rng)
        g = ConnectedGraph(lambda v, x: model.apply(v, x), (v, x))
        eq = equalize_model(g, v)
        xb = jnp.asarray(np.abs(rng.randn(4, 8, 8, 3)).astype(np.float32))
        out0 = np.asarray(model.apply(v, xb))
        out1 = np.asarray(model.apply(eq, xb))
        # HBF is exact only when pre-activations stay in the linear region;
        # demand closeness, not equality (reference has the same property)
        err = np.abs(out1 - out0).mean() / (np.abs(out0).mean() + 1e-9)
        assert err < 0.2

    def test_equalization_improves_per_tensor_int8(self, rng):
        """The DFQ claim in miniature: after CLE, per-tensor INT8 weight
        quantization reconstructs the model better."""
        model = ConvBnConv()
        v, x = init_model(model, (2, 8, 8, 3))
        v = randomize_bn(v, rng)
        k0 = v["params"]["Conv_0"]["kernel"]
        scale_vec = jnp.asarray(np.logspace(-2, 1, k0.shape[-1]).astype(np.float32))
        v["params"]["Conv_0"]["kernel"] = k0 * scale_vec
        g = ConnectedGraph(lambda v, x: model.apply(v, x), (v, x))
        folded, bn_info = fold_all_batch_norms(g, v, return_bn_info=True)
        scaled, _ = scale_cls_sets(g, folded)

        xb = jnp.asarray(rng.randn(8, 8, 8, 3).astype(np.float32))

        def int8_err(params):
            fn = lambda p, x: model.apply(p, x)
            sim = QuantizationSimModel(fn, (params, xb), quant_scheme="minmax")
            sim.compute_encodings(params, iter([xb]))
            ref = model.apply(params, xb)
            return float(jnp.mean(jnp.abs(sim.quantized_fn(params, xb) - ref)))

        assert int8_err(scaled) < int8_err(folded)


class TestBiasCorrection:
    def test_bias_correction_reduces_error(self, rng):
        model = ConvBnConv()
        v, x = init_model(model, (4, 8, 8, 3))
        v = randomize_bn(v, rng)
        fn = lambda p, x: model.apply(p, x)
        batches = [jnp.asarray(rng.randn(4, 8, 8, 3).astype(np.float32))
                   for _ in range(3)]
        sim = QuantizationSimModel(fn, (v, x), quant_scheme="minmax",
                                   default_param_bw=4)
        sim.compute_encodings(v, iter(batches))

        ref = np.asarray(model.apply(v, batches[0]))
        err_before = np.abs(np.asarray(sim.quantized_fn(v, batches[0])) - ref).mean()
        corrected = correct_bias(sim, v, batches)
        err_after = np.abs(
            np.asarray(sim.quantized_fn(corrected, batches[0])) - ref).mean()
        assert err_after < err_before


class TestAnalyticalBiasCorrection:
    def test_data_free_correction_reduces_expected_error(self, rng):
        from aimet_tpu.algorithms.bias_correction import correct_bias_analytical
        model = ConvBnConv()
        v, x = init_model(model, (4, 8, 8, 3))
        v = randomize_bn(v, rng)
        fn = lambda p, x: model.apply(p, x)
        sim = QuantizationSimModel(fn, (v, x), quant_scheme="minmax",
                                   default_param_bw=4)
        sim.compute_param_encodings(v)
        corrected = correct_bias_analytical(sim, v)
        # the second conv's bias changed (it is preceded by BN+relu)
        b0 = np.asarray(v["params"]["Conv_1"]["bias"])
        b1 = np.asarray(corrected["params"]["Conv_1"]["bias"])
        assert not np.allclose(b0, b1)
        # and the output-mean shift of the quantized model shrinks on data
        # matching the BN statistics
        xb = jnp.asarray(rng.randn(16, 8, 8, 3).astype(np.float32))
        ref = model.apply(v, xb)
        sim.compute_encodings(v, iter([xb]))
        m_before = np.abs(np.asarray(
            (sim.quantized_fn(v, xb) - ref).mean(axis=(0, 1, 2))))
        sim2 = QuantizationSimModel(fn, (corrected, xb), quant_scheme="minmax",
                                    default_param_bw=4)
        sim2.compute_encodings(corrected, iter([xb]))
        m_after = np.abs(np.asarray(
            (sim2.quantized_fn(corrected, xb) - ref).mean(axis=(0, 1, 2))))
        assert m_after.mean() <= m_before.mean() * 1.2
