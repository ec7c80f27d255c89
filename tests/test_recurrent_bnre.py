"""Recurrent quantsim (scan-based LSTM/GRU) + BN re-estimation tests
(reference: test_qc_quantize_recurrent.py strategy)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aimet_tpu.algorithms.bn_reestimation import reestimate_bn_stats
from aimet_tpu.quantsim.recurrent import (
    RecurrentQuantizer,
    RecurrentQuantSpec,
    init_gru_params,
    init_lstm_params,
)


class TestRecurrent:
    def test_lstm_quantsim_close_to_fp(self, rng):
        params = init_lstm_params(jax.random.PRNGKey(0), 8, 16)
        x = jnp.asarray(rng.randn(4, 12, 8).astype(np.float32))
        rq = RecurrentQuantizer("lstm")
        rq.compute_encodings(params, [x])
        assert set(rq.encodings) == {"input", "hidden", "cell"}
        out_q, (h, c) = rq.quantized_forward(params, x)
        out_fp, _ = rq.fp_forward(params, x)
        assert out_q.shape == (4, 12, 16)
        err = float(jnp.mean(jnp.abs(out_q - out_fp)))
        scale = float(jnp.mean(jnp.abs(out_fp))) + 1e-9
        assert 0 < err / scale < 0.3

    def test_lstm_int4_worse_than_int8(self, rng):
        params = init_lstm_params(jax.random.PRNGKey(0), 8, 16)
        x = jnp.asarray(rng.randn(4, 12, 8).astype(np.float32))
        errs = {}
        for bw in (8, 4):
            rq = RecurrentQuantizer("lstm", RecurrentQuantSpec(
                bitwidth_act=bw, bitwidth_param=bw))
            rq.compute_encodings(params, [x])
            out_q, _ = rq.quantized_forward(params, x)
            out_fp, _ = rq.fp_forward(params, x)
            errs[bw] = float(jnp.mean(jnp.abs(out_q - out_fp)))
        assert errs[8] < errs[4]

    def test_gru(self, rng):
        params = init_gru_params(jax.random.PRNGKey(0), 8, 16)
        x = jnp.asarray(rng.randn(2, 10, 8).astype(np.float32))
        rq = RecurrentQuantizer("gru")
        rq.compute_encodings(params, [x])
        assert "cell" not in rq.encodings
        out_q, _ = rq.quantized_forward(params, x)
        assert out_q.shape == (2, 10, 16)
        assert np.isfinite(np.asarray(out_q)).all()

    def test_quantized_forward_jit_and_grad(self, rng):
        params = init_lstm_params(jax.random.PRNGKey(0), 4, 8)
        x = jnp.asarray(rng.randn(2, 6, 4).astype(np.float32))
        rq = RecurrentQuantizer("lstm")
        rq.compute_encodings(params, [x])
        f = jax.jit(lambda p, x: rq.quantized_forward(p, x)[0])
        out = f(params, x)
        g = jax.grad(lambda p: jnp.sum(f(p, x) ** 2))(params)
        gnorm = sum(float(jnp.sum(jnp.abs(l)))
                    for l in jax.tree_util.tree_leaves(g))
        assert np.isfinite(gnorm) and gnorm > 0


class TestBnReestimation:
    def test_reestimate_matches_data_stats(self, rng):
        from aimet_tpu.models.cnn import ConvBnRelu, init_model
        from aimet_tpu.quantsim.qsim import QuantizationSimModel
        import jax.tree_util as jtu

        model = ConvBnRelu()
        v, x = init_model(model, (4, 8, 8, 3))
        fn = lambda p, x: model.apply(p, x)
        sim = QuantizationSimModel(fn, (v, x), quant_scheme="minmax")
        batches = [jnp.asarray(rng.randn(4, 8, 8, 3).astype(np.float32) + 1.0)
                   for _ in range(3)]
        sim.compute_encodings(v, iter(batches))

        new_v = reestimate_bn_stats(sim, v, batches, mode="fp")
        stats = new_v["batch_stats"]["BatchNorm_0"]
        # conv output mean over the data is nonzero (inputs shifted by +1)
        assert float(jnp.max(jnp.abs(stats["mean"]))) > 0.01
        # variance positive and matches direct computation
        caps = [sim.collect_activations(v, (b,), ["conv_0.out"], "fp")["conv_0.out"]
                for b in batches]
        allx = jnp.concatenate([c.reshape(-1, c.shape[-1]) for c in caps])
        np.testing.assert_allclose(np.asarray(stats["mean"]),
                                   np.asarray(allx.mean(0)), rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(stats["var"]),
                                   np.asarray(allx.var(0)), rtol=1e-2, atol=1e-5)


class TestRecurrentQat:
    def test_qat_improves_quantized_lstm(self, rng):
        """BASELINE row 6 in miniature: INT8 recurrent QAT — training through
        the per-timestep fake-quant forward recovers accuracy on a
        sequence-regression task."""
        import optax
        params = init_lstm_params(jax.random.PRNGKey(0), 4, 8)
        x = jnp.asarray(rng.randn(16, 10, 4).astype(np.float32))
        # target: outputs of a 'teacher' LSTM
        teacher = init_lstm_params(jax.random.PRNGKey(7), 4, 8)
        rq_t = RecurrentQuantizer("lstm")
        target, _ = rq_t.fp_forward(teacher, x)

        rq = RecurrentQuantizer("lstm", RecurrentQuantSpec(
            bitwidth_act=8, bitwidth_param=8))
        rq.compute_encodings(params, [x])

        def loss(p):
            out, _ = rq.quantized_forward(p, x)
            return jnp.mean((out - target) ** 2)

        opt = optax.adam(5e-3)
        state = opt.init(params)
        l0 = float(loss(params))

        @jax.jit
        def step(p, s):
            l, g = jax.value_and_grad(loss)(p)
            up, s = opt.update(g, s)
            return optax.apply_updates(p, up), s, l

        p = params
        for _ in range(60):
            p, state, l = step(p, state)
        assert float(l) < l0 * 0.7  # STE gradients train through the scan


def test_packed_sequence_lengths(rng):
    """Packed-sequence semantics (qc_quantize_recurrent.py:105): carries
    freeze at each sequence's end, outputs beyond the end are zero."""
    from aimet_tpu.quantsim.recurrent import (
        RecurrentQuantizer, init_lstm_params)

    params = init_lstm_params(jax.random.PRNGKey(0), 6, 10)
    rq = RecurrentQuantizer("lstm")
    xs = [jnp.asarray(rng.randn(3, 7, 6).astype(np.float32))]
    rq.compute_encodings(params, xs)

    x = jnp.asarray(rng.randn(3, 7, 6).astype(np.float32))
    lengths = jnp.asarray([7, 4, 2])
    out, (h, c) = rq.quantized_forward(params, x, seq_lengths=lengths)
    out_full, (h_full, _) = rq.quantized_forward(params, x)

    # outputs beyond each length are exactly zero
    assert float(jnp.abs(out[1, 4:]).max()) == 0.0
    assert float(jnp.abs(out[2, 2:]).max()) == 0.0
    # valid prefix matches the unmasked run
    np.testing.assert_allclose(np.asarray(out[1, :4]),
                               np.asarray(out_full[1, :4]), rtol=1e-5)
    # final state equals the state at the true end of each sequence
    np.testing.assert_allclose(np.asarray(h[2]),
                               np.asarray(out_full[2, 1]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h[0]),
                               np.asarray(out_full[0, -1]), rtol=1e-5)
