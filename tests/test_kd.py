"""QAT + knowledge distillation (algorithms/kd.py).

Mirrors the fork's flagship LLM QAT+KD workflow
(Examples/torch/quantization/llm_qat_kd/finetune_llm_qat_kd.py): frozen FP
teacher, range-learning fake-quant student, CE + temperature-KL loss.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from aimet_tpu.algorithms.kd import (
    KDConfig, init_kd_state, kd_loss, make_qat_kd_step, shift_labels)


class TestKDLoss:
    def test_equal_logits_alpha1_is_zero(self, rng):
        logits = jnp.asarray(rng.randn(2, 5, 11), jnp.float32)
        labels = jnp.asarray(rng.randint(0, 11, (2, 5)), jnp.int32)
        loss = kd_loss(logits, logits, labels, KDConfig(alpha=1.0))
        assert float(loss) == pytest.approx(0.0, abs=1e-5)

    def test_equal_logits_reduces_to_ce(self, rng):
        logits = jnp.asarray(rng.randn(2, 5, 11), jnp.float32)
        labels = jnp.asarray(rng.randint(0, 11, (2, 5)), jnp.int32)
        cfg = KDConfig(alpha=0.25)
        loss = kd_loss(logits, logits, labels, cfg)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()
        assert float(loss) == pytest.approx(0.75 * float(ce), rel=1e-5)

    def test_kl_nonnegative_and_temperature_scaled(self, rng):
        s = jnp.asarray(rng.randn(2, 4, 7), jnp.float32)
        t = jnp.asarray(rng.randn(2, 4, 7), jnp.float32)
        labels = jnp.asarray(rng.randint(0, 7, (2, 4)), jnp.int32)
        ce = optax.softmax_cross_entropy_with_integer_labels(s, labels).mean()
        loss = kd_loss(s, t, labels, KDConfig(alpha=0.5, temperature=3.0))
        # loss = 0.5*ce + 0.5*9*KL with KL >= 0
        assert float(loss) >= 0.5 * float(ce) - 1e-5

    def test_mask_ignores_positions(self, rng):
        s = jnp.asarray(rng.randn(1, 4, 7), jnp.float32)
        t = jnp.asarray(rng.randn(1, 4, 7), jnp.float32)
        labels = jnp.asarray([[1, 2, -100, -100]], jnp.int32)
        # corrupting masked positions must not change the loss
        s2 = s.at[:, 2:].set(99.0)
        l1 = kd_loss(s, t, labels)
        l2 = kd_loss(s2, t, labels)
        assert float(l1) == pytest.approx(float(l2), rel=1e-5)

    def test_shift_labels(self):
        tokens = jnp.asarray([[5, 6, 7, 0]], jnp.int32)
        labels = shift_labels(tokens, pad_id=0)
        np.testing.assert_array_equal(
            np.asarray(labels), [[6, 7, -100, -100]])


class TestQATKDStep:
    def _build(self):
        from aimet_tpu.models.transformer import (
            Transformer, TransformerConfig)
        from aimet_tpu.quantsim.qsim import QuantizationSimModel

        cfg = TransformerConfig.tiny(vocab_size=64)
        model = Transformer(cfg)
        tokens = jnp.zeros((2, 8), jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), tokens)
        fn = lambda v, t: model.apply(v, t)
        sim = QuantizationSimModel(fn, (variables, tokens),
                                   quant_scheme="minmax",
                                   default_param_bw=8, default_output_bw=8)
        rs = np.random.RandomState(0)
        batches = [jnp.asarray(rs.randint(0, 64, (2, 8)), jnp.int32)
                   for _ in range(2)]
        sim.compute_encodings(variables, iter(batches))
        return cfg, fn, sim, variables

    def test_loss_decreases_and_encodings_train(self):
        cfg, teacher_apply, sim, variables = self._build()
        opt = optax.adam(3e-3)
        kcfg = KDConfig(temperature=2.0, alpha=0.5, enc_lr=1e-4)
        state0, step = make_qat_kd_step(sim, teacher_apply, opt, kcfg)
        state = init_kd_state(state0, variables, opt)
        enc_before = jax.tree_util.tree_leaves(state.enc)

        step = jax.jit(step)
        rs = np.random.RandomState(1)
        tokens = jnp.asarray(rs.randint(0, 64, (2, 8)), jnp.int32)
        labels = shift_labels(tokens)
        losses = []
        for _ in range(6):
            state, loss = step(state, variables, tokens, labels)
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]
        enc_after = jax.tree_util.tree_leaves(state.enc)
        deltas = [float(jnp.abs(jnp.asarray(a) - jnp.asarray(b)).max())
                  for a, b in zip(enc_after, enc_before)]
        assert max(deltas) > 0.0  # range learning actually moved encodings


def test_remat_step_matches_plain(rng):
    """cfg.remat=True must be numerically identical (just recomputes
    activations in backward)."""
    from aimet_tpu.models.transformer import Transformer, TransformerConfig
    from aimet_tpu.quantsim.qsim import QuantizationSimModel

    cfg = TransformerConfig.tiny(vocab_size=32)
    model = Transformer(cfg)
    tokens = jnp.zeros((2, 6), jnp.int32)
    v = model.init(jax.random.PRNGKey(0), tokens)
    fn = lambda p, t: model.apply(p, t)
    sim = QuantizationSimModel(fn, (v, tokens), quant_scheme="minmax")
    sim.compute_encodings(v, iter([jnp.zeros((2, 6), jnp.int32)]))

    opt = optax.sgd(1e-2)
    toks = jnp.asarray(rng.randint(0, 32, (2, 6)), jnp.int32)
    labels = shift_labels(toks)
    outs = []
    for remat in (False, True):
        kcfg = KDConfig(remat=remat)
        s0, step = make_qat_kd_step(sim, fn, opt, kcfg)
        state = init_kd_state(s0, v, opt)
        state, loss = jax.jit(step)(state, v, toks, labels)
        outs.append(float(loss))
    assert outs[0] == pytest.approx(outs[1], rel=1e-6)
