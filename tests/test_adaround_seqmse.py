"""AdaRound + SeqMSE tests (reference: test_adaround_weight.py strategy —
adarounded weights land on the quantization grid and beat nearest rounding).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aimet_tpu.algorithms.adaround import (
    AdaroundParameters,
    _alpha_init,
    _h_alpha,
    apply_adaround,
)
from aimet_tpu.algorithms.seq_mse import apply_seq_mse
from aimet_tpu.models.cnn import TinyMLP, init_model
from aimet_tpu.quantsim.config import QuantSimConfig
from aimet_tpu.quantsim.qsim import QuantizationSimModel


def build(rng, bw=4, per_channel=False, shape=(8, 16)):
    model = TinyMLP(features=16)
    v, x = init_model(model, shape)
    fn = lambda p, x: model.apply(p, x)
    cfg = QuantSimConfig.per_channel_default() if per_channel else None
    sim = QuantizationSimModel(fn, (v, x), quant_scheme="minmax",
                               default_param_bw=bw, config=cfg)
    batches = [jnp.asarray(rng.randn(*shape).astype(np.float32)) for _ in range(3)]
    sim.compute_encodings(v, iter(batches))
    return model, sim, v, batches


def test_h_alpha_bounds():
    a = jnp.linspace(-10, 10, 101)
    h = _h_alpha(a)
    assert float(h.min()) == 0.0 and float(h.max()) == 1.0
    # monotone
    assert np.all(np.diff(np.asarray(h)) >= 0)


def test_alpha_init_reproduces_fractional_part(rng):
    w = jnp.asarray(rng.randn(32).astype(np.float32))
    delta = jnp.float32(0.1)
    alpha = _alpha_init(w, delta)
    h = _h_alpha(alpha)
    rest = np.asarray(w / delta - jnp.floor(w / delta))
    np.testing.assert_allclose(np.asarray(h), rest, atol=2e-4)
    # soft-quant at init == original weight (on-grid reconstruction)


def test_adaround_weights_on_grid_and_better(rng):
    model, sim, v, batches = build(rng, bw=4)
    ada = AdaroundParameters(num_batches=3, num_iterations=200)
    new_params = apply_adaround(sim, v, batches, ada)

    # 1. adarounded weights lie on their encoding grid
    kpath = next(n for n in sim.quantizers if "Dense_0" in n)
    enc = sim.encodings[kpath]
    import jax.tree_util as jtu
    idx = sim.graph._param_leaf_index[kpath]
    w_ada = np.asarray(jtu.tree_leaves(new_params)[idx])
    q = w_ada / float(enc.delta)
    np.testing.assert_allclose(q, np.round(q), atol=1e-3)

    # 2. encodings frozen
    assert kpath in sim._frozen

    # 3. quantized output error vs FP reference improves over nearest rounding
    ref = model.apply(v, batches[0])
    err_nearest = float(jnp.mean(jnp.abs(sim.quantized_fn(v, batches[0]) - ref)))
    err_ada = float(jnp.mean(jnp.abs(sim.quantized_fn(new_params, batches[0]) - ref)))
    assert err_ada < err_nearest


def test_seq_mse_freezes_and_improves(rng):
    model, sim, v, batches = build(rng, bw=4, per_channel=True)
    ref = model.apply(v, batches[0])
    err_before = float(jnp.mean(jnp.abs(sim.quantized_fn(v, batches[0]) - ref)))

    optimized = apply_seq_mse(sim, v, batches, num_candidates=20)
    assert len(optimized) == 3
    # frozen param encodings survive recompute
    frozen = [n for n in sim._frozen]
    assert len(frozen) == 3
    err_after = float(jnp.mean(jnp.abs(sim.quantized_fn(v, batches[0]) - ref)))
    assert err_after <= err_before * 1.05


def test_seq_mse_per_tensor(rng):
    model, sim, v, batches = build(rng, bw=4, per_channel=False)
    optimized = apply_seq_mse(sim, v, batches, num_candidates=10)
    assert optimized
    out = sim.quantized_fn(v, batches[0])
    assert np.isfinite(np.asarray(out)).all()


def test_seq_mse_neg_sqnr_loss(rng):
    model, sim, v, batches = build(rng, bw=4, per_channel=True)
    optimized = apply_seq_mse(sim, v, batches, num_candidates=8,
                              loss_fn="neg_sqnr")
    assert optimized
