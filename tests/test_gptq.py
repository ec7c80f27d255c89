"""GPTQ / GPTVQ tests: Hessian compensation must beat nearest rounding on
the calibration distribution."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aimet_tpu.algorithms.gptq import (
    GPTVQParameters,
    _prep_hessian_inverse,
    _weighted_kmeans,
    apply_gptq,
    apply_gptvq,
)
from aimet_tpu.models.cnn import TinyMLP, init_model
from aimet_tpu.quantsim.qsim import QuantizationSimModel


def build(rng, bw=4):
    model = TinyMLP(features=32)
    v, x = init_model(model, (16, 16))
    fn = lambda p, x: model.apply(p, x)
    sim = QuantizationSimModel(fn, (v, x), quant_scheme="minmax",
                               default_param_bw=bw)
    batches = [jnp.asarray(rng.randn(16, 16).astype(np.float32))
               for _ in range(4)]
    sim.compute_encodings(v, iter(batches))
    return model, sim, v, batches


def test_hessian_inverse_dampening(rng):
    X = jnp.asarray(rng.randn(64, 8).astype(np.float32))
    H = X.T @ X
    H = H.at[3].set(0.0).at[:, 3].set(0.0)  # dead column
    Hinv, dead = _prep_hessian_inverse(H)
    assert bool(dead[3])
    assert np.isfinite(np.asarray(Hinv)).all()


def test_weighted_kmeans_converges(rng):
    pts = np.concatenate([rng.randn(100, 2) + 5, rng.randn(100, 2) - 5])
    v = jnp.asarray(pts.astype(np.float32))
    w = jnp.ones_like(v)
    cent, assign = _weighted_kmeans(v, w, 2, 10, jax.random.PRNGKey(0))
    c = np.sort(np.asarray(cent)[:, 0])
    assert c[0] < -3 and c[1] > 3


def test_gptq_beats_nearest_rounding(rng):
    model, sim, v, batches = build(rng, bw=4)
    ref_out = model.apply(v, batches[0])
    err_nearest = float(jnp.mean(
        jnp.abs(sim.quantized_fn(v, batches[0]) - ref_out)))

    new_v = apply_gptq(sim, v, batches, block_size=16)
    err_gptq = float(jnp.mean(
        jnp.abs(sim.quantized_fn(new_v, batches[0]) - ref_out)))
    assert err_gptq < err_nearest

    # GPTQ'd weights lie on their (frozen) encoding grid
    name = next(n for n in sim._frozen)
    idx = sim.graph._param_leaf_index[name]
    import jax.tree_util as jtu
    w = np.asarray(jtu.tree_leaves(new_v)[idx])
    enc = sim.encodings[name]
    q = w / float(enc.delta)
    np.testing.assert_allclose(q, np.round(q), atol=1e-3)


def test_gptvq_runs_and_reconstructs(rng):
    model, sim, v, batches = build(rng, bw=8)
    ref_out = model.apply(v, batches[0])
    new_v = apply_gptvq(sim, v, batches,
                        GPTVQParameters(vector_dim=2, index_bw=6,
                                        cols_per_block=16))
    out = sim.fp_fn(new_v, batches[0])
    # VQ with 64 centroids reconstructs closely on the calibration data
    rel = float(jnp.mean(jnp.abs(out - ref_out)) /
                (jnp.mean(jnp.abs(ref_out)) + 1e-9))
    assert rel < 0.5
    # weights actually changed (codebook-valued)
    import jax.tree_util as jtu
    w0 = np.asarray(jtu.tree_leaves(v)[1])
    w1 = np.asarray(jtu.tree_leaves(new_v)[1])
    assert not np.allclose(w0, w1)
    # few unique values per column pair (codebook structure)
    uniq = np.unique(np.round(w1.astype(np.float64), 6)).size
    assert uniq < w1.size / 2


def test_gptq_conv_layers(rng):
    import flax.linen as nn
    from aimet_tpu.models.cnn import init_model

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3, 3), padding="SAME")(x)
            x = nn.relu(x)
            x = nn.Conv(4, (3, 3), padding="SAME")(x)
            return x

    model = Net()
    v, x = init_model(model, (4, 8, 8, 3))
    fn = lambda p, x: model.apply(p, x)
    sim = QuantizationSimModel(fn, (v, x), quant_scheme="minmax",
                               default_param_bw=4)
    batches = [jnp.asarray(rng.randn(4, 8, 8, 3).astype(np.float32))
               for _ in range(2)]
    sim.compute_encodings(v, iter(batches))
    ref = model.apply(v, batches[0])
    err0 = float(jnp.mean(jnp.abs(sim.quantized_fn(v, batches[0]) - ref)))
    new_v = apply_gptq(sim, v, batches, block_size=32)
    err1 = float(jnp.mean(jnp.abs(sim.quantized_fn(new_v, batches[0]) - ref)))
    assert err1 < err0
