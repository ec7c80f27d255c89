"""SmoothQuant activation-outlier smoothing (algorithms/smooth_quant.py).

Beyond-reference: the reference's CLE only equalizes weight ranges; these
tests check (a) the transform is float-exact, (b) it discovers the
RMSNorm->qkv / RMSNorm->mlp sites on a real transformer graph, and (c) it
measurably rescues per-tensor W8A8 accuracy on outlier-heavy activations.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aimet_tpu.algorithms.smooth_quant import (apply_smooth_quant,
                                               compute_smoothing_scales,
                                               find_smooth_targets)
from aimet_tpu.graph.connected_graph import ConnectedGraph
from aimet_tpu.quantsim.qsim import QuantizationSimModel


class NormedMLP(nn.Module):
    """RMSNorm -> two parallel linears -> combine (LLM block shape)."""
    d: int = 32
    h: int = 64

    @nn.compact
    def __call__(self, x):
        y = x * jax.lax.rsqrt(jnp.mean(x * x, -1, keepdims=True) + 1e-6)
        y = y * self.param("gamma", nn.initializers.ones, (self.d,))
        a = nn.Dense(self.h, use_bias=False, name="w_gate")(y)
        b = nn.Dense(self.h, use_bias=False, name="w_up")(y)
        return nn.Dense(self.d, name="w_down")(nn.silu(a) * b)


@pytest.fixture(scope="module")
def setup():
    """Outliers live in the learned norm gamma (the real LLM failure mode:
    a few channels of the post-norm hidden state are 50x the rest), NOT at
    the model input — so the rescue is attributable to the smoothed site."""
    rng = np.random.RandomState(0)
    m = NormedMLP()
    x0 = jnp.asarray(rng.randn(8, 32).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x0)
    gamma = np.ones(32, np.float32)
    gamma[[3, 17]] = 50.0
    v = jax.tree_util.tree_map(lambda a: a, v)  # unfreeze-safe copy
    v = {"params": {**v["params"], "gamma": jnp.asarray(gamma)}}
    fn = lambda p, x: m.apply(p, x)
    calib = [jnp.asarray(rng.randn(8, 32).astype(np.float32))
             for _ in range(3)]
    return fn, v, x0, calib


def test_find_targets_on_mlp(setup):
    fn, v, x0, _ = setup
    g = ConnectedGraph(fn, (v, x0))
    targets = find_smooth_targets(g)
    # exactly one site: the gamma scale feeding w_gate + w_up
    sites = {t.producer.type: [c.name for c in t.consumers] for t in targets}
    assert any(len(c) == 2 for c in sites.values()), sites
    assert "scale" in sites, sites


def test_float_exactness(setup):
    fn, v, x0, calib = setup
    v2, info = apply_smooth_quant(fn, (v, x0), v, calib, alpha=0.5)
    assert info, "no sites smoothed"
    ref = np.asarray(fn(v, x0), np.float32)
    got = np.asarray(fn(v2, x0), np.float32)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)
    # the transform actually changed the params
    s = list(info.values())[0]
    assert float(jnp.max(s)) / float(jnp.min(s)) > 3.0, np.asarray(s)


def test_w8a8_rescue_on_outliers(setup):
    """Per-tensor activation INT8 on outlier channels: smoothing must cut
    the quantized-output error of the smoothed site (post-norm activation
    + the weights that absorb it) by a real factor — the SmoothQuant
    tradeoff claim: act spread / weight spread both land at sqrt(spread)."""
    fn, v, x0, calib = setup
    g = ConnectedGraph(fn, (v, x0))
    (t,) = [t for t in find_smooth_targets(g) if len(t.consumers) == 2]
    site = ([t.act_product_name]
            + [c.param_products["kernel"].param_path for c in t.consumers]
            + _per_channel_paths(t, g))

    def quant_err(params):
        sim = QuantizationSimModel(fn, (params, x0))
        sim.compute_encodings(params, iter(calib))
        q = np.asarray(sim.quantized_fn_subset(params, x0, enabled=site),
                       np.float32)
        f = np.asarray(fn(params, x0), np.float32)
        return np.sqrt(np.mean((q - f) ** 2)) / (np.std(f) + 1e-12)

    err_plain = quant_err(v)
    v2, _ = apply_smooth_quant(fn, (v, x0), v, calib, alpha=0.5)
    err_smooth = quant_err(v2)
    assert err_smooth < 0.6 * err_plain, (err_plain, err_smooth)

    # and the full-model error must not get worse
    def full_err(params):
        sim = QuantizationSimModel(fn, (params, x0))
        sim.compute_encodings(params, iter(calib))
        q = np.asarray(sim.quantized_fn(params, x0), np.float32)
        f = np.asarray(fn(params, x0), np.float32)
        return np.sqrt(np.mean((q - f) ** 2)) / (np.std(f) + 1e-12)

    assert full_err(v2) < full_err(v)


def _per_channel_paths(t, g):
    from aimet_tpu.algorithms.smooth_quant import _per_channel_param_paths
    cin = t.consumers[0].param_products["kernel"].shape[0]
    return _per_channel_param_paths(t.producer, int(cin))


def test_scale_guards():
    s = compute_smoothing_scales(jnp.array([0.0, 1.0, 4.0]),
                                 jnp.array([1.0, 0.0, 1.0]), alpha=0.5)
    np.testing.assert_allclose(np.asarray(s), [1.0, 1.0, 2.0])


def test_transformer_targets_and_exactness():
    """On the real Llama-style model: every block's attn_norm and mlp_norm
    (plus final_norm->lm_head) are discovered; transform is float-exact."""
    from aimet_tpu.models.transformer import Transformer, TransformerConfig

    cfg = TransformerConfig.tiny(64)
    m = Transformer(cfg)
    tok = jnp.asarray(np.random.RandomState(0).randint(0, 64, (2, 8)))
    v = m.init(jax.random.PRNGKey(0), tok)
    fn = lambda p, t: m.apply(p, t)[0]
    g = ConnectedGraph(fn, (v, tok))
    targets = find_smooth_targets(g)
    # 2 layers x (attn_norm -> wq/wk/wv, mlp_norm -> w_gate/w_up)
    grouped = sorted(len(t.consumers) for t in targets)
    assert len(targets) >= 4, [t.producer.name for t in targets]
    assert grouped.count(3) >= 2 and grouped.count(2) >= 2, grouped

    v2, info = apply_smooth_quant(fn, (v, tok), v, [tok], alpha=0.5,
                                  graph=g, targets=targets)
    ref = np.asarray(fn(v, tok), np.float32)
    got = np.asarray(fn(v2, tok), np.float32)
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-5)
