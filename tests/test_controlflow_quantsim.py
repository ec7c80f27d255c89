"""Quantsim interception inside lax.scan / lax.cond / lax.while_loop.

Round-2 coverage for the reference's recurrent quantsim semantics
(aimet_torch/v1/qc_quantize_recurrent.py:122-880): per-timestep quantizers
for ops inside control-flow bodies, calibrated with observer state threaded
through the loop carry, exported through the one QuantizationSimModel API.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aimet_tpu.quantsim.qsim import QuantizationSimModel
from aimet_tpu.quantsim.recurrent import init_lstm_params, lstm_step


def _rel_err(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float(np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-9))


# ---------------------------------------------------------------------------
# scan: a single-layer LSTM through the main sim
# ---------------------------------------------------------------------------
def lstm_model(params, x):
    """(B, T, I) -> (B, T, H) scanned LSTM + linear head."""
    B = x.shape[0]
    H = params["cell"]["recurrent_kernel"].shape[0]

    def step(carry, x_t):
        h, c = carry
        h, c = lstm_step(params["cell"], x_t, h, c)
        return (h, c), h

    init = (jnp.zeros((B, H)), jnp.zeros((B, H)))
    _, hs = jax.lax.scan(step, init, jnp.swapaxes(x, 0, 1))
    hs = jnp.swapaxes(hs, 0, 1)
    return hs @ params["head"]


@pytest.fixture(scope="module")
def lstm_setup():
    key = jax.random.PRNGKey(0)
    params = {
        "cell": init_lstm_params(key, 6, 12),
        "head": jax.random.normal(jax.random.PRNGKey(1), (12, 4)) * 0.3,
    }
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 6))
    sim = QuantizationSimModel(lstm_model, (params, x))
    return sim, params, x


class TestScanLSTM:
    def test_inner_ops_discovered(self, lstm_setup):
        sim, params, x = lstm_setup
        names = [op.name for op in sim.graph.ops]
        inner = [n for n in names if n.startswith("scan_0/")]
        assert any("linear" in n for n in inner), inner
        # the gate activations are inner ops too
        assert any("sigmoid" in n for n in inner), inner
        assert any("tanh" in n for n in inner), inner
        scan_ops = [op for op in sim.graph.ops if op.type == "scan"]
        assert len(scan_ops) == 1
        assert sim.graph.subgraph_eqns  # body registered for the interpreter

    def test_inner_quantizers_placed(self, lstm_setup):
        sim, params, x = lstm_setup
        inner_acts = [n for n, s in sim.quantizers.items()
                      if s.kind == "act" and n.startswith("scan_0/")]
        assert len(inner_acts) >= 4, inner_acts
        # LSTM weights (scan consts) are param-quantized at the outer level
        pnames = [n for n, s in sim.quantizers.items() if s.kind == "param"]
        assert any("recurrent_kernel" in n for n in pnames), pnames
        # no output quantizer on the stacked scan output itself
        assert "scan_0" not in sim.quantizers

    def test_calibrate_quantize_export(self, lstm_setup):
        sim, params, x = lstm_setup
        data = [jax.random.normal(jax.random.PRNGKey(i), (2, 7, 6))
                for i in range(3)]
        enc = sim.compute_encodings(params, iter(data))
        inner = [n for n in enc if n.startswith("scan_0/")]
        assert inner, list(enc)
        # per-timestep observation: hidden-state range must be (-1, 1)-ish
        fp = sim.fp_fn(params, x)
        q = sim.quantized_fn(params, x)
        assert fp.shape == q.shape
        err = _rel_err(q, fp)
        assert 0 < err < 0.2, err
        exported = sim.export_encodings()
        merged = {**exported["activation_encodings"],
                  **exported["param_encodings"]}
        assert any(k.startswith("scan_0/") for k in merged), list(merged)

    def test_qat_grads_flow_into_scan(self, lstm_setup):
        sim, params, x = lstm_setup
        data = [jax.random.normal(jax.random.PRNGKey(i), (2, 7, 6))
                for i in range(2)]
        sim.compute_encodings(params, iter(data))
        apply_fn, enc_params = sim.qat_fn()

        def loss(p, ep):
            return jnp.sum(apply_fn(p, ep, x) ** 2)

        gp, ge = jax.grad(loss, argnums=(0, 1))(params, enc_params)
        # weight grads flow through the scanned fake-quant forward
        assert float(jnp.abs(gp["cell"]["kernel"]).sum()) > 0
        inner_enc = {k: v for k, v in ge.items() if k.startswith("scan_0/")}
        assert inner_enc
        total = sum(float(jnp.abs(g[0]) + jnp.abs(g[1]))
                    for g in inner_enc.values())
        assert total > 0  # range-learning gradients reach inner encodings


# ---------------------------------------------------------------------------
# scan over stacked weights (the layer-scanned LLM pattern)
# ---------------------------------------------------------------------------
def scanned_mlp(params, x):
    """L stacked dense layers applied via scan over the weight stack."""
    def layer(h, w):
        return jnp.tanh(h @ w), None

    h, _ = jax.lax.scan(layer, x, params["stack"])
    return h @ params["out"]


class TestScanOverWeights:
    def test_stacked_weight_quantizer(self):
        key = jax.random.PRNGKey(0)
        params = {
            "stack": jax.random.normal(key, (3, 8, 8)) * 0.4,
            "out": jax.random.normal(jax.random.PRNGKey(1), (8, 4)) * 0.4,
        }
        x = jax.random.normal(jax.random.PRNGKey(2), (5, 8))
        sim = QuantizationSimModel(scanned_mlp, (params, x))
        pnames = [n for n, s in sim.quantizers.items() if s.kind == "param"]
        assert any("stack" in n for n in pnames), pnames
        data = [jax.random.normal(jax.random.PRNGKey(i), (5, 8))
                for i in range(3)]
        sim.compute_encodings(params, iter(data))
        fp = sim.fp_fn(params, x)
        q = sim.quantized_fn(params, x)
        assert 0 < _rel_err(q, fp) < 0.2
        # inner linear/tanh quantizers observed per layer step
        assert any(n.startswith("scan_0/") for n in sim.encodings)


# ---------------------------------------------------------------------------
# cond / while
# ---------------------------------------------------------------------------
def cond_model(params, x, flag):
    def true_fn(h):
        return jnp.tanh(h @ params["w1"])

    def false_fn(h):
        return jax.nn.relu(h @ params["w2"])

    return jax.lax.cond(flag > 0, true_fn, false_fn, x)


class TestCond:
    def test_cond_branch_quantizers(self):
        params = {"w1": jax.random.normal(jax.random.PRNGKey(0), (8, 8)) * 0.4,
                  "w2": jax.random.normal(jax.random.PRNGKey(1), (8, 8)) * 0.4}
        x = jax.random.normal(jax.random.PRNGKey(2), (4, 8))
        sim = QuantizationSimModel(cond_model, (params, x, jnp.int32(1)))
        inner = [n for n in sim.quantizers
                 if n.startswith("cond_0/")]
        assert inner, list(sim.quantizers)
        data = [(jax.random.normal(jax.random.PRNGKey(i), (4, 8)),
                 jnp.int32(i % 2)) for i in range(4)]
        sim.compute_encodings(params, iter(data))
        for flag in (0, 1):
            fp = sim.fp_fn(params, x, jnp.int32(flag))
            q = sim.quantized_fn(params, x, jnp.int32(flag))
            assert 0 < _rel_err(q, fp) < 0.25


def while_model(params, x):
    def cond_fn(state):
        i, _h = state
        return i < 3

    def body_fn(state):
        i, h = state
        return i + 1, jnp.tanh(h @ params["w"])

    _, h = jax.lax.while_loop(cond_fn, body_fn, (jnp.int32(0), x))
    return h


class TestWhile:
    def test_while_body_quantizers(self):
        params = {"w": jax.random.normal(jax.random.PRNGKey(0), (8, 8)) * 0.4}
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
        sim = QuantizationSimModel(while_model, (params, x))
        inner = [n for n in sim.quantizers if n.startswith("while_0/")]
        assert inner, list(sim.quantizers)
        data = [jax.random.normal(jax.random.PRNGKey(i), (4, 8))
                for i in range(3)]
        sim.compute_encodings(params, iter(data))
        fp = sim.fp_fn(params, x)
        q = sim.quantized_fn(params, x)
        assert 0 < _rel_err(q, fp) < 0.25

    def test_quantizable_while_cond_raises(self):
        params = {"w": jnp.eye(4) * 0.5}

        def bad(params, x):
            def cond_fn(h):
                return jnp.sum(h @ params["w"]) > 0

            def body_fn(h):
                return h * 0.5

            return jax.lax.while_loop(cond_fn, body_fn, x)

        x = jnp.ones((2, 4))
        with pytest.raises(NotImplementedError, match="while"):
            QuantizationSimModel(bad, (params, x))


# ---------------------------------------------------------------------------
# nested jit (pjit) bodies are inlined and quantized
# ---------------------------------------------------------------------------
class TestNestedJit:
    def test_pjit_body_inlined(self):
        @jax.jit
        def block(w, h):
            return jax.nn.relu(h @ w)

        def model(params, x):
            return block(params["w"], x) @ params["out"]

        params = {"w": jax.random.normal(jax.random.PRNGKey(0), (8, 8)) * 0.4,
                  "out": jax.random.normal(jax.random.PRNGKey(1), (8, 3)) * 0.4}
        x = jax.random.normal(jax.random.PRNGKey(2), (4, 8))
        sim = QuantizationSimModel(model, (params, x))
        types = [op.type for op in sim.graph.ops]
        assert "linear" in types and "relu" in types, types
        pnames = [n for n, s in sim.quantizers.items() if s.kind == "param"]
        assert any("'w'" in n for n in pnames), pnames
        data = [jax.random.normal(jax.random.PRNGKey(i), (4, 8))
                for i in range(2)]
        sim.compute_encodings(params, iter(data))
        q = sim.quantized_fn(params, x)
        fp = sim.fp_fn(params, x)
        assert 0 < _rel_err(q, fp) < 0.25


# ---------------------------------------------------------------------------
# DeepSpeech2 (conv frontend + stacked bi-LSTM) through the ONE sim API
# ---------------------------------------------------------------------------
class TestDeepSpeechMainSim:
    def test_end_to_end(self):
        from aimet_tpu.models.deepspeech import (deepspeech2_apply,
                                                 init_deepspeech2)
        params = init_deepspeech2(jax.random.PRNGKey(0), n_mels=16,
                                  conv_channels=4, hidden=8, num_layers=1,
                                  vocab=5)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 16))
        sim = QuantizationSimModel(deepspeech2_apply, (params, x))
        # both directions of the bi-LSTM produce scan subgraphs
        scans = [op for op in sim.graph.ops if op.type == "scan"]
        assert len(scans) == 2, scans
        data = [jax.random.normal(jax.random.PRNGKey(i), (2, 12, 16))
                for i in range(2)]
        sim.compute_encodings(params, iter(data))
        fp = sim.fp_fn(params, x)
        q = sim.quantized_fn(params, x)
        assert fp.shape == q.shape
        assert _rel_err(q, fp) < 0.5
        exported = sim.export_encodings()
        act = exported["activation_encodings"]
        assert any(k.startswith("scan_") for k in act), list(act)
