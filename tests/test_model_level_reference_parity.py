"""MODEL-level quantsim parity against the reference's own compiled code
(VERDICT r4 missing #1 / next-round #5).

tests/test_reference_vectors.py pins analyzer/kernel-level parity; this
file closes the loop at model level: the reference's TensorQuantizer
(QUANTIZATION_TF + ROUND_NEAREST, compiled UNMODIFIED from
/root/reference/ModelOptimizations/DlQuantization/src/TensorQuantizer.cpp
with TfEncodingAnalyzer + TensorQuantizationSim + trim_functions) was
driven through a small conv net end-to-end with AIMET v1 default-config
semantics (default_config.json:
/root/reference/TrainingExtensions/common/src/python/aimet_common/
quantsim_config/default_config.json — model input quantized, op outputs
quantized, Conv+Relu supergroup leaves the conv output unquantized,
params symmetric 8-bit per-tensor, bias unquantized; calibration observes
activations THROUGH qdq'd weights with activations passing through
unquantized — the v1 wrapper forward quantize-dequantizes params even in
ANALYSIS mode, qc_quantize_op.py:705-731 — and inference applies full
qdq, aimet_torch/v1/quantsim.py:425-448). The C++ driver (compiled + run
during
round 5; source preserved at tests/data/model_oracle.cpp.txt) printed the
encodings of every quantizer and the final quantized output; those values
are pinned below. Our QuantizationSimModel, given the same weights,
calibration batches and default config, must reproduce BOTH.

Net: input (8,2,6,6) -> conv3x3 (2->4) -> relu -> conv3x3 (4->4) ->
flatten (NCHW order) -> dense (16->8). Weights/data from
std::mt19937+normal_distribution streams, reproduced bit-exactly by
tests/refvec_rng.py (itself pinned against g++/libstdc++).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from aimet_tpu.quantsim.config import QuantSimConfig
from aimet_tpu.quantsim.qsim import QuantizationSimModel

from refvec_rng import normal_stream_f32

B, C, H, W, O1, O2, K, FC = 8, 2, 6, 6, 4, 4, 3, 8
F1H = H - K + 1                # 4
F2H = F1H - K + 1              # 2
FLAT = O2 * F2H * F2H          # 16

# ---- pinned output of the compiled reference driver ----
ORACLE_ENC = {
    # name: (min, max, delta, offset)
    "input": (-3.84236295, 3.25765555, 0.0278432098, -138),
    "relu1": (0.0, 6.31422758, 0.0247616768, 0),
    "conv2": (-11.3547278, 16.2210397, 0.108140265, -105),
    "fc": (-25.3825226, 22.2097073, 0.186636195, -136),
    "w1": (-1.71361656, 1.70022893, 0.0133876294, -128),
    "w2": (-1.39502566, 1.38412702, 0.010898638, -128),
    "w3": (-1.17527627, 1.16609442, 0.00918184585, -128),
}
ORACLE_OUT_FIRST16 = np.asarray([
    -9.89171791, -13.4378061, -3.35945153, -2.61290669, 18.2903461,
    -2.23963428, -4.29263258, -1.86636198, -7.4654479, -16.6106205,
    2.23963428, 1.49308956, 5.97235823, -1.67972577, 4.665905,
    -2.23963428], np.float32)
ORACLE_OUT_SUM = -74.8411128
ORACLE_OUT_ABSMAX = 24.2627048


def _weights():
    n = O1 * C * K * K + O1 + O2 * O1 * K * K + O2 + FC * FLAT + FC
    ws = np.asarray(normal_stream_f32(7, n, 0.0, 0.5), np.float32)
    p = [0]

    def take(k):
        v = ws[p[0]:p[0] + k]
        p[0] += k
        return v

    w1 = take(O1 * C * K * K).reshape(O1, C, K, K)      # OIHW
    b1 = take(O1)
    w2 = take(O2 * O1 * K * K).reshape(O2, O1, K, K)
    b2 = take(O2)
    w3 = take(FC * FLAT).reshape(FC, FLAT)              # (out, in)
    b3 = take(FC)
    return {
        # jax-native layouts: HWIO convs, (in, out) dense
        "w1": jnp.asarray(np.transpose(w1, (2, 3, 1, 0))),
        "b1": jnp.asarray(b1),
        "w2": jnp.asarray(np.transpose(w2, (2, 3, 1, 0))),
        "b2": jnp.asarray(b2),
        "w3": jnp.asarray(np.ascontiguousarray(w3.T)),
        "b3": jnp.asarray(b3),
    }


def _batch(seed):
    x = np.asarray(normal_stream_f32(seed, B * C * H * W, 0.0, 1.0),
                   np.float32).reshape(B, C, H, W)
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))   # NHWC


def _net(params, x):
    # Precision.HIGHEST: the oracle is f32 C++ math; XLA's default conv/dot
    # precision may decompose through bf16 (device-dependent) which shifts
    # observed min/max by ~3e-3 — far above the parity tolerance.
    dn = ("NHWC", "HWIO", "NHWC")
    prec = jax.lax.Precision.HIGHEST
    h = jax.lax.conv_general_dilated(x, params["w1"], (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     precision=prec) + params["b1"]
    h = jax.nn.relu(h)
    h = jax.lax.conv_general_dilated(h, params["w2"], (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     precision=prec) + params["b2"]
    # flatten in the oracle's NCHW order
    h = jnp.transpose(h, (0, 3, 1, 2)).reshape(x.shape[0], -1)
    return jnp.dot(h, params["w3"], precision=prec) + params["b3"]


@pytest.fixture(scope="module")
def sim():
    params = _weights()
    x0 = _batch(100)
    s = QuantizationSimModel(_net, (params, x0),
                             config=QuantSimConfig.default(),
                             quant_scheme="minmax",
                             param_quant_scheme="minmax",
                             default_output_bw=8, default_param_bw=8)
    s.compute_encodings(params, iter([_batch(100 + i) for i in range(4)]))
    return s, params


def _enc_by_kind(sim_obj):
    """Map oracle names -> our encoding keys via graph structure."""
    s = sim_obj
    keys = {}
    conv_ops = [op.name for op in s.graph.ops if op.type == "conv"]
    relu_ops = [op.name for op in s.graph.ops if op.type == "relu"]
    lin_ops = [op.name for op in s.graph.ops if op.type == "linear"]
    assert len(conv_ops) == 2 and len(relu_ops) == 1 and len(lin_ops) == 1
    keys["relu1"] = relu_ops[0]
    keys["conv2"] = conv_ops[1]
    keys["fc"] = lin_ops[0]
    inputs = [k for k in s.quantizers if k.startswith("model_input")]
    assert len(inputs) == 1, inputs
    keys["input"] = inputs[0]
    for op in s.graph.ops:
        if "kernel" in op.param_products:
            kp = op.param_products["kernel"].param_path
            for wname in ("w1", "w2", "w3"):
                if wname in kp:
                    keys[wname] = kp
    return keys


class TestModelLevelParity:
    def test_supergroup_and_placement(self, sim):
        """Conv1 (inside the Conv+Relu supergroup) must have NO output
        quantizer; relu, conv2, fc and the model input must have one."""
        s, _ = sim
        conv_ops = [op.name for op in s.graph.ops if op.type == "conv"]
        assert conv_ops[0] not in s.quantizers
        keys = _enc_by_kind(s)
        for k in ("relu1", "conv2", "fc", "input"):
            assert keys[k] in s.quantizers, (k, sorted(s.quantizers))

    def test_encodings_match_reference(self, sim):
        s, _ = sim
        keys = _enc_by_kind(s)
        for name, (emin, emax, edelta, eoff) in ORACLE_ENC.items():
            enc = s._encodings[keys[name]]
            scale = max(abs(emin), abs(emax))
            got = (float(enc.min), float(enc.max), float(enc.delta),
                   float(np.asarray(enc.offset).reshape(())))
            assert abs(got[0] - emin) <= 1e-4 * scale + 1e-7, (name, got)
            assert abs(got[1] - emax) <= 1e-4 * scale + 1e-7, (name, got)
            assert abs(got[2] - edelta) <= 1e-4 * abs(edelta) + 1e-9, (
                name, got)
            assert got[3] == pytest.approx(eoff, abs=1.01), (name, got)

    def test_quantized_outputs_match_reference(self, sim):
        """The full quantized forward must reproduce the reference
        driver's q/dq output. Tolerance: one output quantization step
        (fc delta) — float accumulation-order differences (naive C++
        loops vs XLA) can flip a value sitting on a rounding boundary,
        but any placement/composition error shifts outputs by many
        steps."""
        s, params = sim
        out = np.asarray(s.quantized_fn(params, _batch(999)), np.float32)
        assert out.shape == (B, FC)
        step = ORACLE_ENC["fc"][2]
        np.testing.assert_allclose(out.reshape(-1)[:16], ORACLE_OUT_FIRST16,
                                   atol=1.5 * step, rtol=0)
        assert abs(out.sum() - ORACLE_OUT_SUM) < 64 * step * 0.5
        assert abs(np.max(np.abs(out)) - ORACLE_OUT_ABSMAX) < 1.5 * step
