"""DeepSpeech2-style speech model: conv frontend + stacked bi-LSTM + CTC head.

Model family for the reference's recurrent-QAT baseline (README.md:176-196:
DeepSpeech2 bi-LSTM INT8 QAT, WER 9.92 -> 10.22; enabled by the fork's
QcQuantizeRecurrent changes, lib_changes/aimet_torch/quantsim.py:88-89).

The recurrent core uses the same functional LSTM cells as the recurrent
quantsim (quantsim/recurrent.py lstm_step), so `RecurrentQuantizer` applies
to each direction of each layer directly; each direction's scan carries its
own observer state, matching the reference's grouped per-timestep hidden/
cell quantizers (v1/qc_quantize_recurrent.py:191-204).

Layout: spectrogram input (B, T, F) -> conv2d frontend over (T, F) ->
bi-LSTM stack (lax.scan, both directions) -> per-frame log-probs
(B, T', vocab) for CTC.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from ..quantsim.recurrent import init_lstm_params, lstm_step


def init_deepspeech2(key, n_mels: int = 80, conv_channels: int = 32,
                     hidden: int = 128, num_layers: int = 3,
                     vocab: int = 29) -> Dict:
    """Parameter pytree. Conv kernels are NHWC flax-layout (kh, kw, ci, co);
    LSTM params are quantsim/recurrent.py layout."""
    keys = jax.random.split(key, 2 + 2 * num_layers + 1)
    # two SAME-padded stride-2 convs over the freq axis: ceil(ceil(F/2)/2)
    freq_out = -(-(-(-n_mels // 2)) // 2)
    params = {
        "conv1": {"kernel": jax.random.normal(
            keys[0], (11, 11, 1, conv_channels)) * 0.05,
            "bias": jnp.zeros((conv_channels,))},
        "conv2": {"kernel": jax.random.normal(
            keys[1], (11, 11, conv_channels, conv_channels)) * 0.05,
            "bias": jnp.zeros((conv_channels,))},
        "lstm": [],
        "head": {"kernel": jax.random.normal(
            keys[-1], (2 * hidden, vocab)) * 0.05,
            "bias": jnp.zeros((vocab,))},
    }
    in_dim = conv_channels * freq_out
    for layer in range(num_layers):
        fwd = init_lstm_params(keys[2 + 2 * layer], in_dim, hidden)
        bwd = init_lstm_params(keys[3 + 2 * layer], in_dim, hidden)
        params["lstm"].append({"fwd": fwd, "bwd": bwd})
        in_dim = 2 * hidden
    return params


def _conv_frontend(params: Dict, x: jax.Array) -> jax.Array:
    """(B, T, F) -> (B, T/2, C * F/4): two strided conv+relu stages
    (stride 2 over time once, over freq twice — DeepSpeech2's reduction)."""
    h = x[..., None]                                     # (B, T, F, 1)
    h = jax.lax.conv_general_dilated(
        h, params["conv1"]["kernel"], window_strides=(2, 2),
        padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    h = jax.nn.relu(h + params["conv1"]["bias"])
    h = jax.lax.conv_general_dilated(
        h, params["conv2"]["kernel"], window_strides=(1, 2),
        padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    h = jax.nn.relu(h + params["conv2"]["bias"])
    B, T, F, C = h.shape
    return h.reshape(B, T, F * C)


def _lstm_scan(cell_params: Dict, x_seq: jax.Array,
               reverse: bool = False) -> jax.Array:
    """(B, T, I) -> (B, T, H) single-direction LSTM via lax.scan."""
    B = x_seq.shape[0]
    H = cell_params["recurrent_kernel"].shape[0]

    def step(carry, x_t):
        h, c = carry
        h, c = lstm_step(cell_params, x_t, h, c)
        return (h, c), h

    xs = jnp.swapaxes(x_seq, 0, 1)                       # (T, B, I)
    init = (jnp.zeros((B, H)), jnp.zeros((B, H)))
    _, hs = jax.lax.scan(step, init, xs, reverse=reverse)
    return jnp.swapaxes(hs, 0, 1)


def deepspeech2_apply(params: Dict, x: jax.Array) -> jax.Array:
    """(B, T, n_mels) spectrograms -> (B, T', vocab) log-probs (CTC)."""
    h = _conv_frontend(params, x)
    for layer in params["lstm"]:
        fwd = _lstm_scan(layer["fwd"], h)
        bwd = _lstm_scan(layer["bwd"], h, reverse=True)
        h = jnp.concatenate([fwd, bwd], axis=-1)
    logits = h @ params["head"]["kernel"] + params["head"]["bias"]
    return jax.nn.log_softmax(logits, axis=-1)


def quantsim_deepspeech2(params: Dict, seq_batches: List[jax.Array], **kw):
    """Quantize DeepSpeech2 through the ONE QuantizationSimModel API: the
    bi-LSTM ``lax.scan`` time loops are intercepted by the quantsim (round-2
    control-flow support), so per-timestep hidden/cell-path quantizers
    calibrate inside ``sim.compute_encodings`` and appear in
    ``sim.export_encodings()`` — the reference reaches the same point via
    module wrapping (qc_quantize_recurrent.py:122-880 +
    lib_changes/aimet_torch/quantsim.py:88-89).

    Returns the calibrated sim; use ``sim.quantized_fn`` /
    ``sim.qat_fn()`` for recurrent INT8 QAT (README.md:176-196 row)."""
    from ..quantsim.qsim import QuantizationSimModel
    sim = QuantizationSimModel(deepspeech2_apply, (params, seq_batches[0]),
                               **kw)
    sim.compute_encodings(params, iter(seq_batches))
    return sim


def quantize_deepspeech2(params: Dict, seq_batches: List[jax.Array],
                         spec=None) -> Tuple:
    """INT8 recurrent quantsim over the full model: each bi-LSTM direction
    gets its own RecurrentQuantizer (per-timestep hidden/cell fake-quant);
    conv/head weights get per-tensor minmax qdq.

    Returns (quantized_apply, quantizers) where
    quantized_apply(params, x) mirrors deepspeech2_apply.
    """
    from ..quantization.grads import quantize_dequantize
    from ..quantsim.recurrent import RecurrentQuantSpec, RecurrentQuantizer

    spec = spec or RecurrentQuantSpec()

    # calibrate recurrent quantizers layer by layer on the FP activations
    quantizers = []
    acts = [_conv_frontend(params, b) for b in seq_batches]
    layer_in = acts
    for layer in params["lstm"]:
        rq_f = RecurrentQuantizer("lstm", spec)
        rq_b = RecurrentQuantizer("lstm", spec)
        rq_f.compute_encodings(layer["fwd"], layer_in)
        rq_b.compute_encodings(layer["bwd"],
                               [b[:, ::-1] for b in layer_in])
        quantizers.append((rq_f, rq_b))
        layer_in = [jnp.concatenate(
            [_lstm_scan(layer["fwd"], b),
             _lstm_scan(layer["bwd"], b, reverse=True)], axis=-1)
            for b in layer_in]

    def _qdq_weight(w):
        return quantize_dequantize(w, jnp.min(w), jnp.max(w), bitwidth=8,
                                   symmetric=True)

    def quantized_apply(params, x):
        qp = jax.tree_util.tree_map(lambda w: w, params)  # shallow copy tree
        qp["conv1"] = {"kernel": _qdq_weight(params["conv1"]["kernel"]),
                       "bias": params["conv1"]["bias"]}
        qp["conv2"] = {"kernel": _qdq_weight(params["conv2"]["kernel"]),
                       "bias": params["conv2"]["bias"]}
        h = _conv_frontend(qp, x)
        for layer, (rq_f, rq_b) in zip(params["lstm"], quantizers):
            f, _ = rq_f.quantized_forward(layer["fwd"], h)
            b, _ = rq_b.quantized_forward(layer["bwd"], h[:, ::-1])
            h = jnp.concatenate([f, b[:, ::-1]], axis=-1)
        w = _qdq_weight(params["head"]["kernel"])
        logits = h @ w + params["head"]["bias"]
        return jax.nn.log_softmax(logits, axis=-1)

    return quantized_apply, quantizers
