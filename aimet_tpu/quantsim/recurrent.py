"""Recurrent quantsim: LSTM/GRU with per-timestep fake-quant via lax.scan.

TPU-native re-design of QcQuantizeRecurrent
(aimet_torch/v1/qc_quantize_recurrent.py:122-880): the reference re-implements
the RNN time loop in Python, calling stateful quantizers each step.  Here the
time loop is a ``lax.scan`` whose carry threads the observer state, so
calibration of the per-timestep hidden/cell quantizers compiles into one
fused XLA loop — no per-step Python dispatch.

Quantizer layout mirrors the reference's grouped quantizers (:191-306):
  - input sequence: one quantizer, applied to every timestep's input
  - hidden state (h) and cell state (c): shared across timesteps, updated
    every step during calibration, applied every step when active
  - parameters (kernel/recurrent_kernel): quantized once per forward
  - output sequence: the quantized hidden states
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..quantization.affine import AffineEncoding
from ..quantization.encoding_analyzer import EncodingAnalyzer
from ..quantization.grads import quantize_dequantize


@dataclasses.dataclass(frozen=True)
class RecurrentQuantSpec:
    bitwidth_act: int = 8
    bitwidth_param: int = 8
    act_symmetric: bool = False
    param_symmetric: bool = True
    scheme: str = "minmax"


def lstm_step(params, x_t, h, c):
    """Flax-layout LSTM cell: params = {kernel (I,4H), recurrent_kernel
    (H,4H), bias (4H,)}; gate order (i, f, g, o)."""
    gates = x_t @ params["kernel"] + h @ params["recurrent_kernel"]
    if "bias" in params:
        gates = gates + params["bias"]
    H = h.shape[-1]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def gru_step(params, x_t, h):
    """GRU cell: params = {kernel (I,3H), recurrent_kernel (H,3H), bias,
    optional recurrent_bias (3H,)}. The recurrent bias must stay separate
    (torch semantics: n = tanh(W_in x + b_in + r*(W_hn h + b_hn)) — b_hn
    sits INSIDE the reset-gated term, so it cannot merge into ``bias``)."""
    xz = x_t @ params["kernel"]
    hz = h @ params["recurrent_kernel"]
    if "bias" in params:
        xz = xz + params["bias"]
    if "recurrent_bias" in params:
        hz = hz + params["recurrent_bias"]
    xr, xu, xn = jnp.split(xz, 3, axis=-1)
    hr, hu, hn = jnp.split(hz, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    u = jax.nn.sigmoid(xu + hu)
    n = jnp.tanh(xn + r * hn)
    return (1 - u) * n + u * h


def init_lstm_params(key, input_dim, hidden, use_bias=True, scale=0.1):
    k1, k2 = jax.random.split(key)
    p = {"kernel": jax.random.normal(k1, (input_dim, 4 * hidden)) * scale,
         "recurrent_kernel": jax.random.normal(k2, (hidden, 4 * hidden)) * scale}
    if use_bias:
        p["bias"] = jnp.zeros((4 * hidden,))
    return p


def init_gru_params(key, input_dim, hidden, use_bias=True, scale=0.1):
    k1, k2 = jax.random.split(key)
    p = {"kernel": jax.random.normal(k1, (input_dim, 3 * hidden)) * scale,
         "recurrent_kernel": jax.random.normal(k2, (hidden, 3 * hidden)) * scale}
    if use_bias:
        p["bias"] = jnp.zeros((3 * hidden,))
    return p


class RecurrentQuantizer:
    """Quantsim for a (possibly stacked) LSTM/GRU.

    Usage:
      rq = RecurrentQuantizer('lstm', spec)
      rq.compute_encodings(params, seq_batches)     # x: (B, T, I)
      out, (h, c) = rq.quantized_forward(params, x)
    """

    ACT_QUANTIZERS = ("input", "hidden", "cell")

    def __init__(self, cell_type: str = "lstm",
                 spec: RecurrentQuantSpec = RecurrentQuantSpec()):
        assert cell_type in ("lstm", "gru")
        self.cell_type = cell_type
        self.spec = spec
        self._analyzers = {
            n: EncodingAnalyzer(spec.scheme) for n in self.ACT_QUANTIZERS}
        self.encodings: Dict[str, AffineEncoding] = {}

    # -- helpers -----------------------------------------------------------
    def _qdq_act(self, x, name, encodings):
        enc = encodings.get(name)
        if enc is None:
            return x
        return quantize_dequantize(
            x, enc.min, enc.max, bitwidth=self.spec.bitwidth_act,
            symmetric=self.spec.act_symmetric)

    def _compute_param_encodings(self, params):
        """Host-side: one-shot min-max encodings per weight (cached)."""
        self.param_encodings = {}
        for k, v in params.items():
            if k == "bias":  # bias unquantized (default config)
                continue
            analyzer = EncodingAnalyzer("minmax")
            st = analyzer.update(analyzer.init_state(), v)
            self.param_encodings[k] = analyzer.compute(
                st, bitwidth=self.spec.bitwidth_param,
                symmetric=self.spec.param_symmetric)

    def _quantize_params(self, params):
        """Pure-jnp qdq with the cached encodings (jit-safe)."""
        if not getattr(self, "param_encodings", None):
            self._compute_param_encodings(params)
        out = {}
        for k, v in params.items():
            enc = self.param_encodings.get(k)
            if enc is None:
                out[k] = v
                continue
            out[k] = quantize_dequantize(
                v, enc.min, enc.max, bitwidth=self.spec.bitwidth_param,
                symmetric=self.spec.param_symmetric)
        return out

    # -- calibration -------------------------------------------------------
    def compute_encodings(self, params, seq_batches):
        obs = {n: self._analyzers[n].init_state() for n in self.ACT_QUANTIZERS}
        analyzers = self._analyzers
        cell_type = self.cell_type
        self._compute_param_encodings(params)
        qparams = self._quantize_params(params)

        @jax.jit
        def observe(obs, x_seq):
            B, T, I = x_seq.shape
            H = params["recurrent_kernel"].shape[0]
            obs = dict(obs)
            obs["input"] = analyzers["input"].update(obs["input"], x_seq)
            h = jnp.zeros((B, H))
            c = jnp.zeros((B, H))

            def step(carry, x_t):
                h, c, obs_h, obs_c = carry
                if cell_type == "lstm":
                    h, c = lstm_step(qparams, x_t, h, c)
                    obs_c = analyzers["cell"].update(obs_c, c)
                else:
                    h = gru_step(qparams, x_t, h)
                obs_h = analyzers["hidden"].update(obs_h, h)
                return (h, c, obs_h, obs_c), None

            (h, c, obs_h, obs_c), _ = jax.lax.scan(
                step, (h, c, obs["hidden"], obs["cell"]),
                jnp.swapaxes(x_seq, 0, 1))
            obs["hidden"] = obs_h
            obs["cell"] = obs_c
            return obs

        count = 0
        for x_seq in seq_batches:
            obs = observe(obs, x_seq)
            count += 1
        if count == 0:
            raise RuntimeError("no calibration batches")

        for n in self.ACT_QUANTIZERS:
            if n == "cell" and self.cell_type == "gru":
                continue
            self.encodings[n] = self._analyzers[n].compute(
                obs[n], bitwidth=self.spec.bitwidth_act,
                symmetric=self.spec.act_symmetric)
        return self.encodings

    # -- quantized forward -------------------------------------------------
    def quantized_forward(self, params, x_seq, seq_lengths=None):
        """x_seq (B, T, I) -> (outputs (B, T, H), (h, c)).

        ``seq_lengths`` (B,) int enables packed-sequence semantics
        (reference: qc_quantize_recurrent.py:105 PackedSequence support):
        steps at or beyond a sequence's length freeze its (h, c) carry and
        zero its outputs, so the returned final state is the state at each
        sequence's true end."""
        if not self.encodings:
            raise RuntimeError("call compute_encodings first")
        enc = self.encodings
        qparams = self._quantize_params(params)
        B, T, I = x_seq.shape
        H = params["recurrent_kernel"].shape[0]
        x_q = self._qdq_act(x_seq, "input", enc)
        h = jnp.zeros((B, H), x_seq.dtype)
        c = jnp.zeros((B, H), x_seq.dtype)

        def step(carry, xs):
            h, c = carry
            x_t, t = xs
            h_prev, c_prev = h, c
            if self.cell_type == "lstm":
                h, c = lstm_step(qparams, x_t, h, c)
                c = self._qdq_act(c, "cell", enc)
            else:
                h = gru_step(qparams, x_t, h)
            h = self._qdq_act(h, "hidden", enc)
            if seq_lengths is not None:
                valid = (t < seq_lengths)[:, None]
                h = jnp.where(valid, h, h_prev)
                c = jnp.where(valid, c, c_prev)
                out_t = jnp.where(valid, h, 0.0)
            else:
                out_t = h
            return (h, c), out_t

        (h, c), out = jax.lax.scan(
            step, (h, c), (jnp.swapaxes(x_q, 0, 1), jnp.arange(T)))
        return jnp.swapaxes(out, 0, 1), (h, c)

    def fp_forward(self, params, x_seq):
        B, T, I = x_seq.shape
        H = params["recurrent_kernel"].shape[0]
        h = jnp.zeros((B, H), x_seq.dtype)
        c = jnp.zeros((B, H), x_seq.dtype)

        def step(carry, x_t):
            h, c = carry
            if self.cell_type == "lstm":
                h, c = lstm_step(params, x_t, h, c)
            else:
                h = gru_step(params, x_t, h)
            return (h, c), h

        (h, c), out = jax.lax.scan(step, (h, c), jnp.swapaxes(x_seq, 0, 1))
        return jnp.swapaxes(out, 0, 1), (h, c)
