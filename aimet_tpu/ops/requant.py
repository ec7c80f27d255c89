"""Fixed-point requantization helpers for integer conv/matmul pipelines.

Port of the reference's encoding-rescale / bias-absorption math
(DlQuantization/include/DlQuantization/EncodingRescale.hpp:53-96,
src/spec_functions.cpp:60-170): given input/weight/output encodings of an
integer layer

  [(q_in + in_off) * in_scale] @ [q_w * w_scale] + bias
      = (q_out + out_off) * out_scale

compute the per-channel requant scale ``(in_scale * w_scale) / out_scale``
and the rescaled integer-domain bias, plus the mantissa/exponent split HW
fixed-point multipliers use (getScaleFactor, EncodingRescale.hpp:74-85).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def get_scale_factor(x: float, mbits: int = 16) -> Tuple[int, int]:
    """(exponent, mantissa) of positive float x as an mbits-bit fixed-point
    multiplier: x ~= m * 2^(e - mbits). Port of getScaleFactor
    (EncodingRescale.hpp:74-85, bit-twiddling re-expressed arithmetically)."""
    assert x > 0 and np.isfinite(x)
    e = int(np.floor(np.log2(x))) + 1
    m = int(round(x / 2.0 ** (e - mbits)))
    if m == (1 << mbits):  # rounding overflow
        m >>= 1
        e += 1
    if e < -126 + 1:
        return -9999, m
    return e, m


def requant_scale_and_bias(
    bias_in: jax.Array,
    input_scale: float,
    weight_scale: jax.Array,       # scalar or (C,)
    out_scale: float,
    out_offset: float = 0.0,
    with_offset_wrap: bool = False,
):
    """Returns (requant_scale, bias_q): the per-channel multiplier applied to
    the int32 accumulator, and the integer-domain bias added before
    requantization (getRescaledOutputAndBiasImplCpu, spec_functions.cpp:99+).

      q_out = requant_scale * (acc + bias_q)   [then + out_offset]
    """
    weight_scale = jnp.atleast_1d(jnp.asarray(weight_scale, jnp.float32))
    acc_scale = weight_scale * input_scale                       # (C,)
    requant_scale = acc_scale / out_scale
    # snap the float bias onto the accumulator grid, then express it in
    # accumulator units
    bias_sim = jnp.round(jnp.asarray(bias_in) / acc_scale) * acc_scale
    bias_q = bias_sim / acc_scale
    if with_offset_wrap:
        bias_q = bias_q - out_offset / requant_scale
    return requant_scale, bias_q


def get_rescaled_output_and_bias(
    bias_in: np.ndarray,
    weight_scale: np.ndarray,          # (C,) per-channel or (1,) per-tensor
    input_scale: float,
    out_encoding_delta: float,
    out_encoding_offset: float,
    bw: int = 8,
    with_offset_wrap: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Reference-exact ``getRescaledOutputAndBias``
    (spec_functions.cpp:99-156): returns (requant_scale, bias_sim) with the
    reference's exact rounding order — per-channel snaps the bias to the
    accumulator grid *before* the offset wrap, per-tensor rounds *after*
    subtracting the wrap — and the final ``floor(x * 2^(8-bw))`` shift
    simulating the HW's 16-bit bias path. Golden-vector-tested against
    TestEncodingRescale.cpp (tests/test_reference_vectors.py)."""
    if bw not in (8, 16):
        raise ValueError("bw must be 8 or 16 (spec_functions.cpp:107)")
    bias_in = np.asarray(bias_in, np.float64)
    ws = np.atleast_1d(np.asarray(weight_scale, np.float64))
    acc_scale = ws.max() * input_scale
    shift = 2.0 ** (8 - bw)

    def wrap(requant_scale):
        return (out_encoding_offset / requant_scale) if with_offset_wrap \
            else 0.0

    # Dispatch mirrors the reference EXACTLY: `if (count == weightLen)`
    # takes the per-channel branch FIRST (spec_functions.cpp:118), so a
    # single-output-channel layer with weight_scale of length 1 uses the
    # per-channel rounding order, same as the C++.
    if bias_in.shape[0] == ws.shape[0]:          # per-channel
        acc_curr = ws * input_scale
        requant_scale = acc_curr / out_encoding_delta
        bias_sim = np.round(bias_in / acc_curr) * acc_curr
        norm_ws = ws / ws.max()
        bias_sim = bias_sim / norm_ws / acc_scale - wrap(requant_scale)
        bias_sim = np.floor(bias_sim * shift)
    elif ws.shape[0] == 1:                       # per-tensor
        requant_scale = np.full_like(ws, acc_scale / out_encoding_delta)
        bias_sim = np.round(bias_in / acc_scale - wrap(requant_scale[0]))
        bias_sim = np.floor(bias_sim * shift)
    else:
        raise ValueError("weight_scale must be scalar or match bias length")
    return (requant_scale.astype(np.float32), bias_sim.astype(np.float32))


def requantize(acc: jax.Array, requant_scale: jax.Array, bias_q: jax.Array,
               out_offset: float, bitwidth: int = 8,
               signed: bool = False) -> jax.Array:
    """Apply the requant pipeline to an int32 accumulator: scale, offset,
    round, saturate — producing the next layer's integer activation."""
    ns = 2 ** bitwidth - 1
    q = jnp.round((acc.astype(jnp.float32) + bias_q) * requant_scale
                  - out_offset)
    if signed:
        lo, hi = -(ns + 1) // 2, ns // 2
    else:
        lo, hi = 0, ns
    return jnp.clip(q, lo, hi).astype(jnp.int32)
