"""Simulated float quantization: FP16 round-trip and FP8 fake-cast.

Ports:
  - FP16: FP32->FP16->FP32 round-trip sim (DlQuantization/src/
    Fp16Quantization.cpp, trim_functions.hpp:57)
  - FP8: aimet_torch/fp_quantization.py:40-205 — IEEE-style fake cast with a
    (searchable) maxval; exponent_bits = 7 - mantissa_bits; maxval init by
    min-max or a 111-point MSE sweep (init_mse, :78-110).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NUM_MANTISSA_BITS = 3  # fp_quantization.py:46 (E4M3)


def fake_cast_fp16(x: jax.Array) -> jax.Array:
    return x.astype(jnp.float16).astype(x.dtype)


def fake_cast_to_ieee_float(x, maxval, exponent_bits=None,
                            mantissa_bits=NUM_MANTISSA_BITS):
    """Port of fake_cast_to_ieee_float (fp_quantization.py:170-205)."""
    if exponent_bits is None:
        exponent_bits = 7 - mantissa_bits
    bias = (2.0 ** exponent_bits - jnp.log2(maxval)
            + jnp.log2(2.0 - 2.0 ** (-mantissa_bits)) - 1.0)
    x_clipped = jnp.clip(x, -maxval, maxval)
    log_scales = jax.lax.stop_gradient(
        jnp.floor(jnp.log2(jnp.abs(x_clipped) + 1e-45) + bias))
    log_scales = jnp.maximum(log_scales, 1.0)
    scales = 2.0 ** (log_scales - mantissa_bits - bias)
    return jnp.round(x_clipped / scales) * scales


def _broadcast_maxval(maxval, x, channel_axis):
    if jnp.ndim(maxval) == 0 or channel_axis is None:
        return maxval
    shape = [1] * x.ndim
    shape[channel_axis] = -1
    return jnp.reshape(maxval, shape)


def init_fp8_maxval_minmax(x, channel_axis: Optional[int] = None):
    """init_minmax (fp_quantization.py:51-66)."""
    a = jnp.abs(x)
    if channel_axis is None:
        return jnp.max(a)
    axes = tuple(d for d in range(x.ndim) if d != channel_axis)
    return jnp.max(a, axis=axes)


def init_fp8_maxval_mse(x, channel_axis: Optional[int] = None,
                        mantissa_bits=NUM_MANTISSA_BITS):
    """init_mse (fp_quantization.py:78-110): sweep 111 maxval candidates in
    [0.1*amax, 1.2*amax], pick the per-channel argmin MSE — one vmapped
    evaluation instead of the reference's Python loop."""
    amax = init_fp8_maxval_minmax(x, channel_axis)
    fracs = jnp.linspace(0.1, 1.2, 111)

    if channel_axis is None:
        def mse_for(f):
            xfp = fake_cast_to_ieee_float(x, f * amax,
                                          mantissa_bits=mantissa_bits)
            return jnp.mean((x - xfp) ** 2)
        mses = jax.vmap(mse_for)(fracs)
        return fracs[jnp.argmin(mses)] * amax

    axes = tuple(d for d in range(x.ndim) if d != channel_axis)

    def mse_for(f):
        mv = _broadcast_maxval(f * amax, x, channel_axis)
        xfp = fake_cast_to_ieee_float(x, mv, mantissa_bits=mantissa_bits)
        return jnp.mean((x - xfp) ** 2, axis=axes)

    mses = jax.vmap(mse_for)(fracs)          # (111, C)
    best = jnp.argmin(mses, axis=0)          # (C,)
    return fracs[best] * amax


def quantize_to_fp8(x, maxval, channel_axis: Optional[int] = None,
                    mantissa_bits=NUM_MANTISSA_BITS):
    """fp8_quantizer entry (fp_quantization.py:130-140)."""
    mv = _broadcast_maxval(maxval, x, channel_axis)
    return fake_cast_to_ieee_float(x, mv, mantissa_bits=mantissa_bits)
