"""Fused dequant-conv: true INT8/INT4 convolution on TPU.

The BASELINE north star names "fused dequant+matmul/conv Pallas kernels";
convs lower to the tuned matmul kernels via im2col
(`lax.conv_general_dilated_patches`), which is how TPUs execute convs
anyway (XLA lowers conv to MXU matmuls over patch matrices). Reference
counterpart: none — the reference only simulates (QcQuantizeOp fake-quant
around float convs); this executes with INT weights resident.

Layouts: x NHWC, w (kh, kw, ci, co) — flax.linen.Conv convention.
"""
from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

from .int_matmul import (
    matmul_w4,
    matmul_w8,
    matmul_w8a8,
    matmul_w4_xla,
    matmul_w8_xla,
    matmul_w8a8_xla,
    quantize_weight_int4,
    quantize_weight_per_channel,
)

Padding = Union[str, Sequence[Tuple[int, int]]]


def quantize_conv_weight_per_channel(w: jax.Array):
    """w (kh, kw, ci, co) -> (w_int8 (ci*kh*kw, co), scale (co,)).

    Rows are ordered (ci, kh, kw) to match
    lax.conv_general_dilated_patches' output feature ordering."""
    kh, kw, ci, co = w.shape
    w2d = jnp.transpose(w, (2, 0, 1, 3)).reshape(ci * kh * kw, co)
    return quantize_weight_per_channel(w2d)


def quantize_conv_weight_int4(w: jax.Array):
    """Like quantize_conv_weight_per_channel but packed INT4 (split-half).
    ci*kh*kw must be even."""
    kh, kw, ci, co = w.shape
    w2d = jnp.transpose(w, (2, 0, 1, 3)).reshape(ci * kh * kw, co)
    return quantize_weight_int4(w2d)


def _patches(x: jax.Array, filter_shape: Tuple[int, int],
             strides: Tuple[int, int], padding: Padding,
             rhs_dilation=None) -> jax.Array:
    """(B, H, W, C) -> (B, Ho, Wo, C*kh*kw) patch matrix (feature order
    (C, kh, kw)). rhs_dilation = atrous rate (DeepLab-style convs)."""
    return lax.conv_general_dilated_patches(
        x, filter_shape=filter_shape, window_strides=strides,
        padding=padding, rhs_dilation=rhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv2d_w8(x: jax.Array, w_q: jax.Array, w_scale: jax.Array,
              filter_shape: Tuple[int, int], *, strides=(1, 1),
              padding: Padding = "SAME", rhs_dilation=None,
              use_pallas: bool = True, out_dtype=None) -> jax.Array:
    """Weight-only INT8 conv: x (B,H,W,C) float/bf16, w_q from
    quantize_conv_weight_per_channel. Returns (B, Ho, Wo, co)."""
    out_dtype = out_dtype or x.dtype
    p = _patches(x, filter_shape, strides, padding, rhs_dilation)
    B, Ho, Wo, F = p.shape
    mm = matmul_w8 if use_pallas else matmul_w8_xla
    out = mm(p.reshape(B * Ho * Wo, F), w_q, w_scale, out_dtype=out_dtype)
    return out.reshape(B, Ho, Wo, -1)


def conv2d_w8a8(x: jax.Array, w_q: jax.Array, w_scale: jax.Array,
                filter_shape: Tuple[int, int], *, strides=(1, 1),
                padding: Padding = "SAME", rhs_dilation=None,
                use_pallas: bool = True, out_dtype=None) -> jax.Array:
    """Full-INT8 conv: per-patch (per output pixel) dynamic activation
    quant + int8 MXU matmul, scales applied in the epilogue."""
    out_dtype = out_dtype or x.dtype
    p = _patches(x, filter_shape, strides, padding, rhs_dilation)
    B, Ho, Wo, F = p.shape
    mm = matmul_w8a8 if use_pallas else matmul_w8a8_xla
    out = mm(p.reshape(B * Ho * Wo, F), w_q, w_scale, out_dtype=out_dtype)
    return out.reshape(B, Ho, Wo, -1)


def conv2d_w4(x: jax.Array, w_packed: jax.Array, w_scale: jax.Array,
              filter_shape: Tuple[int, int], *, strides=(1, 1),
              padding: Padding = "SAME", rhs_dilation=None,
              use_pallas: bool = True, out_dtype=None) -> jax.Array:
    """Weight-only packed-INT4 conv (split-half nibble layout)."""
    out_dtype = out_dtype or x.dtype
    p = _patches(x, filter_shape, strides, padding, rhs_dilation)
    B, Ho, Wo, F = p.shape
    mm = matmul_w4 if use_pallas else matmul_w4_xla
    out = mm(p.reshape(B * Ho * Wo, F), w_packed, w_scale,
             out_dtype=out_dtype)
    return out.reshape(B, Ho, Wo, -1)
