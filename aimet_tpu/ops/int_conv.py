"""Fused dequant-conv: true INT8/INT4 convolution on TPU.

Two execution strategies (reference counterpart: none — the reference only
simulates; QcQuantizeOp fake-quant around float convs):

1. **Direct int conv** (round 2, the default): XLA's
   ``conv_general_dilated`` accepts int8 operands with
   ``preferred_element_type=int32`` and lowers them onto the MXU's int8
   path as an *implicit* GEMM — no patch materialization, activation
   traffic stays 1 byte/element.  Covers regular, depthwise/grouped
   (``feature_group_count``) and transposed (``lhs_dilation``) convs.
   Asymmetric activation grids are handled by **zero-point padding**: the
   padded/dilation-inserted positions are filled with the activation
   zero-point so one position-independent correction term
   ``(128 + offset) * sum(w_int)`` makes the integer conv exact
   (see ``conv2d_int8_static``).

2. **im2col + fused dequant-matmul Pallas kernels** (round 1, kept for the
   ops API): ``lax.conv_general_dilated_patches`` then ops/int_matmul.py.
   Multiplies activation traffic by kh*kw; only sensible when the fused
   epilogue wins back more than the patch traffic costs.

Weight-only modes store the weights as INT codes (int8, or nibble-packed
int4 along the output-channel axis) and dequantize inline — conv weights
are tiny next to conv activations, so the honest weight-only conv is a
*memory* win (weights resident INT), not a compute win.

Layouts: x NHWC, w (kh, kw, ci/g, co) — flax.linen.Conv convention.
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


# ---------------------------------------------------------------------------
# Direct int conv (round 2): implicit GEMM on the MXU int8 path
# ---------------------------------------------------------------------------

def _dilate_and_pad(xq: jax.Array, padding, lhs_dilation, fill) -> jax.Array:
    """Spatially dilate (conv-transpose zero insertion) and pad ``xq``
    (NHWC int8) with the constant ``fill`` (the activation zero-point), so
    a VALID integer conv is exact for asymmetric activation grids."""
    dh, dw = (lhs_dilation or (1, 1))
    if dh > 1 or dw > 1:
        B, H, W, C = xq.shape
        out = jnp.full((B, (H - 1) * dh + 1, (W - 1) * dw + 1, C),
                       fill, xq.dtype)
        xq = out.at[:, ::dh, ::dw, :].set(xq)
    (ph0, ph1), (pw0, pw1) = padding
    if (ph0, ph1, pw0, pw1) != (0, 0, 0, 0):
        xq = jnp.pad(xq, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)),
                     constant_values=fill)
    return xq


def conv_int_core(xq: jax.Array, wq: jax.Array, *, strides,
                  padding, feature_group_count: int = 1,
                  lhs_dilation=None, rhs_dilation=None,
                  fill: int = 0) -> jax.Array:
    """int8 x int8 -> int32 NHWC conv with explicit ``fill``-valued
    padding/dilation (XLA would insert 0s; asymmetric grids need the
    zero-point instead)."""
    xq = _dilate_and_pad(xq, padding, lhs_dilation, fill)
    return lax.conv_general_dilated(
        xq, wq, window_strides=tuple(strides), padding="VALID",
        rhs_dilation=rhs_dilation, feature_group_count=feature_group_count,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def conv2d_int8_static(x: jax.Array, wq: jax.Array, w_scale: jax.Array,
                       act_delta, act_offset, act_steps: float, *,
                       strides=(1, 1), padding=((0, 0), (0, 0)),
                       feature_group_count: int = 1, lhs_dilation=None,
                       rhs_dilation=None, out_dtype=None) -> jax.Array:
    """Full static-INT8 conv: quantize x with its FROZEN calibration
    encoding, run the int8 implicit-GEMM conv, correct the zero point.

        x = (q + off)*dx,  q in [0, steps]  ->  q_s = q - 128  (int8)
        y[co] = sw*dx * ( conv_int(q_s, w_int)[co]
                          + (128 + off) * sum(w_int[.., co]) )

    Padded / conv-transpose-inserted positions are filled with the signed
    zero-point ``-(128 + off)`` so their contribution is exactly float-0
    and the correction stays position-independent.

    wq: (kh, kw, ci/g, co) int8 codes; w_scale: (co,) float.
    """
    out_dtype = out_dtype or x.dtype
    dx = jnp.asarray(act_delta, jnp.float32).reshape(())
    off = jnp.asarray(act_offset, jnp.float32).reshape(())
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / dx - off), 0.0, act_steps)
    q_s = (q - 128.0).astype(jnp.int8)
    zp = (-(off + 128.0)).astype(jnp.int8)
    acc = conv_int_core(
        q_s, wq, strides=strides, padding=padding,
        feature_group_count=feature_group_count, lhs_dilation=lhs_dilation,
        rhs_dilation=rhs_dilation, fill=zp)
    wsum = wq.astype(jnp.int32).sum(axis=(0, 1, 2)).astype(jnp.float32)
    y = (acc.astype(jnp.float32) + (128.0 + off) * wsum[None, None, None, :])
    return (y * (dx * w_scale)[None, None, None, :]).astype(out_dtype)


def conv2d_w8a8_dynamic(x: jax.Array, wq: jax.Array, w_scale: jax.Array, *,
                        strides=(1, 1), padding=((0, 0), (0, 0)),
                        feature_group_count: int = 1, lhs_dilation=None,
                        rhs_dilation=None, out_dtype=None) -> jax.Array:
    """Dynamic full-INT8 conv: per-tensor symmetric activation quant
    (s = max|x|/127, zero point 0 so plain zero padding is exact), int8
    implicit-GEMM conv, epilogue rescale. Serves w4a8/w8a8 convs when no
    static input encoding exists."""
    out_dtype = out_dtype or x.dtype
    s = jnp.maximum(jnp.max(jnp.abs(x)).astype(jnp.float32), 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127.0, 127.0)
    acc = conv_int_core(
        q.astype(jnp.int8), wq, strides=strides, padding=padding,
        feature_group_count=feature_group_count, lhs_dilation=lhs_dilation,
        rhs_dilation=rhs_dilation, fill=0)
    return (acc.astype(jnp.float32)
            * (s * w_scale)[None, None, None, :]).astype(out_dtype)


def pack_int4_conv_co(q: jax.Array):
    """(kh, kw, cig, co) int codes in [-7, 7] -> (kh, kw, cig, co//2)
    uint-nibble packed along the OUTPUT-channel axis (co must be even)."""
    lo = q[..., 0::2] & 0xF
    hi = (q[..., 1::2] & 0xF) << 4
    return (lo | hi).astype(jnp.int8)


def unpack_int4_conv_co(packed: jax.Array) -> jax.Array:
    """Inverse of pack_int4_conv_co -> int8 codes (kh, kw, cig, co)."""
    lo = (packed << 4).astype(jnp.int8) >> 4       # sign-extend low nibble
    hi = packed >> 4                                # arithmetic shift (int8)
    kh, kw, cig, cop = packed.shape
    out = jnp.stack([lo, hi], axis=-1).reshape(kh, kw, cig, 2 * cop)
    return out


def conv2d_weight_only(x: jax.Array, wq: jax.Array, w_scale: jax.Array, *,
                       bits: int = 8, strides=(1, 1),
                       padding=((0, 0), (0, 0)), feature_group_count: int = 1,
                       lhs_dilation=None, rhs_dilation=None,
                       out_dtype=None) -> jax.Array:
    """Weight-only INT conv: weights resident as INT codes (int8, or
    int4 nibble-packed along co when ``bits==4``), dequantized inline —
    the dequant is O(weight size), negligible next to the conv itself,
    and the conv runs as XLA's native implicit GEMM (no im2col traffic).
    """
    out_dtype = out_dtype or x.dtype
    if bits == 4:
        wq = unpack_int4_conv_co(wq)
    w = wq.astype(jnp.float32) * w_scale[None, None, None, :]
    return lax.conv_general_dilated(
        _dilate_and_pad(x, padding, lhs_dilation, 0).astype(x.dtype),
        w.astype(x.dtype), window_strides=tuple(strides), padding="VALID",
        rhs_dilation=rhs_dilation, feature_group_count=feature_group_count,
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(out_dtype)
