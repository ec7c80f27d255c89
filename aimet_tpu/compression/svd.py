"""Spatial-SVD and Weight-SVD layer factorization.

Port of the reference's SVD compression (DlCompression/src/SvdAlgorithm.cpp,
aimet_common/svd_pruner.py:54-125): conv (Noc,Nic,kh,kw) factorizes as
  spatial: (r,Nic,kh,1) then (Noc,r,1,kw)    [vertical x horizontal pass]
  weight:  (r,Nic,kh,kw) then (Noc,r,1,1)    [channel bottleneck]
expressed layout-agnostically for flax HWIO kernels via jnp.linalg.svd
(instead of OpenCV's), with the factored layer realized as a graph-level op
replacement (graph/interpreter.py) rather than module surgery.
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.connected_graph import ConnectedGraph, Op


def _hwio(op: Op, w):
    """Bring the kernel to (kh, kw, I, O) canonical order."""
    dn = op.attrs["dimension_numbers"]
    perm = list(dn.rhs_spec[2:]) + [dn.rhs_spec[1], dn.rhs_spec[0]]
    return jnp.transpose(w, perm), perm


def spatial_svd_factor(op: Op, w, rank: int):
    """kernel (kh,kw,I,O) -> w1 (kh,1,I,r), w2 (1,kw,r,O)."""
    w_c, _ = _hwio(op, w)
    kh, kw, I, O = w_c.shape
    # matrix M[(I,kh), (kw,O)]
    m = jnp.transpose(w_c, (2, 0, 1, 3)).reshape(I * kh, kw * O)
    u, s, vt = jnp.linalg.svd(m, full_matrices=False)
    r = min(rank, s.shape[0])
    sq = jnp.sqrt(s[:r])
    u_r = u[:, :r] * sq[None, :]          # (I*kh, r)
    v_r = vt[:r, :] * sq[:, None]         # (r, kw*O)
    w1 = jnp.transpose(u_r.reshape(I, kh, r), (1, 0, 2)).reshape(kh, 1, I, r)
    w2 = v_r.reshape(r, kw, O).transpose(1, 0, 2).reshape(1, kw, r, O)
    return w1, w2


def weight_svd_factor_linear(w, rank: int):
    """(I, O) -> (I, r), (r, O)."""
    u, s, vt = jnp.linalg.svd(w, full_matrices=False)
    r = min(rank, s.shape[0])
    sq = jnp.sqrt(s[:r])
    return u[:, :r] * sq[None, :], vt[:r, :] * sq[:, None]


def weight_svd_factor_conv(op: Op, w, rank: int):
    """kernel (kh,kw,I,O) -> w1 (kh,kw,I,r), w2 (1,1,r,O)."""
    w_c, _ = _hwio(op, w)
    kh, kw, I, O = w_c.shape
    m = w_c.reshape(kh * kw * I, O)
    u, s, vt = jnp.linalg.svd(m, full_matrices=False)
    r = min(rank, s.shape[0])
    sq = jnp.sqrt(s[:r])
    w1 = (u[:, :r] * sq[None, :]).reshape(kh, kw, I, r)
    w2 = (vt[:r, :] * sq[:, None]).reshape(1, 1, r, O)
    return w1, w2


def successive_svd_factor_conv(op: Op, w, rank_r: int, rank_s: int):
    """TYPE_SUCCESSIVE (ISVD.hpp:69-71; SvdAlgorithm.cpp:102-106 cost
    shape): kernel (kh,kw,I,O) -> w_in (1,1,I,s) . w_mid (kh,kw,s,r)
    . w_out (1,1,r,O).  The single weight-SVD split is applied again to the
    first factor across the input dimension."""
    w1, w_out = weight_svd_factor_conv(op, w, rank_r)   # (kh,kw,I,r),(1,1,r,O)
    kh, kw, I, r = w1.shape
    m = jnp.transpose(w1, (2, 0, 1, 3)).reshape(I, kh * kw * r)
    u, sv, vt = jnp.linalg.svd(m, full_matrices=False)
    s = min(rank_s, sv.shape[0])
    sq = jnp.sqrt(sv[:s])
    w_in = (u[:, :s] * sq[None, :]).reshape(1, 1, I, s)
    w_mid = jnp.transpose(
        (vt[:s, :] * sq[:, None]).reshape(s, kh, kw, r), (1, 2, 0, 3))
    return w_in, w_mid, w_out


def make_successive_svd_replacement(op: Op, w, bias, rank_r: int,
                                    rank_s: int) -> Callable:
    """Three-stage factored conv: 1x1 input projection, spatial bottleneck
    conv (original stride/padding), 1x1 output projection."""
    w_in, w_mid, w_out = successive_svd_factor_conv(op, w, rank_r, rank_s)
    strides = tuple(op.attrs["window_strides"])

    def conv(x, k, st=(1, 1), pad="VALID"):
        return jax.lax.conv_general_dilated(
            x, k, window_strides=st, padding=pad,
            dimension_numbers=jax.lax.conv_dimension_numbers(
                x.shape, k.shape, ("NHWC", "HWIO", "NHWC")))

    def apply_fn(x):
        y = conv(x, w_in)
        y = conv(y, w_mid, strides, op.attrs["padding"])
        y = conv(y, w_out)
        if bias is not None:
            y = y + bias
        return y

    return apply_fn


def _split_padding(padding, kh, kw):
    if isinstance(padding, str):
        return padding, padding
    (ph, pw) = padding
    return ((tuple(ph), (0, 0)), ((0, 0), tuple(pw)))


def make_spatial_svd_replacement(op: Op, w, bias, rank: int) -> Callable:
    """Returns fn(x) computing the two-stage factored conv."""
    w1, w2 = spatial_svd_factor(op, w, rank)
    dn_flax = jax.lax.conv_dimension_numbers(
        op.inputs[0].shape, w1.shape, ("NHWC", "HWIO", "NHWC"))
    strides = tuple(op.attrs["window_strides"])
    sh, sw = (strides + (1, 1))[:2]
    kh, kw = w1.shape[0], w2.shape[1]
    pad1, pad2 = _split_padding(op.attrs["padding"], kh, kw)

    def apply_fn(x):
        y = jax.lax.conv_general_dilated(
            x, w1, window_strides=(sh, 1), padding=pad1,
            dimension_numbers=dn_flax)
        y = jax.lax.conv_general_dilated(
            y, w2, window_strides=(1, sw), padding=pad2,
            dimension_numbers=jax.lax.conv_dimension_numbers(
                y.shape, w2.shape, ("NHWC", "HWIO", "NHWC")))
        if bias is not None:
            y = y + bias
        return y

    return apply_fn


def make_weight_svd_replacement(op: Op, w, bias, rank: int) -> Callable:
    if op.type == "linear":
        w1, w2 = weight_svd_factor_linear(w, rank)

        def apply_fn(x):
            y = x @ w1 @ w2
            if bias is not None:
                y = y + bias
            return y

        return apply_fn

    w1, w2 = weight_svd_factor_conv(op, w, rank)
    strides = tuple(op.attrs["window_strides"])

    def apply_fn(x):
        y = jax.lax.conv_general_dilated(
            x, w1, window_strides=strides, padding=op.attrs["padding"],
            dimension_numbers=jax.lax.conv_dimension_numbers(
                x.shape, w1.shape, ("NHWC", "HWIO", "NHWC")))
        y = jax.lax.conv_general_dilated(
            y, w2, window_strides=(1, 1), padding="VALID",
            dimension_numbers=jax.lax.conv_dimension_numbers(
                y.shape, w2.shape, ("NHWC", "HWIO", "NHWC")))
        if bias is not None:
            y = y + bias
        return y

    return apply_fn
