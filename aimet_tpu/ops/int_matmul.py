"""Fused dequant-matmul Pallas kernels — true INT execution on TPU.

These are the TPU-native replacement for what the reference only *simulates*
(QcQuantizeOp fake-quant): after quantsim produces encodings, weights are
stored as real INT8 / packed-INT4 and the dequantization is fused into the
matmul:

  - ``matmul_w8``  : weight-only INT8 — int8 weights dequantized to bf16 in
    VMEM and fed to the MXU; halves HBM weight traffic vs bf16 (the usual
    bottleneck at serving batch sizes).
  - ``matmul_w8a8``: full INT8 — activations dynamically quantized per-row,
    int8 x int8 MXU matmul with int32 accumulation (2x MXU throughput on
    v5e), per-row x per-channel scale epilogue.
  - ``matmul_w4``  : weight-only INT4 — two nibbles packed per int8 along K,
    unpacked + dequantized in-kernel; 4x HBM weight compression.

All kernels use a (M/BM, N/BN, K/BK) grid with the K axis innermost and an
accumulator in VMEM scratch; the scale epilogue runs on the final K step.
Every kernel has an XLA reference implementation (used for correctness
tests and as the CPU fallback).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def matmul_w4_decode(x, w_packed, w_scale, *, out_dtype=None):
    """Decode-shape (M < 256) weight-only INT4 matmul with the swept
    tile policy (see :func:`decode_blocks`) — THE single place the tuned
    decode dispatch lives (serving._qmm and quantsim.lowering both call
    it). block_m covers the whole M in one pass up to 128 rows so the
    weight streams from HBM exactly once."""
    m = x.shape[0]
    bn, bk = decode_blocks(w_packed.shape[1])
    bm = max(8, min(128, -(-m // 8) * 8))
    return matmul_w4(x, w_packed, w_scale, block_m=bm, block_n=bn,
                     block_k=bk, out_dtype=out_dtype)


def decode_blocks(n_out: int) -> Tuple[int, int]:
    """(block_n, block_k-packed) for weight-only decode shapes (M<=32),
    swept on-chip at the Llama-8B shapes (scripts/probe_llama8b_parts.py):
    K-shallow, N-wide tiles stream weights fastest — bk=512 with bn=2048
    (4096 for very wide N) reaches 667-726 GB/s on v5e vs 578-644 for
    1024x1024. NOTE: if N is not a multiple of block_n the wrapper pads
    the full weight inside jit (a catastrophic extra HBM round-trip at
    lm_head size — pad the weight once at build time instead; see
    serving/quantized_llm.pad_vocab_for_decode)."""
    return (4096 if n_out >= 16384 else 2048), 512


def _pad_to(x, multiple, axis):
    size = x.shape[axis]
    rem = size % multiple
    if rem == 0:
        return x, size
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, multiple - rem)
    return jnp.pad(x, pad), size


# ---------------------------------------------------------------------------
# Quantization helpers (XLA; fused by the compiler around the kernels)
# ---------------------------------------------------------------------------

def quantize_weight_per_channel(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel INT8: w (K, N) -> (w_int8, scale (N,))."""
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def pack_int4_split_half(q: jax.Array) -> jax.Array:
    """(K, N) int codes in [-8, 7] -> (K//2, N) packed int8, *split-half
    biased* layout: byte = ((q[k + K/2] & 0xF) << 4) | (q[k] + 8).

    The low nibble is stored BIASED (+8, in [0, 15]) and the high nibble
    as plain two's complement, so kernels extract both planes with two
    int8 ANDs and NO shifts — Mosaic does not legalize i8 shifts, and
    int32-widened shifts made the M=16 decode path VPU-bound (503 GB/s vs
    631 GB/s with the AND-only extraction on v5e):

        lo + 8   = p & 0x0F          (int8)
        16 * hi  = p & 0xF0          (int8, signed!)

    The +8 folds into a rank-1 rowsum correction or an int8 subtract; the
    16x folds into a prescaled x_hi, a group-scale division, or an
    epilogue multiply — never a per-weight-element op."""
    K = q.shape[0]
    q = q.astype(jnp.int32)
    lo = (q[: K // 2] + 8) & 0xF
    hi = (q[K // 2:] & 0xF) << 4
    return (lo | hi).astype(jnp.int8)


def quantize_weight_int4(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-channel INT4, packed two-per-int8 along K with the
    split-half biased layout (see :func:`pack_int4_split_half`): the low
    nibble of packed row k holds W[k] + 8, the high nibble W[k + K/2].
    The kernel consumes the two halves as two plain MXU dots with no
    sublane interleaving.
    w (K, N) -> (packed (K//2, N) int8, scale (N,)); K must be even."""
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(w / scale[None, :]), -7, 7)
    return pack_int4_split_half(q), scale.astype(jnp.float32)


def quantize_weight_int4_grouped(w: jax.Array, group_size: int = 128
                                 ) -> Tuple[jax.Array, jax.Array]:
    """Group-wise symmetric INT4 (AWQ/LPBQ-style): one scale per
    (K-group, out-channel). w (K, N) -> (packed (K//2, N) split-half int8,
    scales (K//group_size, N) float32). group_size must divide K/2's halves
    (i.e. K % (2*group_size) == 0) so groups never straddle the two nibble
    planes."""
    K, N = w.shape
    assert K % (2 * group_size) == 0, (K, group_size)
    g = K // group_size
    wg = w.reshape(g, group_size, N)
    amax = jnp.max(jnp.abs(wg), axis=1)                  # (g, N)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wg / scale[:, None, :]), -7, 7)
    return (pack_int4_split_half(q.reshape(K, N)),
            scale.astype(jnp.float32))


def matmul_w4_grouped_xla(x, w_packed, scales, group_size: int = 128,
                          out_dtype=None):
    out_dtype = out_dtype or x.dtype
    K = x.shape[1]
    w_q = unpack_int4(w_packed).astype(jnp.float32)      # (K, N)
    g = K // group_size
    w_deq = (w_q.reshape(g, group_size, -1)
             * scales[:, None, :]).reshape(K, -1)
    return jnp.dot(x, w_deq.astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(out_dtype)


def quantize_activation_per_row(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Dynamic symmetric per-row INT8: x (M, K) -> (x_int8, scale (M,))."""
    amax = jnp.max(jnp.abs(x), axis=1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x / scale[:, None]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


# ---------------------------------------------------------------------------
# XLA reference paths
# ---------------------------------------------------------------------------

def matmul_w8_xla(x, w_q, w_scale, out_dtype=None):
    out_dtype = out_dtype or x.dtype
    acc = jnp.dot(x, w_q.astype(x.dtype), preferred_element_type=jnp.float32)
    return (acc * w_scale[None, :]).astype(out_dtype)


def matmul_w8a8_xla(x, w_q, w_scale, out_dtype=None):
    out_dtype = out_dtype or x.dtype
    x_q, x_scale = quantize_activation_per_row(x)
    acc = jax.lax.dot_general(
        x_q, w_q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32)
            * x_scale[:, None] * w_scale[None, :]).astype(out_dtype)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """(K//2, N) int8 -> (K, N) int8 in [-8, 7] (split-half biased rows:
    lo nibble (biased +8) = rows [0, K/2), hi nibble = rows [K/2, K))."""
    p = packed.astype(jnp.int32)
    lo = (p & 0xF) - 8
    hi = p >> 4            # arithmetic: sign-extended high nibble
    return jnp.concatenate([lo, hi], axis=0).astype(jnp.int8)


def matmul_w4_xla(x, w_packed, w_scale, out_dtype=None):
    """Split-half two-dot form with int8-native nibble extraction (no
    int32 widening, no concat) — measurably faster than unpack_int4 +
    one dot at decode batch sizes."""
    out_dtype = out_dtype or x.dtype
    K2 = w_packed.shape[0]
    lo = (w_packed & 0xF) - 8
    hi = jnp.right_shift(w_packed, 4)
    acc = (jnp.dot(x[:, :K2], lo.astype(x.dtype),
                   preferred_element_type=jnp.float32)
           + jnp.dot(x[:, K2:], hi.astype(x.dtype),
                     preferred_element_type=jnp.float32))
    return (acc * w_scale[None, :]).astype(out_dtype)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _w8_kernel(x_ref, w_ref, s_ref, out_ref, acc_ref, *, nk):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w_bf = w_ref[:].astype(x_ref.dtype)
    acc_ref[:] += jnp.dot(x_ref[:], w_bf, preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = (acc_ref[:] * s_ref[:]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "out_dtype"))
def matmul_w8(x, w_q, w_scale, *, block_m=1024, block_n=512, block_k=4096,
              out_dtype=None):
    """x (M, K) float/bf16 @ w_q (K, N) int8 * w_scale (N,) -> (M, N).
    Default blocks tuned on v5e at M=1024, K=N=4096 with the 100M VMEM
    limit (K-unsplit 1024x512x4096 = 200.8 TF/s > 16M-limit best 157)."""
    out_dtype = out_dtype or x.dtype
    M, K = x.shape
    _, N = w_q.shape
    block_m = min(block_m, max(8, M))
    block_k = min(block_k, -(-K // 256) * 256)
    block_n = min(block_n, -(-N // 128) * 128)
    x, m0 = _pad_to(x, block_m, 0)
    x, _ = _pad_to(x, block_k, 1)
    w_q, _ = _pad_to(w_q, block_k, 0)
    w_q, _ = _pad_to(w_q, block_n, 1)
    w_scale2 = jnp.reshape(w_scale, (1, N)).astype(jnp.float32)
    w_scale2, _ = _pad_to(w_scale2, block_n, 1)
    Mp, Kp = x.shape
    Np = w_q.shape[1]
    nk = Kp // block_k

    out = pl.pallas_call(
        functools.partial(_w8_kernel, nk=nk),
        grid=(Mp // block_m, Np // block_n, nk),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=Mp * Kp * x.dtype.itemsize + Kp * Np + Mp * Np * 2,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x, w_q, w_scale2)
    return out[:m0, :N]


def _w8a8_kernel(x_ref, w_ref, sx_ref, sw_ref, out_ref, acc_ref, *, nk,
                 bias_ref=None):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k == nk - 1)
    def _():
        scaled = acc_ref[:].astype(jnp.float32) * sx_ref[:] * sw_ref[:]
        if bias_ref is not None:
            # fused per-column epilogue add (zero-point correction / bias)
            scaled = scaled + bias_ref[:]
        out_ref[:] = scaled.astype(out_ref.dtype)


def _w8a8_kernel_bias(x_ref, w_ref, sx_ref, sw_ref, bias_ref, out_ref,
                      acc_ref, *, nk):
    _w8a8_kernel(x_ref, w_ref, sx_ref, sw_ref, out_ref, acc_ref, nk=nk,
                 bias_ref=bias_ref)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "out_dtype"))
def matmul_w8a8(x, w_q, w_scale, *, block_m=None, block_n=None,
                block_k=None, out_dtype=None):
    """Full-int8 path: dynamic per-row activation quant + int8 MXU matmul.

    With default blocks, routes to the in-kernel-quant kernel
    (``matmul_w8a8_fusedq``) whenever the whole K row fits in VMEM — on
    v5e that path runs at 323.6 TF/s at M=1024, K=N=4096, within 1% of the
    bare int8 kernel (326), because the row-max + quantize happens in VMEM
    instead of as a separate HBM pass (two-step path: 283). An explicitly
    passed ``block_k`` always takes the two-step quantize + ``matmul_q8``
    path (K-split grid) so caller tuning arguments take effect."""
    M, K = x.shape
    if block_k is None and K <= 8192:
        return matmul_w8a8_fusedq(
            x, w_q, w_scale, block_m=1024 if block_m is None else block_m,
            block_n=512 if block_n is None else block_n,
            out_dtype=out_dtype or x.dtype)
    x_q, x_scale = quantize_activation_per_row(x)
    return matmul_q8(x_q, x_scale, w_q, w_scale,
                     block_m=512 if block_m is None else block_m,
                     block_n=1024 if block_n is None else block_n,
                     block_k=4096 if block_k is None else block_k,
                     out_dtype=out_dtype or x.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "out_dtype"))
def matmul_q8(x_q, x_scale, w_q, w_scale, col_bias=None, *, block_m=1024,
              block_n=512, block_k=4096, out_dtype=jnp.float32):
    """int8 x int8 -> int32 MXU matmul with per-row x per-channel scale
    epilogue. ``x_q`` already int8 (dynamic path quantizes first; the
    static-encoding lowering path quantizes with frozen calibration
    scales — quantsim/lowering.py mode='w8a8').

    ``col_bias`` (N,) f32: fused per-column epilogue add — the static
    path's zero-point correction (and/or layer bias) without an extra
    full-tensor VPU pass."""
    M, K = x_q.shape
    _, N = w_q.shape
    block_m = min(block_m, max(32, M))
    block_k = min(block_k, -(-K // 256) * 256)
    block_n = min(block_n, -(-N // 128) * 128)

    x_q, m0 = _pad_to(x_q, block_m, 0)
    x_q, _ = _pad_to(x_q, block_k, 1)
    w_q, _ = _pad_to(w_q, block_k, 0)
    w_q, _ = _pad_to(w_q, block_n, 1)
    sx = jnp.reshape(x_scale, (M, 1)).astype(jnp.float32)
    sx, _ = _pad_to(sx, block_m, 0)
    sw = jnp.reshape(w_scale, (1, N)).astype(jnp.float32)
    sw, _ = _pad_to(sw, block_n, 1)
    Mp, Kp = x_q.shape
    Np = w_q.shape[1]
    nk = Kp // block_k

    operands = [x_q, w_q, sx, sw]
    in_specs = [
        pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_m, 1), lambda i, j, k: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_n), lambda i, j, k: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    fusion = [True, False, True, False]
    kern = functools.partial(_w8a8_kernel, nk=nk)
    if col_bias is not None:
        cb = jnp.reshape(col_bias, (1, N)).astype(jnp.float32)
        cb, _ = _pad_to(cb, block_n, 1)
        operands.append(cb)
        in_specs.append(pl.BlockSpec((1, block_n), lambda i, j, k: (0, j),
                                     memory_space=pltpu.VMEM))
        fusion.append(False)
        kern = functools.partial(_w8a8_kernel_bias, nk=nk)

    out = pl.pallas_call(
        kern,
        grid=(Mp // block_m, Np // block_n, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=Mp * Kp + Kp * Np + Mp * Np * 2,
            transcendentals=0),
        # fuse the dynamic per-row activation quant (and its pad) into the
        # kernel's input DMA instead of materializing x_q in HBM
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            allow_input_fusion=fusion,
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*operands)
    return out[:m0, :N]


def _w8a8_fusedq_kernel(x_ref, w_ref, sw_ref, out_ref, xq_ref, sx_ref):
    """Dynamic per-row activation quant INSIDE the kernel: at the first
    N-block of each M-block, read the float x tile once, reduce the row
    max, quantize to int8 into VMEM scratch; every N-block then runs the
    int8 MXU dot against the cached codes. Saves the separate HBM
    row-max + quantize pass of the two-step path (x is read once, as
    float, instead of float-read + int8 write + int8 read)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
        scale = jnp.maximum(amax, 1e-8) / 127.0
        xq_ref[:] = jnp.clip(jnp.round(xf / scale), -127, 127
                             ).astype(jnp.int8)
        sx_ref[:] = scale

    acc = jax.lax.dot_general(
        xq_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out_ref[:] = (acc.astype(jnp.float32) * sx_ref[:] * sw_ref[:]
                  ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n",
                                             "out_dtype"))
def matmul_w8a8_fusedq(x, w_q, w_scale, *, block_m=None, block_n=512,
                       out_dtype=None):
    """Full-int8 matmul with the dynamic per-row activation quantization
    fused into the kernel itself (K unsplit; the whole row lives in VMEM,
    so the row max needs no cross-block reduction). Numerics identical to
    ``matmul_w8a8`` / ``matmul_w8a8_xla``."""
    out_dtype = out_dtype or x.dtype
    M, K = x.shape
    _, N = w_q.shape
    if block_m is None:
        # v5e sweep at M=1024, K=N=4096 (vmem_limit raised to 100M):
        # 1024x512 = 323.6 TF/s > 512x1024 = 318 > 512x512 = 315 —
        # within 1% of the bare int8 kernel (326) with the dynamic
        # activation quantization INCLUDED
        block_m = 1024
    block_m = min(block_m, max(32, M))
    block_n = min(block_n, -(-N // 128) * 128)
    block_k = -(-K // 256) * 256

    x, m0 = _pad_to(x, block_m, 0)
    x, _ = _pad_to(x, block_k, 1)
    w_q, _ = _pad_to(w_q, block_k, 0)
    w_q, _ = _pad_to(w_q, block_n, 1)
    sw = jnp.reshape(w_scale, (1, N)).astype(jnp.float32)
    sw, _ = _pad_to(sw, block_n, 1)
    Mp, Kp = x.shape
    Np = w_q.shape[1]

    out = pl.pallas_call(
        _w8a8_fusedq_kernel,
        grid=(Mp // block_m, Np // block_n),
        in_specs=[
            pl.BlockSpec((block_m, Kp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, Kp), jnp.int8),
                        pltpu.VMEM((block_m, 1), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=Mp * Kp * x.dtype.itemsize + Kp * Np + Mp * Np * 2,
            transcendentals=0),
        # j must run sequentially within each i: the quantized codes are
        # produced at j == 0 and reused by the remaining N-blocks
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x, w_q, sw)
    return out[:m0, :N]


def matmul_w4a8_xla(x, w_packed, w_scale, out_dtype=None):
    """Reference: dynamic per-row INT8 activations x split-half INT4 weights
    via two int8 MXU dots with int32 accumulation."""
    out_dtype = out_dtype or x.dtype
    x_q, x_scale = quantize_activation_per_row(x)
    K2 = w_packed.shape[0]
    lo = ((w_packed & 0xF) - 8).astype(jnp.int8)
    hi = jnp.right_shift(w_packed, 4)
    dot = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    acc = dot(x_q[:, :K2], lo) + dot(x_q[:, K2:], hi)
    return (acc.astype(jnp.float32)
            * x_scale[:, None] * w_scale[None, :]).astype(out_dtype)


def _w4a8_kernel(xlo_ref, xhi_ref, w_ref, sx_ref, sw_ref, out_ref, acc_ref,
                 acch_ref, rsq_ref, *, nk):
    """W4A8 (biased layout): int8 MXU dots against the AND-extracted
    planes. acc accumulates xq_lo @ (lo+8), acch accumulates
    xq_hi @ (16*hi); the epilogue combines exactly in int32:
    total = acc - 8*rowsum(xq_lo) + (acch >> 4)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        acch_ref[:] = jnp.zeros_like(acch_ref)
        rsq_ref[:] = jnp.zeros_like(rsq_ref)

    lo_b, hi16 = _and_nibbles(w_ref[:])
    acc_ref[:] += jax.lax.dot_general(
        xlo_ref[:], lo_b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    acch_ref[:] += jax.lax.dot_general(
        xhi_ref[:], hi16, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    rsq_ref[:] += jnp.sum(xlo_ref[:].astype(jnp.int32), axis=1,
                          keepdims=True)

    @pl.when(k == nk - 1)
    def _():
        total = (acc_ref[:] - 8 * rsq_ref[:]
                 + jax.lax.shift_right_arithmetic(acch_ref[:], 4))
        scaled = total.astype(jnp.float32) * sx_ref[:] * sw_ref[:]
        out_ref[:] = scaled.astype(out_ref.dtype)


def _w8a8_staticq_kernel(x_ref, w_ref, sv_ref, cb_ref, out_ref, xq_ref,
                         *, inv_dx, shift, hi):
    """Deployment-mode w8a8: activations quantized in-kernel with the
    FROZEN calibration encoding, once per M-block at j == 0 — unlike the
    ``matmul_q8`` + allow_input_fusion path, which re-quantizes the x
    tile for every N-block (the 301 vs 324 TF/s gap of BENCH_r02).

    The quantize params are COMPILE-TIME constants (frozen encodings are
    constants at deployment): SMEM scalar operands measured ~17% slower,
    and the folded signed form (one FMA + round + signed clip; exact for
    integer offsets since round(a) - c == round(a - c)) beats the
    unsigned-grid multi-step form by the same margin. Epilogue applies
    the combined scale vector and the zero-point-correction/bias
    column."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        q = jnp.round(xf * inv_dx + shift)
        xq_ref[:] = jnp.clip(q, -128.0, hi).astype(jnp.int8)

    acc = jax.lax.dot_general(
        xq_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out_ref[:] = (acc.astype(jnp.float32) * sv_ref[:] + cb_ref[:]
                  ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("inv_delta", "offset",
                                             "num_steps", "block_m",
                                             "block_n", "out_dtype"))
def matmul_w8a8_staticq(x, w_q, scale_vec, col_bias, *, inv_delta, offset,
                        num_steps, block_m=1024, block_n=512,
                        out_dtype=jnp.float32):
    """Static-encoding INT8 matmul: x quantized in-kernel on the frozen
    [0, num_steps] grid (q = round(x/delta) - offset), shifted to signed
    int8; epilogue out = acc * scale_vec + col_bias with scale_vec (N,) =
    delta_x * w_scale and col_bias (N,) carrying the zero-point correction
    (and optionally the layer bias). K unsplit — the whole row in VMEM.
    ``inv_delta``/``offset``/``num_steps`` are STATIC (python floats): the
    frozen encoding is a deployment-time constant, and baking it measured
    ~17% faster than SMEM scalar operands on v5e."""
    M, K = x.shape
    _, N = w_q.shape
    block_m = min(block_m, max(32, M))
    block_n = min(block_n, -(-N // 128) * 128)
    block_k = -(-K // 256) * 256

    x, m0 = _pad_to(x, block_m, 0)
    x, _ = _pad_to(x, block_k, 1)
    w_q, _ = _pad_to(w_q, block_k, 0)
    w_q, _ = _pad_to(w_q, block_n, 1)
    sv = jnp.reshape(scale_vec, (1, N)).astype(jnp.float32)
    sv, _ = _pad_to(sv, block_n, 1)
    cb = jnp.reshape(col_bias, (1, N)).astype(jnp.float32)
    cb, _ = _pad_to(cb, block_n, 1)
    Mp, Kp = x.shape
    Np = w_q.shape[1]

    out = pl.pallas_call(
        functools.partial(_w8a8_staticq_kernel,
                          inv_dx=float(inv_delta),
                          shift=float(-offset - 128.0),
                          hi=float(num_steps - 128.0)),
        grid=(Mp // block_m, Np // block_n),
        in_specs=[
            pl.BlockSpec((block_m, Kp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, Kp), jnp.int8)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=Mp * Kp * x.dtype.itemsize + Kp * Np + Mp * Np * 2,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x, w_q, sv, cb)
    return out[:m0, :N]


def _w4a8_fusedq_kernel(x_ref, w_ref, sw_ref, out_ref, xq_ref, sx_ref,
                        rsq_ref):
    """W4A8 with dynamic per-row activation quant INSIDE the kernel (same
    design as ``_w8a8_fusedq_kernel``): codes computed once per M-block at
    j == 0 and cached in VMEM scratch; each N-block extracts the nibble
    planes of its packed tile with two int8 ANDs (biased layout) and runs
    two int8 MXU dots, combined exactly in int32 in the epilogue."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
        scale = jnp.maximum(amax, 1e-8) / 127.0
        xq = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
        xq_ref[:] = xq
        sx_ref[:] = scale
        K2 = xq.shape[1] // 2
        rsq_ref[:] = jnp.sum(xq[:, :K2].astype(jnp.int32), axis=1,
                             keepdims=True)

    p = w_ref[:]
    lo_b, hi16 = _and_nibbles(p)
    K2 = p.shape[0]
    dot = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    acc = dot(xq_ref[:, :K2], lo_b)
    acch = dot(xq_ref[:, K2:], hi16)
    total = (acc - 8 * rsq_ref[:]
             + jax.lax.shift_right_arithmetic(acch, 4))
    out_ref[:] = (total.astype(jnp.float32) * sx_ref[:] * sw_ref[:]
                  ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n",
                                             "out_dtype"))
def matmul_w4a8_fusedq(x, w_packed, w_scale, *, block_m=1024, block_n=256,
                       out_dtype=None):
    """W4A8 with in-kernel activation quantization (K unsplit; the whole
    row lives in VMEM so the row max needs no cross-block reduction).
    Numerics identical to ``matmul_w4a8_xla``.

    v5e sweep at M=1024, K=N=4096: 1024/256 = 347.4 TF/s > 1024/512 =
    343.9 > 1024/1024 = 322 — ABOVE the w8a8 fusedq path (323.8): the
    int4 weight tile halves weight HBM traffic on the same int8 MXU
    path."""
    out_dtype = out_dtype or x.dtype
    M, K = x.shape
    N = w_packed.shape[1]
    K2 = w_packed.shape[0]
    block_m = min(block_m, max(32, M))
    block_n = min(block_n, -(-N // 128) * 128)
    bk2 = -(-K2 // 256) * 256

    x, m0 = _pad_to(x, block_m, 0)
    # pad the two K-halves separately so columns stay aligned with the
    # lo/hi nibble planes (padded weight rows are zero)
    x_lo, _ = _pad_to(x[:, :K2], bk2, 1)
    x_hi, _ = _pad_to(x[:, K2:], bk2, 1)
    x = jnp.concatenate([x_lo, x_hi], axis=1)
    w_packed, _ = _pad_to(w_packed, bk2, 0)
    w_packed, _ = _pad_to(w_packed, block_n, 1)
    sw = jnp.reshape(w_scale, (1, N)).astype(jnp.float32)
    sw, _ = _pad_to(sw, block_n, 1)
    Mp, Kp = x.shape
    Np = w_packed.shape[1]

    out = pl.pallas_call(
        _w4a8_fusedq_kernel,
        grid=(Mp // block_m, Np // block_n),
        in_specs=[
            pl.BlockSpec((block_m, Kp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp // 2, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, Kp), jnp.int8),
                        pltpu.VMEM((block_m, 1), jnp.float32),
                        pltpu.VMEM((block_m, 1), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=Mp * Kp * x.dtype.itemsize + Kp * Np // 2
            + Mp * Np * 2,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x, w_packed, sw)
    return out[:m0, :N]


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "out_dtype"))
def matmul_w4a8(x, w_packed, w_scale, *, block_m=None, block_n=None,
                block_k=None, out_dtype=None):
    """W4A8: packed-INT4 weights x dynamically-quantized INT8 activations on
    the int8 MXU path (int32 accumulation) — the execution target of the
    reference's AdaRound W4A8 headline config (README.md:155-173), which it
    only simulates. 4x weight compression AND 2x MXU throughput; per-row x
    per-channel scale epilogue. ``block_k`` is in packed rows.

    Routes to ``matmul_w4a8_fusedq`` (in-kernel activation quant, K unsplit)
    when no explicit blocks are passed and the K row fits in VMEM; any
    explicitly passed block (incl. ``block_k``, matching ``matmul_w8a8``)
    forces the K-split two-step path so caller tuning takes effect."""
    out_dtype = out_dtype or x.dtype
    M, K = x.shape
    N = w_packed.shape[1]
    K2 = w_packed.shape[0]
    if block_m is None and block_n is None and block_k is None and K <= 8192:
        return matmul_w4a8_fusedq(x, w_packed, w_scale,
                                  out_dtype=out_dtype)
    block_m = 512 if block_m is None else block_m
    block_n = 1024 if block_n is None else block_n
    block_k = 512 if block_k is None else block_k
    x_q, x_scale = quantize_activation_per_row(x)
    block_m = min(block_m, max(32, M))
    block_k = min(block_k, -(-K2 // 256) * 256)
    block_n = min(block_n, -(-N // 128) * 128)

    x_q, m0 = _pad_to(x_q, block_m, 0)
    x_lo = x_q[:, :K2]
    x_hi = x_q[:, K2:]
    x_lo, _ = _pad_to(x_lo, block_k, 1)
    x_hi, _ = _pad_to(x_hi, block_k, 1)
    w_packed, _ = _pad_to(w_packed, block_k, 0)
    w_packed, _ = _pad_to(w_packed, block_n, 1)
    sx = jnp.reshape(x_scale, (M, 1)).astype(jnp.float32)
    sx, _ = _pad_to(sx, block_m, 0)
    sw = jnp.reshape(w_scale, (1, N)).astype(jnp.float32)
    sw, _ = _pad_to(sw, block_n, 1)
    Mp = x_lo.shape[0]
    Kp2 = x_lo.shape[1]
    Np = w_packed.shape[1]
    nk = Kp2 // block_k

    out = pl.pallas_call(
        functools.partial(_w4a8_kernel, nk=nk),
        grid=(Mp // block_m, Np // block_n, nk),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32),
                        pltpu.VMEM((block_m, block_n), jnp.int32),
                        pltpu.VMEM((block_m, 1), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp2 * 2,
            bytes_accessed=Mp * Kp2 * 2 + Kp2 * Np + Mp * Np * 2,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            allow_input_fusion=[True, True, False, False, False],
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x_lo, x_hi, w_packed, sx, sw)
    return out[:m0, :N]


def _and_nibbles(p):
    """Biased-layout nibble planes with int8 ANDs only (no shifts — Mosaic
    rejects i8 shifts; int32 widening costs 4x VPU register traffic):
    returns (lo + 8 in [0,15], 16*hi in [-128,112]) both int8."""
    return p & 0x0F, p & (-16)


def _w4_kernel(xlo_ref, xhi16_ref, w_ref, s_ref, out_ref, acc_ref, rs_ref,
               *, nk):
    """Weight-only INT4, biased layout: acc accumulates
    x_lo @ (lo+8) + (x_hi/16) @ (16*hi); the epilogue removes the lo bias
    with the rank-1 rowsum term (out = (acc - 8*rowsum(x_lo)) * s). The
    only per-weight VPU work is two int8 ANDs and two int8->bf16 converts
    (631 GB/s effective at M=16 on v5e vs 503 for shift-based unpack)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        rs_ref[:] = jnp.zeros_like(rs_ref)

    lo_b, hi16 = _and_nibbles(w_ref[:])
    acc_ref[:] += jnp.dot(xlo_ref[:], lo_b.astype(xlo_ref.dtype),
                          preferred_element_type=jnp.float32)
    acc_ref[:] += jnp.dot(xhi16_ref[:], hi16.astype(xlo_ref.dtype),
                          preferred_element_type=jnp.float32)
    rs_ref[:] += jnp.sum(xlo_ref[:].astype(jnp.float32), axis=1,
                         keepdims=True)

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = ((acc_ref[:] - 8.0 * rs_ref[:]) * s_ref[:]
                      ).astype(out_ref.dtype)


def _w4g_kernel(xlo_ref, xhi_ref, w_ref, slo_ref, shi_ref, out_ref, acc_ref,
                *, nk, group_size):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lo_b, hi16 = _and_nibbles(w_ref[:])
    lo = lo_b.astype(jnp.float32) - 8.0
    hi16f = hi16.astype(jnp.float32)
    bk, bn = lo.shape
    ng = bk // group_size
    # expand (ng, bn) group scales to (bk, bn) rows (f32: bit-matches the
    # XLA reference dequant). The hi plane carries a 16x factor from the
    # AND extraction — folded into the broadcast scale (shi/16), zero
    # extra per-element cost.
    slo = jnp.broadcast_to(slo_ref[:][:, None, :],
                           (ng, group_size, bn)).reshape(bk, bn)
    shi = jnp.broadcast_to((shi_ref[:] * 0.0625)[:, None, :],
                           (ng, group_size, bn)).reshape(bk, bn)
    lo_d = (lo * slo).astype(xlo_ref.dtype)
    hi_d = (hi16f * shi).astype(xlo_ref.dtype)
    acc_ref[:] += jnp.dot(xlo_ref[:], lo_d, preferred_element_type=jnp.float32)
    acc_ref[:] += jnp.dot(xhi_ref[:], hi_d, preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _w4g_acc_kernel(xlo_ref, xhi_ref, w_ref, slo_ref, shi_ref, out_ref,
                    acc_ref, *, nk, group_size):
    """Grouped-INT4 decode variant: group scales applied to the (M, N)
    accumulator after per-group dots instead of to the (K, N) weight tile.
    At small M the scale work drops from O(K*N) to O(M*N*groups); the
    AND-only biased extraction leaves two int8 ANDs + converts as the only
    per-weight VPU cost, with a per-group rank-1 rowsum correction for the
    lo bias and the 16x of the hi plane folded into its scale."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lo_b, hi16 = _and_nibbles(w_ref[:])
    lo_f = lo_b.astype(xlo_ref.dtype)
    hi_f = hi16.astype(xlo_ref.dtype)
    bk, bn = lo_f.shape
    ng = bk // group_size
    acc = acc_ref[:]
    for g in range(ng):
        sl = slice(g * group_size, (g + 1) * group_size)
        xg = xlo_ref[:, sl]
        dlo = jnp.dot(xg, lo_f[sl], preferred_element_type=jnp.float32)
        rsg = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        dhi = jnp.dot(xhi_ref[:, sl], hi_f[sl],
                      preferred_element_type=jnp.float32)
        acc = (acc + (dlo - 8.0 * rsg) * slo_ref[g:g + 1, :]
               + dhi * (shi_ref[g:g + 1, :] * 0.0625))
    acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "block_m",
                                             "block_n", "block_k", "out_dtype",
                                             "acc_scales"))
def matmul_w4_grouped(x, w_packed, scales, *, group_size=128, block_m=1024,
                      block_n=1024, block_k=2048, out_dtype=None,
                      acc_scales=None):
    """Group-wise INT4 fused dequant-matmul (split-half packing).

    scales (K/group_size, N); the dequant (scale applied per K-group before
    the dot) happens in VMEM. block_k is in packed rows and must be a
    multiple of group_size.

    ``acc_scales``: apply group scales on the accumulator (per-group dots)
    instead of on the weight tile — the decode-shape fast path. Defaults to
    on for M <= 64."""
    out_dtype = out_dtype or x.dtype
    M, K = x.shape
    N = w_packed.shape[1]
    K2 = w_packed.shape[0]
    g_per_half = K2 // group_size
    if acc_scales is None:
        acc_scales = M <= 64
    block_m = min(block_m, max(8, M))
    block_k = min(block_k, K2)
    block_n = min(block_n, -(-N // 128) * 128)
    if acc_scales and block_k // group_size < 8:
        # the acc-path scale blocks are (block_k/group_size, block_n);
        # Mosaic needs >= 8 sublanes — fall back to weight-tile scales.
        # Checked AFTER the block_k = min(block_k, K2) clamp: a decode
        # shape with K2 < 8*group_size must not pass the guard on the
        # unclamped default block_k (it would fail Mosaic legality on
        # real TPU only).
        acc_scales = False
    assert block_k % group_size == 0

    x, m0 = _pad_to(x, block_m, 0)
    x_lo = x[:, :K2]
    x_hi = x[:, K2:]
    s_lo = scales[:g_per_half]
    s_hi = scales[g_per_half:]
    # pad the packed-K and N dims like every other kernel here (padded
    # weight rows are zero, so scale padding value is irrelevant)
    x_lo, _ = _pad_to(x_lo, block_k, 1)
    x_hi, _ = _pad_to(x_hi, block_k, 1)
    w_packed, _ = _pad_to(w_packed, block_k, 0)
    w_packed, _ = _pad_to(w_packed, block_n, 1)
    gb = block_k // group_size
    s_lo, _ = _pad_to(s_lo, gb, 0)
    s_lo, _ = _pad_to(s_lo, block_n, 1)
    s_hi, _ = _pad_to(s_hi, gb, 0)
    s_hi, _ = _pad_to(s_hi, block_n, 1)
    Mp = x_lo.shape[0]
    Kp2 = x_lo.shape[1]
    Np = w_packed.shape[1]
    nk = Kp2 // block_k

    kern = _w4g_acc_kernel if acc_scales else _w4g_kernel
    out = pl.pallas_call(
        functools.partial(kern, nk=nk, group_size=group_size),
        grid=(Mp // block_m, Np // block_n, nk),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, block_n), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, block_n), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * K, bytes_accessed=Mp * K * 2 + K * N // 2 + Mp * N * 2,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x_lo, x_hi, w_packed, s_lo, s_hi)
    return out[:m0, :N]


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "out_dtype"))
def matmul_w4(x, w_packed, w_scale, *, block_m=1024, block_n=1024,
              block_k=1024, out_dtype=None):
    """Weight-only INT4 (split-half biased packing): the two K-halves of x
    feed two MXU dots against the AND-extracted nibble planes — no
    in-kernel interleave, no shifts. ``block_k`` is in packed rows (covers
    2*block_k of K). Decode blocks tuned on v5e at M=16, K=N=4096:
    1024x1024 = 631 GB/s effective weight bandwidth (~77% of HBM peak,
    3.46x the bf16 matmul)."""
    out_dtype = out_dtype or x.dtype
    M, K = x.shape
    N = w_packed.shape[1]
    K2 = w_packed.shape[0]
    block_m = min(block_m, max(8, M))
    block_k = min(block_k, -(-K2 // 256) * 256)
    block_n = min(block_n, -(-N // 128) * 128)

    x, m0 = _pad_to(x, block_m, 0)
    x_lo = x[:, :K2]
    # fold the 16x of the AND-extracted hi plane into a prescaled x_hi
    x_hi = (x[:, K2:].astype(jnp.float32) / 16.0).astype(x.dtype)
    x_lo, _ = _pad_to(x_lo, block_k, 1)
    x_hi, _ = _pad_to(x_hi, block_k, 1)
    w_packed, _ = _pad_to(w_packed, block_k, 0)
    w_packed, _ = _pad_to(w_packed, block_n, 1)
    sw = jnp.reshape(w_scale, (1, N)).astype(jnp.float32)
    sw, _ = _pad_to(sw, block_n, 1)
    Mp = x_lo.shape[0]
    Kp2 = x_lo.shape[1]
    Np = w_packed.shape[1]
    nk = Kp2 // block_k

    out = pl.pallas_call(
        functools.partial(_w4_kernel, nk=nk),
        grid=(Mp // block_m, Np // block_n, nk),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32),
                        pltpu.VMEM((block_m, 1), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp2 * 2,
            bytes_accessed=Mp * Kp2 * 2 * x.dtype.itemsize + Kp2 * Np + Mp * Np * 2,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x_lo, x_hi, w_packed, sw)
    return out[:m0, :N]
