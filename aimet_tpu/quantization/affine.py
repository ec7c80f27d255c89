"""Affine quantization grid math — the numerical core of the framework.

Pure-functional, fully-vectorized JAX re-expression of the reference's C++ grid
math.  Per-tensor, per-channel and per-block quantization all flow through the
same broadcasting convention: ``scale``/``offset`` arrays must be broadcastable
against the tensor being quantized (e.g. scalar ``()`` for per-tensor,
``(C, 1, 1)`` for per-channel, ``(B, 1)`` for per-block on a reshaped view).

Reference semantics reproduced here (for parity validation):
  - ``getComputedEncodings`` — DlQuantization/src/quantization_utils.cpp:58-140
    (symmetric/asymmetric grids, exact-zero snap, strict/unsigned symmetric)
  - ``computeDelta/computeOffset`` — DlQuantization/src/trim_functions.cpp:61-71
  - ``quantizeValueCpu``/``dequantizeValueCpu`` —
    DlQuantization/src/trim_functions.cpp:141-180 (clamp -> /delta - offset ->
    round nearest/stochastic; dequant = (q + offset) * delta)

The integer grid convention follows the reference: quantized values live in
``[0, num_steps]`` with a non-positive integer ``offset`` (zero-point is
``-offset``), so ``dequant(0) == min`` and ``dequant(num_steps) == max``.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

FLOAT32_MAX = float(jnp.finfo(jnp.float32).max)
FLOAT32_LOWEST = float(-jnp.finfo(jnp.float32).max)


def num_quant_steps(bitwidth: int, *, strict_symmetric: bool = False) -> int:
    """Number of integer steps on the grid: 2^bw - 1 (one fewer when strict)."""
    steps = 2 ** bitwidth - 1
    if strict_symmetric:
        steps -= 1
    return steps


@struct.dataclass
class AffineEncoding:
    """Affine encoding record {min, max, delta, offset} (+ static metadata).

    JAX pytree equivalent of the reference's ``TfEncoding``
    (DlQuantization/include/DlQuantization/Quantization.hpp:113).  All array
    fields share one shape (scalar for per-tensor, ``(C,)``-like for
    per-channel / per-block); static fields are pytree aux data so encodings
    can flow through ``jit``/``vmap``/``scan`` freely.
    """

    min: jax.Array
    max: jax.Array
    delta: jax.Array
    offset: jax.Array  # integer-valued but stored as float (reference parity)
    bitwidth: int = struct.field(pytree_node=False, default=8)
    symmetric: bool = struct.field(pytree_node=False, default=False)
    strict_symmetric: bool = struct.field(pytree_node=False, default=False)
    unsigned_symmetric: bool = struct.field(pytree_node=False, default=False)

    @property
    def num_steps(self) -> int:
        return num_quant_steps(self.bitwidth, strict_symmetric=self.symmetric and self.strict_symmetric)

    @property
    def shape(self):
        return jnp.shape(self.min)

    def reshape(self, shape) -> "AffineEncoding":
        return AffineEncoding(
            min=jnp.reshape(self.min, shape),
            max=jnp.reshape(self.max, shape),
            delta=jnp.reshape(self.delta, shape),
            offset=jnp.reshape(self.offset, shape),
            bitwidth=self.bitwidth,
            symmetric=self.symmetric,
            strict_symmetric=self.strict_symmetric,
            unsigned_symmetric=self.unsigned_symmetric,
        )

    def broadcast_to(self, tensor_shape, channel_axis: Optional[int]) -> "AffineEncoding":
        """View per-channel encodings as shape (1,..,C,..,1) for broadcasting."""
        if channel_axis is None:
            return self
        shape = tuple(
            d if ax == channel_axis else 1 for ax, d in enumerate(tensor_shape)
        )
        return self.reshape(shape)


def compute_encoding_from_min_max(
    min_val: jax.Array,
    max_val: jax.Array,
    bitwidth: int,
    symmetric: bool,
    strict_symmetric: bool = False,
    unsigned_symmetric: bool = False,
) -> AffineEncoding:
    """Vectorized port of ``getComputedEncodings`` (quantization_utils.cpp:58-140).

    ``min_val``/``max_val`` may be any (broadcast-compatible) shape; the
    data-dependent C++ branches become ``jnp.where`` selects so the whole thing
    is jittable and vmappable for per-channel grids.
    """
    min_val = jnp.asarray(min_val, jnp.float32)
    max_val = jnp.asarray(max_val, jnp.float32)
    num_steps = num_quant_steps(bitwidth, strict_symmetric=symmetric and strict_symmetric)
    ns = jnp.float32(num_steps)

    # Guard against infinities like the C++ does.
    min_val = jnp.where(jnp.isinf(min_val), FLOAT32_LOWEST, min_val)
    max_val = jnp.where(jnp.isinf(max_val), FLOAT32_MAX, max_val)

    # ---- signed-symmetric grid -------------------------------------------
    amax = jnp.maximum(jnp.abs(max_val), jnp.abs(min_val))
    n_pos = float(math.floor(num_steps / 2))
    sym_delta = amax / n_pos
    sym_offset = jnp.full_like(sym_delta, -float(math.ceil(num_steps / 2)))
    sym_min = jnp.maximum(sym_offset * sym_delta, FLOAT32_LOWEST)
    sym_max = jnp.minimum(sym_delta * n_pos, FLOAT32_MAX)

    # ---- asymmetric / unsigned-symmetric grid ----------------------------
    asym_delta = (max_val - min_val) / ns
    safe_delta = jnp.where(asym_delta == 0, 1.0, asym_delta)
    straddles = (min_val < 0) & (max_val > 0)
    b_zero = jnp.clip(jnp.round(-min_val / safe_delta), 0.0, ns)
    offset_straddle = -b_zero
    offset_edge = jnp.round(min_val / safe_delta)
    asym_offset = jnp.where(straddles, offset_straddle, offset_edge)
    # When the range straddles zero, min/max are snapped onto the integer grid;
    # otherwise the observed min/max are kept verbatim (C++ early-return path).
    snapped_min = jnp.clip(asym_delta * asym_offset, FLOAT32_LOWEST, FLOAT32_MAX)
    snapped_max = jnp.minimum(max_val - min_val + snapped_min, FLOAT32_MAX)
    asym_min = jnp.where(straddles, snapped_min, min_val)
    asym_max = jnp.where(straddles, snapped_max, max_val)

    if symmetric:
        if unsigned_symmetric:
            # Unsigned-symmetric is only legal for all-non-negative ranges;
            # fall back to the signed grid wherever min < 0.
            use_signed = min_val < 0
        else:
            use_signed = jnp.ones_like(min_val, dtype=bool)
        enc_min = jnp.where(use_signed, sym_min, asym_min)
        enc_max = jnp.where(use_signed, sym_max, asym_max)
        enc_delta = jnp.where(use_signed, sym_delta, asym_delta)
        enc_offset = jnp.where(use_signed, sym_offset, asym_offset)
    else:
        enc_min, enc_max = asym_min, asym_max
        enc_delta, enc_offset = asym_delta, asym_offset

    return AffineEncoding(
        min=enc_min,
        max=enc_max,
        delta=enc_delta,
        offset=enc_offset,
        bitwidth=bitwidth,
        symmetric=symmetric,
        strict_symmetric=strict_symmetric,
        unsigned_symmetric=unsigned_symmetric,
    )


def gate_min_max(min_val: jax.Array, max_val: jax.Array, min_range: float = 0.01):
    """Always include zero; enforce ``max >= min + min_range``.

    Port of the gating in TfEncodingAnalyzer::computeEncoding
    (DlQuantization/src/TfEncodingAnalyzer.cpp:90-98, MIN_RANGE = 0.01).
    """
    gated_min = jnp.minimum(0.0, min_val)
    gated_max = jnp.maximum(0.0, max_val)
    gated_max = jnp.maximum(gated_max, gated_min + min_range)
    return gated_min, gated_max


# ---------------------------------------------------------------------------
# Quantize / dequantize primitives
# ---------------------------------------------------------------------------

def quantize(
    x: jax.Array,
    delta: jax.Array,
    offset: jax.Array,
    num_steps: int,
    *,
    stochastic_key: Optional[jax.Array] = None,
) -> jax.Array:
    """Map real values onto the integer grid ``[0, num_steps]``.

    Equivalent to ``quantizeValueCpu`` (trim_functions.cpp:141-166): clamp to
    the representable range, scale, subtract offset, round.  ``offset`` is an
    integer-valued array so ``round(x/d) - offset == round(x/d - offset)``.
    Returns a float array of integer values (callers cast as needed).
    """
    x_scaled = x / delta - offset
    if stochastic_key is not None:
        noise = jax.random.uniform(stochastic_key, jnp.shape(x), dtype=x.dtype)
        x_rounded = jnp.floor(x_scaled + noise)
    else:
        x_rounded = jnp.round(x_scaled)
    return jnp.clip(x_rounded, 0.0, float(num_steps))


def dequantize(q: jax.Array, delta: jax.Array, offset: jax.Array) -> jax.Array:
    """``(q + offset) * delta`` — trim_functions.cpp:168-180."""
    return (q.astype(delta.dtype) + offset) * delta


def quantize_dequantize_encoding(
    x: jax.Array,
    encoding: AffineEncoding,
    *,
    channel_axis: Optional[int] = None,
    stochastic_key: Optional[jax.Array] = None,
) -> jax.Array:
    """Fake-quant through an :class:`AffineEncoding` (no custom gradients)."""
    enc = encoding.broadcast_to(jnp.shape(x), channel_axis) if channel_axis is not None else encoding
    q = quantize(x, enc.delta, enc.offset, encoding.num_steps, stochastic_key=stochastic_key)
    return dequantize(q, enc.delta, enc.offset)


def quantize_to_int(
    x: jax.Array,
    encoding: AffineEncoding,
    *,
    channel_axis: Optional[int] = None,
    signed: bool = True,
    dtype=jnp.int8,
) -> jax.Array:
    """Produce true integer codes for storage/execution.

    ``signed=True`` shifts the ``[0, num_steps]`` grid by ``offset`` so that
    zero-point-free symmetric weights land in ``[-2^(bw-1), 2^(bw-1)-1]``
    (matches quantizeToFxp's ``shiftToSigned`` — trim_functions.cpp:118-135).
    """
    enc = encoding.broadcast_to(jnp.shape(x), channel_axis) if channel_axis is not None else encoding
    q = quantize(x, enc.delta, enc.offset, encoding.num_steps)
    if signed:
        q = q + enc.offset  # now centered: dequant = q * delta
    return q.astype(dtype)


def reduce_min_max(
    x: jax.Array, channel_axis: Optional[int] = None
) -> Tuple[jax.Array, jax.Array]:
    """Min/max over all dims (per-tensor) or all-but-one (per-channel)."""
    if channel_axis is None:
        return jnp.min(x), jnp.max(x)
    dims = tuple(d for d in range(x.ndim) if d != channel_axis)
    return jnp.min(x, axis=dims), jnp.max(x, axis=dims)
