"""Fake-quant primitives with custom gradients (STE + range learning).

TPU-native re-expression of the reference's autograd functions:
  - STE w.r.t. the input tensor: ``compute_dloss_by_dx``
    (aimet_torch/v1/quantsim_straight_through_grad.py:91-118) — gradient
    passes through inside the representable range, is zero outside.
  - Analytic range-learning gradients w.r.t. encoding min/max:
    ``asymmetric_gradients`` / ``symmetric_gradients``
    (quantsim_straight_through_grad.py:252-348), forward
    ``calculate_forward_pass`` (:191-249).

Encodings here are parameterized by ``(encoding_min, encoding_max)`` arrays
that must be *broadcast-compatible* with the input tensor (scalar for
per-tensor, ``(C,1,1)``-style for per-channel, ``(B,1)`` for per-block on a
reshaped view).  Gradients for the encoding parameters are reduced back to
the parameter shape, which generalizes the reference's channel-axis special
cases to arbitrary granularity.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from .affine import num_quant_steps


def _reduce_to_shape(x: jax.Array, shape) -> jax.Array:
    """Sum ``x`` over the dims where ``shape`` is 1/missing (un-broadcast)."""
    if jnp.shape(x) == tuple(shape):
        return x
    ndim_diff = x.ndim - len(shape)
    lead = tuple(range(ndim_diff))
    x = jnp.sum(x, axis=lead) if lead else x
    axes = tuple(i for i, s in enumerate(shape) if s == 1 and x.shape[i] != 1)
    if axes:
        x = jnp.sum(x, axis=axes, keepdims=True)
    return x


def _grid_params(enc_min, enc_max, bitwidth, symmetric, strict_symmetric, unsigned_symmetric):
    """delta/offset from learnable min/max — ``get_computed_encodings``
    (quantsim_straight_through_grad.py:120-160)."""
    num_steps = num_quant_steps(bitwidth, strict_symmetric=symmetric and strict_symmetric)
    ns = float(num_steps)
    if symmetric and not unsigned_symmetric:
        delta = enc_max / float(math.floor(ns / 2))
        offset = jnp.full_like(delta, -float(math.ceil(ns / 2)))
    else:
        delta = (enc_max - enc_min) / ns
        if symmetric:  # unsigned symmetric
            offset = enc_min / delta
        else:
            b_zero = jnp.clip(jnp.round(-enc_min / delta), 0.0, ns)
            offset = -b_zero
    return delta, offset, num_steps


@functools.lru_cache(maxsize=None)
def _make_qdq(bitwidth: int, symmetric: bool, strict_symmetric: bool,
              unsigned_symmetric: bool, learn_range: bool):
    ns_int = num_quant_steps(bitwidth, strict_symmetric=symmetric and strict_symmetric)
    ns = float(ns_int)

    def _forward(x, enc_min, enc_max):
        delta, offset, _ = _grid_params(
            enc_min, enc_max, bitwidth, symmetric, strict_symmetric, unsigned_symmetric)
        x_round = jnp.round(x / delta) - offset
        x_quant = jnp.clip(x_round, 0.0, ns)
        out = (x_quant + offset) * delta
        mask = (x_round >= 0.0) & (x_round <= ns)
        return out, (x_quant, delta, offset, mask)

    @jax.custom_vjp
    def qdq(x, enc_min, enc_max):
        return _forward(x, enc_min, enc_max)[0]

    def qdq_fwd(x, enc_min, enc_max):
        out, (x_quant, delta, offset, mask) = _forward(x, enc_min, enc_max)
        return out, (x, enc_min, enc_max, x_quant, delta, offset, mask)

    def qdq_bwd(res, grad):
        x, enc_min, enc_max, x_quant, delta, offset, mask = res
        dx = grad * mask
        if not learn_range:
            return dx, jnp.zeros_like(enc_min), jnp.zeros_like(enc_max)

        shape = jnp.shape(enc_min)
        if symmetric and not unsigned_symmetric:
            # symmetric_gradients (quantsim_straight_through_grad.py:297-329)
            g = (x_quant + offset) * grad - mask * (x / delta) * grad
            dmax = _reduce_to_shape(g, shape) / float(math.floor(ns / 2))
            dmin = -dmax
        else:
            # asymmetric_gradients (quantsim_straight_through_grad.py:252-295)
            grad_scale = (x_quant + offset - x * mask / delta) * grad
            grad_offset = delta * grad * jnp.logical_not(mask)
            t1 = _reduce_to_shape(grad_scale, shape) / ns
            t2 = ns / (enc_max - enc_min) ** 2 * _reduce_to_shape(grad_offset, shape)
            dmin = -t1 + enc_max * t2
            dmax = t1 - enc_min * t2
        return dx, jnp.reshape(dmin, shape), jnp.reshape(dmax, shape)

    qdq.defvjp(qdq_fwd, qdq_bwd)
    return qdq


def quantize_dequantize(
    x: jax.Array,
    enc_min: jax.Array,
    enc_max: jax.Array,
    *,
    bitwidth: int = 8,
    symmetric: bool = False,
    strict_symmetric: bool = False,
    unsigned_symmetric: bool = False,
    learn_range: bool = False,
) -> jax.Array:
    """Differentiable fake-quant.

    ``learn_range=False``: straight-through estimator on ``x`` only (static
    grid; encoding params receive zero gradient).
    ``learn_range=True``: additionally produces the reference's analytic
    gradients for ``enc_min``/``enc_max`` (range-learning QAT).
    """
    qdq = _make_qdq(bitwidth, bool(symmetric), bool(strict_symmetric),
                    bool(unsigned_symmetric), bool(learn_range))
    return qdq(x, jnp.asarray(enc_min, x.dtype), jnp.asarray(enc_max, x.dtype))


def round_ste(x: jax.Array) -> jax.Array:
    """Round with straight-through gradient (RoundStraightThrough,
    quantsim_straight_through_grad.py:350-362)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)
