"""Blockwise quantization and LPBQ (low-power block quantization).

Ports:
  - blockwise fake-quant: per-block (min, max) along a chosen axis — the v2
    ``block_size`` quantizer semantics (v2 API spec:
    backends.quantize(tensor, scale, offset, qmin, qmax, block_size);
    blockwise_quant_recipes/ emulate this with grouped convs — here it is
    just reshaped broadcasting).
  - LPBQ scale compression: per-block scales re-quantized onto a per-group
    integer grid: per_group_scale = max(scale)/2^bw, int_scale =
    clip(round(scale/pgs), 1, 2^bw) (aimet_onnx/lpbq_utils.py:46-133,
    v2 GroupedBlockQuantizeDequantize).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .affine import AffineEncoding, compute_encoding_from_min_max
from .grads import quantize_dequantize


def _to_blocks(w: jax.Array, block_size: int, axis: int):
    """Reshape axis into (n_blocks, block_size) at (axis, axis+1)."""
    n = w.shape[axis]
    assert n % block_size == 0, f"{n} % {block_size} != 0"
    shape = list(w.shape)
    shape[axis:axis + 1] = [n // block_size, block_size]
    return w.reshape(shape)


def blockwise_min_max(w: jax.Array, block_size: int, axis: int):
    """Per-block (min, max); returned with a keepdims-style block shape."""
    wb = _to_blocks(w, block_size, axis)
    mn = jnp.min(wb, axis=axis + 1, keepdims=True)
    mx = jnp.max(wb, axis=axis + 1, keepdims=True)
    return wb, mn, mx


def blockwise_encoding(w: jax.Array, block_size: int, axis: int,
                       bitwidth: int = 4, symmetric: bool = True
                       ) -> AffineEncoding:
    """Encoding with one (min,max,delta,offset) per block (shape keeps the
    blocked layout for broadcasting)."""
    _, mn, mx = blockwise_min_max(w, block_size, axis)
    return compute_encoding_from_min_max(mn, mx, bitwidth, symmetric)


def blockwise_quantize_dequantize(w: jax.Array, block_size: int, axis: int,
                                  bitwidth: int = 4, symmetric: bool = True,
                                  encoding: Optional[AffineEncoding] = None,
                                  learn_range: bool = False) -> jax.Array:
    wb = _to_blocks(w, block_size, axis)
    enc = encoding if encoding is not None else blockwise_encoding(
        w, block_size, axis, bitwidth, symmetric)
    out = quantize_dequantize(wb, enc.min, enc.max, bitwidth=bitwidth,
                              symmetric=symmetric, learn_range=learn_range)
    return out.reshape(w.shape)


# ---------------------------------------------------------------------------
# LPBQ
# ---------------------------------------------------------------------------

def lpbq_compress_scales(scale: jax.Array, group_size: int, axis: int,
                         scale_bitwidth: int = 4
                         ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Quantize per-block scales onto a per-group integer grid
    (lpbq_utils.py:65-133).

    Returns (dequantized_scales, int_scales, per_group_scale).
    """
    sb = _to_blocks(scale, group_size, axis)
    max_scale = jnp.max(sb, axis=axis + 1, keepdims=True)
    per_group = max_scale / (2 ** scale_bitwidth)
    int_scale = jnp.clip(jnp.round(sb / per_group), 1, 2 ** scale_bitwidth)
    deq = (int_scale * per_group).reshape(scale.shape)
    return deq, int_scale.reshape(scale.shape), per_group


def grouped_block_quantize_dequantize(
    w: jax.Array, block_size: int, axis: int, bitwidth: int = 4,
    scale_bitwidth: int = 4, block_group: int = -1,
) -> Tuple[jax.Array, AffineEncoding]:
    """GroupedBlockQuantizeDequantize (v2 test spec, LPBQ):
    symmetric per-block quant whose block scales are LPBQ-compressed so the
    hardware only needs per-channel grids + integer per-block multipliers.

    ``block_group``: how many blocks share one scale group (-1 = all blocks
    along the axis).
    """
    enc = blockwise_encoding(w, block_size, axis, bitwidth, symmetric=True)
    scale = enc.delta  # blocked shape (..., n_blocks, 1, ...)
    nb = scale.shape[axis]
    group = nb if block_group == -1 else block_group
    deq_scale, _, _ = lpbq_compress_scales(
        scale.squeeze(axis + 1), group, axis, scale_bitwidth)
    new_scale = jnp.expand_dims(deq_scale, axis + 1)
    ns = enc.num_steps
    n_pos = ns // 2
    new_max = new_scale * n_pos
    new_min = enc.offset * new_scale
    enc2 = AffineEncoding(min=new_min, max=new_max, delta=new_scale,
                          offset=enc.offset, bitwidth=bitwidth,
                          symmetric=True)
    wb = _to_blocks(w, block_size, axis)
    out = quantize_dequantize(wb, enc2.min, enc2.max, bitwidth=bitwidth,
                              symmetric=True).reshape(w.shape)
    return out, enc2
