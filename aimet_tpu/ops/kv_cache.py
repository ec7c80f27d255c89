"""INT8 KV cache — quantized storage with fused dequant on read.

No reference counterpart (the reference only simulates quantization); this
is the TPU-native serving design from BASELINE config 5: the KV cache is
stored as int8 with per-head scales, halving (vs bf16) HBM footprint and
read bandwidth during decode — the decode-latency bottleneck.

Scales are fixed at prefill (per head, symmetric absmax); decode writes clip
into the established grid.  Dequantization happens on read and fuses into
the attention matmuls under XLA.
"""
from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class QuantizedKVCache(NamedTuple):
    k: jax.Array        # (B, S, KH, D) int8
    v: jax.Array        # (B, S, KH, D) int8
    k_scale: jax.Array  # (B, KH) float32
    v_scale: jax.Array  # (B, KH) float32


def init_quantized_kv_cache(batch: int, max_len: int, n_kv_heads: int,
                            head_dim: int) -> QuantizedKVCache:
    return QuantizedKVCache(
        k=jnp.zeros((batch, max_len, n_kv_heads, head_dim), jnp.int8),
        v=jnp.zeros((batch, max_len, n_kv_heads, head_dim), jnp.int8),
        k_scale=jnp.ones((batch, n_kv_heads), jnp.float32),
        v_scale=jnp.ones((batch, n_kv_heads), jnp.float32),
    )


def _quant(x, scale):
    # x (B, T, KH, D), scale (B, KH). Multiply by the IEEE reciprocal
    # rather than divide: the fused decode-attention kernel quantizes
    # in-kernel with the same precomputed reciprocal (Mosaic lowers f32
    # division to an approximate reciprocal, which shifted round() by
    # 1-2 int levels at bin boundaries vs XLA's exact divide) — with a
    # shared reciprocal both paths produce bit-identical cache rows.
    r = (1.0 / scale.astype(jnp.float32))[:, None, :, None]
    return jnp.clip(jnp.round(x.astype(jnp.float32) * r),
                    -127, 127).astype(jnp.int8)


def prefill_kv(cache: QuantizedKVCache, k: jax.Array, v: jax.Array,
               start: int = 0, lengths=None) -> QuantizedKVCache:
    """Write the prefill K/V and fix per-head scales from their absmax.

    ``lengths`` (B,) restricts the absmax to each row's first ``lengths``
    positions — required when prompts are right-padded to a common length
    (batched admission waves): without it a request's KV scale would
    depend on its wave-mates' padding garbage, making generation
    schedule-dependent."""
    eps = 1e-8
    ka, va = jnp.abs(k), jnp.abs(v)
    if lengths is not None:
        valid = (jnp.arange(k.shape[1])[None, :]
                 < jnp.asarray(lengths)[:, None])[:, :, None, None]
        ka = jnp.where(valid, ka, 0.0)
        va = jnp.where(valid, va, 0.0)
    # scales are f32 by contract (bf16 k/v would otherwise leak bf16
    # scales into the cache — the fused attention kernel requires f32,
    # and reciprocal precision matters for the quantize grid)
    k_scale = jnp.maximum(jnp.max(ka, axis=(1, 3)).astype(jnp.float32),
                          eps) / 127.0
    v_scale = jnp.maximum(jnp.max(va, axis=(1, 3)).astype(jnp.float32),
                          eps) / 127.0
    kq = _quant(k, k_scale)
    vq = _quant(v, v_scale)
    new_k = jax.lax.dynamic_update_slice(cache.k, kq, (0, start, 0, 0))
    new_v = jax.lax.dynamic_update_slice(cache.v, vq, (0, start, 0, 0))
    return QuantizedKVCache(new_k, new_v, k_scale, v_scale)


def append_kv(cache: QuantizedKVCache, k: jax.Array, v: jax.Array,
              index) -> QuantizedKVCache:
    """Decode-step write using the established scales.

    ``index``: scalar (same position for every row) or a (B,) vector of
    per-slot positions (continuous batching)."""
    kq = _quant(k, cache.k_scale)
    vq = _quant(v, cache.v_scale)
    index = jnp.asarray(index)
    if index.ndim == 0:
        new_k = jax.lax.dynamic_update_slice(cache.k, kq, (0, index, 0, 0))
        new_v = jax.lax.dynamic_update_slice(cache.v, vq, (0, index, 0, 0))
    else:
        b = jnp.arange(cache.k.shape[0])
        t = k.shape[1]
        idx = index[:, None] + jnp.arange(t)[None, :]
        new_k = cache.k.at[b[:, None], idx].set(kq)
        new_v = cache.v.at[b[:, None], idx].set(vq)
    return QuantizedKVCache(new_k, new_v, cache.k_scale, cache.v_scale)


def flatten_kv_caches(caches: List[QuantizedKVCache]
                      ) -> List[QuantizedKVCache]:
    """(B, S, KH, D) -> (B, S, KH*D) views for the decode loop carry.

    The fused decode-attention kernel's cache operands are (B, S, KH*D)
    (ops/decode_attention_fused.py) and alias input->output; when the
    scan carry holds the SAME layout the append happens in place, but a
    4D carry forced a bitcast reshape between carry and kernel operand,
    which made XLA copy both caches every layer (probed: ~20 us/layer
    at Llama-8B batch 16). Call this once after prefill, before the
    decode loop."""
    return [QuantizedKVCache(
        c.k.reshape(c.k.shape[0], c.k.shape[1], -1),
        c.v.reshape(c.v.shape[0], c.v.shape[1], -1),
        c.k_scale, c.v_scale) for c in caches]


def dequantize_kv(cache: QuantizedKVCache, dtype=jnp.float32
                  ) -> Tuple[jax.Array, jax.Array]:
    k = cache.k.astype(dtype) * cache.k_scale[:, None, :, None].astype(dtype)
    v = cache.v.astype(dtype) * cache.v_scale[:, None, :, None].astype(dtype)
    return k, v
