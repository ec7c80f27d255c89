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
    # x (B, T, KH, D), scale (B, KH)
    s = scale[:, None, :, None]
    return jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)


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
    k_scale = jnp.maximum(jnp.max(ka, axis=(1, 3)), eps) / 127.0
    v_scale = jnp.maximum(jnp.max(va, axis=(1, 3)), eps) / 127.0
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


def dequantize_kv(cache: QuantizedKVCache, dtype=jnp.float32
                  ) -> Tuple[jax.Array, jax.Array]:
    k = cache.k.astype(dtype) * cache.k_scale[:, None, :, None].astype(dtype)
    v = cache.v.astype(dtype) * cache.v_scale[:, None, :, None].astype(dtype)
    return k, v
