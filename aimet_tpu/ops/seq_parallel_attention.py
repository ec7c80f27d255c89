"""Sequence-parallel decode attention over a length-sharded INT8 KV cache.

The long-context serving design (SURVEY §5 flags this as from-scratch
TPU-native work — the reference has no distributed KV story at all): when a
context outgrows one chip's HBM, the KV cache shards over a mesh axis in the
SEQUENCE dimension. Decode attention then runs as a distributed
flash-decode: each device computes attention partials over its local cache
chunk (running max / exp-sum / weighted values) and the partials combine
exactly with the log-sum-exp trick —

    m  = pmax(m_i)
    l  = psum(l_i * exp(m_i - m))
    o  = psum(o_i * exp(m_i - m)) / l

One pmax + two psums per layer, all on ICI; no device ever materializes the
full-sequence score row, so max context scales linearly with the axis size.
The local chunk math reuses the INT8 KV dequant (ops/kv_cache.py), keeping
HBM traffic at 1 byte/element.

Shapes follow ops/kv_cache.py: q (B, 1, H, D) for decode; local cache
(B, S_local, KH, D) int8 + (B, KH) scales.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .kv_cache import QuantizedKVCache, dequantize_kv

__all__ = ["local_decode_attention_partials", "combine_attention_partials",
           "seq_parallel_decode_attention", "shard_kv_cache_seq"]


def local_decode_attention_partials(q, k_local, v_local, valid_mask):
    """Flash-decode partials over one local KV chunk.

    q (B, H, D) fp; k/v_local (B, S_l, H, D) fp (kv-heads already
    repeated); valid_mask (B, S_l) bool — True where the cache slot holds a
    real token *visible to the query*.

    Returns (m, l, o): running max (B, H), exp-sum (B, H), weighted value
    accumulator (B, H, D).
    """
    D = q.shape[-1]
    scores = jnp.einsum("bhd,bshd->bhs", q.astype(jnp.float32),
                        k_local.astype(jnp.float32)) / np.sqrt(D)
    scores = jnp.where(valid_mask[:, None, :], scores, -jnp.inf)
    m = jnp.max(scores, axis=-1)                        # (B, H)
    # a chunk may hold no visible token: exp(-inf - -inf) guards to 0
    safe_m = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.where(valid_mask[:, None, :],
                  jnp.exp(scores - safe_m[..., None]), 0.0)
    l = jnp.sum(e, axis=-1)                             # (B, H)
    o = jnp.einsum("bhs,bshd->bhd", e, v_local.astype(jnp.float32))
    return safe_m, l, o


def combine_attention_partials(m, l, o, axis: str):
    """Exact log-sum-exp combine of per-chunk partials across ``axis``."""
    m_g = jax.lax.pmax(m, axis)
    corr = jnp.exp(m - m_g)
    l_g = jax.lax.psum(l * corr, axis)
    o_g = jax.lax.psum(o * corr[..., None], axis)
    return o_g / jnp.maximum(l_g, 1e-30)[..., None]


def shard_kv_cache_seq(cache: QuantizedKVCache, mesh: Mesh,
                       axis: str = "sp") -> QuantizedKVCache:
    """Place a QuantizedKVCache with its SEQUENCE dim sharded over ``axis``
    (scales are per (batch, head): replicated)."""
    kv_s = NamedSharding(mesh, P(None, axis, None, None))
    sc_s = NamedSharding(mesh, P(None, None))
    return QuantizedKVCache(
        jax.device_put(cache.k, kv_s), jax.device_put(cache.v, kv_s),
        jax.device_put(cache.k_scale, sc_s),
        jax.device_put(cache.v_scale, sc_s))


def seq_parallel_decode_attention(mesh: Mesh, n_heads: int,
                                  axis: str = "sp"):
    """Build ``fn(q, cache, length) -> out`` computing exact decode
    attention over a sequence-sharded INT8 KV cache.

    q (B, H, D) replicated; cache length-sharded via
    :func:`shard_kv_cache_seq`; ``length`` scalar — number of valid cache
    slots (positions >= length are masked). GQA: kv-heads are repeated up
    to ``n_heads`` locally.
    """
    n_dev = mesh.shape[axis]

    def local(q, k, v, k_scale, v_scale, length):
        idx = jax.lax.axis_index(axis)
        B, S_l, KH, D = k.shape
        cache_l = QuantizedKVCache(k, v, k_scale, v_scale)
        k_f, v_f = dequantize_kv(cache_l, jnp.float32)
        rep = n_heads // KH
        k_f = jnp.repeat(k_f, rep, axis=2)
        v_f = jnp.repeat(v_f, rep, axis=2)
        global_pos = idx * S_l + jnp.arange(S_l)            # (S_l,)
        valid = (global_pos[None, :] < length)              # (B?, S_l)
        valid = jnp.broadcast_to(valid, (B, S_l))
        m, l, o = local_decode_attention_partials(q, k_f, v_f, valid)
        return combine_attention_partials(m, l, o, axis)

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(None, axis, None, None), P(None, axis, None, None),
                  P(), P(), P()),
        out_specs=P(),
        check_vma=False))
