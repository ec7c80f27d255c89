"""Llama-style decoder-only transformer (flax linen) — the flagship model
for INT4/INT8 weight-quantized serving (BASELINE config 5: Llama INT4
weight-only + INT8 KV-cache, sharded multi-host).

Design notes (TPU-first):
  - RoPE, RMSNorm, SwiGLU, grouped-query attention; all shapes static.
  - Decode path (`decode=True` call) uses a functional KV cache carried by
    the caller — no mutable state, so it jits/shards cleanly and the cache
    can be INT8-quantized by the serving layer (ops/kv_cache.py).
  - Weight layouts chosen so tensor-parallel sharding is a pure dim-1/dim-0
    annotation (see parallel/mesh.py: qkv/up kernels shard out-dim, o/down
    kernels shard in-dim).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    vocab_size: int = 32000
    d_model: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 8
    d_ff: int = 14336
    rope_theta: float = 500000.0
    norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16
    # explicit head width (defaults to d_model // n_heads); set when n_heads
    # is rescaled independently of d_model, e.g. per-shard configs under
    # tensor parallelism (serving/multihost.make_shard_map_decode)
    head_dim_override: int = 0

    @property
    def head_dim(self):
        return self.head_dim_override or self.d_model // self.n_heads

    @classmethod
    def tiny(cls, vocab_size=256):
        return cls(vocab_size=vocab_size, d_model=64, n_layers=2, n_heads=4,
                   n_kv_heads=2, d_ff=128, dtype=jnp.float32)

    @classmethod
    def small(cls, vocab_size=32000):
        """~160M params — single-chip benchmarkable."""
        return cls(vocab_size=vocab_size, d_model=768, n_layers=12,
                   n_heads=12, n_kv_heads=4, d_ff=2048)

    @classmethod
    def llama3_8b(cls):
        return cls(vocab_size=128256, d_model=4096, n_layers=32, n_heads=32,
                   n_kv_heads=8, d_ff=14336)


def rope_freqs(cfg: TransformerConfig, positions):
    """(T,) or (B, T) int positions -> cos/sin tables (..., T, head_dim//2)."""
    dim = cfg.head_dim
    inv = 1.0 / (cfg.rope_theta ** (np.arange(0, dim, 2) / dim))
    ang = jnp.asarray(positions)[..., None].astype(jnp.float32) * inv
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x, cos, sin):
    """x: (B, T, H, D); cos/sin (T, D/2) or per-batch (B, T, D/2).

    Half-split ("rotate half") convention — pairs dimension i with i+D/2,
    matching HF/Llama checkpoints (so imported attention weights need no
    column permutation) and the fused decode-attention kernel
    (ops/decode_attention_fused.py), where the rotation is a single
    static lane roll. Equivalent to the interleaved (GPT-J) convention up
    to a fixed permutation of head dims."""
    d2 = x.shape[-1] // 2
    x1 = x[..., :d2]
    x2 = x[..., d2:]
    if cos.ndim == 2:
        cos = cos[None, :, None, :]
        sin = sin[None, :, None, :]
    else:
        cos = cos[:, :, None, :]
        sin = sin[:, :, None, :]
    r1 = x1 * cos - x2 * sin
    r2 = x2 * cos + x1 * sin
    return jnp.concatenate([r1, r2], axis=-1)


class RMSNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        y = x * jax.lax.rsqrt(var + self.eps).astype(x.dtype)
        return y * scale


class Attention(nn.Module):
    cfg: TransformerConfig

    @nn.compact
    def __call__(self, x, cos, sin, mask, kv_cache=None, cache_index=None):
        cfg = self.cfg
        B, T, _ = x.shape
        H, KH, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=False, dtype=cfg.dtype, name=name)

        q = dense(H * D, "wq")(x).reshape(B, T, H, D)
        k = dense(KH * D, "wk")(x).reshape(B, T, KH, D)
        v = dense(KH * D, "wv")(x).reshape(B, T, KH, D)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        new_cache = None
        if kv_cache is not None:
            ck, cv = kv_cache  # (B, S, KH, D)
            ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype),
                                              (0, cache_index, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype),
                                              (0, cache_index, 0, 0))
            k, v = ck, cv
            new_cache = (ck, cv)

        # GQA: repeat kv heads
        rep = H // KH
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)

        q = q.transpose(0, 2, 1, 3)  # (B, H, T, D)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhtd,bhsd->bhts", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / np.sqrt(D)
        if mask is not None:
            scores = jnp.where(mask, scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1).astype(cfg.dtype)
        out = jnp.einsum("bhts,bhsd->bhtd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, H * D)
        out = dense(cfg.d_model, "wo")(out)
        return out, new_cache


class MLP(nn.Module):
    cfg: TransformerConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        gate = nn.Dense(cfg.d_ff, use_bias=False, dtype=cfg.dtype, name="w_gate")(x)
        up = nn.Dense(cfg.d_ff, use_bias=False, dtype=cfg.dtype, name="w_up")(x)
        return nn.Dense(cfg.d_model, use_bias=False, dtype=cfg.dtype,
                        name="w_down")(nn.silu(gate) * up)


class Block(nn.Module):
    cfg: TransformerConfig

    @nn.compact
    def __call__(self, x, cos, sin, mask, kv_cache=None, cache_index=None):
        h, new_cache = Attention(self.cfg, name="attn")(
            RMSNorm(self.cfg.norm_eps, name="attn_norm")(x),
            cos, sin, mask, kv_cache, cache_index)
        x = x + h
        x = x + MLP(self.cfg, name="mlp")(
            RMSNorm(self.cfg.norm_eps, name="mlp_norm")(x))
        return x, new_cache


class Transformer(nn.Module):
    cfg: TransformerConfig

    @nn.compact
    def __call__(self, tokens, kv_caches=None, cache_index=None):
        """tokens: (B, T) int32. Returns (logits, new_kv_caches).

        Prefill: kv_caches=None -> causal mask over T.
        Decode: kv_caches = per-layer (k, v) of shape (B, S, KH, D);
        cache_index = write position (T is typically 1).
        """
        cfg = self.cfg
        B, T = tokens.shape
        x = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=cfg.dtype,
                     name="embed")(tokens)

        if kv_caches is None:
            positions = jnp.arange(T)
            mask = jnp.tril(jnp.ones((T, T), bool))[None, None, :, :]
        else:
            S = kv_caches[0][0].shape[1]
            positions = cache_index + jnp.arange(T)
            # attend to all cache positions <= current
            span = jnp.arange(S)[None, :] <= (cache_index + jnp.arange(T))[:, None]
            mask = span[None, None, :, :]

        cos, sin = rope_freqs(cfg, positions)
        new_caches = []
        for i in range(cfg.n_layers):
            cache = kv_caches[i] if kv_caches is not None else None
            x, nc = Block(cfg, name=f"layer_{i}")(x, cos, sin, mask, cache,
                                                  cache_index)
            new_caches.append(nc)
        x = RMSNorm(cfg.norm_eps, name="final_norm")(x)
        logits = nn.Dense(cfg.vocab_size, use_bias=False,
                          dtype=jnp.float32, name="lm_head")(x)
        if kv_caches is None:
            return logits
        return logits, new_caches


def init_kv_caches(cfg: TransformerConfig, batch: int, max_len: int,
                   dtype=None):
    dtype = dtype or cfg.dtype
    return [(jnp.zeros((batch, max_len, cfg.n_kv_heads, cfg.head_dim), dtype),
             jnp.zeros((batch, max_len, cfg.n_kv_heads, cfg.head_dim), dtype))
            for _ in range(cfg.n_layers)]
