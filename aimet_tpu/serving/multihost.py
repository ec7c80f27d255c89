"""Multi-chip (tensor + data parallel) quantized LLM serving.

The BASELINE config-5 scale-out: INT8/INT4 weights and the INT8 KV cache
tensor-sharded over the `tp` mesh axis, requests sharded over `dp`.  Uses
GSPMD (jit + NamedSharding) so XLA inserts the ICI collectives; the layout
is chosen so decode needs exactly one all-reduce per attention block and one
per MLP (megatron layout: qkv/gateup column-parallel, o/down row-parallel,
KV cache sharded over kv-heads).
"""
from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax import tree_util as jtu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.transformer import TransformerConfig
from ..ops.kv_cache import QuantizedKVCache, init_quantized_kv_cache
from .quantized_llm import quantized_forward


def _layer_shardings(mesh: Mesh):
    return {
        "attn_norm": P(),
        "mlp_norm": P(),
        "wqkv": (P(None, "tp"), P("tp")),
        "wo": (P("tp", None), P()),
        "w_gateup": (P(None, "tp"), P("tp")),
        "w_down": (P("tp", None), P()),
    }


def shard_quantized_weights(qw, cfg: TransformerConfig, mesh: Mesh):
    """NamedSharding placement for a quantize_transformer_weights tree."""
    ls = _layer_shardings(mesh)

    def put(x, spec):
        # fall back to replication when the dim doesn't divide the axis
        parts = []
        for ax, s in enumerate(spec):
            if s is not None and x.shape[ax] % mesh.shape[s] != 0:
                s = None
            parts.append(s)
        return jax.device_put(x, NamedSharding(mesh, P(*parts)))

    out = {"embed": put(qw["embed"], P()),
           "final_norm": put(qw["final_norm"], P()),
           "lm_head": (put(qw["lm_head"][0], P(None, "tp")),
                       put(qw["lm_head"][1], P("tp"))),
           "layers": []}
    for layer in qw["layers"]:
        new = {}
        for k, v in layer.items():
            spec = ls[k]
            if isinstance(v, tuple):
                new[k] = (put(v[0], spec[0]), put(v[1], spec[1]))
            else:
                new[k] = put(v, spec)
        out["layers"].append(new)
    return out


def shard_kv_caches(caches: List[QuantizedKVCache], mesh: Mesh):
    """KV cache sharded: batch over dp, kv-heads over tp (when divisible)."""
    def put(c: QuantizedKVCache):
        kh = c.k.shape[2]
        head_spec = "tp" if kh % mesh.shape["tp"] == 0 else None
        kv_s = NamedSharding(mesh, P("dp", None, head_spec, None))
        sc_s = NamedSharding(mesh, P("dp", head_spec))
        return QuantizedKVCache(
            jax.device_put(c.k, kv_s), jax.device_put(c.v, kv_s),
            jax.device_put(c.k_scale, sc_s), jax.device_put(c.v_scale, sc_s))

    return [put(c) for c in caches]


class ShardedQuantizedLLM:
    """Tensor/data-parallel serving engine (single-controller GSPMD)."""

    def __init__(self, qw, cfg: TransformerConfig, mesh: Mesh,
                 mode: str = "w8", max_len: int = 256):
        self.cfg = cfg
        self.mesh = mesh
        self.mode = mode
        self.max_len = max_len
        self.qw = shard_quantized_weights(qw, cfg, mesh)
        # pallas kernels have no SPMD partitioning rule: force XLA paths so
        # GSPMD keeps the tp-sharded weights sharded
        self._prefill = jax.jit(partial(quantized_forward, prefill=True,
                                        mode=mode, allow_pallas=False),
                                static_argnames=("cfg",))
        self._decode = jax.jit(partial(quantized_forward, prefill=False,
                                       mode=mode, allow_pallas=False),
                               static_argnames=("cfg",))

    def new_caches(self, batch: int):
        caches = [init_quantized_kv_cache(batch, self.max_len,
                                          self.cfg.n_kv_heads,
                                          self.cfg.head_dim)
                  for _ in range(self.cfg.n_layers)]
        return shard_kv_caches(caches, self.mesh)

    def generate(self, tokens, num_steps: int):
        B, T = tokens.shape
        tokens = jax.device_put(tokens, NamedSharding(self.mesh, P("dp", None)))
        caches = self.new_caches(B)
        logits, caches = self._prefill(self.qw, self.cfg, tokens, caches, 0)
        nxt = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)
        out = [tokens, nxt]
        pos = T
        for _ in range(num_steps - 1):
            logits, caches = self._decode(self.qw, self.cfg, nxt, caches,
                                          jnp.int32(pos))
            nxt = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)
            out.append(nxt)
            pos += 1
        return jnp.concatenate(out, axis=1)
