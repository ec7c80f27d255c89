"""Multi-chip (tensor + data parallel) quantized LLM serving.

The BASELINE config-5 scale-out: INT8/INT4 weights and the INT8 KV cache
tensor-sharded over the `tp` mesh axis, requests sharded over `dp`.  Uses
GSPMD (jit + NamedSharding) so XLA inserts the ICI collectives; the layout
is chosen so decode needs exactly one all-reduce per attention block and one
per MLP (megatron layout: qkv/gateup column-parallel, o/down row-parallel,
KV cache sharded over kv-heads).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map, tree_util as jtu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.transformer import TransformerConfig, rope_freqs
from ..ops.kv_cache import QuantizedKVCache, init_quantized_kv_cache
from .quantized_llm import _attention, _mlp, _qmm, _rms_norm, \
    quantized_forward


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


def _tp_block_permutation(sizes_per_part: List[int], tp: int) -> np.ndarray:
    """Column permutation turning a (part0 | part1 | ...) concatenated axis
    into device-contiguous blocks: device i gets (part0_i | part1_i | ...).

    Megatron column-parallel layout: a contiguous tp-split of the permuted
    axis gives every device its own q/k/v (or gate/up) head slice."""
    idx = []
    offs = np.cumsum([0] + sizes_per_part[:-1])
    for i in range(tp):
        for off, size in zip(offs, sizes_per_part):
            loc = size // tp
            idx.extend(range(off + i * loc, off + (i + 1) * loc))
    return np.asarray(idx)


def reorder_weights_for_tp(qw, cfg: TransformerConfig, tp: int):
    """Permute the fused qkv / gate-up projection columns so a contiguous
    tp-shard is megatron-correct (each device owns whole q/k/v head and
    gate/up slices). Scales are per-output-channel and permute alongside."""
    H, KH, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    qkv_perm = _tp_block_permutation([H * D, KH * D, KH * D], tp)
    ff_perm = _tp_block_permutation([cfg.d_ff, cfg.d_ff], tp)

    def permute(pair, perm):
        w, s = pair
        return (w[:, perm], s[perm])

    out = dict(qw)
    out["layers"] = []
    for layer in qw["layers"]:
        new = dict(layer)
        new["wqkv"] = permute(layer["wqkv"], qkv_perm)
        new["w_gateup"] = permute(layer["w_gateup"], ff_perm)
        out["layers"].append(new)
    return out


def make_shard_map_forward(cfg: TransformerConfig, mesh: Mesh, mode: str,
                           prefill: bool):
    """Explicit-SPMD forward step (shard_map): every projection runs the
    fused Pallas dequant-matmul on its LOCAL weight shard, with exactly one
    ``psum`` after attention-out and one after mlp-down per layer (megatron
    layout). Unlike the GSPMD path (``allow_pallas=False`` because
    pallas_call has no SPMD partitioning rule), shard_map scopes the kernel
    to per-device shards, so the INT kernels run tp-sharded, and the
    explicit psums let XLA schedule the collectives asynchronously against
    the next block's matmuls (VERDICT r1 #9).

    Weights must be pre-permuted with :func:`reorder_weights_for_tp`.
    """
    tp = mesh.shape["tp"]
    cfg_l = dataclasses.replace(cfg, n_heads=cfg.n_heads // tp,
                                n_kv_heads=cfg.n_kv_heads // tp,
                                d_ff=cfg.d_ff // tp,
                                head_dim_override=cfg.head_dim)

    def local_fwd(qw, tokens, caches, cache_index):
        B, T = tokens.shape
        x = jnp.take(qw["embed"], tokens, axis=0).astype(cfg.dtype)
        S = caches[0].k.shape[1]
        cache_index = jnp.asarray(cache_index)
        if prefill:
            positions = jnp.arange(T)
            span = jnp.arange(S)[None, :] <= jnp.arange(T)[:, None]
            mask = span[None, None, :, :]
        else:
            positions = cache_index + jnp.arange(T)
            span = jnp.arange(S)[None, :] <= positions[:, None]
            mask = span[None, None, :, :]
        cos, sin = rope_freqs(cfg, positions)
        new_caches = []
        for i in range(cfg.n_layers):
            layer = qw["layers"][i]
            h, cache = _attention(
                cfg_l, layer, _rms_norm(x, layer["attn_norm"], cfg.norm_eps),
                cos, sin, mask, caches[i], cache_index, mode, prefill=prefill)
            x = x + jax.lax.psum(h, "tp")        # row-parallel wo reduce
            m = _mlp(cfg_l, layer,
                     _rms_norm(x, layer["mlp_norm"], cfg.norm_eps), mode)
            x = x + jax.lax.psum(m, "tp")        # row-parallel w_down reduce
            new_caches.append(cache)
        x = _rms_norm(x, qw["final_norm"], cfg.norm_eps)
        logits = _qmm(x.reshape(B * T, -1), *qw["lm_head"], mode=mode)
        logits = jax.lax.all_gather(logits, "tp", axis=1, tiled=True)
        logits = logits[:, :cfg.vocab_size]   # vocab-padding columns
        return logits.reshape(B, T, -1).astype(jnp.float32), new_caches

    col = (P(None, "tp"), P("tp"))
    row = (P("tp", None), P())
    layer_specs = {"attn_norm": P(), "mlp_norm": P(),
                   "wqkv": col, "wo": row, "w_gateup": col, "w_down": row}
    qw_specs = {"embed": P(), "final_norm": P(), "lm_head": col,
                "layers": [dict(layer_specs) for _ in range(cfg.n_layers)]}
    cache_spec = QuantizedKVCache(
        k=P("dp", None, "tp", None), v=P("dp", None, "tp", None),
        k_scale=P("dp", "tp"), v_scale=P("dp", "tp"))
    caches_spec = [cache_spec for _ in range(cfg.n_layers)]

    # check_vma=False: the varying-axis checker can't yet infer that a
    # tiled all_gather over 'tp' yields tp-replicated logits
    return jax.jit(shard_map(
        local_fwd, mesh=mesh,
        in_specs=(qw_specs, P("dp", None), caches_spec, P()),
        out_specs=(P("dp", None, None), caches_spec),
        check_vma=False))


class ShardedQuantizedLLM:
    """Tensor/data-parallel serving engine (single-controller GSPMD)."""

    def __init__(self, qw, cfg: TransformerConfig, mesh: Mesh,
                 mode: str = "w8", max_len: int = 256,
                 use_shard_map: bool = True):
        self.cfg = cfg
        self.mesh = mesh
        self.mode = mode
        self.max_len = max_len
        tp = mesh.shape["tp"]
        self._explicit_tp = bool(
            use_shard_map and mode in ("w8", "w4")
            and cfg.n_heads % tp == 0 and cfg.n_kv_heads % tp == 0
            and cfg.d_ff % tp == 0 and cfg.vocab_size % tp == 0
            and (cfg.head_dim * cfg.n_heads) % tp == 0)
        if self._explicit_tp:
            # explicit-SPMD (shard_map) prefill AND decode on megatron-
            # permuted weights: local Pallas INT matmuls + one psum per
            # attention/mlp block
            qw = reorder_weights_for_tp(qw, cfg, tp)
            self.qw = shard_quantized_weights(qw, cfg, mesh)
            self._prefill_sm = make_shard_map_forward(cfg, mesh, mode,
                                                      prefill=True)
            self._decode_sm = make_shard_map_forward(cfg, mesh, mode,
                                                     prefill=False)
        else:
            # GSPMD fallback (pallas kernels have no SPMD partitioning
            # rule, so force the XLA int paths)
            self.qw = shard_quantized_weights(qw, cfg, mesh)
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
        if self._explicit_tp:
            logits, caches = self._prefill_sm(self.qw, tokens, caches,
                                              jnp.int32(0))
        else:
            logits, caches = self._prefill(self.qw, self.cfg, tokens,
                                           caches, 0)
        nxt = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)
        out = [tokens, nxt]
        pos = T
        for _ in range(num_steps - 1):
            if self._explicit_tp:
                logits, caches = self._decode_sm(self.qw, nxt, caches,
                                                 jnp.int32(pos))
            else:
                logits, caches = self._decode(self.qw, self.cfg, nxt, caches,
                                              jnp.int32(pos))
            nxt = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)
            out.append(nxt)
            pos += 1
        return jnp.concatenate(out, axis=1)
