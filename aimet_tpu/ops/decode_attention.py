"""Fused GQA decode attention over the INT8 KV cache (single Pallas call).

Motivation (scripts/probe_llama8b_glue.py): the Llama-8B decode step
carries ~61 us/layer of glue, largely XLA fusion/kernel launches around
the attention block (scores einsum, mask, softmax, context einsum, scale
folds = ~6 launches). This kernel collapses them into one launch per
layer: scores + causal mask + softmax + context directly on the int8
K/V cache, one grid program per batch row.

Scale handling keeps the kernel scalar-free (SMEM scalars cost ~15%,
CLAUDE.md): the per-(batch, kv-head) k_scale/sqrt(D) factor is folded
into q OUTSIDE the kernel (O(B*H*D) elements), and v_scale is applied to
the output outside (O(B*H*D)); only the position scalar rides SMEM for
the causal mask.

No reference counterpart (the reference has no serving runtime at all);
the math matches serving/quantized_llm._attention's decode branch
bit-for-bit up to f32 association order.

NEGATIVE RESULT (round 4, on-chip): at the 8B decode shape
(B=16, S=84, KH=8, rep=4, D=128) this kernel measures ~30 us vs ~5.5 us
for the XLA einsum path it replaces (parity exact, rel err 0.0). The 16
grid programs each do 8 sequential tiny dots over strided (S, kh, D)
slices — too little work per program to pipeline, and the launch cost
equals what it saves. The serving path therefore KEEPS the XLA einsums;
the per-layer glue (probe_llama8b_glue.py: ~61 us) must be attacked at
coarser granularity (a whole-layer megakernel or a runtime with cheaper
launches), not by fusing attention alone. Kept as a documented probe
with its parity test (tests/test_decode_attention.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(pos_ref, q_ref, k_ref, v_ref, out_ref, *, kh_count, rep):
    pos = pos_ref[0]
    q = q_ref[0]                     # (KH, rep, D) bf16, k-scale prefolded
    S = k_ref.shape[1]
    s_ids = jax.lax.broadcasted_iota(jnp.int32, (rep, S), 1)
    mask = s_ids <= pos
    for kh in range(kh_count):
        kk = k_ref[0, :, kh, :]      # (S, D) int8
        vv = v_ref[0, :, kh, :]      # (S, D) int8
        qk = q[kh]                   # (rep, D)
        scores = jax.lax.dot_general(
            qk, kk.astype(qk.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (rep, S)
        scores = jnp.where(mask, scores, -1e30)
        m = jnp.max(scores, axis=1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = e / jnp.sum(e, axis=1, keepdims=True)
        ctx = jnp.dot(probs.astype(qk.dtype), vv.astype(qk.dtype),
                      preferred_element_type=jnp.float32)  # (rep, D)
        out_ref[0, kh] = ctx


@functools.partial(jax.jit, static_argnames=())
def fused_gqa_decode_attention(q, kc, vc, k_scale, v_scale, pos):
    """q (B, KH, rep, D) float/bf16; kc/vc (B, S, KH, D) int8 caches;
    k_scale/v_scale (B, KH) f32; pos scalar int32 (attend to s <= pos).
    Returns (B, KH, rep, D) f32 context (v-scale applied)."""
    B, KH, rep, D = q.shape
    S = kc.shape[1]
    qs = q * (k_scale[:, :, None, None] / np.sqrt(D)).astype(q.dtype)
    pos_arr = jnp.reshape(jnp.asarray(pos, jnp.int32), (1,))

    out = pl.pallas_call(
        functools.partial(_kernel, kh_count=KH, rep=rep),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, KH, rep, D), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, KH, D), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, KH, D), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, KH, rep, D), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, KH, rep, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(pos_arr, qs, kc, vc)
    return out * v_scale[:, :, None, None]


def fused_gqa_decode_attention_xla(q, kc, vc, k_scale, v_scale, pos):
    """XLA reference (the serving decode-attention math)."""
    B, KH, rep, D = q.shape
    S = kc.shape[1]
    qs = q * (k_scale[:, :, None, None] / np.sqrt(D)).astype(q.dtype)
    scores = jnp.einsum("bkrd,bskd->bkrs", qs, kc.astype(q.dtype),
                        preferred_element_type=jnp.float32)
    mask = jnp.arange(S)[None, None, None, :] <= pos
    scores = jnp.where(mask, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bkrs,bskd->bkrd", probs, vc.astype(q.dtype),
                     preferred_element_type=jnp.float32)
    return out * v_scale[:, :, None, None]
