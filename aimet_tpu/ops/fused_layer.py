"""Fused whole-layer decode block: WO-projection + residual + RMSNorm +
gate/up + SiLU + down + residual in ONE Pallas kernel.

VERDICT r4 #1: the Llama-8B decode step spent 1.95 ms/step (of 7.42) in
per-layer glue — 4 Pallas launches + ~12 XLA ops per layer, each paying
launch + DMA-rampup cost in a regime where the useful work is a single
pass over the weights. Per-op fusion at attention granularity was a
parity-exact negative result (ops/decode_attention.py: 30 us vs 5.5 us
XLA — the per-(batch, head) matmuls are too small for the MXU). This
kernel attacks at the other end: everything from the attention output
projection to the end of the MLP is one pallas_call, so half a layer's
weights (WO + W_gate + W_up + W_down = 96 MB at 8B shapes) stream through
one continuously-pipelined grid instead of 3 kernel launches + norm/
residual/silu XLA ops between them.

Structure (grid = (JA + J1 + J2,), dimension_semantics=("arbitrary",)):
  phase A (j <  JA):        y_blk  = resid_blk + (ao @ WO_deq)_blk
  phase B (JA <= j < JA+J1): h_blk = silu(g)*u, g|u = (rmsnorm(y) @ Wg|u)_blk
  phase C (j >= JA+J1):     out_blk = y_blk + (h @ Wd_deq)_blk
Cross-phase intermediates y (M, D) and h (M, F) live in VMEM scratch
(decode M <= 64: ~1 MB). Each weight input uses a CLAMPED block index map
(min/max of the phase-local index), so revisited blocks are never
refetched and every weight byte moves from HBM exactly once; K is unsplit
(whole packed-K rows per block), so no cross-step accumulators exist.

INT4 weights use the split-half biased packing of ops/int_matmul.py
(two int8 ANDs per tile, no shifts — Mosaic legality, CLAUDE.md); the
lo-plane bias folds into a per-row rowsum correction and the hi plane's
16x into a prescaled lo/hi activation split, all computed inline per step
(VPU cost ~100k ops vs 4-8 MB DMA per step).

Reference parity anchor: this executes what the reference's AdaRound W4
serving config only simulates (reference quantsim
TrainingExtensions/torch/src/python/aimet_torch/v1/quantsim.py:218 wraps
modules with fake-quant; here the lowered integer math IS the model).

NOTE (r5): the production decode path now uses ops/decode_layer_sol.py —
the same math with MANUAL double-buffered weight DMA, which (unlike this
grid-pipelined version) can overlap the attention phase with the first
W_o fetches. fused_wo_mlp and fused_decode_layer remain as the
grid-pipelined baseline, the probe-documented negative result for
attention overlap, and the fallback path.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .int_matmul import _and_nibbles, _interpret, _pad_to


def _dot(a, b):
    return jnp.dot(a, b.astype(a.dtype), preferred_element_type=jnp.float32)


def _w4_block(x_lo, x_hi16, rs, w_ref, s_ref):
    """Full-K weight-only INT4 matmul for one N-block: biased-nibble
    extraction + two dots + rank-1 rowsum correction (see _w4_kernel)."""
    lo_b, hi16 = _and_nibbles(w_ref[:])
    acc = _dot(x_lo, lo_b) + _dot(x_hi16, hi16)
    return (acc - 8.0 * rs) * s_ref[:]


def _split_half(x, dtype):
    """x (M, K) -> (x_lo (M, K/2), x_hi/16 (M, K/2), rowsum(x_lo) (M, 1))."""
    k2 = x.shape[1] // 2
    x_lo = x[:, :k2].astype(dtype)
    x_hi = (x[:, k2:].astype(jnp.float32) * 0.0625).astype(dtype)
    rs = jnp.sum(x_lo.astype(jnp.float32), axis=1, keepdims=True)
    return x_lo, x_hi, rs


def _fused_kernel(ao_ref, resid_ref, gamma_ref, wo_ref, so_ref, wg_ref,
                  sg_ref, wu_ref, su_ref, wd_ref, sd_ref, out_ref,
                  y_ref, h_ref, *, ja, j1, j2, ba, bg, bd, eps, j_off=0):
    j = pl.program_id(0) - j_off
    dt = ao_ref.dtype

    @pl.when(j < ja)
    def _phase_a():
        x_lo, x_hi, rs = _split_half(ao_ref[:], dt)
        yb = _w4_block(x_lo, x_hi, rs, wo_ref, so_ref).astype(dt)
        col = j * ba
        y_ref[:, pl.ds(col, ba)] = yb + resid_ref[:, pl.ds(col, ba)]

    @pl.when((j >= ja) & (j < ja + j1))
    def _phase_b():
        jj = j - ja
        yf = y_ref[:].astype(jnp.float32)
        r = jax.lax.rsqrt(jnp.mean(yf * yf, axis=1, keepdims=True) + eps)
        yhat = ((yf * r).astype(dt) * gamma_ref[:]).astype(dt)
        y_lo, y_hi, rs = _split_half(yhat, dt)
        gate = _w4_block(y_lo, y_hi, rs, wg_ref, sg_ref)
        up = _w4_block(y_lo, y_hi, rs, wu_ref, su_ref)
        hb = gate * jax.lax.logistic(gate) * up
        h_ref[:, pl.ds(jj * bg, bg)] = hb.astype(h_ref.dtype)

    @pl.when((j >= ja + j1) & (j < ja + j1 + j2))
    def _phase_c():
        # the upper bound matters: the phase-D variant extends the grid
        # past ja+j1+j2, and an unbounded phase C re-executing there
        # writes through out-of-range dynamic slices (real-chip
        # corruption at bm >= 16, benign-looking in interpret mode)
        jj = j - ja - j1
        h_lo, h_hi, rs = _split_half(h_ref[:], dt)
        ob = _w4_block(h_lo, h_hi, rs, wd_ref, sd_ref).astype(dt)
        # out_ref is ONE constant-index (M, D) block (tiny), so phase C
        # writes slices and phase D can read the whole row back
        out_ref[:, pl.ds(jj * bd, bd)] = ob + y_ref[:, pl.ds(jj * bd, bd)]


def _fused_kernel_qkv(ao_ref, resid_ref, gamma_ref, wo_ref, so_ref, wg_ref,
                      sg_ref, wu_ref, su_ref, wd_ref, sd_ref, agamma_ref,
                      wq_ref, sq_ref, out_ref, qkv_ref, y_ref, h_ref,
                      *, ja, j1, j2, ba, bg, bd, eps, j_off=0):
    """The wo+mlp kernel with PHASE D: the NEXT layer's attention-norm +
    QKV projection computed from the freshly built output while its
    weights stream behind the MLP phases — one pallas call per decode
    layer, zero standalone qkv kernel (VERDICT r4 #1, second cut)."""
    j = pl.program_id(0) - j_off
    dt = ao_ref.dtype

    _fused_kernel(ao_ref, resid_ref, gamma_ref, wo_ref, so_ref, wg_ref,
                  sg_ref, wu_ref, su_ref, wd_ref, sd_ref, out_ref,
                  y_ref, h_ref, ja=ja, j1=j1, j2=j2, ba=ba, bg=bg, bd=bd,
                  eps=eps, j_off=j_off)

    @pl.when(j >= ja + j1 + j2)
    def _phase_d():
        jj = j - ja - j1 - j2
        of = out_ref[:].astype(jnp.float32)
        r = jax.lax.rsqrt(jnp.mean(of * of, axis=1, keepdims=True) + eps)
        ohat = ((of * r).astype(dt) * agamma_ref[:]).astype(dt)
        o_lo, o_hi, rs = _split_half(ohat, dt)
        del jj  # qkv_ref is the phase-local block; index map selects it
        qkv_ref[:] = _w4_block(o_lo, o_hi, rs, wq_ref, sq_ref).astype(dt)


@functools.partial(jax.jit, static_argnames=("eps", "block_a", "block_g",
                                             "block_d", "block_q",
                                             "up_block_offset", "n_f"))
def fused_wo_mlp(attn_out, resid, wo_pair, gate_pair, up_pair, down_pair,
                 mlp_gamma, *, eps: float = 1e-5, block_a: int = 2048,
                 block_g: int = 1024, block_d: int = 512,
                 block_q: int = 0, up_block_offset: int = 0, n_f: int = 0,
                 next_qkv=None):
    """out = y + W_down-proj(silu(g)*u),  y = resid + W_o-proj(attn_out),
    (g, u) = rmsnorm(y, mlp_gamma) @ (W_gate, W_up) — all INT4 weight-only
    (split-half packed, per-channel scales), one pallas_call.

    attn_out (M, A), resid (M, D); wo (A/2, D) packed, gate/up (D/2, F),
    down (F/2, D). Block sizes must divide D (block_a, block_d) and F
    (block_g). Decode-shape M (<= ~64); output dtype = resid dtype.

    ``up_block_offset``: when gate and up live CONCATENATED in one packed
    array (serving's w_gateup layout, (D/2, 2F)), pass the same array as
    both gate_pair and up_pair with ``up_block_offset = F // block_g`` and
    ``n_f = F`` — the up half is then addressed by block-index offset, no
    column-slice copy of the weight is ever materialized in HBM.

    ``next_qkv = ((wqkv_packed, wqkv_scale), attn_gamma)``: adds PHASE D —
    the NEXT layer's rmsnorm + QKV projection computed in the same grid
    (its weight streams right behind W_down), returning
    ``(out, next_qkv_proj)`` instead of ``out``. One pallas call per
    decode layer; the standalone qkv kernel (19.4 us/layer in-context,
    scripts/probe_r5_glue2.py) disappears.
    """
    wo_p, so = wo_pair
    wg_p, sg = gate_pair
    wu_p, su = up_pair
    wd_p, sd = down_pair
    M, A = attn_out.shape
    D = resid.shape[1]
    F = n_f or wg_p.shape[1]
    assert wo_p.shape == (A // 2, D), (wo_p.shape, A, D)
    assert wd_p.shape == (F // 2, D)
    ba = min(block_a, D)
    bg = min(block_g, F)
    bd = min(block_d, D)
    assert D % ba == 0 and F % bg == 0 and D % bd == 0, (D, F, ba, bg, bd)
    ja, j1, j2 = D // ba, F // bg, D // bd
    if up_block_offset:
        assert up_block_offset == j1 and wu_p.shape == (D // 2, 2 * F)
    else:
        assert wu_p.shape == (D // 2, F)

    bm = max(8, -(-M // 8) * 8)
    ao, m0 = _pad_to(attn_out, bm, 0)
    resid, _ = _pad_to(resid, bm, 0)
    dt = resid.dtype
    ao = ao.astype(dt)
    gamma = jnp.reshape(mlp_gamma, (1, D)).astype(dt)
    row = lambda s, n: jnp.reshape(s, (1, n)).astype(jnp.float32)

    const = lambda j: (0, 0)
    spec = lambda shape, idx: pl.BlockSpec(shape, idx,
                                           memory_space=pltpu.VMEM)
    a_idx = lambda j: (0, jnp.minimum(j, ja - 1))
    g_idx = lambda j: (0, jnp.clip(j - ja, 0, j1 - 1))
    u_idx = (g_idx if not up_block_offset
             else (lambda j: (0, up_block_offset
                              + jnp.clip(j - ja, 0, j1 - 1))))
    d_idx = lambda j: (0, jnp.clip(j - ja - j1, 0, j2 - 1))

    in_specs = [
        spec((bm, A), const),            # attn_out
        spec((bm, D), const),            # resid
        spec((1, D), const),             # mlp norm gamma
        spec((A // 2, ba), a_idx),       # wo packed
        spec((1, ba), a_idx),            # wo scale
        spec((D // 2, bg), g_idx),       # w_gate packed
        spec((1, bg), g_idx),
        spec((D // 2, bg), u_idx),       # w_up packed
        spec((1, bg), g_idx),
        spec((F // 2, bd), d_idx),       # w_down packed
        spec((1, bd), d_idx),
    ]
    operands = [ao, resid, gamma, wo_p, row(so, D), wg_p, row(sg, F), wu_p,
                row(su, F), wd_p, row(sd, D)]
    scratch = [pltpu.VMEM((bm, D), dt),     # y
               pltpu.VMEM((bm, F), dt)]     # h
    cost = pl.CostEstimate(
        flops=2 * bm * (A * D + 2 * D * F + F * D),
        bytes_accessed=(A * D + 2 * D * F + F * D) // 2 + 3 * bm * D * 2,
        transcendentals=bm * F)
    cparams = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=100 * 1024 * 1024)

    if next_qkv is None:
        out = pl.pallas_call(
            functools.partial(_fused_kernel, ja=ja, j1=j1, j2=j2, ba=ba,
                              bg=bg, bd=bd, eps=eps),
            grid=(ja + j1 + j2,),
            in_specs=in_specs,
            out_specs=spec((bm, D), const),
            out_shape=jax.ShapeDtypeStruct((bm, D), dt),
            scratch_shapes=scratch,
            cost_estimate=cost,
            compiler_params=cparams,
            interpret=_interpret(),
        )(*operands)
        return out[:m0]

    (wq_p, sq), attn_gamma = next_qkv
    assert wq_p.shape[0] == D // 2, wq_p.shape
    Nq = wq_p.shape[1]
    bq = block_q or min(2048, Nq)
    assert Nq % bq == 0, (Nq, bq)
    jq = Nq // bq
    q_idx = lambda j: (0, jnp.clip(j - ja - j1 - j2, 0, jq - 1))
    in_specs += [
        spec((1, D), const),             # attn norm gamma (next layer)
        spec((D // 2, bq), q_idx),       # wqkv packed (next layer)
        spec((1, bq), q_idx),
    ]
    operands += [jnp.reshape(attn_gamma, (1, D)).astype(dt), wq_p,
                 row(sq, Nq)]
    out, qkv = pl.pallas_call(
        functools.partial(_fused_kernel_qkv, ja=ja, j1=j1, j2=j2, ba=ba,
                          bg=bg, bd=bd, eps=eps),
        grid=(ja + j1 + j2 + jq,),
        in_specs=in_specs,
        out_specs=[spec((bm, D), const), spec((bm, bq), q_idx)],
        out_shape=[jax.ShapeDtypeStruct((bm, D), dt),
                   jax.ShapeDtypeStruct((bm, Nq), dt)],
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * (A * D + 2 * D * F + F * D + D * Nq),
            bytes_accessed=(A * D + 2 * D * F + F * D + D * Nq) // 2
            + 3 * bm * D * 2,
            transcendentals=bm * F),
        compiler_params=cparams,
        interpret=_interpret(),
    )(*operands)
    return out[:m0], qkv[:m0]


# ---------------------------------------------------------------------------
# Whole-layer decode megakernel: ATTENTION + WO + residual + RMSNorm + MLP
# (+ next layer's attn-norm + QKV) in ONE pallas_call (VERDICT r4 #1, final
# cut). Phase 0 runs the fused decode attention (ops/decode_attention_fused.
# attention_body: rope + INT8-KV quantize + in-place window append + GQA
# scores/softmax/context) while the pipeline prefetches phase A's first W_o
# block — the attention compute hides behind the weight streaming, and the
# only per-layer XLA ops left are the scan plumbing itself.
# ---------------------------------------------------------------------------

def _fused_kernel_layer(pos_ref, qkv_ref, resid_ref, gamma_ref, wo_ref,
                        so_ref, wg_ref, sg_ref, wu_ref, su_ref, wd_ref,
                        sd_ref, agamma_ref, wq_ref, sq_ref,
                        cos_ref, sin_ref, ks_ref, vs_ref, iks_ref, ivs_ref,
                        colb_ref, cols_ref, rowb_ref, kc_hbm, vc_hbm,
                        out_ref, qkvn_ref, kc_out, vc_out,
                        y_ref, h_ref, ao_ref, kbuf, vbuf, kwin, vwin, sems,
                        *, ja, j1, j2, ba, bg, bd, eps, b, s, nkv, rep, d):
    from .decode_attention_fused import attention_body
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _phase_attn():
        attention_body(pos_ref[0], qkv_ref, cos_ref, sin_ref, ks_ref,
                       vs_ref, iks_ref, ivs_ref, colb_ref, cols_ref,
                       rowb_ref, kc_out, vc_out, ao_ref,
                       kbuf, vbuf, kwin, vwin, sems,
                       b=b, s=s, kh=nkv, rep=rep, d=d)

    _fused_kernel_qkv(ao_ref, resid_ref, gamma_ref, wo_ref, so_ref, wg_ref,
                      sg_ref, wu_ref, su_ref, wd_ref, sd_ref, agamma_ref,
                      wq_ref, sq_ref, out_ref, qkvn_ref, y_ref, h_ref,
                      ja=ja, j1=j1, j2=j2, ba=ba, bg=bg, bd=bd, eps=eps,
                      j_off=1)


def _fused_kernel_layer_last(pos_ref, qkv_ref, resid_ref, gamma_ref, wo_ref,
                             so_ref, wg_ref, sg_ref, wu_ref, su_ref, wd_ref,
                             sd_ref,
                             cos_ref, sin_ref, ks_ref, vs_ref, iks_ref,
                             ivs_ref, colb_ref, cols_ref, rowb_ref,
                             kc_hbm, vc_hbm,
                             out_ref, kc_out, vc_out,
                             y_ref, h_ref, ao_ref, kbuf, vbuf, kwin, vwin,
                             sems,
                             *, ja, j1, j2, ba, bg, bd, eps, b, s, nkv, rep,
                             d):
    from .decode_attention_fused import attention_body
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _phase_attn():
        attention_body(pos_ref[0], qkv_ref, cos_ref, sin_ref, ks_ref,
                       vs_ref, iks_ref, ivs_ref, colb_ref, cols_ref,
                       rowb_ref, kc_out, vc_out, ao_ref,
                       kbuf, vbuf, kwin, vwin, sems,
                       b=b, s=s, kh=nkv, rep=rep, d=d)

    _fused_kernel(ao_ref, resid_ref, gamma_ref, wo_ref, so_ref, wg_ref,
                  sg_ref, wu_ref, su_ref, wd_ref, sd_ref, out_ref,
                  y_ref, h_ref, ja=ja, j1=j1, j2=j2, ba=ba, bg=bg, bd=bd,
                  eps=eps, j_off=1)


@functools.partial(jax.jit, static_argnames=(
    "eps", "block_a", "block_g", "block_d", "block_q", "up_block_offset",
    "n_f", "n_heads", "n_kv_heads", "has_next"))
def fused_decode_layer(qkv, resid, k_cache, v_cache, k_scale, v_scale,
                       cache_index, cos, sin,
                       wo_pair, gate_pair, up_pair, down_pair, mlp_gamma,
                       *, eps: float = 1e-5, block_a: int = 2048,
                       block_g: int = 1024, block_d: int = 512,
                       block_q: int = 0, up_block_offset: int = 0,
                       n_f: int = 0, next_qkv=None, has_next: bool = None,
                       n_heads: int, n_kv_heads: int):
    """One ENTIRE decode layer in one pallas_call.

    qkv (B, (H+2KH)*D): THIS layer's qkv projection (from the previous
    layer's phase D, or a standalone projection for layer 0).
    k_cache/v_cache: (B, S, KH*D) flat (preferred, in-place append — see
    ops/kv_cache.flatten_kv_caches) or (B, S, KH, D).
    Other operands as ops/fused_layer.fused_wo_mlp; ``next_qkv``
    = ((wqkv_packed, wqkv_scale), next_attn_gamma) adds phase D.

    Returns (out, k_cache', v_cache') or (out, next_qkv_proj, k_cache',
    v_cache') with phase D.
    """
    from .decode_attention_fused import (WINDOW, attention_operands,
                                         attention_scratch)
    del has_next   # derived from next_qkv; kept for jit cache keying
    H, KH = n_heads, n_kv_heads
    flat = k_cache.ndim == 3
    if flat:
        B, S, KHD = k_cache.shape
        D = KHD // KH
    else:
        B, S, _, D = k_cache.shape
    rep = H // KH
    M, A = qkv.shape[0], H * D
    Dm = resid.shape[1]
    assert qkv.shape == (B, (H + 2 * KH) * D) and M == B and M % 8 == 0
    assert D % 128 == 0 and S % WINDOW == 0 and (B * rep) % 8 == 0

    wo_p, so = wo_pair
    wg_p, sg = gate_pair
    wu_p, su = up_pair
    wd_p, sd = down_pair
    F = n_f or wg_p.shape[1]
    ba = min(block_a, Dm)
    bg = min(block_g, F)
    bd = min(block_d, Dm)
    assert Dm % ba == 0 and F % bg == 0 and Dm % bd == 0
    ja, j1, j2 = Dm // ba, F // bg, Dm // bd
    bm = M
    dt = resid.dtype
    gamma = jnp.reshape(mlp_gamma, (1, Dm)).astype(dt)
    row = lambda sc, n: jnp.reshape(sc, (1, n)).astype(jnp.float32)

    const = lambda j, p: (0, 0)
    spec = lambda shape, idx: pl.BlockSpec(shape, idx,
                                           memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    a_idx = lambda j, p: (0, jnp.clip(j - 1, 0, ja - 1))
    g_idx = lambda j, p: (0, jnp.clip(j - 1 - ja, 0, j1 - 1))
    u_idx = (g_idx if not up_block_offset
             else (lambda j, p: (0, up_block_offset
                                 + jnp.clip(j - 1 - ja, 0, j1 - 1))))
    d_idx = lambda j, p: (0, jnp.clip(j - 1 - ja - j1, 0, j2 - 1))

    in_specs = [
        vspec,                           # qkv (attention input)
        spec((bm, Dm), const),           # resid
        spec((1, Dm), const),            # mlp norm gamma
        spec((A // 2, ba), a_idx),       # wo packed
        spec((1, ba), a_idx),
        spec((Dm // 2, bg), g_idx),      # w_gate packed
        spec((1, bg), g_idx),
        spec((Dm // 2, bg), u_idx),      # w_up packed
        spec((1, bg), g_idx),
        spec((F // 2, bd), d_idx),       # w_down packed
        spec((1, bd), d_idx),
    ]
    aops = attention_operands(cos, sin, k_scale, v_scale, B, S, rep, D)
    attn_specs = [vspec] * len(aops) + [any_spec, any_spec]
    operands = [qkv.astype(dt), resid, gamma, wo_p, row(so, Dm), wg_p,
                row(sg, F), wu_p, row(su, F), wd_p, row(sd, Dm)]
    attn_operands = list(aops) + [k_cache.reshape(B, S, KH * D),
                                  v_cache.reshape(B, S, KH * D)]
    scratch = [pltpu.VMEM((bm, Dm), dt),     # y
               pltpu.VMEM((bm, F), dt),      # h
               pltpu.VMEM((bm, A), dt)]      # ao (attention output)
    scratch += attention_scratch(B, S, KH, D)
    pos = jnp.asarray(cache_index, jnp.int32).reshape(1)
    wbytes = (A * Dm + 2 * Dm * F + F * Dm) // 2
    cbytes = 2 * B * S * KH * D
    cparams = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=100 * 1024 * 1024)

    def unflatten(k_new, v_new):
        if flat:
            return k_new, v_new
        return (k_new.reshape(B, S, KH, D), v_new.reshape(B, S, KH, D))

    if next_qkv is None:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1 + ja + j1 + j2,),
            in_specs=in_specs + attn_specs,
            out_specs=[spec((bm, Dm), const), any_spec, any_spec],
            scratch_shapes=scratch,
        )
        out, k_new, v_new = pl.pallas_call(
            functools.partial(_fused_kernel_layer_last, ja=ja, j1=j1,
                              j2=j2, ba=ba, bg=bg, bd=bd, eps=eps, b=B,
                              s=S, nkv=KH, rep=rep, d=D),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((bm, Dm), dt),
                jax.ShapeDtypeStruct((B, S, KH * D), jnp.int8),
                jax.ShapeDtypeStruct((B, S, KH * D), jnp.int8),
            ],
            # alias indices count the scalar-prefetch operand
            input_output_aliases={len(operands) + len(attn_operands) - 1:
                                  1,
                                  len(operands) + len(attn_operands): 2},
            cost_estimate=pl.CostEstimate(
                flops=2 * bm * (A * Dm + 2 * Dm * F + F * Dm)
                + 4 * B * H * D * S,
                bytes_accessed=wbytes + cbytes + 3 * bm * Dm * 2,
                transcendentals=bm * F + B * H * S),
            compiler_params=cparams,
            interpret=_interpret(),
        )(pos, *operands, *attn_operands)
        return (out, *unflatten(k_new, v_new))

    (wq_p, sq), attn_gamma = next_qkv
    Nq = wq_p.shape[1]
    bq = block_q or min(2048, Nq)
    assert Nq % bq == 0
    jq = Nq // bq
    q_idx = lambda j, p: (0, jnp.clip(j - 1 - ja - j1 - j2, 0, jq - 1))
    in_specs = in_specs + [
        spec((1, Dm), const),            # next attn norm gamma
        spec((Dm // 2, bq), q_idx),      # next wqkv packed
        spec((1, bq), q_idx),
    ]
    operands = operands + [jnp.reshape(attn_gamma, (1, Dm)).astype(dt),
                           wq_p, row(sq, Nq)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1 + ja + j1 + j2 + jq,),
        in_specs=in_specs + attn_specs,
        out_specs=[spec((bm, Dm), const), spec((bm, bq), q_idx),
                   any_spec, any_spec],
        scratch_shapes=scratch,
    )
    out, qkvn, k_new, v_new = pl.pallas_call(
        functools.partial(_fused_kernel_layer, ja=ja, j1=j1, j2=j2, ba=ba,
                          bg=bg, bd=bd, eps=eps, b=B, s=S, nkv=KH, rep=rep,
                          d=D),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bm, Dm), dt),
            jax.ShapeDtypeStruct((bm, Nq), dt),
            jax.ShapeDtypeStruct((B, S, KH * D), jnp.int8),
            jax.ShapeDtypeStruct((B, S, KH * D), jnp.int8),
        ],
        input_output_aliases={len(operands) + len(attn_operands) - 1: 2,
                              len(operands) + len(attn_operands): 3},
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * (A * Dm + 2 * Dm * F + F * Dm + Dm * Nq)
            + 4 * B * H * D * S,
            bytes_accessed=(A * Dm + 2 * Dm * F + F * Dm + Dm * Nq) // 2
            + cbytes + 3 * bm * Dm * 2,
            transcendentals=bm * F + B * H * S),
        compiler_params=cparams,
        interpret=_interpret(),
    )(pos, *operands, *attn_operands)
    return (out, qkvn, *unflatten(k_new, v_new))
