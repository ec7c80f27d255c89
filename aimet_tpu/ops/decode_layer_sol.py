"""Speed-of-light whole-layer decode kernel: manual double-buffered
weight streaming with the attention phase truly overlapped.

Why not the grid-pipelined megakernel (ops/fused_layer.fused_decode_layer)?
Pallas' automatic pipeline fetches EVERY input block mapped to grid step 0
before the kernel body starts — including phase A's first 4 MB W_o block —
so the attention phase pays that fetch up front and nothing overlaps it
(probed: merged 28.5 us/layer vs 25.1 for the separate attention kernel).
Here the kernel owns its DMAs: at entry it issues the KV-cache fetches AND
the first two W_o block fetches together, computes attention while they
fly, then streams W_o -> gate/up -> W_down -> next-QKV through
double-buffered VMEM slots, starting each next fetch before computing the
current block, and chaining the first fetch of each next phase behind the
last fetch of the current one so the HBM pipe never drains.

Further wins over the grid version:
- the MLP-norm rsqrt is computed ONCE (the grid version recomputed the
  full-row norm in every phase-B step);
- per-phase VMEM buffers are sized exactly, no pallas block bookkeeping.

Everything else (INT4 split-half packing, biased-nibble ANDs, the
attention phase math) is shared with ops/fused_layer.py and
ops/decode_attention_fused.py.

Reference parity anchor: executes the INT4 serving math the reference
only simulates (TrainingExtensions/torch/.../v1/qc_quantize_op.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_attention_fused import (WINDOW, attention_body,
                                     attention_operands, attention_scratch)
from .fused_layer import _split_half, _w4_block
from .int_matmul import _and_nibbles, _interpret


class _Val:
    """Adapter so _w4_block's ``w_ref[:]``/``s_ref[:]`` reads work on
    already-loaded values."""
    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __getitem__(self, idx):
        return self.v


def _quant_rows(x):
    """Per-row symmetric int8 quantize of a phase input (M, K), plus the
    lo-half int32 rowsum the biased-nibble epilogue needs. Same math as
    _w4a8_fusedq_kernel's j==0 block (ops/int_matmul.py)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    k2 = xq.shape[1] // 2
    rsq = jnp.sum(xq[:, :k2].astype(jnp.int32), axis=1, keepdims=True)
    return xq, scale, rsq


def _w4_block_i8(xq, rsq, sx, w_val, s_val):
    """One N-block of the INT4 matmul on the int8 MXU path: two int8
    ANDs extract the biased nibble planes, two int8xint8->int32 dots,
    exact combine in int32 (the hi plane carries a 16x factor removed by
    an arithmetic shift — int32 shifts are Mosaic-legal, int8 are not).
    2x the MXU rate of the bf16 dots at decode M, where the whole-layer
    kernel is compute-bound (M=16 fills 1/8 of the MXU rows)."""
    lo_b, hi16 = _and_nibbles(w_val)
    k2 = w_val.shape[0]
    dot = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    total = (dot(xq[:, :k2], lo_b) - 8 * rsq
             + jax.lax.shift_right_arithmetic(dot(xq[:, k2:], hi16), 4))
    return total.astype(jnp.float32) * sx * s_val


def _sol_kernel(pos_ref, qkv_ref, resid_ref, gamma_ref, agamma_ref,
                so_ref, sgu_ref, sd_ref, sq_ref,
                cos_ref, sin_ref, ks_ref, vs_ref, iks_ref, ivs_ref,
                colb_ref, cols_ref, rowb_ref,
                wo_hbm, wgu_hbm, wd_hbm, wq_hbm, kc_hbm, vc_hbm,
                out_ref, qkvn_ref, kc_out, vc_out,
                y_ref, h_ref, ao_ref,
                kbuf, vbuf, kwin, vwin, asem,
                wo_buf, g_buf, u_buf, wd_buf, wq_buf, wsem,
                *, b, s, nkv, rep, d, dm, f, nq, ba, bg, bd, bq, eps,
                has_qkv, int8_dots):
    ja, j1, j2 = dm // ba, f // bg, dm // bd
    jq = nq // bq if has_qkv else 0
    dt = resid_ref.dtype

    if int8_dots:
        def prep(x):
            return _quant_rows(x)

        def blk(prepped, w_val, s_val):
            xq, sx, rsq = prepped
            return _w4_block_i8(xq, rsq, sx, w_val, s_val)
    else:
        def prep(x):
            return _split_half(x, dt)

        def blk(prepped, w_val, s_val):
            x_lo, x_hi, rs = prepped
            return _w4_block(x_lo, x_hi, rs, _Val(w_val), _Val(s_val))

    def fetch(dst, src, cols, width, sem):
        cp = pltpu.make_async_copy(
            src.at[:, pl.ds(cols, width)], dst, sem)
        cp.start()
        return cp

    # --- kernel entry: KV fetches + first W_o fetches all in flight
    wo_dma = {0: fetch(wo_buf.at[0], wo_hbm, 0, ba, wsem.at[0])}
    if ja > 1:
        wo_dma[1] = fetch(wo_buf.at[1], wo_hbm, ba, ba, wsem.at[1])

    attention_body(pos_ref[0], qkv_ref, cos_ref, sin_ref, ks_ref, vs_ref,
                   iks_ref, ivs_ref, colb_ref, cols_ref, rowb_ref,
                   kc_out, vc_out, ao_ref, kbuf, vbuf, kwin, vwin, asem,
                   b=b, s=s, kh=nkv, rep=rep, d=d)

    # --- phase A: y = resid + ao @ W_o
    pa = prep(ao_ref[:])
    g_dma = {}
    u_dma = {}
    for i in range(ja):
        if i + 2 < ja:
            wo_dma[i + 2] = fetch(wo_buf.at[(i + 2) % 2], wo_hbm,
                                  (i + 2) * ba, ba, wsem.at[(i + 2) % 2])
        if i == max(ja - 2, 0):    # chain the next phase's first fetches
            g_dma[0] = fetch(g_buf.at[0], wgu_hbm, 0, bg, wsem.at[2])
            u_dma[0] = fetch(u_buf.at[0], wgu_hbm, f, bg, wsem.at[4])
        wo_dma[i].wait()
        yb = blk(pa, wo_buf[i % 2],
                 so_ref[:, pl.ds(i * ba, ba)]).astype(dt)
        y_ref[:, pl.ds(i * ba, ba)] = yb + resid_ref[:, pl.ds(i * ba, ba)]

    # --- phase B: h = silu(gate) * up, input rmsnorm(y) computed ONCE
    yf = y_ref[:].astype(jnp.float32)
    r = jax.lax.rsqrt(jnp.mean(yf * yf, axis=1, keepdims=True) + eps)
    yhat = ((yf * r).astype(dt) * gamma_ref[:]).astype(dt)
    py = prep(yhat)
    wd_dma = {}
    for i in range(j1):
        if i + 1 < j1:
            g_dma[i + 1] = fetch(g_buf.at[(i + 1) % 2], wgu_hbm,
                                 (i + 1) * bg, bg, wsem.at[2 + (i + 1) % 2])
            u_dma[i + 1] = fetch(u_buf.at[(i + 1) % 2], wgu_hbm,
                                 f + (i + 1) * bg, bg,
                                 wsem.at[4 + (i + 1) % 2])
        elif i + 1 == j1:
            wd_dma[0] = fetch(wd_buf.at[0], wd_hbm, 0, bd, wsem.at[6])
        g_dma[i].wait()
        u_dma[i].wait()
        gate = blk(py, g_buf[i % 2], sgu_ref[:, pl.ds(i * bg, bg)])
        up = blk(py, u_buf[i % 2], sgu_ref[:, pl.ds(f + i * bg, bg)])
        hb = gate * jax.lax.logistic(gate) * up
        h_ref[:, pl.ds(i * bg, bg)] = hb.astype(h_ref.dtype)

    # --- phase C: out = y + h @ W_down
    ph = prep(h_ref[:])
    wq_dma = {}
    for i in range(j2):
        if i + 1 < j2:
            wd_dma[i + 1] = fetch(wd_buf.at[(i + 1) % 2], wd_hbm,
                                  (i + 1) * bd, bd, wsem.at[6 + (i + 1) % 2])
        elif has_qkv:
            wq_dma[0] = fetch(wq_buf.at[0], wq_hbm, 0, bq, wsem.at[8])
        wd_dma[i].wait()
        ob = blk(ph, wd_buf[i % 2],
                 sd_ref[:, pl.ds(i * bd, bd)]).astype(dt)
        out_ref[:, pl.ds(i * bd, bd)] = ob + y_ref[:, pl.ds(i * bd, bd)]

    # --- phase D: next layer's attn-norm + QKV projection
    if has_qkv:
        of = out_ref[:].astype(jnp.float32)
        r2 = jax.lax.rsqrt(jnp.mean(of * of, axis=1, keepdims=True) + eps)
        ohat = ((of * r2).astype(dt) * agamma_ref[:]).astype(dt)
        po = prep(ohat)
        for i in range(jq):
            if i + 1 < jq:
                wq_dma[i + 1] = fetch(wq_buf.at[(i + 1) % 2], wq_hbm,
                                      (i + 1) * bq, bq,
                                      wsem.at[8 + (i + 1) % 2])
            wq_dma[i].wait()
            qb = blk(po, wq_buf[i % 2], sq_ref[:, pl.ds(i * bq, bq)])
            qkvn_ref[:, pl.ds(i * bq, bq)] = qb.astype(dt)


@functools.partial(jax.jit, static_argnames=(
    "eps", "block_a", "block_g", "block_d", "block_q", "n_f",
    "n_heads", "n_kv_heads", "int8_dots"))
def sol_decode_layer(qkv, resid, k_cache, v_cache, k_scale, v_scale,
                     cache_index, cos, sin,
                     wo_pair, gateup_pair, down_pair, mlp_gamma,
                     *, eps: float = 1e-5, block_a: int = 2048,
                     block_g: int = 1024, block_d: int = 512,
                     block_q: int = 0, n_f: int = 0, next_qkv=None,
                     n_heads: int, n_kv_heads: int,
                     int8_dots: bool = False):
    """One ENTIRE decode layer, manually streamed (see module docstring).

    ``gateup_pair``: the packed (D/2, 2F) concatenated gate|up array with
    its (2F,) scales (serving's w_gateup layout). Other operands as
    ops/fused_layer.fused_decode_layer. Caches flat (B, S, KH*D) or 4D.

    ``int8_dots=True`` runs the projections on the int8 MXU path with
    per-row in-kernel activation quantization (true W4A8 — the same
    numerics as ops/int_matmul.matmul_w4a8): at decode M the kernel is
    MXU-compute-bound, and int8 dots run at 2x the bf16 rate.
    """
    H, KH = n_heads, n_kv_heads
    flat = k_cache.ndim == 3
    if flat:
        B, S, KHD = k_cache.shape
        D = KHD // KH
    else:
        B, S, _, D = k_cache.shape
    rep = H // KH
    A = H * D
    Dm = resid.shape[1]
    assert qkv.shape == (B, (H + 2 * KH) * D) and B % 8 == 0
    assert D % 128 == 0 and S % WINDOW == 0 and (B * rep) % 8 == 0

    wo_p, so = wo_pair
    wgu_p, sgu = gateup_pair
    wd_p, sd = down_pair
    F = n_f or wgu_p.shape[1] // 2
    assert wgu_p.shape == (Dm // 2, 2 * F) and wo_p.shape == (A // 2, Dm)
    ba = min(block_a, Dm)
    bg = min(block_g, F)
    bd = min(block_d, Dm)
    assert Dm % ba == 0 and F % bg == 0 and Dm % bd == 0
    dt = resid.dtype
    gamma = jnp.reshape(mlp_gamma, (1, Dm)).astype(dt)
    row = lambda sc, n: jnp.reshape(sc, (1, n)).astype(jnp.float32)

    has_qkv = next_qkv is not None
    if has_qkv:
        (wq_p, sq), attn_gamma = next_qkv
        Nq = wq_p.shape[1]
        bq = block_q or min(2048, Nq)
        assert Nq % bq == 0 and wq_p.shape[0] == Dm // 2
        agamma = jnp.reshape(attn_gamma, (1, Dm)).astype(dt)
    else:
        # dummy singleton operands keep the signature static
        Nq, bq = 128, 128
        wq_p = jnp.zeros((Dm // 2, Nq), jnp.int8)
        sq = jnp.zeros((Nq,), jnp.float32)
        agamma = gamma

    aops = attention_operands(cos, sin, k_scale, v_scale, B, S, rep, D)
    pos = jnp.asarray(cache_index, jnp.int32).reshape(1)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    n_vmem_in = 8 + len(aops)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[vspec] * n_vmem_in + [any_spec] * 6,
        out_specs=[vspec, vspec, any_spec, any_spec],
        scratch_shapes=[
            pltpu.VMEM((B, Dm), dt),          # y
            pltpu.VMEM((B, F), dt),           # h
            pltpu.VMEM((B, A), dt),           # ao
        ] + attention_scratch(B, S, KH, D) + [
            pltpu.VMEM((2, A // 2, ba), jnp.int8),   # W_o slots
            pltpu.VMEM((2, Dm // 2, bg), jnp.int8),  # gate slots
            pltpu.VMEM((2, Dm // 2, bg), jnp.int8),  # up slots
            pltpu.VMEM((2, F // 2, bd), jnp.int8),   # W_down slots
            pltpu.VMEM((2, Dm // 2, bq), jnp.int8),  # W_qkv slots
            pltpu.SemaphoreType.DMA((10,)),
        ],
    )
    operands = [qkv.astype(dt), resid, gamma, agamma, row(so, Dm),
                row(sgu, 2 * F), row(sd, Dm), row(sq, Nq),
                *aops,
                wo_p, wgu_p, wd_p, wq_p,
                k_cache.reshape(B, S, KH * D), v_cache.reshape(B, S, KH * D)]
    n_in = 1 + len(operands)          # incl. the scalar-prefetch operand
    out, qkvn, k_new, v_new = pl.pallas_call(
        functools.partial(
            _sol_kernel, b=B, s=S, nkv=KH, rep=rep, d=D, dm=Dm, f=F,
            nq=Nq, ba=ba, bg=bg, bd=bd, bq=bq, eps=eps, has_qkv=has_qkv,
            int8_dots=int8_dots),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Dm), dt),
            jax.ShapeDtypeStruct((B, Nq), dt),
            jax.ShapeDtypeStruct((B, S, KH * D), jnp.int8),
            jax.ShapeDtypeStruct((B, S, KH * D), jnp.int8),
        ],
        input_output_aliases={n_in - 2: 2, n_in - 1: 3},
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (A * Dm + 2 * Dm * F + F * Dm + Dm * Nq)
            + 4 * B * H * D * S,
            bytes_accessed=(A * Dm + 2 * Dm * F + F * Dm + Dm * Nq) // 2
            + 2 * B * S * KH * D,
            transcendentals=B * F + B * H * S),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=_interpret(),
    )(pos, *operands)
    if not flat:
        k_new = k_new.reshape(B, S, KH, D)
        v_new = v_new.reshape(B, S, KH, D)
    if has_qkv:
        return out, qkvn, k_new, v_new
    return out, k_new, v_new
