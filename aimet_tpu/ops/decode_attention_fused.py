"""Fused decode-step GQA attention: rope + INT8-KV quantize + scores +
softmax + context in ONE Pallas kernel per layer.

VERDICT r4/r5 #1 (the last mile): after the whole-layer WO+MLP megakernel
(ops/fused_layer.py) absorbed the projections, the remaining decode glue
was ~32 us/layer of ~12 tiny XLA ops — rope on q and k, k/v quantize,
two cache dynamic-update-slices, the two GQA einsums, mask/softmax and
scale multiplies — dominated by per-kernel launch overhead, not bytes
(scripts/probe_r5_glue2.py: 31.9 us/layer measured, ~6 us of which is
real work). This kernel replaces all but the two cache row-writes with
one launch.

Design notes (TPU/Mosaic legality, probed round 3/5 — see CLAUDE.md):
- The KV caches stay in HBM (``memory_space=ANY``); the kernel DMAs them
  to VMEM through a (B, S, KH*D) LANE-MAJOR view: with the natural
  (B, S, KH, D) view, KH=8 rides the 32-sublane int8 tile -> 4x VMEM
  padding and scattered sublane reads (probed: the whole kernel ran
  ~38 us that way). Per-head access is then a cheap lane slice. The
  fetch starts at kernel entry and overlaps the rope/quantize compute.
- The new token is appended in-kernel by an aligned-WINDOW writeback:
  a direct (B, 1, KH*D) row DMA is illegal (sub-tile slice on the
  sublane-tiled S axis), and an XLA dynamic_update_slice outside the
  kernel forced a full 2x cache copy per layer (25 us/layer, probed —
  the cache being a kernel operand defeats XLA's in-place update). So
  the kernel patches the new row into the WINDOW aligned rows around
  ``pos`` (pure vector select) and DMAs just that window back into the
  input/output-aliased HBM cache. The fetched cache is stale at ``pos``
  during compute; the kernel patches the new token's contribution with
  vector ops: its score column is overwritten with the directly-
  computed self score, and its context contribution is added as a
  rank-1 update after zeroing the stale column's probability.
- GQA decode attention is reformulated as 2 dots per kv-head on
  CROSS-BATCH matrices: q_kh (B*rep, D) x K_kh (B*S, D)^T -> scores
  (B*rep, B*S), masked to the block-diagonal (col batch == row batch)
  with precomputed iota row/col index vectors (inputs, shared by all
  layers — no int div/mod inside the kernel). This turns 4*B*KH tiny
  per-(batch, head) matmuls — the reason the r4 standalone attention
  kernel lost to XLA (ops/decode_attention.py negative result) — into
  2*KH MXU-shaped ones.
- Rope uses the half-split (rotate-half, HF-Llama) convention:
  x_rot = x * [cos, cos] + roll(x, D/2) * [-sin, sin] — one static lane
  roll, no strided lane access (models/transformer.apply_rope matches).

Reference parity anchor: the reference only ever simulates quantization
(TrainingExtensions/torch/src/python/aimet_torch/v1/qc_quantize_op.py);
an INT8 KV cache with fused on-read dequant has no reference counterpart
— this is the TPU-native serving design of BASELINE config 5.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .int_matmul import _interpret


WINDOW = 32      # aligned cache-row window for the append writeback DMA
                 # (int8 sublane tiling; S must be a multiple of this)


def _group(b: int) -> int:
    """Attention batch-group size: 16 keeps the cross-batch score block
    at (16*rep, 16*S) — the O(G^2) padding compute sweet spot."""
    return 16 if b % 16 == 0 else b


def attention_body(pos, qkv_ref, cos_ref, sin_ref, ks_ref, vs_ref,
                   iks_ref, ivs_ref, colb_ref, cols_ref, rowb_ref,
                   kc_out, vc_out, ao_ref,
                   kbuf, vbuf, kwin, vwin, sems,
                   *, b, s, kh, rep, d):
    """The whole decode-attention phase, written against refs so it can
    run either as its own kernel (fused_decode_attention) or as phase 0
    of the whole-layer megakernel (ops/fused_layer.fused_decode_layer).
    ``ao_ref`` may be an output ref or a VMEM scratch."""
    dt = qkv_ref.dtype
    h = kh * rep
    cos2 = cos_ref[:]                       # (1, D) f32: [cos, cos]
    sin2 = sin_ref[:]                       # (1, D) f32: [-sin, sin]

    # fetch the (stale-at-pos) caches; overlaps the quantize/rope below.
    # kc_out aliases kc_hbm (input_output_aliases), so reading via the
    # output ref reads the same HBM buffer.
    kf = pltpu.make_async_copy(kc_out, kbuf, sems.at[0])
    vf = pltpu.make_async_copy(vc_out, vbuf, sems.at[1])
    kf.start()
    vf.start()

    def rope(x):
        xf = x.astype(jnp.float32)
        return xf * cos2 + pltpu.roll(xf, d // 2, 1) * sin2

    # --- quantize the new token's K/V rows (established prefill scales).
    # The reciprocals are PRECOMPUTED outside (exact IEEE divide) and
    # shared with the XLA append path (ops/kv_cache._quant): Mosaic
    # lowers in-kernel f32 division to an approximate reciprocal, which
    # shifted round() by 1-2 int levels at bin boundaries (probed) — a
    # shared reciprocal keeps the cache bit-identical whichever path
    # wrote it.
    kq_f = []
    vq_f = []
    for j in range(kh):
        k_j = rope(qkv_ref[:, (h + j) * d:(h + j + 1) * d])      # (B, D)
        v_j = qkv_ref[:, (h + kh + j) * d:(h + kh + j + 1) * d] \
            .astype(jnp.float32)
        kq = jnp.clip(jnp.round(k_j * iks_ref[:, j:j + 1]), -127, 127)
        vq = jnp.clip(jnp.round(v_j * ivs_ref[:, j:j + 1]), -127, 127)
        kq_f.append(kq)
        vq_f.append(vq)
    kq_row = jnp.concatenate(kq_f, axis=1)       # (B, KH*D) f32
    vq_row = jnp.concatenate(vq_f, axis=1)

    # --- append writeback: patch the new row into an aligned WINDOW of
    # cache rows and DMA only that window back in place. A direct
    # (B, 1, KH*D) row DMA is illegal (sub-tile slice on the sublane-
    # tiled S axis); an XLA dynamic_update_slice outside the kernel
    # forced a full 2x cache copy per layer because the cache is also a
    # kernel operand (probed: 25 us/layer for the two updates).
    w = WINDOW
    pos_al = (pos // w) * w
    kf.wait()
    vf.wait()
    ridx = jax.lax.broadcasted_iota(jnp.int32, (b, w, kh * d), 1)
    hit = ridx == (pos - pos_al)
    kwf = kbuf[:, pl.ds(pos_al, w), :].astype(jnp.float32)
    vwf = vbuf[:, pl.ds(pos_al, w), :].astype(jnp.float32)
    kwin[:] = jnp.where(hit, kq_row[:, None, :], kwf).astype(jnp.int8)
    vwin[:] = jnp.where(hit, vq_row[:, None, :], vwf).astype(jnp.int8)
    kw = pltpu.make_async_copy(kwin, kc_out.at[:, pl.ds(pos_al, w)],
                               sems.at[2])
    vw = pltpu.make_async_copy(vwin, vc_out.at[:, pl.ds(pos_al, w)],
                               sems.at[3])
    kw.start()
    vw.start()

    # --- per-kv-head cross-batch attention, in BATCH GROUPS of <= 16:
    # the cross-batch dot computes a (G*rep, G*S) score block per group,
    # so its padding compute is O(G^2) in the group size, not O(B^2) —
    # at batch 32 one (128, 3072) block per head cost ~25 us/layer more
    # than two (64, 1536) blocks (probed: the b32 roofline inversion)
    gb = _group(b)
    diag = colb_ref[:] == rowb_ref[:]                    # (G*rep, G*S)
    valid = diag & (cols_ref[:] <= pos)
    selfc = diag & (cols_ref[:] == pos)                  # new token's column
    inv_sqrt_d = 1.0 / np.sqrt(d)
    for g in range(b // gb):
        r0 = g * gb
        for j in range(kh):
            q_j = qkv_ref[r0:r0 + gb, j * rep * d:(j + 1) * rep * d] \
                .reshape(gb * rep, d)                            # (G*rep, D)
            q_j = rope(q_j).astype(dt)
            k_j = kbuf[r0:r0 + gb, :, j * d:(j + 1) * d] \
                .reshape(gb * s, d).astype(dt)
            scores = jax.lax.dot_general(
                q_j, k_j, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)              # (G*rep, G*S)
            # patch the stale ``pos`` column with the directly-computed
            # self score against the just-quantized K row (int grid,
            # like the dot)
            kq_rep = jnp.repeat(kq_f[j][r0:r0 + gb], rep,
                                axis=0).astype(dt)               # (G*rep, D)
            self_raw = jnp.sum((q_j * kq_rep).astype(jnp.float32), axis=1,
                               keepdims=True)                    # (G*rep, 1)
            scores = jnp.where(selfc, self_raw, scores)
            ks_col = ks_ref[r0:r0 + gb, j:j + 1] * inv_sqrt_d    # (G, 1)
            ks_row = jnp.repeat(ks_col, rep, axis=0)             # (G*rep, 1)
            scores = jnp.where(valid, scores * ks_row, -1e30)
            m = jnp.max(scores, axis=1, keepdims=True)
            p = jnp.exp(scores - m)
            probs = p / jnp.sum(p, axis=1, keepdims=True)
            # context: zero the stale column, add its contribution rank-1
            p_pos = jnp.sum(jnp.where(selfc, probs, 0.0), axis=1,
                            keepdims=True)                       # (G*rep, 1)
            probs = jnp.where(selfc, 0.0, probs).astype(dt)
            v_j = vbuf[r0:r0 + gb, :, j * d:(j + 1) * d] \
                .reshape(gb * s, d).astype(dt)
            ctx = jax.lax.dot_general(
                probs, v_j, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)              # (G*rep, D)
            vq_rep = jnp.repeat(vq_f[j][r0:r0 + gb], rep, axis=0)
            ctx = ctx + p_pos * vq_rep
            vs_row = jnp.repeat(vs_ref[r0:r0 + gb, j:j + 1], rep, axis=0)
            ctx = (ctx * vs_row).astype(dt)
            ao_ref[r0:r0 + gb, j * rep * d:(j + 1) * rep * d] = \
                ctx.reshape(gb, rep * d)
    kw.wait()
    vw.wait()


def _attn_kernel(pos_ref, qkv_ref, cos_ref, sin_ref, ks_ref, vs_ref,
                 iks_ref, ivs_ref, colb_ref, cols_ref, rowb_ref,
                 kc_hbm, vc_hbm,
                 ao_ref, kc_out, vc_out,
                 kbuf, vbuf, kwin, vwin, sems,
                 *, b, s, kh, rep, d):
    attention_body(pos_ref[0], qkv_ref, cos_ref, sin_ref, ks_ref, vs_ref,
                   iks_ref, ivs_ref, colb_ref, cols_ref, rowb_ref,
                   kc_out, vc_out, ao_ref, kbuf, vbuf, kwin, vwin, sems,
                   b=b, s=s, kh=kh, rep=rep, d=d)


def attention_operands(cos, sin, k_scale, v_scale, b, s, rep, d):
    """The small VMEM operands the attention phase needs, in kernel
    order: (cos2, sin2, ks, vs, iks, ivs, colb, cols, rowb). The iota
    index vectors are sized to the batch GROUP (see _group), not the
    full batch."""
    D = d
    gb = _group(b)
    cos2 = jnp.concatenate([cos, cos], -1).reshape(1, D).astype(jnp.float32)
    sin2 = jnp.concatenate([-sin, sin], -1).reshape(1, D).astype(jnp.float32)
    j = np.arange(gb * s, dtype=np.int32)
    colb = jnp.asarray(j // s).reshape(1, gb * s)
    cols = jnp.asarray(j % s).reshape(1, gb * s)
    rowb = jnp.asarray(np.arange(gb * rep, dtype=np.int32) // rep
                       ).reshape(gb * rep, 1)
    ks32 = k_scale.astype(jnp.float32)
    vs32 = v_scale.astype(jnp.float32)
    return (cos2, sin2, ks32, vs32, 1.0 / ks32, 1.0 / vs32,
            colb, cols, rowb)


def attention_scratch(b, s, kh, d):
    """Scratch allocations for attention_body, in kernel order."""
    return [
        pltpu.VMEM((b, s, kh * d), jnp.int8),       # K fetch buffer
        pltpu.VMEM((b, s, kh * d), jnp.int8),       # V fetch buffer
        pltpu.VMEM((b, WINDOW, kh * d), jnp.int8),  # K append window
        pltpu.VMEM((b, WINDOW, kh * d), jnp.int8),  # V append window
        pltpu.SemaphoreType.DMA((4,)),
    ]


@functools.partial(jax.jit, static_argnames=("n_heads", "n_kv_heads"))
def fused_decode_attention(qkv, cos, sin, k_cache, v_cache, k_scale,
                           v_scale, cache_index, *, n_heads: int,
                           n_kv_heads: int):
    """One-token GQA decode attention with INT8-KV append.

    qkv: (B, (H + 2*KH) * D) — this step's fused QKV projection.
    cos/sin: (1, D/2) rope tables for this position (half-split pairing).
    k_cache/v_cache: (B, S, KH, D) int8 — DONATED; returned updated.
    k_scale/v_scale: (B, KH) f32 prefill-established symmetric scales.
    cache_index: int32 scalar position to append at.

    Returns (attn_mix (B, H*D), k_cache', v_cache') — attn_mix is the
    pre-W_o attention output feeding ops/fused_layer.fused_wo_mlp.
    """
    H, KH = n_heads, n_kv_heads
    flat = k_cache.ndim == 3          # (B, S, KH*D) — preferred: keeps
    # the scan-carry buffer layout identical to the kernel operand, so
    # the input/output alias updates in place (a 4D<->3D reshape between
    # the carry and the kernel made XLA copy the cache each call)
    if flat:
        B, S, KHD = k_cache.shape
        D = KHD // KH
    else:
        B, S, _, D = k_cache.shape
        assert k_cache.shape[2] == KH
    rep = H // KH
    assert qkv.shape == (B, (H + 2 * KH) * D)
    assert D % 128 == 0 and S % WINDOW == 0 and (B * rep) % 8 == 0

    aops = attention_operands(cos, sin, k_scale, v_scale, B, S, rep, D)
    pos = jnp.asarray(cache_index, jnp.int32).reshape(1)

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[vspec] * 10 + [any_spec, any_spec],
        out_specs=[vspec, any_spec, any_spec],
        scratch_shapes=attention_scratch(B, S, KH, D),
    )
    call = pl.pallas_call(
        functools.partial(_attn_kernel, b=B, s=S, kh=KH, rep=rep, d=D),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, H * D), qkv.dtype),
            jax.ShapeDtypeStruct((B, S, KH * D), jnp.int8),
            jax.ShapeDtypeStruct((B, S, KH * D), jnp.int8),
        ],
        # the caches alias input<->output (indices count the scalar-
        # prefetch operand): the kernel appends IN PLACE via the window
        # DMA — no XLA-side update, no copy
        input_output_aliases={11: 1, 12: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )
    ao, k_new, v_new = call(
        pos, qkv, *aops,
        k_cache.reshape(B, S, KH * D), v_cache.reshape(B, S, KH * D))
    if flat:
        return ao, k_new, v_new
    return ao, k_new.reshape(B, S, KH, D), v_new.reshape(B, S, KH, D)
