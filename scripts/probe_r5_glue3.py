"""Round-5 probe #3: decompose the decode step AFTER the fused attention
kernel landed. Variants at Llama-8B shapes (batch 16, S=96):
  kernel — production: fused_decode_attention + megakernel(phase D)
  xla    — attention via the old XLA glue + megakernel(phase D)
  none   — attention skipped entirely (ao = q slice), megakernel(phase D)
  nodus  — kernel, but cache updates dropped (measures the 2 dus ops)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from aimet_tpu.models.transformer import TransformerConfig, rope_freqs
from aimet_tpu.ops.decode_attention_fused import fused_decode_attention
from aimet_tpu.ops.fused_layer import fused_wo_mlp
from aimet_tpu.ops.kv_cache import QuantizedKVCache, init_quantized_kv_cache
from aimet_tpu.serving.quantized_llm import (_attention_from_qkv,
                                             _fused_decode_blocks, _proj,
                                             _rms_norm,
                                             random_quantized_weights)

BATCH = 16
PREFILL = 32
STEPS0, STEPS1 = 4, 52
MAX_LEN = 96
REPS = 3


def decode_step(qw, cfg, tokens, caches, cache_index, variant):
    B, T = tokens.shape
    x = jnp.take(qw["embed"], tokens, axis=0).astype(cfg.dtype)
    S = caches[0].k.shape[1]
    cache_index = jnp.asarray(cache_index)
    positions = cache_index + jnp.arange(T)
    span = jnp.arange(S)[None, :] <= positions[:, None]
    mask = span[None, None, :, :]
    cos, sin = rope_freqs(cfg, positions)
    ba, bg, bd = _fused_decode_blocks(cfg, B * T, "w4a8")
    F = cfg.d_ff
    H, KH = cfg.n_heads, cfg.n_kv_heads
    layers = qw["layers"]
    xn0 = _rms_norm(x, layers[0]["attn_norm"], cfg.norm_eps)
    qkv = _proj(xn0, layers[0]["wqkv"], "w4a8", True)
    new_caches = []
    for i in range(cfg.n_layers):
        layer = layers[i]
        c = caches[i]
        if variant == "sol":
            from aimet_tpu.ops.decode_layer_sol import sol_decode_layer
            wgu_p, s_gu = layer["w_gateup"]
            last = i == cfg.n_layers - 1
            nxt = None if last else (layers[i + 1]["wqkv"],
                                     layers[i + 1]["attn_norm"])
            res = sol_decode_layer(
                qkv.reshape(B, -1), x.reshape(B * T, -1), c.k, c.v,
                c.k_scale, c.v_scale, cache_index, cos, sin, layer["wo"],
                (wgu_p, s_gu), layer["w_down"], layer["mlp_norm"],
                eps=cfg.norm_eps, block_a=ba, block_g=bg, block_d=bd,
                n_f=F, next_qkv=nxt, n_heads=H, n_kv_heads=KH)
            if last:
                out, k_new, v_new = res
            else:
                out, qkv2, k_new, v_new = res
                qkv = qkv2.reshape(B, T, -1)
            x = out.reshape(B, T, -1)
            new_caches.append(QuantizedKVCache(k_new, v_new, c.k_scale,
                                               c.v_scale))
            continue
        if variant == "merged":
            from aimet_tpu.ops.fused_layer import fused_decode_layer
            wgu_p, s_gu = layer["w_gateup"]
            last = i == cfg.n_layers - 1
            nxt = None if last else (layers[i + 1]["wqkv"],
                                     layers[i + 1]["attn_norm"])
            res = fused_decode_layer(
                qkv.reshape(B, -1), x.reshape(B * T, -1), c.k, c.v,
                c.k_scale, c.v_scale, cache_index, cos, sin, layer["wo"],
                (wgu_p, s_gu[:F]), (wgu_p, s_gu[F:]), layer["w_down"],
                layer["mlp_norm"], eps=cfg.norm_eps, block_a=ba,
                block_g=bg, block_d=bd, up_block_offset=F // bg, n_f=F,
                next_qkv=nxt, n_heads=H, n_kv_heads=KH)
            if last:
                out, k_new, v_new = res
            else:
                out, qkv2, k_new, v_new = res
                qkv = qkv2.reshape(B, T, -1)
            x = out.reshape(B, T, -1)
            new_caches.append(QuantizedKVCache(k_new, v_new, c.k_scale,
                                               c.v_scale))
            continue
        if variant in ("kernel", "nodus", "flat"):
            raw, k_new, v_new = fused_decode_attention(
                qkv.reshape(B, -1), cos, sin, c.k, c.v, c.k_scale,
                c.v_scale, cache_index, n_heads=H, n_kv_heads=KH)
            raw = raw.reshape(B, T, -1)
            if variant == "nodus":
                cache = c
            else:
                cache = QuantizedKVCache(k_new, v_new, c.k_scale, c.v_scale)
        elif variant == "xla":
            raw, cache = _attention_from_qkv(
                cfg, layer, qkv, cos, sin, mask, c, cache_index,
                "w4a8", False, project_out=False)
        else:                                   # none
            raw = qkv[..., :H * cfg.head_dim]
            cache = c
        wgu_p, s_gu = layer["w_gateup"]
        last = i == cfg.n_layers - 1
        nxt = None if last else (layers[i + 1]["wqkv"],
                                 layers[i + 1]["attn_norm"])
        out = fused_wo_mlp(
            raw.reshape(B * T, -1), x.reshape(B * T, -1), layer["wo"],
            (wgu_p, s_gu[:F]), (wgu_p, s_gu[F:]), layer["w_down"],
            layer["mlp_norm"], eps=cfg.norm_eps, block_a=ba, block_g=bg,
            block_d=bd, up_block_offset=F // bg, n_f=F, next_qkv=nxt)
        if last:
            x = out.reshape(B, T, -1)
        else:
            out, qkv2 = out
            x = out.reshape(B, T, -1)
            qkv = qkv2.reshape(B, T, -1)
        new_caches.append(cache)
    from aimet_tpu.ops.int_matmul import matmul_w4_decode
    x = _rms_norm(x, qw["final_norm"], cfg.norm_eps)
    logits = matmul_w4_decode(x.reshape(B * T, -1), *qw["lm_head"],
                              out_dtype=cfg.dtype)
    return logits[:, :cfg.vocab_size].reshape(B, T, -1), new_caches


def step_time(cfg, qw, caches, tok0, variant):
    def make(steps):
        def loop(qw, tok0, caches, start):
            def body(carry, _):
                tok, caches, pos = carry
                logits, caches = decode_step(qw, cfg, tok, caches, pos,
                                             variant)
                nxt = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)
                return (nxt, caches, pos + 1), nxt
            _, toks = jax.lax.scan(body, (tok0, caches, start), None,
                                   length=steps)
            return toks
        return jax.jit(loop)

    times = {}
    for steps in (STEPS0, STEPS1):
        f = make(steps)
        np.asarray(f(qw, tok0, caches, jnp.int32(PREFILL))[0])
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(f(qw, tok0, caches, jnp.int32(PREFILL))[0])
            best = min(best, time.perf_counter() - t0)
        times[steps] = best
    return max((times[STEPS1] - times[STEPS0]) / (STEPS1 - STEPS0), 1e-9)


def main():
    cfg = TransformerConfig.llama3_8b()
    qw = random_quantized_weights(cfg, "w4a8")
    caches = [init_quantized_kv_cache(BATCH, MAX_LEN, cfg.n_kv_heads,
                                      cfg.head_dim)
              for _ in range(cfg.n_layers)]
    rng = np.random.RandomState(0)
    tok0 = jnp.asarray(rng.randint(0, cfg.vocab_size, (BATCH, 1)), jnp.int32)
    flat_caches = [QuantizedKVCache(
        c.k.reshape(BATCH, MAX_LEN, -1), c.v.reshape(BATCH, MAX_LEN, -1),
        c.k_scale, c.v_scale) for c in caches]
    res = {}
    # interleave two passes: the chip's clock swings >10% within minutes
    # (pin 0.935 -> 1.087 observed within an hour), so sequential
    # variant timing is meaningless — keep each variant's best
    for _pass in range(4):
        for variant in ("sol", "flat", "none"):
            cs = caches if variant in ("xla", "none", "kernel") \
                else flat_caches
            t = step_time(cfg, qw, cs, tok0, variant)
            res[variant] = min(t, res.get(variant, float("inf")))
            print(f"pass{_pass} {variant:7s}: {t*1e3:.2f} ms/step",
                  flush=True)
    n = cfg.n_layers
    print(f"attention in-context us/layer: "
          f"sol {(res['sol']-res['none'])/n*1e6:.1f}, "
          f"two-kernel {(res['flat']-res['none'])/n*1e6:.1f}")


if __name__ == "__main__":
    main()
