"""Sweep fused_decode_layer block sizes at full Llama-8B decode (b16)."""
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
from aimet_tpu.ops.fused_layer import fused_decode_layer
from aimet_tpu.ops.kv_cache import (QuantizedKVCache, flatten_kv_caches,
                                    init_quantized_kv_cache)
from aimet_tpu.ops.int_matmul import matmul_w4_decode
from aimet_tpu.serving.quantized_llm import (_proj, _rms_norm,
                                             random_quantized_weights)

BATCH, PREFILL, MAX_LEN = 16, 32, 96
STEPS0, STEPS1 = 4, 52
REPS = 3


def build_step(cfg, blocks):
    ba, bg, bd, bq = blocks

    def decode_step(qw, tokens, caches, cache_index):
        B, T = tokens.shape
        x = jnp.take(qw["embed"], tokens, axis=0).astype(cfg.dtype)
        cache_index = jnp.asarray(cache_index)
        cos, sin = rope_freqs(cfg, cache_index + jnp.arange(T))
        F = cfg.d_ff
        H, KH = cfg.n_heads, cfg.n_kv_heads
        layers = qw["layers"]
        xn0 = _rms_norm(x, layers[0]["attn_norm"], cfg.norm_eps)
        qkv = _proj(xn0, layers[0]["wqkv"], "w4a8", True)
        new_caches = []
        for i in range(cfg.n_layers):
            layer = layers[i]
            c = caches[i]
            wgu_p, s_gu = layer["w_gateup"]
            last = i == cfg.n_layers - 1
            nxt = None if last else (layers[i + 1]["wqkv"],
                                     layers[i + 1]["attn_norm"])
            res = fused_decode_layer(
                qkv.reshape(B, -1), x.reshape(B * T, -1), c.k, c.v,
                c.k_scale, c.v_scale, cache_index, cos, sin, layer["wo"],
                (wgu_p, s_gu[:F]), (wgu_p, s_gu[F:]), layer["w_down"],
                layer["mlp_norm"], eps=cfg.norm_eps, block_a=ba,
                block_g=bg, block_d=bd, block_q=bq,
                up_block_offset=F // bg, n_f=F, next_qkv=nxt,
                n_heads=H, n_kv_heads=KH)
            if last:
                out, k_new, v_new = res
            else:
                out, qkv2, k_new, v_new = res
                qkv = qkv2.reshape(B, T, -1)
            x = out.reshape(B, T, -1)
            new_caches.append(QuantizedKVCache(k_new, v_new, c.k_scale,
                                               c.v_scale))
        x = _rms_norm(x, qw["final_norm"], cfg.norm_eps)
        logits = matmul_w4_decode(x.reshape(B * T, -1), *qw["lm_head"],
                                  out_dtype=cfg.dtype)
        return logits[:, :cfg.vocab_size].reshape(B, T, -1), new_caches

    def make(steps):
        def loop(qw, tok0, caches, start):
            def body(carry, _):
                tok, caches, pos = carry
                logits, caches = decode_step(qw, tok, caches, pos)
                nxt = jnp.argmax(logits[:, -1], -1)[:, None
                                                    ].astype(jnp.int32)
                return (nxt, caches, pos + 1), nxt
            _, toks = jax.lax.scan(body, (tok0, caches, start), None,
                                   length=steps)
            return toks
        return jax.jit(loop)
    return make


def main():
    cfg = TransformerConfig.llama3_8b()
    qw = random_quantized_weights(cfg, "w4a8")
    caches = flatten_kv_caches(
        [init_quantized_kv_cache(BATCH, MAX_LEN, cfg.n_kv_heads,
                                 cfg.head_dim)
         for _ in range(cfg.n_layers)])
    rng = np.random.RandomState(0)
    tok0 = jnp.asarray(rng.randint(0, cfg.vocab_size, (BATCH, 1)),
                       jnp.int32)
    configs = [(2048, 1024, 512, 2048),   # current default
               (1024, 1024, 512, 2048),
               (2048, 2048, 1024, 2048),
               (1024, 512, 512, 1024),
               (4096, 1024, 512, 2048)]
    res = {}
    for _pass in range(2):
        for blocks in configs:
            make = build_step(cfg, blocks)
            try:
                times = {}
                for steps in (STEPS0, STEPS1):
                    f = make(steps)
                    np.asarray(f(qw, tok0, caches, jnp.int32(PREFILL))[0])
                    best = float("inf")
                    for _ in range(REPS):
                        t0 = time.perf_counter()
                        np.asarray(f(qw, tok0, caches,
                                     jnp.int32(PREFILL))[0])
                        best = min(best, time.perf_counter() - t0)
                    times[steps] = best
                t = (times[STEPS1] - times[STEPS0]) / (STEPS1 - STEPS0)
                res[blocks] = min(t, res.get(blocks, float("inf")))
                print(f"pass{_pass} {blocks}: {t*1e3:.2f} ms/step",
                      flush=True)
            except Exception as e:
                print(f"pass{_pass} {blocks}: FAILED "
                      f"{type(e).__name__} {str(e)[:120]}", flush=True)
                res[blocks] = float("inf")
    best = min(res, key=res.get)
    print(f"best: {best} at {res[best]*1e3:.2f} ms/step")


if __name__ == "__main__":
    main()
