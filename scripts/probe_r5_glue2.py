"""Round-5 probe: decompose the REMAINING per-layer decode cost after the
fused WO+MLP kernel (ops/fused_layer.py).

Builds three decode-step variants at Llama-8B shapes (batch 16):
  full   — the production path (qkv kernel + rope/KV-append/attention
           einsums in XLA + fused_wo_mlp)
  noattn — attention glue removed: attn_out = q-slice of the qkv proj
           (isolates rope + INT8-KV quantize/append + einsums + softmax)
  noqkv  — additionally skips the qkv kernel: attn_out = x
           (isolates the qkv pallas call + its reshapes)
Per-step times give: attention-glue cost = full - noattn; qkv cost =
noattn - noqkv; fused-kernel + residual floor = noqkv.
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from aimet_tpu.models.transformer import TransformerConfig, rope_freqs
from aimet_tpu.ops.fused_layer import fused_wo_mlp
from aimet_tpu.ops.int_matmul import matmul_w4_decode
from aimet_tpu.ops.kv_cache import init_quantized_kv_cache
from aimet_tpu.serving.quantized_llm import (_attention, _fused_decode_blocks,
                                             _rms_norm,
                                             random_quantized_weights)

BATCH = 16
PREFILL = 32
STEPS0, STEPS1 = 4, 52
MAX_LEN = PREFILL + STEPS1 + 8
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
    H, D = cfg.n_heads, cfg.head_dim
    new_caches = []
    for i in range(cfg.n_layers):
        layer = qw["layers"][i]
        cache = caches[i]
        xn = _rms_norm(x, layer["attn_norm"], cfg.norm_eps)
        if variant == "full":
            raw, cache = _attention(cfg, layer, xn, cos, sin, mask, cache,
                                    cache_index, "w4a8", False,
                                    project_out=False)
        elif variant == "noattn":
            qkv = matmul_w4_decode(xn.reshape(B * T, -1), *layer["wqkv"],
                                   out_dtype=cfg.dtype)
            raw = qkv[:, :H * D].reshape(B, T, H * D)
        else:                                   # noqkv
            raw = xn
        wgu_p, s_gu = layer["w_gateup"]
        out = fused_wo_mlp(raw.reshape(B * T, -1), x.reshape(B * T, -1),
                           layer["wo"], (wgu_p, s_gu[:F]), (wgu_p, s_gu[F:]),
                           layer["w_down"], layer["mlp_norm"],
                           eps=cfg.norm_eps, block_a=ba, block_g=bg,
                           block_d=bd, up_block_offset=F // bg, n_f=F)
        x = out.reshape(B, T, -1)
        new_caches.append(cache)
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
    res = {}
    for variant in ("full", "noattn", "noqkv"):
        t = step_time(cfg, qw, caches, tok0, variant)
        res[variant] = t
        print(f"{variant}: {t*1e3:.2f} ms/step", flush=True)
    att = (res["full"] - res["noattn"]) / cfg.n_layers * 1e6
    qkv = (res["noattn"] - res["noqkv"]) / cfg.n_layers * 1e6
    print(f"attention glue: {att:.1f} us/layer; qkv kernel+reshape: "
          f"{qkv:.1f} us/layer", flush=True)


if __name__ == "__main__":
    main()
