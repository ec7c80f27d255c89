"""LLM decode-throughput benchmark on the real TPU chip.

Measures tokens/s for batched greedy decode of the ~160M-param `small`
transformer config in three weight modes: bf16 (flax baseline), INT8 and
INT4 weight-only (fused dequant-matmul kernels) — all with the INT8 KV
cache for the quantized modes. The decode loop runs inside one jit
(lax.scan over steps) so relay latency is amortized.

Prints one JSON line:
  {"metric": "decode_tokens_per_s_w4", "value": ..., "unit": "tok/s",
   "vs_baseline": speedup over bf16}
"""
import json
import sys
import time
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from aimet_tpu.models.transformer import Transformer, TransformerConfig
from aimet_tpu.ops.kv_cache import init_quantized_kv_cache
from aimet_tpu.serving.quantized_llm import (
    quantize_transformer_weights,
    quantized_forward,
)
from aimet_tpu.models.transformer import init_kv_caches

BATCH = 8
PREFILL = 32
STEPS0, STEPS1 = 16, 144      # slope method: amortize the ~200ms relay fetch
MAX_LEN = PREFILL + STEPS1 + 8


def timed_steps(make_loop, *args, reps=3):
    """make_loop(steps) -> fn(*args); returns seconds per decode step via
    the slope between two step counts (fetching one element forces real
    completion through the relay)."""
    times = {}
    for steps in (STEPS0, STEPS1):
        fn = make_loop(steps)
        np.asarray(fn(*args)[0])  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(*args)[0])
            best = min(best, time.perf_counter() - t0)
        times[steps] = best
    return max((times[STEPS1] - times[STEPS0]) / (STEPS1 - STEPS0), 1e-9)


def bench_quantized(cfg, variables, mode):
    qw = quantize_transformer_weights(variables, cfg, mode)

    def make_loop(steps):
        def decode_loop(qw, tok0, caches, start):
            def body(carry, _):
                tok, caches, pos = carry
                logits, caches = quantized_forward(
                    qw, cfg, tok, caches, pos, prefill=False, mode=mode)
                nxt = jnp.argmax(logits[:, -1], axis=-1)[:, None].astype(jnp.int32)
                return (nxt, caches, pos + 1), nxt

            (_, caches, _), toks = jax.lax.scan(
                body, (tok0, caches, start), None, length=steps)
            return toks

        return jax.jit(decode_loop)

    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(0, cfg.vocab_size, (BATCH, PREFILL)),
                         jnp.int32)
    caches = [init_quantized_kv_cache(BATCH, MAX_LEN, cfg.n_kv_heads,
                                      cfg.head_dim)
              for _ in range(cfg.n_layers)]
    logits, caches = jax.jit(partial(quantized_forward, prefill=True,
                                     mode=mode), static_argnames=("cfg",))(
        qw, cfg, tokens, caches, 0)
    tok0 = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)
    t_step = timed_steps(make_loop, qw, tok0, caches, jnp.int32(PREFILL))
    return BATCH / t_step


def bench_bf16(cfg, variables):
    model = Transformer(cfg)

    def make_loop(steps):
        def decode_loop(v, tok0, caches, start):
            def body(carry, _):
                tok, caches, pos = carry
                logits, caches = model.apply(v, tok, caches, pos)
                nxt = jnp.argmax(logits[:, -1], axis=-1)[:, None].astype(jnp.int32)
                return (nxt, caches, pos + 1), nxt

            (_, caches, _), toks = jax.lax.scan(
                body, (tok0, caches, start), None, length=steps)
            return toks

        return jax.jit(decode_loop)

    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(0, cfg.vocab_size, (BATCH, PREFILL)),
                         jnp.int32)
    caches = init_kv_caches(cfg, BATCH, MAX_LEN)
    logits, caches = jax.jit(model.apply)(variables, tokens, caches, 0)
    tok0 = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)
    t_step = timed_steps(make_loop, variables, tok0, caches, jnp.int32(PREFILL))
    return BATCH / t_step


def main():
    # ~0.9B params: large enough for decode to be weight-bandwidth-bound
    cfg = TransformerConfig(vocab_size=32000, d_model=2048, n_layers=16,
                            n_heads=16, n_kv_heads=8, d_ff=5504)
    model = Transformer(cfg)
    tokens = jnp.zeros((1, 8), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), tokens)

    tps_bf16 = bench_bf16(cfg, variables)
    tps_w8 = bench_quantized(cfg, variables, "w8")
    tps_w4 = bench_quantized(cfg, variables, "w4")
    tps_w4a8 = bench_quantized(cfg, variables, "w4a8")

    print(f"# decode tok/s  bf16={tps_bf16:.0f}  w8={tps_w8:.0f}  "
          f"w4={tps_w4:.0f}  w4a8={tps_w4a8:.0f}", file=sys.stderr)
    print(json.dumps({
        "metric": "decode_tokens_per_s_w4a8",
        "value": round(tps_w4a8, 1),
        "unit": "tok/s",
        "vs_baseline": round(tps_w4a8 / tps_bf16, 3),
        "w8_tps": round(tps_w8, 1),
        "w4_tps": round(tps_w4, 1),
        "bf16_tps": round(tps_bf16, 1),
    }))


if __name__ == "__main__":
    main()
