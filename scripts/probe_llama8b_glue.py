"""Round-4 probe: decompose the Llama-8B decode step's non-matmul cost.

Measures the full decode step at n_layers = 16 and 32 (same shapes,
random direct-quantized weights); the marginal per-layer cost includes
ALL per-layer work (4 matmul kernel launches + attention + KV appends +
norms + XLA glue). Comparing against the standalone per-matmul times
(probe_llama8b_parts.py: 158 us/layer at best blocks) isolates the glue.

RESULTS (v5e, 2026-08-21, batch 16):
  n_layers=32: 7.42 ms/step; n_layers=16: 3.92 ms/step
  -> marginal per layer 219 us vs ~158 us of standalone matmul time
     = ~61 us/layer of glue (KV appends, rope, norms, attention einsums,
       XLA fusion launches, and kernel rampup-in-context)
  -> layer-independent tail (lm_head + argmax + embed + scan) 0.42 ms
  Decomposition of the 7.42 ms step: 5.06 ms matmul + 1.95 ms glue +
  0.42 ms tail. Path to >=85% roofline (5.4 ms total): fuse the
  per-layer glue (attention + KV append as one Pallas kernel would
  target ~30-40 us/layer) — block tuning is exhausted
  (probe_r4_kernels2.py).
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses
import jax.numpy as jnp
import numpy as np

from aimet_tpu.models.transformer import TransformerConfig
from aimet_tpu.ops.kv_cache import init_quantized_kv_cache
from aimet_tpu.serving.quantized_llm import (quantized_forward,
                                             random_quantized_weights)

BATCH = 16
PREFILL = 32
STEPS0, STEPS1 = 4, 36
MAX_LEN = PREFILL + STEPS1 + 8


def step_time(cfg, reps=3):
    qw = random_quantized_weights(cfg, "w4a8")
    caches = [init_quantized_kv_cache(BATCH, MAX_LEN, cfg.n_kv_heads,
                                      cfg.head_dim)
              for _ in range(cfg.n_layers)]
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(0, cfg.vocab_size, (BATCH, PREFILL)),
                         jnp.int32)
    prefill = jax.jit(partial(quantized_forward, prefill=True, mode="w4a8"),
                      static_argnames=("cfg",))
    logits, caches = prefill(qw, cfg, tokens, caches, 0)
    tok0 = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)

    def make_loop(steps):
        def decode_loop(qw, tok0, caches, start):
            def body(carry, _):
                tok, caches, pos = carry
                logits, caches = quantized_forward(
                    qw, cfg, tok, caches, pos, prefill=False, mode="w4a8")
                nxt = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)
                return (nxt, caches, pos + 1), nxt
            _, toks = jax.lax.scan(body, (tok0, caches, start), None,
                                   length=steps)
            return toks
        return jax.jit(decode_loop)

    times = {}
    for steps in (STEPS0, STEPS1):
        fn = make_loop(steps)
        np.asarray(fn(qw, tok0, caches, jnp.int32(PREFILL))[0])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(qw, tok0, caches, jnp.int32(PREFILL))[0])
            best = min(best, time.perf_counter() - t0)
        times[steps] = best
    return max((times[STEPS1] - times[STEPS0]) / (STEPS1 - STEPS0), 1e-9)


def main():
    base = TransformerConfig.llama3_8b()
    t32 = step_time(base)
    print(f"n_layers=32: {t32*1e3:.2f} ms/step", flush=True)
    cfg16 = dataclasses.replace(base, n_layers=16)
    t16 = step_time(cfg16)
    print(f"n_layers=16: {t16*1e3:.2f} ms/step", flush=True)
    per_layer = (t32 - t16) / 16
    head = t32 - 32 * per_layer
    print(f"marginal per layer: {per_layer*1e6:.0f} us "
          f"(standalone matmul sum ~158 us -> glue "
          f"~{per_layer*1e6-158:.0f} us/layer)", flush=True)
    print(f"layer-independent tail (lm_head+argmax+embed+scan): "
          f"{head*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
