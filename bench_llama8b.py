"""North-star benchmark: Llama-3-8B-class W4A8 + INT8-KV decode on one chip.

BASELINE.json north star + VERDICT r3 missing #1: the largest model the
framework had ever put on the chip was ~160M params. This runs the real
thing: 8.03B params (Llama-3-8B shapes: 128256 vocab, 4096 d_model, 32
layers, GQA 32/8, 14336 d_ff), INT4 weights (split-half packed, per-channel
scales), INT8 KV cache, batch greedy decode inside one jit.

bf16 is IMPOSSIBLE at this size on one v5e chip: 16.1 GB of weights alone
exceeds the 16 GB HBM before a single activation — quantization is not an
optimization here, it is the only way the model runs at all. INT4 weights
are 4.28 GB (3.76 GB projections+lm_head packed + 1.05 GB bf16 embed).

Weights are random (this is a throughput claim, not an accuracy claim);
the compute path is the production one: serving/quantized_llm.py forward
with ops/int_matmul.py kernels (decode -> weight-only w4 Pallas kernel,
prefill -> int8-MXU w4a8 fusedq) and ops/kv_cache.py INT8 KV.

Reports tokens/s and the fraction of the v5e HBM roofline (~819 GB/s) the
decode step sustains for its weight+KV traffic.

Roofline note (r5 analysis): after the whole-layer single-pallas-call
step (ops/decode_layer_sol.py) removed all per-layer XLA glue, batch 16
is MXU-COMPUTE-bound, not HBM-bound: the layer's ~7 GFLOP of M=16 dots
run at ~40 TF/s effective (1/8 of the MXU's 128 rows populated) ≈ 175
us/layer vs 136 us of pure DMA — consistent with batch 32 decoding 2x
the tokens at nearly the same step time (6.33 vs 6.59 ms, 74% vs 72% of
the HBM roofline). The residual HBM-roofline gap at b16 is therefore a
compute ceiling, not scheduling slack; the next lever would be int8-MXU
dots (2x peak), which probed SLOWER at decode M for these shapes
(commit 6b40828: fusedq 7.57 vs weight-only 5.92 ms model-matmul total).

Prints one JSON line:
  {"metric": "llama8b_w4a8_decode_tok_s", "value": ..., "unit": "tok/s",
   "roofline_frac": ..., "gbps": ...}
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

from aimet_tpu.models.transformer import TransformerConfig
from aimet_tpu.ops.kv_cache import init_quantized_kv_cache
from aimet_tpu.serving.quantized_llm import (
    quantized_forward,
    quantized_weight_bytes,
    random_quantized_weights,
)

HBM_PEAK_GBPS = 819.0          # v5e
BATCH = 16
PREFILL = 32
STEPS0, STEPS1 = 4, 52         # ~5 ms/step floor -> 48 extra steps ~ 240 ms
                               # (>= 200 ms of slope signal, ADVICE r4 #5)
MAX_LEN = PREFILL + STEPS1 + 12          # multiple of 8: the fused
                                         # attention kernel needs S % 8 == 0
MODE = "w4a8"


def run(batch=BATCH, mode=MODE, reps=4, quiet=False):
    cfg = TransformerConfig.llama3_8b()
    qw = random_quantized_weights(cfg, mode)
    w_bytes = quantized_weight_bytes(qw)
    embed_bytes = qw["embed"].size * 2
    if not quiet:
        print(f"# llama8b: quantized weight tree = {w_bytes/1e9:.2f} GB "
              f"(incl. {embed_bytes/1e9:.2f} GB bf16 embed)", file=sys.stderr)

    caches = [init_quantized_kv_cache(batch, MAX_LEN, cfg.n_kv_heads,
                                      cfg.head_dim)
              for _ in range(cfg.n_layers)]
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(0, cfg.vocab_size, (batch, PREFILL)),
                         jnp.int32)

    t0 = time.perf_counter()
    prefill = jax.jit(partial(quantized_forward, prefill=True, mode=mode),
                      static_argnames=("cfg",))
    logits, caches = prefill(qw, cfg, tokens, caches, 0)
    tok0 = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)
    np.asarray(tok0[0:1])
    t_prefill = time.perf_counter() - t0
    # flat (B, S, KH*D) carry: in-place aliased KV append in the fused
    # attention kernel (ops/kv_cache.flatten_kv_caches docstring)
    from aimet_tpu.ops.kv_cache import flatten_kv_caches
    caches = flatten_kv_caches(caches)

    def make_loop(steps):
        def decode_loop(qw, tok0, caches, start):
            def body(carry, _):
                tok, caches, pos = carry
                logits, caches = quantized_forward(
                    qw, cfg, tok, caches, pos, prefill=False, mode=mode)
                nxt = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)
                return (nxt, caches, pos + 1), nxt
            (_, caches, _), toks = jax.lax.scan(
                body, (tok0, caches, start), None, length=steps)
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
    t_step = max((times[STEPS1] - times[STEPS0]) / (STEPS1 - STEPS0), 1e-9)

    # Decode-step HBM traffic: every projection weight byte + scales are
    # read once; the INT8 KV cache is read once per step (k+v) at the
    # average decode length; embed gathers `batch` rows.
    avg_len = PREFILL + (STEPS0 + STEPS1) / 2
    kv_bytes = (2 * batch * avg_len * cfg.n_kv_heads * cfg.head_dim
                * cfg.n_layers)
    step_bytes = (w_bytes - embed_bytes) + kv_bytes + batch * cfg.d_model * 2
    gbps = step_bytes / t_step / 1e9
    out = {
        "tok_s": batch / t_step,
        "step_ms": t_step * 1e3,
        "gbps": gbps,
        "roofline_frac": gbps / HBM_PEAK_GBPS,
        "prefill_s_first": t_prefill,
        "weight_gb": w_bytes / 1e9,
        "batch": batch,
        "mode": mode,
    }
    if not quiet:
        print(f"# llama8b decode: {out['tok_s']:.0f} tok/s  "
              f"{out['step_ms']:.2f} ms/step  {gbps:.0f} GB/s "
              f"({100*out['roofline_frac']:.0f}% of HBM roofline)",
              file=sys.stderr)
    return out


def prefill_mfu(batch=8, seq=512, reps=3, quiet=False):
    """Whole-model steady-state prefill throughput (VERDICT r4 next #4):
    batch*seq >= 4k tokens, compute-bound, on the int8-MXU w4a8 path.

    Gap analysis (r5, 53% of int8 peak at 8x512): the w4a8 fusedq kernel
    microbenches at ~390 TF/s (99% of boost int8 peak) at M=1024; the
    whole model sustains ~210. The difference is (a) unfused prefill
    attention — XLA materializes (B, H, S, S) f32 scores+probs, ~17 GB
    of HBM traffic per forward at these shapes (~7% of step time alone),
    (b) per-layer norms/rope/KV-quantize glue between the quantized
    matmuls, and (c) per-row activation quantize on every matmul input.
    Larger token counts would amortize (b) but 16x512 already OOMs on
    the 16 GB chip (the (tokens, 128256) f32 logits buffer); a prefill
    flash-attention kernel is the next lever and is future work.
    Slope method: a python chain of prefills (caches threaded through for
    ordering) dispatches asynchronously; only the final fetch syncs, so
    t(n1)-t(n0) is pure device time. Reports TFLOP/s over the model's
    matmul FLOPs and the fraction of the v5e int8 MXU peak."""
    INT8_PEAK_TFLOPS = 394.0
    cfg = TransformerConfig.llama3_8b()
    qw = random_quantized_weights(cfg, MODE)
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(0, cfg.vocab_size, (batch, seq)),
                         jnp.int32)
    caches = [init_quantized_kv_cache(batch, seq + 8, cfg.n_kv_heads,
                                      cfg.head_dim)
              for _ in range(cfg.n_layers)]
    prefill = jax.jit(partial(quantized_forward, prefill=True, mode=MODE),
                      static_argnames=("cfg",))

    def chain(n):
        cs = caches
        logits = None
        for _ in range(n):
            logits, cs = prefill(qw, cfg, tokens, cs, 0)
        return logits

    np.asarray(chain(1)[0:1, 0:1, 0:1])          # compile + warm
    times = {}
    for n in (1, 4):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(chain(n)[0:1, 0:1, 0:1])
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    t = max((times[4] - times[1]) / 3, 1e-9)

    D, H, KH, hd, F = (cfg.d_model, cfg.n_heads, cfg.n_kv_heads,
                       cfg.head_dim, cfg.d_ff)
    per_tok = 2 * cfg.n_layers * (D * (H + 2 * KH) * hd + H * hd * D
                                  + 3 * D * F)
    per_tok += 2 * D * cfg.vocab_size                 # lm_head
    # attention score+context FLOPs (quadratic term, avg seq/2)
    per_tok += 2 * cfg.n_layers * 2 * H * hd * (seq / 2)
    flops = per_tok * batch * seq
    tflops = flops / t / 1e12
    out = {"prefill_tflops": round(tflops, 1),
           "prefill_frac_int8_peak": round(tflops / INT8_PEAK_TFLOPS, 3),
           "prefill_tokens": batch * seq,
           "prefill_s": round(t, 3)}
    if not quiet:
        print(f"# llama8b prefill: {batch}x{seq} tokens in {t*1e3:.0f} ms "
              f"= {tflops:.0f} TFLOP/s "
              f"({100*out['prefill_frac_int8_peak']:.0f}% of int8 peak)",
              file=sys.stderr)
    return out


def continuous_batching(num_slots=16, step_chunk=8, n_requests=48,
                        prompt_len=32, quiet=False):
    """8B continuous-batching throughput (VERDICT r4 next #7): the
    ContinuousBatcher + C++ scheduler over the 8B quantized weights with
    mixed output lengths. Reports generated tokens/s wall-clock and mean
    slot utilization (active-slot-steps / total-slot-steps)."""
    from aimet_tpu.serving.batcher import ContinuousBatcher
    from aimet_tpu.serving.quantized_llm import QuantizedLLM

    cfg = TransformerConfig.llama3_8b()
    qw = random_quantized_weights(cfg, MODE)
    llm = QuantizedLLM.from_quantized(qw, cfg, MODE,
                                      max_len=prompt_len + 160)
    b = ContinuousBatcher(llm, num_slots=num_slots, step_chunk=step_chunk)
    rng = np.random.RandomState(0)
    reqs = []
    lens = rng.randint(32, 129, n_requests)
    for i in range(n_requests):
        reqs.append(b.submit(list(rng.randint(0, cfg.vocab_size,
                                              prompt_len)),
                             max_new_tokens=int(lens[i])))
    # warm the compiles outside the timed region: the batcher admits in
    # power-of-two wave buckets (serving/batcher._wave_quota), so
    # precompile every bucket's admission graph (production engines AOT-
    # warm their shape buckets the same way; at 8B each whole-graph
    # compile costs tens of seconds and would otherwise land mid-run —
    # the first driver capture read 25 tok/s, ~all of it compile time),
    # then one engine step warms the first wave + decode chunk
    b.warm_admission(prompt_len=prompt_len, pipelined=True)
    t0 = time.perf_counter()
    # pipelined engine: chunk n+1 dispatched from the device-side carry
    # BEFORE chunk n's tokens are fetched, hiding the ~200 ms relay
    # round-trip behind device compute (serving/batcher.run_pipelined)
    steps = b.run_pipelined(max_steps=4000)
    dt = time.perf_counter() - t0
    assert all(r.done for r in reqs), "continuous batching did not drain"
    toks = sum(len(r.generated) for r in reqs)
    tok_s = toks / dt
    slot_steps = steps * step_chunk * num_slots
    util = toks / max(slot_steps, 1)
    out = {"cb_tok_s": round(tok_s, 1), "cb_slot_util": round(util, 3),
           "cb_requests": n_requests, "cb_slots": num_slots,
           "cb_chunk": step_chunk}
    if not quiet:
        print(f"# llama8b continuous batching: {tok_s:.0f} tok/s "
              f"({n_requests} reqs, {num_slots} slots, chunk {step_chunk}, "
              f"util {util:.2f})", file=sys.stderr)
    return out


def main():
    out = run()
    print(json.dumps({
        "metric": "llama8b_w4a8_decode_tok_s",
        "value": round(out["tok_s"], 1),
        "unit": "tok/s",
        "roofline_frac": round(out["roofline_frac"], 3),
        "gbps": round(out["gbps"], 1),
        "step_ms": round(out["step_ms"], 2),
        "weight_gb": round(out["weight_gb"], 2),
        "batch": out["batch"],
        "bf16_possible": False,
    }))


if __name__ == "__main__":
    main()
