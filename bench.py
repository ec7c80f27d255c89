"""Benchmark: fused dequant-matmul Pallas kernels on the real TPU chip.

Headline metric: INT8xINT8 fused dequant-matmul throughput (TFLOP/s) vs the
XLA bf16 matmul baseline at the same shape (vs_baseline = speedup).

Methodology: the axon relay adds ~200 ms fixed round-trip latency per fetch,
so each kernel is timed by the slope method — a data-dependent chain of n
invocations inside one jit (lax.fori_loop), timed at two n values, with a
1-element fetch forcing completion.  per-call time = (T(n1) - T(n0))/(n1-n0).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

M, K, N = 1024, 4096, 4096
# the slope signal (T(N1)-T(N0)) must dwarf relay jitter (tens of ms):
# ~250 chained matmuls ~= 200ms of pure device time per measurement
N0, N1 = 16, 264
REPS = 6

# Session-health pin (VERDICT r4 weak #3): the chip's effective clock
# drifts ~10% across sessions and occasionally throttles to ~1/30
# (CLAUDE.md), so absolute kernel numbers are hostage to session state.
# A fixed bf16 XLA matmul (no code of ours) is timed at bench start and
# end; its best observed rate across rounds defines frac=1.0. All
# headline metrics are reported raw AND clock-normalized (raw/frac), and
# the cross-round regression guard runs on the normalized values.
PIN_BEST_TFLOPS = 219.8        # best observed (r5 session at full clock)
THROTTLE_FRAC = 0.92           # below this: known throttle mode -> retry


def slope_time(make_chain):
    """make_chain(n) -> jitted fn(x) running the op n times chained."""
    times = {}
    for n in (N0, N1):
        f = make_chain(n)
        x0 = jnp.ones((M, K), jnp.bfloat16)
        np.asarray(f(x0)[0:1, 0:1])  # compile + warm
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(f(x0)[0:1, 0:1])
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return max((times[N1] - times[N0]) / (N1 - N0), 1e-9)


def parity_check():
    """On-chip kernel-vs-XLA parity gates (VERDICT r1 weak #6: the Pallas
    kernels are CI-tested only in interpret mode; this compiles them through
    Mosaic on the real chip before any timing is recorded). Raises on
    mismatch."""
    from aimet_tpu.ops.int_matmul import (
        matmul_w4, matmul_w4_grouped, matmul_w4_xla, matmul_w8, matmul_w8_xla,
        matmul_w8a8, matmul_w8a8_xla, quantize_weight_int4,
        quantize_weight_int4_grouped, quantize_weight_per_channel)

    rng = np.random.RandomState(3)
    m, k, n = 16, 256, 256
    blk = dict(block_m=8, block_n=128, block_k=128)
    x = jnp.asarray(rng.randn(m, k).astype(np.float32))
    w = jnp.asarray(rng.randn(k, n).astype(np.float32) * 0.1)
    wq8, s8 = quantize_weight_per_channel(w)
    wp4, s4 = quantize_weight_int4(w)
    wp4g, s4g = quantize_weight_int4_grouped(w, group_size=128)

    from aimet_tpu.ops.int_matmul import (matmul_q8, matmul_w4a8,
                                          matmul_w4a8_xla,
                                          matmul_w8a8_staticq,
                                          quantize_activation_per_row)
    from aimet_tpu.quantization.affine import compute_encoding_from_min_max

    xq, sxr = quantize_activation_per_row(x)
    bias = jnp.asarray(rng.randn(n).astype(np.float32))
    enc = compute_encoding_from_min_max(
        jnp.float32(-4.0), jnp.float32(4.0), 8, False, False, False)
    dx = jnp.asarray(enc.delta, jnp.float32).reshape(())
    off = jnp.asarray(enc.offset, jnp.float32).reshape(())
    q_s = jnp.clip(jnp.round(x / dx - off), 0.0, float(enc.num_steps))
    xs_i8 = (q_s - 128.0).astype(jnp.int8)
    acc_s = jax.lax.dot_general(xs_i8, wq8, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
    colsum = wq8.astype(jnp.float32).sum(axis=0)
    cvec = (128.0 + off) * colsum * dx * s8
    staticq_ref = acc_s.astype(jnp.float32) * dx * s8[None, :] + cvec[None, :]
    checks = [
        ("w8", matmul_w8(x, wq8, s8, **blk), matmul_w8_xla(x, wq8, s8), 1e-4),
        ("w8a8", matmul_w8a8(x, wq8, s8, **blk),
         matmul_w8a8_xla(x, wq8, s8), 1e-3),
        # w4 tolerance: on-chip, BOTH sides compute f32 dots via MXU bf16
        # decomposition (~1.5e-3 from exact) and the biased-plane rowsum
        # correction adds cancellation noise (~3.5e-3 from exact) — all far
        # below the int4 quantization error itself (~1e-1). Interpret-mode
        # unit tests pin the math exactly.
        ("w4", matmul_w4(x, wp4, s4, **blk), matmul_w4_xla(x, wp4, s4), 1e-2),
        ("w4a8", matmul_w4a8(x, wp4, s4),
         matmul_w4a8_xla(x, wp4, s4), 1e-3),
        ("q8_bias", matmul_q8(xq, sxr, wq8, s8, bias, **blk),
         matmul_q8(xq, sxr, wq8, s8, **blk) + bias[None, :], 1e-4),
        ("w8a8_staticq", matmul_w8a8_staticq(
            x, wq8, dx * s8, cvec, inv_delta=float(1.0 / dx),
            offset=float(off), num_steps=float(enc.num_steps),
            block_m=32, block_n=128, out_dtype=jnp.float32),
         staticq_ref, 1e-2),
    ]
    for name, got, ref, tol in checks:
        got, ref = np.asarray(got), np.asarray(ref)
        err = np.max(np.abs(got - ref)) / max(np.max(np.abs(ref)), 1e-9)
        if not np.isfinite(got).all() or err > tol:
            raise AssertionError(
                f"on-chip parity FAILED for {name}: rel err {err:.2e}")
    # grouped-int4: gate against the fp matmul (grouped dequant has no
    # direct XLA twin here) at int4 resolution
    got = np.asarray(matmul_w4_grouped(x, wp4g, s4g, group_size=128, **blk))
    fp = np.asarray(x) @ np.asarray(w)
    rel = np.mean((got - fp) ** 2) / np.mean(fp ** 2)
    if not rel < 0.05:
        raise AssertionError(f"on-chip parity FAILED for w4_grouped: {rel}")
    print("# on-chip kernel parity: OK", file=sys.stderr)


def measure_session_clock(retries: int = 1):
    """TFLOP/s of the pinned bf16 matmul -> (pin_tflops, clock_frac).
    Retries once after a pause when the chip looks throttled."""
    w_pin = (jnp.ones((K, N), jnp.bfloat16) * 0.001)

    def pin_chain(n):
        def body(i, acc):
            return jnp.dot(acc, w_pin, preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)[:, :K]
        return jax.jit(lambda x: jax.lax.fori_loop(0, n, body, x))

    best = 0.0
    for attempt in range(retries + 1):
        t = slope_time(pin_chain)
        tf = 2.0 * M * K * N / t / 1e12
        best = max(best, tf)
        if best / PIN_BEST_TFLOPS >= THROTTLE_FRAC:
            break
        if attempt < retries:
            print(f"# session clock LOW ({best:.1f} TF/s = "
                  f"{best/PIN_BEST_TFLOPS:.3f}) - retrying pin once",
                  file=sys.stderr)
            time.sleep(20)
    return best, best / PIN_BEST_TFLOPS


def _load_previous_round():
    """Most recent driver-recorded BENCH_r*.json (they are committed
    in-repo), parsed, for the cross-round regression guard (VERDICT r3
    weak #1: w8 decode dropped 10% between rounds and nothing flagged
    it)."""
    import glob
    import os
    import re
    best = None
    for path in glob.glob(os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        n = int(m.group(1))
        if best is None or n > best[0]:
            best = (n, path)
    if best is None:
        return None, None
    try:
        with open(best[1]) as f:
            return best[0], json.load(f).get("parsed")
    except Exception:
        return None, None


def _flatten_metrics(d, prefix=""):
    out = {}
    for k, v in (d or {}).items():
        if isinstance(v, dict):
            out.update(_flatten_metrics(v, prefix + k + "."))
        elif isinstance(v, (int, float)) and not isinstance(v, bool):
            out[prefix + k] = float(v)
    return out


def regression_guard(current: dict, drop_tol: float = 0.05):
    """Warn-hard (nonzero-prefixed stderr lines) when any kernel metric
    fell more than ``drop_tol`` vs the previous round's driver record,
    comparing CLOCK-NORMALIZED values (each side divided by its recorded
    session clock_frac; rounds before r5 carry none and count as 1.0).
    Normalization is what lets the tolerance sit at 5% instead of the 8%
    that raw cross-session drift forced (VERDICT r4 weak #3). Ratio
    metrics (vs_*, *_frac) and latencies are excluded."""
    prev_round, prev = _load_previous_round()
    if not prev:
        return
    prev_frac = float((prev.get("session") or {}).get("clock_frac") or 1.0)
    cur_frac = float((current.get("session") or {}).get("clock_frac") or 1.0)
    prev_flat = _flatten_metrics(prev)
    cur_flat = _flatten_metrics(current)
    for key, cur_v in cur_flat.items():
        if key.endswith(("_us", "_ms", "step_ms")) or "_vs_" in key \
                or key.startswith(("vs_", "session.", "normalized.")) \
                or "frac" in key:
            continue
        prev_v = prev_flat.get(key)
        if not (prev_v and prev_v > 0):
            continue
        cur_n = cur_v / max(cur_frac, 1e-9)
        prev_n = prev_v / max(prev_frac, 1e-9)
        if cur_n < (1 - drop_tol) * prev_n:
            print(f"!! REGRESSION vs BENCH_r{prev_round:02d} (normalized): "
                  f"{key} {prev_n:.1f} -> {cur_n:.1f} "
                  f"({100 * (cur_n / prev_n - 1):.1f}%)", file=sys.stderr)


def main():
    from aimet_tpu.ops.int_matmul import (
        matmul_w4,
        matmul_w4_grouped,
        matmul_w4a8,
        matmul_w8,
        matmul_w8a8,
        quantize_weight_int4,
        quantize_weight_int4_grouped,
        quantize_weight_per_channel,
    )

    parity_check()
    pin_start, frac_start = measure_session_clock()
    print(f"# session clock: pin {pin_start:.1f} TF/s = {frac_start:.3f} "
          f"of best-known {PIN_BEST_TFLOPS}", file=sys.stderr)

    rng = np.random.RandomState(0)
    w = jnp.asarray((rng.randn(K, N) * 0.05).astype(np.float32))
    w_bf = (w * 0.01).astype(jnp.bfloat16)   # keep the chain numerically tame
    wq8, s8 = quantize_weight_per_channel(w)
    s8 = s8 * 0.01
    wp4, s4 = quantize_weight_int4(w)
    s4 = s4 * 0.01

    flops = 2.0 * M * K * N

    def chain(op):
        def make(n):
            def body(i, acc):
                return op(acc).astype(jnp.bfloat16)
            return jax.jit(lambda x: jax.lax.fori_loop(0, n, body, x))
        return make

    wp4g, s4g = quantize_weight_int4_grouped(w, group_size=128)
    s4g = s4g * 0.01

    # static-encoding w8a8: the DEPLOYMENT path (lowered models quantize
    # activations with frozen calibration scales — no per-row max reduce,
    # the quantize fuses into the kernel's input DMA). This is the number
    # a lowered model's matmuls actually run at. bf16 activations go
    # straight into the staticq kernel (an f32 pre-cast would add a 25MB
    # HBM round-trip no real serving path pays).
    from aimet_tpu.quantization.affine import compute_encoding_from_min_max
    from aimet_tpu.quantsim.lowering import _make_static_q8_mm

    enc_in = compute_encoding_from_min_max(
        jnp.float32(-4.0), jnp.float32(4.0), 8, False, False, False)
    static_mm = _make_static_q8_mm(enc_in, wq8, s8)

    # the chip's clock drifts over minutes (CLAUDE.md): measure the whole
    # kernel list TWICE interleaved and keep each kernel's best slope, so
    # a thermal dip doesn't land on one kernel's headline
    kernel_ops = [
        ("static", lambda a: static_mm(a)[:, :K]),
        ("bf16", lambda a: jnp.dot(a, w_bf,
                                   preferred_element_type=jnp.float32)),
        ("w8a8", lambda a: matmul_w8a8(a, wq8, s8, out_dtype=jnp.bfloat16)),
        # W4A8 fusedq: the execution target of the reference's AdaRound
        # W4A8 headline (README.md:155-173) — int4 weights, int8 MXU path
        ("w4a8", lambda a: matmul_w4a8(a, wp4, s4, out_dtype=jnp.bfloat16)),
        ("w8", lambda a: matmul_w8(a, wq8, s8, out_dtype=jnp.bfloat16)),
        ("w4", lambda a: matmul_w4(a, wp4, s4, out_dtype=jnp.bfloat16)),
        ("w4g", lambda a: matmul_w4_grouped(a, wp4g, s4g, group_size=128,
                                            out_dtype=jnp.bfloat16)),
    ]
    t_best = {}
    for _pass in range(2):
        for name, op in kernel_ops:
            t = slope_time(chain(op))
            t_best[name] = min(t, t_best.get(name, float("inf")))
    t_bf16, t_w8a8, t_w4a8, t_w8, t_w4, t_w4g, t_static = (
        t_best[k] for k in ("bf16", "w8a8", "w4a8", "w8", "w4", "w4g",
                            "static"))

    tflops = lambda t: flops / t / 1e12
    results = {"bf16_xla": tflops(t_bf16), "w8a8": tflops(t_w8a8),
               "w4a8": tflops(t_w4a8), "w8a8_static": tflops(t_static),
               "w8": tflops(t_w8), "w4": tflops(t_w4),
               "w4_grouped": tflops(t_w4g)}
    print("# all results (TFLOP/s): " + json.dumps(
        {k: round(v, 2) for k, v in results.items()}), file=sys.stderr)

    # --- decode shape (M=16): weight-only kernels' home turf — report the
    # HBM-bandwidth-bound speedup vs bf16 (VERDICT r1 #3: the bandwidth
    # claim must be driver-recorded, not just bench_serving)
    m_dec = 16
    # bf16 decode matmul ~40us/call: chain thousands for >=200ms signal
    dec_n0, dec_n1 = 256, 6400

    def dec_slope(make_chain):
        times = {}
        for n in (dec_n0, dec_n1):
            f = make_chain(n)
            x0 = jnp.ones((m_dec, K), jnp.bfloat16)
            np.asarray(f(x0)[0:1, 0:1])
            best = float("inf")
            for _ in range(REPS):
                t0 = time.perf_counter()
                np.asarray(f(x0)[0:1, 0:1])
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        return max((times[dec_n1] - times[dec_n0]) / (dec_n1 - dec_n0), 1e-9)

    dec_ops = [
        ("bf16", lambda a: jnp.dot(a, w_bf,
                                   preferred_element_type=jnp.float32)),
        ("w8", lambda a: matmul_w8(a, wq8, s8, block_m=16, block_n=1024,
                                   block_k=1024, out_dtype=jnp.bfloat16)),
        ("w4", lambda a: matmul_w4(a, wp4, s4, block_m=16, block_n=1024,
                                   block_k=1024, out_dtype=jnp.bfloat16)),
        # grouped decode blocks swept on-chip (scripts/probe_w4g_decode.py)
        ("w4g", lambda a: matmul_w4_grouped(
            a, wp4g, s4g, group_size=128, block_m=16, block_n=2048,
            block_k=1024, out_dtype=jnp.bfloat16)),
    ]
    d_best = {}
    for _pass in range(2):                 # interleave vs clock drift
        for name, op in dec_ops:
            t = dec_slope(chain(op))
            d_best[name] = min(t, d_best.get(name, float("inf")))
    t_dbf, t_dw8, t_dw4, t_dw4g = (
        d_best[k] for k in ("bf16", "w8", "w4", "w4g"))
    decode = {
        "bf16_us": round(t_dbf * 1e6, 1),
        "w8_gbps": round(K * N / t_dw8 / 1e9, 1),
        "w8_vs_bf16": round(t_dbf / t_dw8, 2),
        "w4_gbps": round(K * N / 2 / t_dw4 / 1e9, 1),
        "w4_vs_bf16": round(t_dbf / t_dw4, 2),
        "w4g_vs_bf16": round(t_dbf / t_dw4g, 2),
    }
    print("# decode (M=16): " + json.dumps(decode), file=sys.stderr)

    # --- serving decode tokens/s (VERDICT r2 weak #5: driver-recorded,
    # not just bench_serving prose): ~0.9B transformer, w8 weight-only +
    # INT8 KV cache vs the bf16 flax baseline
    import bench_serving as bs
    cfg_s = bs.TransformerConfig(vocab_size=32000, d_model=2048,
                                 n_layers=16, n_heads=16, n_kv_heads=8,
                                 d_ff=5504)
    model_s = bs.Transformer(cfg_s)
    vars_s = model_s.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 8), jnp.int32))
    tps_bf16 = bs.bench_bf16(cfg_s, vars_s)
    tps_w8 = bs.bench_quantized(cfg_s, vars_s, "w8")
    # w4a8 serving mode: driver-captured (VERDICT r3 weak #2 — the r3
    # headline lived only in a commit message)
    tps_w4a8 = bs.bench_quantized(cfg_s, vars_s, "w4a8")
    serving = {"bf16_tps": round(tps_bf16, 1), "w8_tps": round(tps_w8, 1),
               "w4a8_tps": round(tps_w4a8, 1),
               "w8_vs_bf16": round(tps_w8 / tps_bf16, 2),
               "w4a8_vs_bf16": round(tps_w4a8 / tps_bf16, 2)}
    print("# serving decode: " + json.dumps(serving), file=sys.stderr)
    if tps_w8 < 1.2 * tps_bf16:
        raise AssertionError(
            f"w8 serving regression: {tps_w8:.0f} tok/s < 1.2x bf16 "
            f"({tps_bf16:.0f})")
    if tps_w4a8 < 1.2 * tps_bf16:
        raise AssertionError(
            f"w4a8 serving regression: {tps_w4a8:.0f} tok/s < 1.2x bf16 "
            f"({tps_bf16:.0f})")

    # --- north star: Llama-3-8B-class W4A8 + INT8-KV decode on this chip
    # (bf16 CANNOT run at this size: 16.1 GB of weights > 16 GB HBM).
    # Free the 0.9B f32 tree + kernel operands first: the 8B INT4 tree is
    # 4.3 GB and must not share HBM with a 3.6 GB float model. The op
    # lists' lambdas (and static_mm) close over the weight arrays, so they
    # must be dropped too or the buffers stay resident.
    del vars_s, model_s, w, w_bf, wq8, wp4, wp4g, kernel_ops, dec_ops, \
        static_mm
    import bench_llama8b
    l8b = bench_llama8b.run(quiet=False)
    # throughput-optimal batch (amortizes the per-step glue): tok/s
    # headline at batch 32, latency/roofline headline at batch 16
    l8b32 = bench_llama8b.run(batch=32, reps=2, quiet=False)
    llama8b = {"tok_s": round(l8b["tok_s"], 1),
               "gbps": round(l8b["gbps"], 1),
               "roofline_frac": round(l8b["roofline_frac"], 3),
               "step_ms": round(l8b["step_ms"], 2),
               "weight_gb": round(l8b["weight_gb"], 2),
               "batch": l8b["batch"],
               "tok_s_b32": round(l8b32["tok_s"], 1),
               "roofline_frac_b32": round(l8b32["roofline_frac"], 3),
               "bf16_possible": False}
    # whole-model prefill MFU (compute-bound half of the serving cost,
    # VERDICT r4 next #4) + continuous-batching throughput (next #7)
    llama8b.update(bench_llama8b.prefill_mfu(quiet=False))
    llama8b.update(bench_llama8b.continuous_batching(quiet=False))

    # re-pin at the end: drift DURING the run is real (a 1.010 start fell
    # to 0.908 within 10 min in the r5 session); the session's best
    # observed pin is the honest denominator for normalization
    pin_end, frac_end = measure_session_clock(retries=0)
    frac = max(frac_start, frac_end)
    session = {"pin_tflops_start": round(pin_start, 1),
               "pin_tflops_end": round(pin_end, 1),
               "clock_frac": round(frac, 3),
               "pin_best_ref": PIN_BEST_TFLOPS}
    print(f"# session clock: start {frac_start:.3f} / end {frac_end:.3f} "
          f"-> normalizing by {frac:.3f}", file=sys.stderr)
    norm = lambda v: round(v / max(frac, 1e-9), 1)
    normalized = {
        "bf16_xla_tflops": norm(results["bf16_xla"]),
        "w8a8_tflops": norm(results["w8a8"]),
        "w4a8_tflops": norm(results["w4a8"]),
        "w8_dec_gbps": norm(decode["w8_gbps"]),
        "w4_dec_gbps": norm(decode["w4_gbps"]),
        "llama8b_gbps": norm(llama8b["gbps"]),
        "llama8b_tok_s": norm(llama8b["tok_s"]),
    }
    payload = {
        "metric": "fused_dequant_matmul_w8a8_tflops",
        "value": round(results["w8a8"], 2),
        "unit": "TFLOP/s",
        "vs_baseline": round(results["w8a8"] / results["bf16_xla"], 3),
        "w4a8_tflops": round(results["w4a8"], 2),
        "static_w8a8_tflops": round(results["w8a8_static"], 2),
        "decode_m16": decode,
        "serving_decode": serving,
        "llama8b_w4a8": llama8b,
        "session": session,
        "normalized": normalized,
    }
    regression_guard(payload)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
