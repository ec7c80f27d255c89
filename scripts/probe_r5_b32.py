"""Round-5 probe: explain the batch-32 decode efficiency inversion
(VERDICT r4 weak #2: b32 = 54% of roofline vs b16 = 63%).

Hypothesis: serving._qmm switches the w4a8 decode path at m >= 32 from the
bandwidth-tuned weight-only kernel (matmul_w4_decode: bn=2048/4096, bk=512)
to the compute-oriented fusedq kernel (matmul_w4a8: block_n=256, in-kernel
activation quant) — batch-32 decode (M=32) lands exactly on that boundary
and pays a narrow-tile weight stream in a bandwidth-bound regime.

Measures, per Llama-8B projection shape, per-call time of both kernels at
M=16 and M=32, after pinning the session clock against a known bf16 matmul
(VERDICT r4 weak #3).
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

from aimet_tpu.ops.int_matmul import matmul_w4_decode, matmul_w4a8

REPS = 5
PIN_BEST_TFLOPS = 200.2  # best driver-recorded bf16_xla (BENCH_r03)


def slope(op, m, k_in, n_out, n0, n1, *operands):
    """Chain op n times with FULL-output feedback (scalar feedback produced
    >peak artifacts on int8 chains — tpu-chip-measurement memory).
    ``operands`` (e.g. the weight) are passed as jit ARGUMENTS — closed-over
    device arrays become HLO constants and large ones blow the remote-
    compile tunnel's 413 limit (lm_head = 268 MB)."""
    def fold(out):
        if n_out >= k_in and n_out % k_in == 0:
            return out.reshape(m, n_out // k_in, k_in).sum(1)
        reps = -(-k_in // n_out)
        return jnp.tile(out, (1, reps))[:, :k_in]

    def make(n):
        def run(x, *ops_):
            def body(i, acc):
                out = op(acc, *ops_)
                return acc + (fold(out) * 1e-9).astype(acc.dtype)
            return jax.lax.fori_loop(0, n, body, x)
        return jax.jit(run)

    times = {}
    for n in (n0, n1):
        f = make(n)
        x0 = jnp.ones((m, k_in), jnp.bfloat16)
        np.asarray(f(x0, *operands)[0:1, 0:1])
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(f(x0, *operands)[0:1, 0:1])
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return max((times[n1] - times[n0]) / (n1 - n0), 1e-9)


def pin_clock():
    K = N = 4096
    M = 1024
    w = (jnp.ones((K, N), jnp.bfloat16) * 0.001)
    t = slope(lambda a: jnp.dot(a, w, preferred_element_type=jnp.float32
                                ).astype(jnp.bfloat16)[:, :K],
              M, K, N, 16, 264)
    tf = 2.0 * M * K * N / t / 1e12
    frac = tf / PIN_BEST_TFLOPS
    print(f"# session clock: bf16 pin {tf:.1f} TF/s = {frac:.3f} of best",
          flush=True)
    return frac


def main():
    frac = pin_clock()
    key = jax.random.PRNGKey(0)
    shapes = [("wqkv", 4096, 6144), ("wo", 4096, 4096),
              ("gateup", 4096, 28672), ("down", 14336, 4096),
              ("lm_head", 4096, 131072)]
    for m in (16, 32):
        total = {"dec": 0.0, "fq": 0.0}
        for name, K, N in shapes:
            # on-device generation: host operands >264 MB hit the tunnel's
            # HTTP 413 limit (lm_head is 268 MB)
            key, sub = jax.random.split(key)
            wp = jax.random.randint(sub, (K // 2, N), -128, 128,
                                    dtype=jnp.int8)
            s = jnp.full((N,), 1e-4, jnp.float32)
            wbytes = K * N / 2
            # ~35us/call floor -> 3000+ extra calls would be overkill;
            # size chains for >=200ms of slope signal per measurement
            n0, n1 = 64, 64 + max(512, int(0.25 / (wbytes / 700e9)))
            t_dec = slope(lambda a, w: matmul_w4_decode(
                a, w, s, out_dtype=jnp.bfloat16), m, K, N, n0, n1, wp)
            t_fq = slope(lambda a, w: matmul_w4a8(
                a, w, s, out_dtype=jnp.bfloat16), m, K, N, n0, n1, wp)
            total["dec"] += t_dec * (32 if name != "lm_head" else 1)
            total["fq"] += t_fq * (32 if name != "lm_head" else 1)
            print(f"M={m} {name} K={K} N={N}: w4_decode {t_dec*1e6:.1f} us "
                  f"({wbytes/t_dec/1e9:.0f} GB/s) | w4a8_fusedq "
                  f"{t_fq*1e6:.1f} us ({wbytes/t_fq/1e9:.0f} GB/s)",
                  flush=True)
        print(f"M={m} model matmul totals: w4_decode {total['dec']*1e3:.2f} "
              f"ms | w4a8_fusedq {total['fq']*1e3:.2f} ms", flush=True)
    print(f"# session clock frac was {frac:.3f}", flush=True)


if __name__ == "__main__":
    main()
