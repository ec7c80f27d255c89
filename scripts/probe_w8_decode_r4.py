"""Round-4 probe: w8 decode (M=16, K=N=4096) block sweep.

BENCH_r02 recorded w8_gbps=701.7 with (16,1024,1024); BENCH_r03 recorded
629.6 with identical kernel code (no commit between r2 and r3 touched
matmul_w8's decode path). This probe (a) sanity-checks the chip against
the known w4 decode number first (CLAUDE.md throttle check), then
(b) re-measures the r2/r3 config and sweeps alternatives.
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

from aimet_tpu.ops.int_matmul import (matmul_w4, matmul_w8,
                                      quantize_weight_int4,
                                      quantize_weight_per_channel)

M, K, N = 16, 4096, 4096
N0, N1 = 256, 6400
REPS = 6


def slope(op):
    def make(n):
        def body(i, acc):
            return op(acc).astype(jnp.bfloat16)
        return jax.jit(lambda x: jax.lax.fori_loop(0, n, body, x))
    times = {}
    for n in (N0, N1):
        f = make(n)
        x0 = jnp.ones((M, K), jnp.bfloat16)
        np.asarray(f(x0)[0:1, 0:1])
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(f(x0)[0:1, 0:1])
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return max((times[N1] - times[N0]) / (N1 - N0), 1e-9)


def main():
    rng = np.random.RandomState(0)
    w = jnp.asarray((rng.randn(K, N) * 0.05).astype(np.float32))
    wq8, s8 = quantize_weight_per_channel(w)
    s8 = s8 * 0.01
    wp4, s4 = quantize_weight_int4(w)
    s4 = s4 * 0.01

    # sanity: w4 decode at its bench blocks should be ~500-560 GB/s
    t = slope(lambda a: matmul_w4(a, wp4, s4, block_m=16, block_n=1024,
                                  block_k=1024, out_dtype=jnp.bfloat16))
    w4_gbps = K * N / 2 / t / 1e9
    print(f"sanity w4 (16,1024,1024): {w4_gbps:.1f} GB/s", file=sys.stderr)
    if w4_gbps < 350:
        print("CHIP LOOKS THROTTLED — numbers below are unreliable",
              file=sys.stderr)

    for bm, bn, bk in [(16, 1024, 1024), (16, 2048, 1024), (16, 512, 2048),
                       (16, 1024, 2048), (16, 2048, 2048), (16, 4096, 1024),
                       (16, 512, 4096), (16, 1024, 4096), (16, 2048, 4096),
                       (32, 1024, 1024), (8, 1024, 1024), (16, 4096, 512)]:
        try:
            t = slope(lambda a, bm=bm, bn=bn, bk=bk: matmul_w8(
                a, wq8, s8, block_m=bm, block_n=bn, block_k=bk,
                out_dtype=jnp.bfloat16))
            gbps = K * N / t / 1e9
            print(f"w8 ({bm},{bn},{bk}): {gbps:.1f} GB/s  ({t*1e6:.1f} us)",
                  file=sys.stderr)
        except Exception as e:
            print(f"w8 ({bm},{bn},{bk}): FAILED {type(e).__name__}",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
