"""Follow-up: w8a8 around 1024x1024x512 + first w4a8 timings."""
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from aimet_tpu.ops.int_matmul import (
    matmul_w8a8, matmul_w4a8, quantize_weight_per_channel,
    quantize_weight_int4)

M, K, N = 1024, 4096, 4096
N0, N1 = 16, 264
REPS = 6


def slope_time(make_chain):
    times = {}
    for n in (N0, N1):
        f = make_chain(n)
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
    flops = 2.0 * M * K * N
    out = {}

    def run(tag, op):
        def make(n):
            def body(i, acc):
                return op(acc).astype(jnp.bfloat16)
            return jax.jit(lambda x: jax.lax.fori_loop(0, n, body, x))
        t = slope_time(make)
        out[tag] = round(flops / t / 1e12, 2)
        print(json.dumps(out), file=sys.stderr, flush=True)

    for bm, bn, bk in [(1024, 1024, 1024), (1024, 2048, 512),
                       (1024, 1024, 256)]:
        run(f"w8a8 {bm}x{bn}x{bk}",
            lambda a, bm=bm, bn=bn, bk=bk: matmul_w8a8(
                a, wq8, s8, block_m=bm, block_n=bn, block_k=bk,
                out_dtype=jnp.bfloat16))
    # w4a8: block_k is packed rows (x2 of K)
    for bm, bn, bk in [(512, 1024, 512), (1024, 1024, 512),
                       (1024, 1024, 256)]:
        run(f"w4a8 {bm}x{bn}x{bk}",
            lambda a, bm=bm, bn=bn, bk=bk: matmul_w4a8(
                a, wp4, s4, block_m=bm, block_n=bn, block_k=bk,
                out_dtype=jnp.bfloat16))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
