"""On-chip block sweep for matmul_w8a8_fusedq (in-kernel dynamic quant).

Compares against the two-step matmul_w8a8 path at the headline shape
(M=1024, K=N=4096). Run: python scripts/sweep_fusedq.py
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

from aimet_tpu.ops.int_matmul import (
    matmul_w8a8,
    matmul_w8a8_fusedq,
    matmul_w8a8_xla,
    quantize_weight_per_channel,
)

M, K, N = 1024, 4096, 4096


def slope_time(make_chain, m, k, n0, n1, reps=5):
    times = {}
    for n in (n0, n1):
        f = make_chain(n)
        x0 = jnp.ones((m, k), jnp.bfloat16)
        np.asarray(f(x0)[0:1, 0:1])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(f(x0)[0:1, 0:1])
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return max((times[n1] - times[n0]) / (n1 - n0), 1e-9)


def chain(op):
    def make(n):
        def body(i, acc):
            return op(acc).astype(jnp.bfloat16)
        return jax.jit(lambda x: jax.lax.fori_loop(0, n, body, x))
    return make


def main():
    rng = np.random.RandomState(0)
    w = jnp.asarray((rng.randn(K, N) * 0.05).astype(np.float32))
    wq8, s8 = quantize_weight_per_channel(w)
    s8 = s8 * 0.01
    flops = 2.0 * M * K * N

    # parity first (on-chip), both input dtypes
    for dt in (np.float32, jnp.bfloat16):
        x = jnp.asarray(rng.randn(M, K)).astype(dt)
        # the kernel computes the row scale in f32 regardless of the input
        # dtype; the equivalent XLA semantic is the f32-upcast reference
        ref = np.asarray(matmul_w8a8_xla(x.astype(jnp.float32), wq8, s8,
                                         out_dtype=jnp.float32))
        try:
            got = np.asarray(matmul_w8a8_fusedq(x, wq8, s8,
                                                out_dtype=jnp.float32))
        except Exception as e:  # noqa: BLE001
            print(f"parity {np.dtype(dt).name}: FAILED {e}"[:300], flush=True)
            continue
        err = np.abs(got - ref).max() / np.abs(ref).max()
        print(f"parity fusedq vs xla ({np.dtype(dt).name}): rel {err:.2e}",
              flush=True)
        assert err < 1e-4, err

    t = slope_time(chain(lambda a: matmul_w8a8(
        a, wq8, s8, out_dtype=jnp.bfloat16)), M, K, 16, 264)
    print(f"two-step w8a8 default: {flops / t / 1e12:.1f} TF/s", flush=True)

    results = {}
    for bm, bn in [(512, 512), (512, 1024), (1024, 512), (1024, 1024),
                   (512, 2048), (1024, 2048), (256, 1024)]:
        try:
            t = slope_time(chain(lambda a, bm=bm, bn=bn: matmul_w8a8_fusedq(
                a, wq8, s8, block_m=bm, block_n=bn,
                out_dtype=jnp.bfloat16)), M, K, 16, 264)
            tf = flops / t / 1e12
        except Exception as e:  # noqa: BLE001
            print(f"fusedq {bm}x{bn}: FAILED {type(e).__name__}: {e}",
                  flush=True)
            continue
        results[(bm, bn)] = tf
        print(f"fusedq {bm}x{bn}: {tf:.1f} TF/s", flush=True)
    if results:
        best = max(results, key=results.get)
        print(f"BEST fusedq: {best} -> {results[best]:.1f} TF/s")


if __name__ == "__main__":
    main()
