"""A/B sweep of w8a8 block sizes on the real chip (slope method)."""
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from aimet_tpu.ops.int_matmul import matmul_w8a8, quantize_weight_per_channel

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
    flops = 2.0 * M * K * N

    configs = [
        (512, 1024, 512),   # current default
        (512, 1024, 1024),
        (1024, 1024, 512),
        (512, 2048, 512),
        (256, 1024, 512),
        (512, 512, 1024),
    ]
    out = {}
    for bm, bn, bk in configs:
        def chain(n, bm=bm, bn=bn, bk=bk):
            def body(i, acc):
                return matmul_w8a8(acc, wq8, s8, block_m=bm, block_n=bn,
                                   block_k=bk,
                                   out_dtype=jnp.bfloat16)
            return jax.jit(lambda x: jax.lax.fori_loop(0, n, body, x))
        try:
            t = slope_time(chain)
            out[f"{bm}x{bn}x{bk}"] = round(flops / t / 1e12, 2)
        except Exception as e:  # noqa: BLE001
            out[f"{bm}x{bn}x{bk}"] = f"FAIL {type(e).__name__}"
        print(json.dumps(out), file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
