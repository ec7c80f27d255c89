"""Block-size sweep for the fused int8 matmul kernels on the real TPU chip.

Targets VERDICT r1 item 3: push w8a8 past 300 TF/s at M=1024, K=N=4096, and
find decode-shape (M=16) configs where the weight-only kernels beat bf16 on
effective bandwidth.

Run: python scripts/sweep_w8a8.py [headline|decode]
"""
import itertools
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from aimet_tpu.ops.int_matmul import (
    matmul_w4,
    matmul_w4_grouped,
    matmul_w8,
    matmul_w8a8,
    quantize_weight_int4,
    quantize_weight_int4_grouped,
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


def headline():
    rng = np.random.RandomState(0)
    w = jnp.asarray((rng.randn(K, N) * 0.05).astype(np.float32))
    wq8, s8 = quantize_weight_per_channel(w)
    s8 = s8 * 0.01
    flops = 2.0 * M * K * N

    configs = [
        # (block_m, block_n, block_k)
        (1024, 1024, 512),   # current default (269)
        (1024, 512, 512),
        (512, 512, 512),
        (512, 512, 1024),
        (512, 1024, 512),
        (1024, 1024, 1024),
        (512, 2048, 512),
        (1024, 2048, 512),
        (256, 1024, 1024),
        (1024, 4096, 512),
        (1024, 512, 1024),
        (512, 4096, 512),
        (1024, 1024, 2048),
        (1024, 2048, 1024),
    ]
    results = {}
    for bm, bn, bk in configs:
        try:
            t = slope_time(chain(lambda a, bm=bm, bn=bn, bk=bk: matmul_w8a8(
                a, wq8, s8, block_m=bm, block_n=bn, block_k=bk,
                out_dtype=jnp.bfloat16)), M, K, 16, 264)
            tf = flops / t / 1e12
        except Exception as e:  # noqa: BLE001
            tf = float("nan")
            print(f"w8a8 {bm}x{bn}x{bk}: FAILED {type(e).__name__}: {e}",
                  flush=True)
            continue
        results[(bm, bn, bk)] = tf
        print(f"w8a8 {bm}x{bn}x{bk}: {tf:.1f} TF/s", flush=True)
    best = max(results, key=results.get)
    print(f"BEST w8a8: {best} -> {results[best]:.1f} TF/s")


def decode():
    m = 16
    rng = np.random.RandomState(0)
    w = jnp.asarray((rng.randn(K, N) * 0.05).astype(np.float32))
    w_bf = (w * 0.01).astype(jnp.bfloat16)
    wq8, s8 = quantize_weight_per_channel(w)
    s8 = s8 * 0.01
    wp4, s4 = quantize_weight_int4(w)
    s4 = s4 * 0.01
    wp4g, s4g = quantize_weight_int4_grouped(w, group_size=128)
    s4g = s4g * 0.01

    # chains must still give >=200ms signal; decode matmuls are ~10-50us so
    # chain thousands: bf16 ~40us/call -> 6000 calls ~ 240ms
    n0, n1 = 256, 6400

    t_bf = slope_time(chain(lambda a: jnp.dot(
        a, w_bf, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        [:, :K]), m, K, n0, n1)
    # note: output (m, N) with N == K so the chain composes
    print(f"bf16 decode: {t_bf*1e6:.1f} us  "
          f"({K*N*2/t_bf/1e9:.0f} GB/s effective)", flush=True)

    for name, op, wbytes in [
        ("w8", lambda a, bm, bn, bk: matmul_w8(
            a, wq8, s8, block_m=bm, block_n=bn, block_k=bk,
            out_dtype=jnp.bfloat16), K * N),
        ("w4", lambda a, bm, bn, bk: matmul_w4(
            a, wp4, s4, block_m=bm, block_n=bn, block_k=bk,
            out_dtype=jnp.bfloat16), K * N // 2),
        ("w4g", lambda a, bm, bn, bk: matmul_w4_grouped(
            a, wp4g, s4g, group_size=128, block_m=bm, block_n=bn,
            block_k=bk, out_dtype=jnp.bfloat16), K * N // 2),
    ]:
        for bm, bn, bk in [(16, 256, 2048), (16, 512, 2048), (16, 1024, 2048),
                           (16, 512, 1024), (16, 256, 1024), (16, 1024, 1024),
                           (16, 2048, 1024), (16, 2048, 2048)]:
            if name in ("w4", "w4g") and bk > K // 2:
                bk = K // 2
            try:
                t = slope_time(chain(
                    lambda a, op=op, bm=bm, bn=bn, bk=bk:
                    op(a, bm, bn, bk)), m, K, n0, n1)
            except Exception as e:  # noqa: BLE001
                print(f"{name} {bm}x{bn}x{bk}: FAILED {e}", flush=True)
                continue
            print(f"{name} {bm}x{bn}x{bk}: {t*1e6:.1f} us  "
                  f"{wbytes/t/1e9:.0f} GB/s  {t_bf/t:.2f}x vs bf16",
                  flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "headline"
    if mode == "headline":
        headline()
    else:
        decode()
