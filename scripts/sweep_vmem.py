"""Re-tune all fused INT kernels with the raised (100M) VMEM limit.

The 16M default scoped limit forced small blocks in round 1/2; v5e has far
more physical VMEM, so bigger tiles cut HBM weight re-reads. Sweeps the
headline shape (M=1024) for w8a8(two-step)/w8/w4/w4_grouped and the decode
shape (M=16) for the weight-only kernels.

Run: python scripts/sweep_vmem.py [headline|decode]
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
    matmul_q8,
    matmul_w4,
    matmul_w4_grouped,
    matmul_w8,
    quantize_activation_per_row,
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


def bench_one(name, op, m=M, n0=16, n1=264):
    flops = 2.0 * m * K * N
    try:
        t = slope_time(chain(op), m, K, n0, n1)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}"[:160], flush=True)
        return None
    tf = flops / t / 1e12
    print(f"{name}: {tf:.1f} TF/s", flush=True)
    return tf


def headline():
    rng = np.random.RandomState(0)
    w = jnp.asarray((rng.randn(K, N) * 0.05).astype(np.float32))
    wq8, s8 = quantize_weight_per_channel(w)
    s8 = s8 * 0.01
    wp4, s4 = quantize_weight_int4(w)
    s4 = s4 * 0.01
    wp4g, s4g = quantize_weight_int4_grouped(w, group_size=128)
    s4g = s4g * 0.01

    # static-path q8 (int8 codes in, frozen scale) — bigger blocks
    for bm, bn, bk in [(512, 1024, 4096), (1024, 1024, 4096),
                       (1024, 512, 4096), (1024, 2048, 4096),
                       (512, 2048, 4096), (2048, 1024, 4096)]:
        def op(a, bm=bm, bn=bn, bk=bk):
            xq, sx = quantize_activation_per_row(a)
            return matmul_q8(xq, sx, wq8, s8, block_m=bm, block_n=bn,
                             block_k=bk, out_dtype=jnp.bfloat16)
        bench_one(f"q8 {bm}x{bn}x{bk}", op)

    # weight-only w8
    for bm, bn, bk in [(1024, 512, 1024), (1024, 1024, 2048),
                       (1024, 512, 4096), (1024, 1024, 4096),
                       (512, 1024, 4096)]:
        bench_one(f"w8 {bm}x{bn}x{bk}",
                  lambda a, bm=bm, bn=bn, bk=bk: matmul_w8(
                      a, wq8, s8, block_m=bm, block_n=bn, block_k=bk,
                      out_dtype=jnp.bfloat16))

    # w4 (block_k in packed rows)
    for bm, bn, bk in [(1024, 256, 2048), (1024, 512, 2048),
                       (1024, 1024, 2048), (1024, 512, 1024),
                       (512, 1024, 2048)]:
        bench_one(f"w4 {bm}x{bn}x{bk}",
                  lambda a, bm=bm, bn=bn, bk=bk: matmul_w4(
                      a, wp4, s4, block_m=bm, block_n=bn, block_k=bk,
                      out_dtype=jnp.bfloat16))

    # w4 grouped
    for bm, bn, bk in [(512, 256, 1024), (512, 512, 2048),
                       (1024, 512, 2048), (1024, 1024, 2048)]:
        bench_one(f"w4g {bm}x{bn}x{bk}",
                  lambda a, bm=bm, bn=bn, bk=bk: matmul_w4_grouped(
                      a, wp4g, s4g, group_size=128, block_m=bm, block_n=bn,
                      block_k=bk, out_dtype=jnp.bfloat16))


def decode():
    m = 16
    rng = np.random.RandomState(0)
    w = jnp.asarray((rng.randn(K, N) * 0.05).astype(np.float32))
    wq8, s8 = quantize_weight_per_channel(w)
    s8 = s8 * 0.01
    wp4, s4 = quantize_weight_int4(w)
    s4 = s4 * 0.01
    wp4g, s4g = quantize_weight_int4_grouped(w, group_size=128)
    s4g = s4g * 0.01
    n0, n1 = 256, 6400

    def report(name, op):
        try:
            t = slope_time(chain(op), m, K, n0, n1)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}"[:160], flush=True)
            return
        print(f"{name}: {t*1e6:.1f} us ({K*N/t/1e9:.0f} GB/s int8-equiv)",
              flush=True)

    for bm, bn, bk in [(16, 512, 4096), (16, 1024, 4096), (16, 2048, 4096),
                       (16, 4096, 4096), (16, 1024, 2048)]:
        report(f"w8 decode {bm}x{bn}x{bk}",
               lambda a, bm=bm, bn=bn, bk=bk: matmul_w8(
                   a, wq8, s8, block_m=bm, block_n=bn, block_k=bk,
                   out_dtype=jnp.bfloat16))
    for bm, bn, bk in [(16, 512, 2048), (16, 1024, 2048), (16, 2048, 2048),
                       (16, 1024, 1024), (16, 4096, 2048)]:
        report(f"w4 decode {bm}x{bn}x{bk}",
               lambda a, bm=bm, bn=bn, bk=bk: matmul_w4(
                   a, wp4, s4, block_m=bm, block_n=bn, block_k=bk,
                   out_dtype=jnp.bfloat16))
        report(f"w4g decode {bm}x{bn}x{bk}",
               lambda a, bm=bm, bn=bn, bk=bk: matmul_w4_grouped(
                   a, wp4g, s4g, group_size=128, block_m=bm, block_n=bn,
                   block_k=bk, out_dtype=jnp.bfloat16))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "headline"
    (headline if which == "headline" else decode)()
