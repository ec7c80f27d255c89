"""Round-4 probe #2: (a) deeper/wider w4 decode tiles at the 8B shapes,
(b) the w8a8 MXU ceiling (raw-int32 vs epilogue variants).

RESULTS (v5e, 2026-08-21):
  A (w4 decode tiles, M=16; ~5-15% run-to-run drift vs probe_llama8b_parts):
    gateup 28672: bn=4096 bk=1024 697 | bn=8192 202 (VMEM thrash) |
                  bn=28672 618  -> (4096, 512) stays best (716 in probe1)
    down 4096:    bk=1024 660, bk=1792 650, bk=3584 522 -> bk=512 stays
    wo 4096:      bn=4096 bk=2048 384 (K-unsplit WORSE), bk=1024 562
    wqkv 6144:    bn=6144 variants <= bn=2048; deeper bk always worse
    lm_head N=131072: host->relay transfer of a 268 MB operand hits the
      remote-compile tunnel's HTTP 413 buffer limit — probe weights must
      be generated ON DEVICE at this size (the bench does; it works).
  CONCLUSION: decode_blocks (bn=2048/4096, bk=512) is the plateau for the
  AND-extraction w4 kernel; wider or deeper tiles lose.
  B (w8a8 ceiling): this harness's chain (scalar-feedback into an int8
  add) produced >int8-peak artifacts (571 TF/s) — measurement invalid;
  use scripts/probe_w8a8_ceiling.py (bench-style full-tensor chain).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aimet_tpu.ops.int_matmul import matmul_w4

M = 16
N0, N1 = 128, 1280
REPS = 5


def slope(op, k_in, n0=N0, n1=N1):
    def make(n):
        def body(i, acc):
            out = op(acc)
            return acc + (out[0, 0] * 1e-9).astype(acc.dtype)
        return jax.jit(lambda x: jax.lax.fori_loop(0, n, body, x))
    times = {}
    for n in (n0, n1):
        f = make(n)
        x0 = jnp.ones((M, k_in), jnp.bfloat16)
        np.asarray(f(x0)[0:1, 0:1])
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(f(x0)[0:1, 0:1])
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return max((times[n1] - times[n0]) / (n1 - n0), 1e-9)


def part_a():
    rng = np.random.RandomState(0)
    cases = [
        ("gateup", 4096, 28672, [(4096, 1024), (8192, 512), (28672, 512)]),
        ("down", 14336, 4096, [(4096, 1024), (4096, 1792), (4096, 3584)]),
        ("lm_head_pad", 4096, 131072, [(4096, 512), (4096, 1024),
                                       (8192, 512), (16384, 512)]),
        ("wo", 4096, 4096, [(4096, 2048), (4096, 1024), (2048, 2048)]),
        ("wqkv", 4096, 6144, [(2048, 512), (6144, 512), (3072, 1024),
                              (6144, 1024), (6144, 2048)]),
    ]
    for name, K, N, blocks in cases:
        wp = jnp.asarray(rng.randint(-128, 128, (K // 2, N)), jnp.int8)
        s = jnp.full((N,), 1e-4, jnp.float32)
        for bn, bk in blocks:
            try:
                t = slope(lambda a, bn=bn, bk=bk: matmul_w4(
                    a, wp, s, block_m=16, block_n=bn, block_k=bk,
                    out_dtype=jnp.bfloat16), K)
                print(f"A {name} K={K} N={N} bn={bn} bk={bk}: "
                      f"{K*N/2/t/1e9:.0f} GB/s ({t*1e6:.0f} us)", flush=True)
            except Exception as e:
                print(f"A {name} bn={bn} bk={bk}: FAIL "
                      f"{type(e).__name__} {str(e)[:80]}", flush=True)
        del wp


def part_b():
    # w8a8 ceiling at the bench contract shape M=1024 K=N=4096
    Mb, K, N = 1024, 4096, 4096
    FLOPS = 2.0 * Mb * K * N

    def kernel(x_ref, w_ref, sx_ref, sw_ref, out_ref, acc_ref, *, nk, epi):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

        @pl.when(k == nk - 1)
        def _():
            if epi == "raw":
                out_ref[:] = acc_ref[:]
            else:
                scaled = (acc_ref[:].astype(jnp.float32) * sx_ref[:]
                          * sw_ref[:])
                out_ref[:] = scaled.astype(out_ref.dtype)

    def build(bm, bn, bk, epi, out_dtype):
        nk = K // bk

        @jax.jit
        def f(x_q, w_q, sx, sw):
            return pl.pallas_call(
                functools.partial(kernel, nk=nk, epi=epi),
                grid=(Mb // bm, N // bn, nk),
                in_specs=[
                    pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((Mb, N), out_dtype),
                scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel",
                                         "arbitrary"),
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(x_q, w_q, sx, sw)
        return f

    rng = np.random.RandomState(0)
    x_q = jnp.asarray(rng.randint(-127, 128, (Mb, K)), jnp.int8)
    w_q = jnp.asarray(rng.randint(-127, 128, (K, N)), jnp.int8)
    sx = jnp.asarray(np.abs(rng.randn(Mb, 1)).astype(np.float32) * 1e-2)
    sw = jnp.asarray(np.abs(rng.randn(1, N)).astype(np.float32) * 1e-2)

    def slope_b(f, od):
        def make(n):
            def body(i, acc):
                out = f(acc, w_q, sx, sw)
                return acc + out[0:1, 0:1].astype(jnp.int8)
            return jax.jit(lambda x: jax.lax.fori_loop(0, n, body, x))
        times = {}
        for n in (16, 144):
            g = make(n)
            np.asarray(g(x_q)[0:1, 0:1])
            best = float("inf")
            for _ in range(REPS):
                t0 = time.perf_counter()
                np.asarray(g(x_q)[0:1, 0:1])
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        return max((times[144] - times[16]) / 128, 1e-9)

    cases = [
        ("raw_1024^3", 1024, 1024, 1024, "raw", jnp.int32),
        ("raw_512m", 512, 1024, 1024, "raw", jnp.int32),
        ("raw_2048n", 1024, 2048, 1024, "raw", jnp.int32),
        ("raw_512k", 1024, 1024, 512, "raw", jnp.int32),
        ("raw_2048k", 1024, 1024, 2048, "raw", jnp.int32),
        ("raw_512n2048k", 1024, 512, 2048, "raw", jnp.int32),
        ("f32epi_1024^3", 1024, 1024, 1024, "f32", jnp.bfloat16),
        ("raw_256m", 256, 1024, 1024, "raw", jnp.int32),
        ("raw_2048m...", 1024, 2048, 2048, "raw", jnp.int32),
    ]
    for name, bm, bn, bk, epi, od in cases:
        try:
            f = build(bm, bn, bk, epi, od)
            t = slope_b(f, od)
            print(f"B {name}: {FLOPS / t / 1e12:.1f} TF/s", flush=True)
        except Exception as e:
            print(f"B {name}: FAIL {type(e).__name__} {str(e)[:80]}",
                  flush=True)


if __name__ == "__main__":
    part_a()
    part_b()
