"""Probe what limits the w8a8 kernel: raw-int32 ceiling vs epilogue cost.

Variants at M=1024, K=N=4096, blocks 1024^3:
  current   : int32 acc, f32 scale epilogue, bf16 out
  raw_i32   : no epilogue, int32 out            (MXU ceiling probe)
  bf16_epi  : acc -> bf16 -> scale in bf16      (half the VPU bytes)
  f32_out   : f32 scale epilogue, f32 out       (no bf16 convert)
  nk1       : block_k = K (single pass, no acc scratch revisit)

NEGATIVE RESULT (round 4, closing VERDICT r3 next #6): the ~83-87%-of-
int8-peak ceiling is structural for this kernel family on this stack.
Evidence accumulated over rounds 2-4, all on-chip:
  - (block_m, block_n, block_k) sweeps over {256,512,1024,2048}^3 incl.
    K-unsplit single-pass: best in-session spread 290-330 TF/s, with the
    shipped fusedq (1024,512) at the top of every interleaved A/B
    (scripts/sweep_w8a8.py, sweep_fusedq.py, /tmp ab runs 2026-08-21;
    interleaved rep0/rep1: 325.2/323.7 vs 323.5/316.0 for (1024,256)).
  - epilogue variants (bf16 epilogue, f32 out, raw int32 out) within
    noise or failing to compile at some blockings (remote-compile 500).
  - in-kernel static quantize + compile-time-constant encodings (r3):
    +15% once, already shipped (matmul_w8a8_staticq).
  - one-dot concat trick and int32 large-M variants: negative (r3,
    scripts/probe_w4_onedot.py, probe_w4_bigm.py).
RESOLUTION (late round 4): the "ceiling" was mostly SESSION clock drift,
not the kernel. With bench.py's interleaved two-pass timing, a full-clock
session recorded w8a8 354.0 TF/s (90% of int8 peak) and w4a8 374.7 TF/s
(95%) with the SAME shipped blocks — while other sessions the same day
read 317/322. Conclusions: (1) the shipped blockings are at or near the
kernel's own limit; (2) cross-session TF/s comparisons tighter than
~15% are meaningless on this chip — only interleaved same-session A/Bs
count; (3) further tuning effort should go to serving-level structure
(fewer kernel launches), not these blocks.
"""
import functools
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 1024, 4096, 4096
FLOPS = 2.0 * M * K * N


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
        elif epi == "bf16":
            out_ref[:] = (acc_ref[:].astype(jnp.bfloat16)
                          * sx_ref[:].astype(jnp.bfloat16)
                          * sw_ref[:].astype(jnp.bfloat16))
        else:
            scaled = acc_ref[:].astype(jnp.float32) * sx_ref[:] * sw_ref[:]
            out_ref[:] = scaled.astype(out_ref.dtype)


def build(bm, bn, bk, epi, out_dtype):
    nk = K // bk

    @jax.jit
    def f(x_q, w_q, sx, sw):
        return pl.pallas_call(
            functools.partial(kernel, nk=nk, epi=epi),
            grid=(M // bm, N // bn, nk),
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
            out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
            cost_estimate=pl.CostEstimate(
                flops=2 * M * N * K, bytes_accessed=M * K + K * N + M * N * 2,
                transcendentals=0),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(x_q, w_q, sx, sw)

    return f


def slope(f, x_q, w_q, sx, sw, chain_dtype):
    # chain via re-quantizing output? simpler: time single large calls with
    # many reps is relay-bound; chain by feeding x through identity: use
    # fori with the SAME inputs and accumulate a checksum to defeat CSE.
    def make(n):
        def body(i, acc):
            o = f(x_q + acc.astype(jnp.int8), w_q, sx, sw)
            return (o[0, 0] != 0).astype(jnp.int8) + acc * 0

        return jax.jit(lambda z: jax.lax.fori_loop(0, n, body, z))

    times = {}
    for n in (16, 264):
        g = make(n)
        z0 = jnp.int8(0)
        np.asarray(g(z0))
        best = 1e9
        for _ in range(6):
            t0 = time.perf_counter()
            np.asarray(g(z0))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return (times[264] - times[16]) / (264 - 16)


def main():
    rng = np.random.RandomState(0)
    x_q = jnp.asarray(rng.randint(-127, 128, (M, K)), jnp.int8)
    w_q = jnp.asarray(rng.randint(-127, 128, (K, N)), jnp.int8)
    sx = jnp.asarray(np.abs(rng.randn(M, 1)).astype(np.float32) * 1e-2)
    sw = jnp.asarray(np.abs(rng.randn(1, N)).astype(np.float32) * 1e-2)

    cases = [
        ("current", 1024, 1024, 1024, "f32", jnp.bfloat16),
        ("raw_i32", 1024, 1024, 1024, "raw", jnp.int32),
        ("bf16_epi", 1024, 1024, 1024, "bf16", jnp.bfloat16),
        ("f32_out", 1024, 1024, 1024, "f32", jnp.float32),
        ("nk1_512", 512, 1024, 4096, "f32", jnp.bfloat16),
        ("nk1_256", 256, 1024, 4096, "f32", jnp.bfloat16),
        ("nk2_512", 512, 1024, 2048, "f32", jnp.bfloat16),
        ("cur_2048k", 1024, 512, 2048, "f32", jnp.bfloat16),
    ]
    for name, bm, bn, bk, epi, od in cases:
        try:
            f = build(bm, bn, bk, epi, od)
            t = slope(f, x_q, w_q, sx, sw, od)
            print(f"{name}: {FLOPS / t / 1e12:.1f} TF/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__} {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
