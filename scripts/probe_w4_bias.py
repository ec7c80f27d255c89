"""Experimental: biased-nibble AND-only INT4 decode kernel.

Layout: packed byte = ((hi & 0xF) << 4) | (lo + 8), hi signed in [-8,7],
lo in [-7,7] stored biased as [1,15].

Extraction (NO shifts — Mosaic rejects i8 shifts and i32 widening is the
current decode bottleneck):
  lo_biased = p & 0x0F                       (int8 AND) -> bf16 = lo + 8
  hi16      = p & 0xF0  (signed int8!)       (int8 AND) -> bf16 = 16 * hi

Fold-outs:
  * the /16 of the hi plane folds into a pre-scaled x_hi (x[:, K/2:] / 16)
  * the +8 of the lo plane folds into a rank-1 rowsum correction applied
    in the scale epilogue: out = (acc - 8 * rowsum(x_lo)) * s

Fallback variant does the two ANDs after an int32 widen (if int8 AND fails
to legalize) — still removes all shifts.
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
REPS = 5


def pack_bias(w):
    Kd = w.shape[0]
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(w / scale[None, :]), -7, 7).astype(jnp.int32)
    lo = (q[: Kd // 2] + 8) & 0xF
    hi = (q[Kd // 2:] & 0xF) << 4
    return (lo | hi).astype(jnp.int8), scale.astype(jnp.float32)


def _w4b_kernel(xlo_ref, xhi16_ref, w_ref, s_ref, out_ref, acc_ref, rs_ref,
                *, nk, and_mode):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        rs_ref[:] = jnp.zeros_like(rs_ref)

    p = w_ref[:]
    if and_mode == "fsub":
        # bias subtracted after the convert, in the x dtype: float sub is
        # always legal; small-magnitude plane [-7,7], no correction term
        lo_pl = (p & 0x0F).astype(xlo_ref.dtype) - 8.0
        hi16 = (p & (-16)).astype(xlo_ref.dtype)
        acc_ref[:] += jnp.dot(xlo_ref[:], lo_pl,
                              preferred_element_type=jnp.float32)
        acc_ref[:] += jnp.dot(xhi16_ref[:], hi16,
                              preferred_element_type=jnp.float32)
    else:
        lo_b = (p & 0x0F).astype(xlo_ref.dtype)     # lo + 8 in [1, 15]
        hi16 = (p & (-16)).astype(xlo_ref.dtype)    # 16 * hi (0xF0 signed)
        acc_ref[:] += jnp.dot(xlo_ref[:], lo_b,
                              preferred_element_type=jnp.float32)
        acc_ref[:] += jnp.dot(xhi16_ref[:], hi16,
                              preferred_element_type=jnp.float32)
        rs_ref[:] += jnp.sum(xlo_ref[:].astype(jnp.float32), axis=1,
                             keepdims=True)

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = ((acc_ref[:] - 8.0 * rs_ref[:]) * s_ref[:]
                      ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "out_dtype", "and_mode"))
def matmul_w4b(x, w_packed, w_scale, *, block_m=16, block_n=1024,
               block_k=1024, out_dtype=jnp.bfloat16, and_mode="i8"):
    M_, Kd = x.shape
    N_ = w_packed.shape[1]
    K2 = w_packed.shape[0]
    x_lo = x[:, :K2]
    x_hi16 = (x[:, K2:].astype(jnp.float32) / 16.0).astype(x.dtype)
    sw = jnp.reshape(w_scale, (1, N_)).astype(jnp.float32)
    nk = K2 // block_k

    out = pl.pallas_call(
        functools.partial(_w4b_kernel, nk=nk, and_mode=and_mode),
        grid=(M_ // block_m, N_ // block_n, nk),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M_, N_), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32),
                        pltpu.VMEM((block_m, 1), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * M_ * N_ * Kd,
            bytes_accessed=M_ * Kd * 2 * 2 + K2 * N_ + M_ * N_ * 2,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(x_lo, x_hi16, w_packed, sw)
    return out


def slope(f, m, n0, n1):
    times = {}
    for n in (n0, n1):
        def body(i, acc):
            return f(acc).astype(jnp.bfloat16)
        g = jax.jit(lambda x, n=n: jax.lax.fori_loop(0, n, body, x))
        x0 = jnp.ones((m, K), jnp.bfloat16)
        np.asarray(g(x0)[0:1, 0:1])
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(g(x0)[0:1, 0:1])
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return max((times[n1] - times[n0]) / (n1 - n0), 1e-9)


def main():
    rng = np.random.RandomState(0)
    w = jnp.asarray((rng.randn(K, N) * 0.05).astype(np.float32))
    wp, s = pack_bias(w)
    s = s * 0.01

    # correctness first (on-chip)
    xs = jnp.asarray(rng.randn(16, K).astype(np.float32))
    want = None
    for and_mode in ("fsub",):
        for bn, bk in [(1024, 1024), (2048, 512), (1024, 512), (2048, 1024)]:
            name = f"w4b[{and_mode}] 16/{bn}/{bk}"
            try:
                got = np.asarray(matmul_w4b(
                    xs.astype(jnp.bfloat16), wp, s, block_m=16, block_n=bn,
                    block_k=bk, and_mode=and_mode))
                if want is None:
                    lo = (np.asarray(wp).astype(np.int32) & 0xF) - 8
                    hi = np.asarray(wp).astype(np.int32) >> 4
                    wd = np.concatenate([lo, hi], 0) * np.asarray(s)[None, :]
                    want = np.asarray(xs.astype(jnp.bfloat16)).astype(
                        np.float32) @ wd
                err = np.max(np.abs(got - want)) / np.max(np.abs(want))
                print(f"  {name} err={err:.2e}", flush=True)
                assert err < 2e-2, err
                t = slope(lambda a, bn=bn, bk=bk, am=and_mode: matmul_w4b(
                    a, wp, s, block_m=16, block_n=bn, block_k=bk,
                    and_mode=am), 16, 256, 6400)
                print(f"{name}: {K*N/2/t/1e9:.1f} GB/s ({t*1e6:.1f} us)",
                      flush=True)
            except Exception as e:
                print(f"{name}: FAILED {str(e).splitlines()[0][:140]}",
                      flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
