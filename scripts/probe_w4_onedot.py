"""w4 decode: single-dot variant — concat the AND-extracted planes along K
in VMEM and run ONE MXU dot per block against the pre-arranged
[x_lo | x_hi/16] row. Fewer dot launches + one x DMA stream."""
import functools
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aimet_tpu.ops.int_matmul import (_and_nibbles, matmul_w4,
                                      quantize_weight_int4)

M, K, N = 1024, 4096, 4096
REPS = 5


def _k1_kernel(x_ref, w_ref, s_ref, out_ref, acc_ref, rs_ref, *, nk):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        rs_ref[:] = jnp.zeros_like(rs_ref)

    lo_b, hi16 = _and_nibbles(w_ref[:])
    w_full = jnp.concatenate([lo_b, hi16], axis=0).astype(x_ref.dtype)
    acc_ref[:] += jnp.dot(x_ref[:], w_full,
                          preferred_element_type=jnp.float32)
    bk2 = x_ref.shape[1] // 2
    rs_ref[:] += jnp.sum(x_ref[:, :bk2].astype(jnp.float32), axis=1,
                         keepdims=True)

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = ((acc_ref[:] - 8.0 * rs_ref[:]) * s_ref[:]
                      ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "block_k"))
def w4_onedot(x, wp, s, *, block_n=1024, block_k=1024):
    M_, Kd = x.shape
    N_ = wp.shape[1]
    K2 = wp.shape[0]
    # pre-arrange x: [lo half | hi half / 16], interleaved per block_k
    x_lo = x[:, :K2].reshape(M_, K2 // block_k, block_k)
    x_hi = (x[:, K2:].astype(jnp.float32) / 16.0).astype(x.dtype) \
        .reshape(M_, K2 // block_k, block_k)
    x_arr = jnp.concatenate([x_lo, x_hi], axis=2).reshape(M_, 2 * K2)
    nk = K2 // block_k
    return pl.pallas_call(
        functools.partial(_k1_kernel, nk=nk),
        grid=(M_ // 16, N_ // block_n, nk),
        in_specs=[
            pl.BlockSpec((16, 2 * block_k), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, block_n), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M_, N_), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((16, block_n), jnp.float32),
                        pltpu.VMEM((16, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(x_arr, wp, jnp.reshape(s, (1, N_)).astype(jnp.float32))


def slope(f, n0=256, n1=6400):
    times = {}
    for n in (n0, n1):
        def body(i, acc):
            return f(acc).astype(jnp.bfloat16)
        g = jax.jit(lambda x, n=n: jax.lax.fori_loop(0, n, body, x))
        x0 = jnp.ones((16, K), jnp.bfloat16)
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
    wp, s = quantize_weight_int4(w)
    s = s * 0.01
    xs = jnp.asarray(rng.randn(16, K).astype(np.float32)).astype(jnp.bfloat16)
    want = np.asarray(matmul_w4(xs, wp, s, block_m=16, block_n=1024,
                                block_k=1024, out_dtype=jnp.float32))
    gb = lambda t: K * N / 2 / t / 1e9
    for bn, bk in [(1024, 1024), (2048, 512), (1024, 512), (2048, 1024)]:
        # careful: the x pre-arrangement depends on block_k
        name = f"w4_onedot 16/{bn}/{bk}"
        try:
            got = np.asarray(w4_onedot(xs, wp, s, block_n=bn, block_k=bk)
                             .astype(jnp.float32))
            err = np.max(np.abs(got - want)) / np.max(np.abs(want))
            assert err < 2e-2, err
            t = slope(lambda a, bn=bn, bk=bk: w4_onedot(a, wp, s, block_n=bn,
                                                        block_k=bk))
            print(f"{name}: {gb(t):.1f} GB/s ({t*1e6:.1f} us)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {str(e).splitlines()[0][:130]}", flush=True)
    # control: current library kernel
    for bn, bk in [(1024, 1024)]:
        t = slope(lambda a: matmul_w4(a, wp, s, block_m=16, block_n=bn,
                                      block_k=bk, out_dtype=jnp.bfloat16))
        print(f"w4_lib 16/{bn}/{bk}: {gb(t):.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
