"""w4 at M=1024: i32 AND-extraction without prescale/rowsum (large-M path)
vs the biased decode kernel."""
import functools
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aimet_tpu.ops.int_matmul import matmul_w4, quantize_weight_int4

M, K, N = 1024, 4096, 4096
REPS = 5


def _kernel(xlo_ref, xhi_ref, w_ref, s_ref, out_ref, acc_ref, *, nk):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = w_ref[:].astype(jnp.int32)
    lo = ((q & 0xF) - 8).astype(xlo_ref.dtype)
    hi = (q >> 4).astype(xlo_ref.dtype)
    acc_ref[:] += jnp.dot(xlo_ref[:], lo, preferred_element_type=jnp.float32)
    acc_ref[:] += jnp.dot(xhi_ref[:], hi, preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = (acc_ref[:] * s_ref[:]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk"))
def w4_bigm(x, wp, s, *, bm=1024, bn=1024, bk=1024):
    M_, Kd = x.shape
    N_ = wp.shape[1]
    K2 = wp.shape[0]
    nk = K2 // bk
    return pl.pallas_call(
        functools.partial(_kernel, nk=nk),
        grid=(M_ // bm, N_ // bn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M_, N_), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(x[:, :K2], x[:, K2:], wp, jnp.reshape(s, (1, N_)).astype(jnp.float32))


def slope(f, n0=16, n1=264):
    times = {}
    for n in (n0, n1):
        def body(i, acc):
            return f(acc).astype(jnp.bfloat16)
        g = jax.jit(lambda x, n=n: jax.lax.fori_loop(0, n, body, x))
        x0 = jnp.ones((M, K), jnp.bfloat16)
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
    tf = lambda t: 2.0 * M * K * N / t / 1e12
    xs = jnp.asarray(rng.randn(16, K).astype(np.float32)).astype(jnp.bfloat16)
    # correctness vs library at small m
    want = np.asarray(matmul_w4(xs, wp, s, block_m=16, block_n=1024,
                                block_k=1024, out_dtype=jnp.float32))
    got = np.asarray(w4_bigm(jnp.pad(xs, ((0, M - 16), (0, 0))), wp, s)
                     .astype(jnp.float32))[:16]
    err = np.max(np.abs(got - want)) / np.max(np.abs(want))
    print("parity vs lib:", err, flush=True)
    for bm, bn, bk in [(1024, 1024, 1024), (1024, 512, 2048),
                      (512, 1024, 1024), (1024, 1024, 2048)]:
        t = slope(lambda a, bm=bm, bn=bn, bk=bk: w4_bigm(a, wp, s, bm=bm,
                                                         bn=bn, bk=bk))
        print(f"w4_bigm {bm}/{bn}/{bk}: {tf(t):.1f} TF/s", flush=True)
    t = slope(lambda a: matmul_w4(a, wp, s, out_dtype=jnp.bfloat16))
    print(f"w4_lib defaults: {tf(t):.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
