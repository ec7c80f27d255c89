"""Grouped-INT4 decode variants (target: >= 2.8x bf16 at M=16).

Variants over the biased layout:
  A. current acc-scales kernel (per-group dots + in-kernel rowsums)
  B. acc-scales with the lo-bias correction HOISTED out of the kernel
     (correction = -8 * rowsums(M,g) @ s_lo(g,N), a tiny XLA matmul)
  C. weight-tile scales applied in bf16 (dense-lane multiply)
"""
import functools
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aimet_tpu.ops.int_matmul import (_and_nibbles, matmul_w4_grouped,
                                      quantize_weight_int4_grouped)

M, K, N = 1024, 4096, 4096
GS = 128
REPS = 5


def _kb_kernel(xlo_ref, xhi_ref, w_ref, slo_ref, shi_ref, out_ref, acc_ref,
               *, nk, group_size):
    """Variant B: biased lo dots WITHOUT correction (hoisted outside)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lo_b, hi16 = _and_nibbles(w_ref[:])
    lo_f = lo_b.astype(xlo_ref.dtype)
    hi_f = hi16.astype(xlo_ref.dtype)
    bk, bn = lo_f.shape
    ng = bk // group_size
    acc = acc_ref[:]
    for g in range(ng):
        sl = slice(g * group_size, (g + 1) * group_size)
        dlo = jnp.dot(xlo_ref[:, sl], lo_f[sl],
                      preferred_element_type=jnp.float32)
        dhi = jnp.dot(xhi_ref[:, sl], hi_f[sl],
                      preferred_element_type=jnp.float32)
        acc = (acc + dlo * slo_ref[g:g + 1, :]
               + dhi * (shi_ref[g:g + 1, :] * 0.0625))
    acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _kc_kernel(xlo_ref, xhi_ref, w_ref, slo_ref, shi_ref, out_ref, acc_ref,
               *, nk, group_size):
    """Variant C: bf16 weight-tile scales (dense lanes; lo bias subtracted
    in bf16)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lo_b, hi16 = _and_nibbles(w_ref[:])
    lo = lo_b.astype(jnp.bfloat16) - 8.0
    hi = hi16.astype(jnp.bfloat16)
    bk, bn = lo.shape
    ng = bk // group_size
    slo = jnp.broadcast_to(
        slo_ref[:].astype(jnp.bfloat16)[:, None, :],
        (ng, group_size, bn)).reshape(bk, bn)
    shi = jnp.broadcast_to(
        (shi_ref[:] * 0.0625).astype(jnp.bfloat16)[:, None, :],
        (ng, group_size, bn)).reshape(bk, bn)
    acc_ref[:] += jnp.dot(xlo_ref[:], (lo * slo).astype(xlo_ref.dtype),
                          preferred_element_type=jnp.float32)
    acc_ref[:] += jnp.dot(xhi_ref[:], (hi * shi).astype(xlo_ref.dtype),
                          preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _call(kern, x, wp, s, *, block_n, block_k, out_dtype=jnp.bfloat16):
    M_, Kd = x.shape
    N_ = wp.shape[1]
    K2 = wp.shape[0]
    g_half = K2 // GS
    x_lo = x[:, :K2]
    x_hi = x[:, K2:]
    s_lo, s_hi = s[:g_half], s[g_half:]
    gb = block_k // GS
    nk = K2 // block_k
    return pl.pallas_call(
        functools.partial(kern, nk=nk, group_size=GS),
        grid=(M_ // 16, N_ // block_n, nk),
        in_specs=[
            pl.BlockSpec((16, block_k), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, block_k), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, block_n), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, block_n), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, block_n), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M_, N_), out_dtype),
        scratch_shapes=[pltpu.VMEM((16, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(x_lo, x_hi, wp, s_lo, s_hi)


@functools.partial(jax.jit, static_argnames=("block_n", "block_k", "kind"))
def run_b(x, wp, s, *, block_n, block_k, kind="b"):
    kern = _kb_kernel if kind == "b" else _kc_kernel
    out = _call(kern, x, wp, s, block_n=block_n, block_k=block_k)
    if kind == "b":
        K2 = wp.shape[0]
        g_half = K2 // GS
        rs = jnp.sum(x[:, :K2].astype(jnp.float32)
                     .reshape(x.shape[0], g_half, GS), axis=2)   # (M, g)
        corr = rs @ (8.0 * s[:g_half])                           # (M, N)
        out = (out.astype(jnp.float32) - corr).astype(out.dtype)
    return out


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
    wp, s = quantize_weight_int4_grouped(w, group_size=GS)
    s = s * 0.01
    gbps = lambda t: K * N / 2 / t / 1e9

    # reference correctness on-chip
    xs = jnp.asarray(rng.randn(16, K).astype(np.float32)).astype(jnp.bfloat16)
    want = np.asarray(matmul_w4_grouped(
        xs, wp, s, group_size=GS, block_m=16, block_n=1024, block_k=1024,
        out_dtype=jnp.float32, acc_scales=True))
    for kind in ("b", "c"):
        for bn, bk in [(1024, 1024), (2048, 1024), (2048, 2048),
                       (1024, 2048)]:
            name = f"w4g[{kind}] 16/{bn}/{bk}"
            try:
                got = np.asarray(run_b(xs, wp, s, block_n=bn, block_k=bk,
                                       kind=kind).astype(jnp.float32))
                err = np.max(np.abs(got - want)) / np.max(np.abs(want))
                assert err < 2e-2, err
                t = slope(lambda a, bn=bn, bk=bk, kind=kind: run_b(
                    a, wp, s, block_n=bn, block_k=bk, kind=kind))
                print(f"{name}: {gbps(t):.1f} GB/s ({t*1e6:.1f} us)",
                      flush=True)
            except Exception as e:
                print(f"{name}: FAILED {str(e).splitlines()[0][:130]}",
                      flush=True)
    # current library kernel for comparison
    for bn, bk in [(1024, 1024), (2048, 1024)]:
        t = slope(lambda a, bn=bn, bk=bk: matmul_w4_grouped(
            a, wp, s, group_size=GS, block_m=16, block_n=bn, block_k=bk,
            out_dtype=jnp.bfloat16, acc_scales=True))
        print(f"w4g[lib-acc] 16/{bn}/{bk}: {gbps(t):.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
