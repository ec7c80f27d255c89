"""Round-3 on-chip probe: W4 decode variants, W4A8 fusedq, static-w8a8.

Measures (slope method, see bench.py) on the real v5e chip:
  - w4 decode (M=16): nibble-unpack widths (i32/i16), native jnp.int4
    storage, block shapes
  - w4 grouped decode: acc_scales vs weight-tile scales
  - w4a8 (M=1024): fusedq variant block sweep, native-int4 variant,
    tuned two-step
  - static w8a8: in-kernel staticq kernel block sweep

Every variant is wrapped in try/except — Mosaic legalization failures
(e.g. int8 shifts) are reported and skipped, not fatal.
"""
import sys
import time
import traceback

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from aimet_tpu.ops.int_matmul import (
    matmul_w4, matmul_w4_grouped, matmul_w4a8, matmul_w4a8_fusedq,
    matmul_w8, matmul_w8a8_staticq, quantize_weight_int4,
    quantize_weight_int4_grouped, quantize_weight_per_channel)

M, K, N = 1024, 4096, 4096
REPS = 5


def slope(make_chain, m, n0, n1):
    times = {}
    for n in (n0, n1):
        f = make_chain(n)
        x0 = jnp.ones((m, K), jnp.bfloat16)
        np.asarray(f(x0)[0:1, 0:1])
        best = float("inf")
        for _ in range(REPS):
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


def run(name, op, *, m=M, n0=16, n1=264, bytes_frac=None):
    try:
        t = slope(chain(op), m, n0, n1)
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAILED {msg}", flush=True)
        return
    if bytes_frac is None:
        v = 2.0 * m * K * N / t / 1e12
        print(f"{name}: {v:.1f} TF/s  ({t*1e6:.1f} us)", flush=True)
    else:
        v = K * N * bytes_frac / t / 1e9
        print(f"{name}: {v:.1f} GB/s  ({t*1e6:.1f} us)", flush=True)


def main():
    rng = np.random.RandomState(0)
    w = jnp.asarray((rng.randn(K, N) * 0.05).astype(np.float32))
    wq8, s8 = quantize_weight_per_channel(w)
    s8 = s8 * 0.01
    wp4, s4 = quantize_weight_int4(w)
    s4 = s4 * 0.01
    wp4g, s4g = quantize_weight_int4_grouped(w, group_size=128)
    s4g = s4g * 0.01

    dec = dict(m=16, n0=256, n1=6400)

    print("== decode M=16 ==", flush=True)
    run("w8 16/1024/1024 (ref)", lambda a: matmul_w8(
        a, wq8, s8, block_m=16, block_n=1024, block_k=1024,
        out_dtype=jnp.bfloat16), bytes_frac=1, **dec)
    for mode in ("i32",):
        for bn, bk in [(1024, 512), (512, 512), (2048, 512), (512, 1024),
                       (256, 1024)]:
            run(f"w4[{mode}] 16/{bn}/{bk}", lambda a, bn=bn, bk=bk, mode=mode:
                matmul_w4(a, wp4, s4, block_m=16, block_n=bn, block_k=bk,
                          out_dtype=jnp.bfloat16, nibble_mode=mode),
                bytes_frac=0.5, **dec)
    for acc in (True, False):
        for bn, bk in [(1024, 1024), (2048, 512)]:
            run(f"w4g acc={acc} 16/{bn}/{bk}",
                lambda a, bn=bn, bk=bk, acc=acc: matmul_w4_grouped(
                    a, wp4g, s4g, group_size=128, block_m=16, block_n=bn,
                    block_k=bk, out_dtype=jnp.bfloat16, acc_scales=acc),
                bytes_frac=0.5, **dec)

    print("== w4a8 M=1024 ==", flush=True)
    for bm, bn in [(1024, 512), (1024, 256), (512, 512), (1024, 1024)]:
        run(f"w4a8_fusedq {bm}/{bn}", lambda a, bm=bm, bn=bn:
            matmul_w4a8_fusedq(a, wp4, s4, block_m=bm, block_n=bn,
                               out_dtype=jnp.bfloat16))
    for bm, bn, bk in [(512, 1024, 512), (1024, 512, 1024)]:
        run(f"w4a8_twostep {bm}/{bn}/{bk}", lambda a, bm=bm, bn=bn, bk=bk:
            matmul_w4a8(a, wp4, s4, block_m=bm, block_n=bn, block_k=bk,
                        out_dtype=jnp.bfloat16))

    print("== static w8a8 M=1024 ==", flush=True)
    from aimet_tpu.quantization.affine import compute_encoding_from_min_max
    enc = compute_encoding_from_min_max(
        jnp.float32(-4.0), jnp.float32(4.0), 8, False, False, False)
    dx = jnp.asarray(enc.delta, jnp.float32).reshape(())
    off = jnp.asarray(enc.offset, jnp.float32).reshape(())
    steps = float(enc.num_steps)
    colsum = wq8.astype(jnp.float32).sum(axis=0)
    cvec = (128.0 + off) * colsum * dx * s8
    sv = dx * s8
    for bm, bn in [(1024, 512), (1024, 256), (512, 512), (1024, 1024)]:
        run(f"w8a8_staticq {bm}/{bn}", lambda a, bm=bm, bn=bn:
            matmul_w8a8_staticq(
                a.astype(jnp.float32), 1.0 / dx, off, steps, wq8, sv, cvec,
                block_m=bm, block_n=bn, out_dtype=jnp.bfloat16)[:, :K])
    print("done", flush=True)


if __name__ == "__main__":
    main()
