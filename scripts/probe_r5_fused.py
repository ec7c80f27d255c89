"""Round-5 probe: standalone fused_wo_mlp kernel at Llama-8B shapes.

Separate-kernel floor (probe_r5_b32.py, M=16): wo 13.9 + gateup 84.8 +
down 45.6 = 144.3 us of kernel time (+2 extra launches + XLA glue).
The fused kernel streams the same 96 MB; at the gateup kernel's 693 GB/s
it would take 139 us. Sweeps block sizes.
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

from aimet_tpu.ops.fused_layer import fused_wo_mlp

REPS = 5
D, F = 4096, 14336
WBYTES = (D * D + 2 * D * F + F * D) // 2


def slope(op, m, n0, n1, *operands):
    def make(n):
        def run(ao, resid, *ops_):
            def body(i, carry):
                ao, resid = carry
                out = op(ao, resid, *ops_)
                return (ao + (out * 1e-9).astype(ao.dtype), out)
            return jax.lax.fori_loop(0, n, body, (ao, resid))
        return jax.jit(run)

    times = {}
    for n in (n0, n1):
        f = make(n)
        ao = jnp.ones((m, D), jnp.bfloat16)
        resid = jnp.ones((m, D), jnp.bfloat16) * 0.1
        np.asarray(f(ao, resid, *operands)[0][0:1, 0:1])
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(f(ao, resid, *operands)[0][0:1, 0:1])
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return max((times[n1] - times[n0]) / (n1 - n0), 1e-9)


def main():
    key = jax.random.PRNGKey(0)

    def rq(k_dim, n_dim):
        nonlocal key
        key, a, b = jax.random.split(key, 3)
        wp = jax.random.randint(a, (k_dim // 2, n_dim), -128, 128,
                                dtype=jnp.int8)
        s = jax.random.uniform(b, (n_dim,), jnp.float32, 0.5, 1.5) * 1e-4
        return wp, s

    wo = rq(D, D)
    wg = rq(D, F)
    wu = rq(D, F)
    wd = rq(F, D)
    gamma = jnp.ones((D,), jnp.bfloat16)

    for m in (16, 32):
        for ba, bg, bd in [(2048, 2048, 1024), (2048, 1024, 1024),
                           (1024, 2048, 2048), (2048, 2048, 2048),
                           (4096, 2048, 1024), (2048, 2048, 512)]:
            if D % ba or F % bg or D % bd:
                continue
            try:
                t = slope(lambda ao, resid, *w: fused_wo_mlp(
                    ao, resid, (w[0], w[1]), (w[2], w[3]), (w[4], w[5]),
                    (w[6], w[7]), gamma, block_a=ba, block_g=bg,
                    block_d=bd), m, 64, 64 + 2048,
                    *wo, *wg, *wu, *wd)
                print(f"M={m} ba={ba} bg={bg} bd={bd}: {t*1e6:.1f} us "
                      f"({WBYTES/t/1e9:.0f} GB/s)", flush=True)
            except Exception as e:
                print(f"M={m} ba={ba} bg={bg} bd={bd}: FAIL "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
