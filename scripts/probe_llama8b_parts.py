"""Round-4 probe: decompose the Llama-8B decode step (8.45 ms @ batch 16)
into per-matmul, attention, and overhead parts; sweep w4 decode blocks at
the 8B shapes. Weight-traffic floor is 4.59 ms (3.76 GB @ 819 GB/s)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from aimet_tpu.ops.int_matmul import matmul_w4

M = 16
N0, N1 = 128, 1280
REPS = 5


def slope(op, k_in):
    def make(n):
        def body(i, acc):
            out = op(acc)
            # feed a scalar back so the chain is data-dependent
            return acc + (out[0, 0] * 1e-9).astype(acc.dtype)

        return jax.jit(lambda x: jax.lax.fori_loop(0, n, body, x))
    times = {}
    for n in (N0, N1):
        f = make(n)
        x0 = jnp.ones((M, k_in), jnp.bfloat16)
        np.asarray(f(x0)[0:1, 0:1])
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(f(x0)[0:1, 0:1])
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return max((times[N1] - times[N0]) / (N1 - N0), 1e-9)


def main():
    rng = np.random.RandomState(0)
    shapes = [("wqkv", 4096, 6144), ("wo", 4096, 4096),
              ("gateup", 4096, 28672), ("down", 14336, 4096),
              ("lm_head", 4096, 128256)]
    blocks = [(16, 1024, 1024), (16, 2048, 1024), (16, 2048, 512),
              (16, 4096, 512)]
    best_t = {}
    for name, K, N in shapes:
        wp = jnp.asarray(rng.randint(-128, 128, (K // 2, N)), jnp.int8)
        s = jnp.full((N,), 1e-4, jnp.float32)
        results = []
        for bm, bn, bk in blocks:
            if bk > K // 2:
                continue
            try:
                t = slope(lambda a, bn=bn, bk=bk: matmul_w4(
                    a, wp, s, block_m=16, block_n=bn, block_k=bk,
                    out_dtype=jnp.bfloat16), K)
                gbps = K * N / 2 / t / 1e9
                results.append((gbps, bn, bk, t))
            except Exception as e:
                print(f"{name} ({bn},{bk}): FAIL {type(e).__name__}",
                      file=sys.stderr)
        results.sort(reverse=True)
        best_t[name] = results[0][3]
        for gbps, bn, bk, t in results[:3]:
            print(f"{name} K={K} N={N} bn={bn} bk={bk}: {gbps:.0f} GB/s "
                  f"({t*1e6:.0f} us)", file=sys.stderr)

    per_layer = (best_t["wqkv"] + best_t["wo"] + best_t["gateup"]
                 + best_t["down"])
    total = per_layer * 32 + best_t["lm_head"]
    print(f"# best-block matmul total: {total*1e3:.2f} ms "
          f"(layer {per_layer*1e6:.0f} us x32 + lm_head "
          f"{best_t['lm_head']*1e6:.0f} us)", file=sys.stderr)

    # per-call overhead: tiny kernel
    wp = jnp.asarray(rng.randint(-128, 128, (128, 256)), jnp.int8)
    s = jnp.full((256,), 1e-4, jnp.float32)
    t0 = slope(lambda a: matmul_w4(a, wp, s, block_m=16, block_n=256,
                                   block_k=128, out_dtype=jnp.bfloat16), 256)
    print(f"# tiny-kernel per-call time (launch overhead bound): "
          f"{t0*1e6:.1f} us", file=sys.stderr)

    # attention part at the bench shape: B=16, S=76, KH=8, D=128, 32 layers
    B, S, KH, rep, D = 16, 76, 8, 4, 128
    kq = jnp.asarray(rng.randint(-127, 128, (B, S, KH, D)), jnp.int8)
    vq = jnp.asarray(rng.randint(-127, 128, (B, S, KH, D)), jnp.int8)
    ks = jnp.ones((B, KH), jnp.float32)
    vs = jnp.ones((B, KH), jnp.float32)

    def attn(q):           # q (M, KH*rep*D) row-view; reuse chain shape
        q5 = q.reshape(B // 16 * 16, 1, KH, rep, D)[:B]
        q5 = q5 * (ks[:, None, :, None, None] / np.sqrt(D)).astype(q5.dtype)
        scores = jnp.einsum("btkrd,bskd->bkrts", q5, kq.astype(q5.dtype),
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1).astype(q5.dtype)
        out = jnp.einsum("bkrts,bskd->btkrd", probs, vq.astype(q5.dtype))
        out = out * vs[:, None, :, None, None].astype(out.dtype)
        return out.reshape(B, KH * rep * D)

    t_attn = slope(attn, KH * rep * D)
    print(f"# attention core per layer: {t_attn*1e6:.1f} us "
          f"(x32 = {t_attn*32*1e3:.2f} ms)", file=sys.stderr)


if __name__ == "__main__":
    main()
