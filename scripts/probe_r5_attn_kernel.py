"""On-chip legality + parity + timing for the fused decode-attention
kernel (ops/decode_attention_fused.py) at Llama-8B decode shapes."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from aimet_tpu.models.transformer import TransformerConfig, rope_freqs
from aimet_tpu.ops.decode_attention_fused import fused_decode_attention
from aimet_tpu.ops.kv_cache import init_quantized_kv_cache, prefill_kv
from aimet_tpu.serving.quantized_llm import _attention_from_qkv

B, S, H, KH, D = 16, 128, 32, 8, 128
POS = 60
REPS = 5


def main():
    cfg = TransformerConfig.llama3_8b()
    rng = np.random.RandomState(0)
    cache = init_quantized_kv_cache(B, S, KH, D)
    key = jax.random.PRNGKey(0)
    kp = jax.random.normal(key, (B, POS, KH, D), jnp.float32)
    vp = jax.random.normal(jax.random.fold_in(key, 1), (B, POS, KH, D),
                           jnp.float32)
    cache = prefill_kv(cache, kp, vp, 0)
    qkv = jax.random.normal(jax.random.fold_in(key, 2),
                            (B, (H + 2 * KH) * D), jnp.float32
                            ).astype(jnp.bfloat16)
    cos, sin = rope_freqs(cfg, jnp.asarray([POS]))

    # ---- parity vs XLA path
    span = jnp.arange(S)[None, :] <= jnp.asarray([POS])[:, None]
    mask = span[None, None, :, :]
    ref, ref_cache = _attention_from_qkv(
        cfg, None, qkv[:, None, :], cos, sin, mask, cache,
        jnp.int32(POS), "w4a8", prefill=False, project_out=False)
    ao, k_new, v_new = fused_decode_attention(
        qkv, cos, sin, cache.k, cache.v, cache.k_scale, cache.v_scale,
        jnp.int32(POS), n_heads=H, n_kv_heads=KH)
    got = np.asarray(ao, np.float32)
    want = np.asarray(ref[:, 0], np.float32)
    err = np.max(np.abs(got - want)) / max(np.max(np.abs(want)), 1e-9)
    kerr = np.abs(np.asarray(k_new, np.int32)
                  - np.asarray(ref_cache.k, np.int32)).max()
    verr = np.abs(np.asarray(v_new, np.int32)
                  - np.asarray(ref_cache.v, np.int32)).max()
    print(f"parity: ao rel err {err:.2e}, cache max |dk|={kerr} |dv|={verr}")
    assert err < 2e-2 and kerr <= 1 and verr <= 1

    # ---- timing: chain n kernels (thread ao -> qkv perturbation)
    def make(n):
        def run(qkv, ck, cv, ks, vs):
            def body(i, carry):
                qkv, ck, cv = carry
                ao, ck, cv = fused_decode_attention(
                    qkv, cos, sin, ck, cv, ks, vs, jnp.int32(POS),
                    n_heads=H, n_kv_heads=KH)
                qkv = qkv + (ao[:, :1] * 1e-9).astype(qkv.dtype)
                return (qkv, ck, cv)
            return jax.lax.fori_loop(0, n, body, (qkv, ck, cv))[0]
        return jax.jit(run)

    times = {}
    for n in (64, 1088):
        f = make(n)
        np.asarray(f(qkv, cache.k, cache.v, cache.k_scale,
                     cache.v_scale)[0:1, 0:1])
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(f(qkv, cache.k, cache.v, cache.k_scale,
                         cache.v_scale)[0:1, 0:1])
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    t = (times[1088] - times[64]) / 1024
    print(f"fused attention kernel: {t*1e6:.1f} us/call")


if __name__ == "__main__":
    main()
