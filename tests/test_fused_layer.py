"""Fused whole-layer decode block (ops/fused_layer.py) vs the XLA
composition it replaces (serving/quantized_llm.py decode path)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aimet_tpu.ops.fused_layer import fused_wo_mlp
from aimet_tpu.ops.int_matmul import matmul_w4_xla, quantize_weight_int4


def _rms_norm(x, scale, eps):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps).astype(x.dtype)) * scale


def _reference(ao, resid, pairs, gamma, eps):
    wo, wg, wu, wd = pairs
    y = resid + matmul_w4_xla(ao, *wo, out_dtype=resid.dtype)
    yh = _rms_norm(y, gamma, eps)
    g = matmul_w4_xla(yh, *wg, out_dtype=resid.dtype)
    u = matmul_w4_xla(yh, *wu, out_dtype=resid.dtype)
    h = jax.nn.silu(g) * u
    return y + matmul_w4_xla(h, *wd, out_dtype=resid.dtype)


@pytest.mark.parametrize("m", [1, 8, 16, 33])
def test_fused_wo_mlp_matches_xla_composition(rng, m):
    A, D, F = 256, 256, 512
    ao = jnp.asarray(rng.randn(m, A).astype(np.float32) * 0.5)
    resid = jnp.asarray(rng.randn(m, D).astype(np.float32) * 0.5)
    gamma = jnp.asarray(rng.rand(D).astype(np.float32) + 0.5)
    mk = lambda k, n: quantize_weight_int4(
        jnp.asarray(rng.randn(k, n).astype(np.float32) * (1.5 / np.sqrt(k))))
    pairs = (mk(A, D), mk(D, F), mk(D, F), mk(F, D))
    eps = 1e-5
    got = fused_wo_mlp(ao, resid, *pairs, gamma, eps=eps, block_a=128,
                       block_g=128, block_d=128)
    ref = _reference(ao, resid, pairs, gamma, eps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_wo_mlp_next_qkv_phase_d(rng):
    """next_qkv: (out, qkv) where qkv = rmsnorm(out, attn_gamma) @ Wqkv."""
    m, A, D, F, Nq = 16, 256, 256, 512, 384
    ao = jnp.asarray(rng.randn(m, A).astype(np.float32) * 0.5)
    resid = jnp.asarray(rng.randn(m, D).astype(np.float32) * 0.5)
    gamma = jnp.asarray(rng.rand(D).astype(np.float32) + 0.5)
    agamma = jnp.asarray(rng.rand(D).astype(np.float32) + 0.5)
    mk = lambda k, n: quantize_weight_int4(
        jnp.asarray(rng.randn(k, n).astype(np.float32) * (1.5 / np.sqrt(k))))
    pairs = (mk(A, D), mk(D, F), mk(D, F), mk(F, D))
    wq = mk(D, Nq)
    eps = 1e-5
    out, qkv = fused_wo_mlp(ao, resid, *pairs, gamma, eps=eps, block_a=128,
                            block_g=128, block_d=128, block_q=128,
                            next_qkv=(wq, agamma))
    ref_out = _reference(ao, resid, pairs, gamma, eps)
    ref_qkv = matmul_w4_xla(_rms_norm(ref_out, agamma, eps), *wq,
                            out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(qkv), np.asarray(ref_qkv),
                               rtol=2e-5, atol=2e-5)


def test_fused_wo_mlp_bf16_and_rect_blocks(rng):
    """bf16 activations (the serving dtype) + A != D + uneven block
    counts; tolerance at bf16 resolution."""
    m, A, D, F = 16, 384, 256, 640
    ao = jnp.asarray(rng.randn(m, A).astype(np.float32)).astype(jnp.bfloat16)
    resid = jnp.asarray(rng.randn(m, D).astype(np.float32)
                        ).astype(jnp.bfloat16)
    gamma = jnp.ones((D,), jnp.bfloat16)
    mk = lambda k, n: quantize_weight_int4(
        jnp.asarray(rng.randn(k, n).astype(np.float32) * (1.5 / np.sqrt(k))))
    pairs = (mk(A, D), mk(D, F), mk(D, F), mk(F, D))
    got = fused_wo_mlp(ao, resid, *pairs, gamma, eps=1e-5, block_a=128,
                       block_g=128, block_d=128)
    ref = _reference(ao, resid, pairs, gamma, 1e-5)
    g = np.asarray(got, np.float32)
    r = np.asarray(ref, np.float32)
    assert np.max(np.abs(g - r)) / max(np.max(np.abs(r)), 1e-9) < 0.05


def test_fused_decode_layer_matches_pieces():
    """The whole-layer megakernel (attention phase 0 + WO/MLP + next-qkv)
    must match the two-kernel composition it replaces."""
    import numpy as np
    from aimet_tpu.models.transformer import TransformerConfig, rope_freqs
    from aimet_tpu.ops.decode_attention_fused import fused_decode_attention
    from aimet_tpu.ops.fused_layer import fused_decode_layer, fused_wo_mlp
    from aimet_tpu.ops.int_matmul import quantize_weight_int4
    from aimet_tpu.ops.kv_cache import init_quantized_kv_cache, prefill_kv

    b, s, h, kh, d = 8, 32, 8, 2, 128
    dm, f = h * d, 2 * h * d
    pos = 11
    cfg = TransformerConfig(vocab_size=64, d_model=dm, n_layers=1,
                            n_heads=h, n_kv_heads=kh, d_ff=f)
    rng = np.random.RandomState(0)
    cache = init_quantized_kv_cache(b, s, kh, d)
    cache = prefill_kv(cache,
                       jnp.asarray(rng.randn(b, pos, kh, d), jnp.float32),
                       jnp.asarray(rng.randn(b, pos, kh, d), jnp.float32),
                       0)
    nq = (h + 2 * kh) * d
    qkv = jnp.asarray(rng.randn(b, nq), jnp.float32).astype(jnp.bfloat16)
    resid = jnp.asarray(rng.randn(b, dm) * 0.1, jnp.float32
                        ).astype(jnp.bfloat16)
    cos, sin = rope_freqs(cfg, jnp.asarray([pos]))

    def rq(k_dim, n_dim):
        return quantize_weight_int4(
            jnp.asarray(rng.randn(k_dim, n_dim) * 0.05, jnp.float32))

    wo = rq(h * d, dm)
    wg = rq(dm, f)
    wu = rq(dm, f)
    wd = rq(f, dm)
    wq = rq(dm, nq)
    gamma = jnp.asarray(rng.rand(dm) + 0.5, jnp.float32)
    agamma = jnp.asarray(rng.rand(dm) + 0.5, jnp.float32)
    blocks = dict(block_a=512, block_g=512, block_d=512)

    # two-kernel reference
    ao, k_ref, v_ref = fused_decode_attention(
        qkv, cos, sin, cache.k, cache.v, cache.k_scale, cache.v_scale,
        jnp.int32(pos), n_heads=h, n_kv_heads=kh)
    out_ref, qkvn_ref = fused_wo_mlp(
        ao, resid, wo, wg, wu, wd, gamma, next_qkv=(wq, agamma), **blocks)

    out, qkvn, k_new, v_new = fused_decode_layer(
        qkv, resid, cache.k, cache.v, cache.k_scale, cache.v_scale,
        jnp.int32(pos), cos, sin, wo, wg, wu, wd, gamma,
        next_qkv=(wq, agamma), n_heads=h, n_kv_heads=kh, **blocks)

    np.testing.assert_array_equal(np.asarray(k_new), np.asarray(k_ref))
    np.testing.assert_array_equal(np.asarray(v_new), np.asarray(v_ref))
    for got, want, name in ((out, out_ref, "out"), (qkvn, qkvn_ref, "qkv")):
        g = np.asarray(got, np.float32)
        w = np.asarray(want, np.float32)
        rel = np.max(np.abs(g - w)) / max(np.max(np.abs(w)), 1e-9)
        assert rel < 2e-2, (name, rel)

    # last-layer variant (no phase D)
    out2, k2, v2 = fused_decode_layer(
        qkv, resid, cache.k, cache.v, cache.k_scale, cache.v_scale,
        jnp.int32(pos), cos, sin, wo, wg, wu, wd, gamma,
        n_heads=h, n_kv_heads=kh, **blocks)
    g = np.asarray(out2, np.float32)
    w = np.asarray(out, np.float32)
    assert np.max(np.abs(g - w)) / max(np.max(np.abs(w)), 1e-9) < 2e-2
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(k_ref))


def test_fused_decode_layer_flat_caches():
    """Flat (B, S, KH*D) caches round-trip through the megakernel."""
    import numpy as np
    from aimet_tpu.models.transformer import TransformerConfig, rope_freqs
    from aimet_tpu.ops.fused_layer import fused_decode_layer
    from aimet_tpu.ops.int_matmul import quantize_weight_int4
    from aimet_tpu.ops.kv_cache import (flatten_kv_caches,
                                        init_quantized_kv_cache, prefill_kv)

    b, s, h, kh, d = 8, 32, 4, 4, 128
    dm, f = h * d, 2 * h * d
    pos = 3
    cfg = TransformerConfig(vocab_size=64, d_model=dm, n_layers=1,
                            n_heads=h, n_kv_heads=kh, d_ff=f)
    rng = np.random.RandomState(1)
    cache = init_quantized_kv_cache(b, s, kh, d)
    cache = prefill_kv(cache,
                       jnp.asarray(rng.randn(b, pos, kh, d), jnp.float32),
                       jnp.asarray(rng.randn(b, pos, kh, d), jnp.float32),
                       0)
    nq = (h + 2 * kh) * d
    qkv = jnp.asarray(rng.randn(b, nq), jnp.float32).astype(jnp.bfloat16)
    resid = jnp.zeros((b, dm), jnp.bfloat16)
    cos, sin = rope_freqs(cfg, jnp.asarray([pos]))

    def rq(k_dim, n_dim):
        return quantize_weight_int4(
            jnp.asarray(rng.randn(k_dim, n_dim) * 0.05, jnp.float32))

    args = (rq(h * d, dm), rq(dm, f), rq(dm, f), rq(f, dm),
            jnp.ones((dm,), jnp.float32))
    blocks = dict(block_a=512, block_g=512, block_d=512,
                  n_heads=h, n_kv_heads=kh)
    out4, k4, v4 = fused_decode_layer(
        qkv, resid, cache.k, cache.v, cache.k_scale, cache.v_scale,
        jnp.int32(pos), cos, sin, *args, **blocks)
    fc = flatten_kv_caches([cache])[0]
    out3, k3, v3 = fused_decode_layer(
        qkv, resid, fc.k, fc.v, fc.k_scale, fc.v_scale,
        jnp.int32(pos), cos, sin, *args, **blocks)
    assert k3.ndim == 3 and k4.ndim == 4
    np.testing.assert_array_equal(np.asarray(k3).reshape(k4.shape),
                                  np.asarray(k4))
    np.testing.assert_allclose(np.asarray(out3, np.float32),
                               np.asarray(out4, np.float32), rtol=0, atol=0)
