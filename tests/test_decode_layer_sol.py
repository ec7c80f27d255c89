"""Manually-streamed whole-layer decode kernel (ops/decode_layer_sol) vs
the grid-pipelined megakernel + attention kernel composition."""
import jax.numpy as jnp
import numpy as np

from aimet_tpu.models.transformer import TransformerConfig, rope_freqs
from aimet_tpu.ops.decode_attention_fused import fused_decode_attention
from aimet_tpu.ops.decode_layer_sol import sol_decode_layer
from aimet_tpu.ops.fused_layer import fused_wo_mlp
from aimet_tpu.ops.int_matmul import quantize_weight_int4
from aimet_tpu.ops.kv_cache import (flatten_kv_caches,
                                    init_quantized_kv_cache, prefill_kv)


def _setup(seed=0):
    b, s, h, kh, d = 8, 32, 8, 2, 128
    dm, f = h * d, 2 * h * d
    pos = 11
    cfg = TransformerConfig(vocab_size=64, d_model=dm, n_layers=1,
                            n_heads=h, n_kv_heads=kh, d_ff=f)
    rng = np.random.RandomState(seed)
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
    wgu = (jnp.concatenate([wg[0], wu[0]], axis=1),
           jnp.concatenate([wg[1], wu[1]]))
    wd = rq(f, dm)
    wq = rq(dm, nq)
    gamma = jnp.asarray(rng.rand(dm) + 0.5, jnp.float32)
    agamma = jnp.asarray(rng.rand(dm) + 0.5, jnp.float32)
    return (b, s, h, kh, d, dm, f, pos, cache, qkv, resid, cos, sin,
            wo, wg, wu, wgu, wd, wq, gamma, agamma)


def test_sol_matches_two_kernel_composition():
    (b, s, h, kh, d, dm, f, pos, cache, qkv, resid, cos, sin,
     wo, wg, wu, wgu, wd, wq, gamma, agamma) = _setup()
    blocks = dict(block_a=512, block_g=512, block_d=512)

    ao, k_ref, v_ref = fused_decode_attention(
        qkv, cos, sin, cache.k, cache.v, cache.k_scale, cache.v_scale,
        jnp.int32(pos), n_heads=h, n_kv_heads=kh)
    out_ref, qkvn_ref = fused_wo_mlp(
        ao, resid, wo, wg, wu, wd, gamma, next_qkv=(wq, agamma), **blocks)

    out, qkvn, k_new, v_new = sol_decode_layer(
        qkv, resid, cache.k, cache.v, cache.k_scale, cache.v_scale,
        jnp.int32(pos), cos, sin, wo, wgu, wd, gamma,
        next_qkv=(wq, agamma), n_heads=h, n_kv_heads=kh, **blocks)

    np.testing.assert_array_equal(np.asarray(k_new), np.asarray(k_ref))
    np.testing.assert_array_equal(np.asarray(v_new), np.asarray(v_ref))
    for got, want, name in ((out, out_ref, "out"), (qkvn, qkvn_ref, "qkv")):
        g = np.asarray(got, np.float32)
        w = np.asarray(want, np.float32)
        rel = np.max(np.abs(g - w)) / max(np.max(np.abs(w)), 1e-9)
        assert rel < 2e-2, (name, rel)


def test_sol_last_layer_and_flat_caches():
    (b, s, h, kh, d, dm, f, pos, cache, qkv, resid, cos, sin,
     wo, wg, wu, wgu, wd, wq, gamma, agamma) = _setup(seed=3)
    blocks = dict(block_a=512, block_g=512, block_d=512)
    out4, k4, v4 = sol_decode_layer(
        qkv, resid, cache.k, cache.v, cache.k_scale, cache.v_scale,
        jnp.int32(pos), cos, sin, wo, wgu, wd, gamma,
        n_heads=h, n_kv_heads=kh, **blocks)
    fc = flatten_kv_caches([cache])[0]
    out3, k3, v3 = sol_decode_layer(
        qkv, resid, fc.k, fc.v, fc.k_scale, fc.v_scale,
        jnp.int32(pos), cos, sin, wo, wgu, wd, gamma,
        n_heads=h, n_kv_heads=kh, **blocks)
    assert k3.ndim == 3 and k4.ndim == 4
    np.testing.assert_array_equal(np.asarray(k3).reshape(k4.shape),
                                  np.asarray(k4))
    np.testing.assert_array_equal(np.asarray(out3), np.asarray(out4))
    # and against the composition
    ao, k_ref, v_ref = fused_decode_attention(
        qkv, cos, sin, cache.k, cache.v, cache.k_scale, cache.v_scale,
        jnp.int32(pos), n_heads=h, n_kv_heads=kh)
    out_ref = fused_wo_mlp(ao, resid, wo, wg, wu, wd, gamma, **blocks)
    g = np.asarray(out4, np.float32)
    w = np.asarray(out_ref, np.float32)
    assert np.max(np.abs(g - w)) / max(np.max(np.abs(w)), 1e-9) < 2e-2
    np.testing.assert_array_equal(np.asarray(k4), np.asarray(k_ref))


def test_sol_int8_dots_matches_w4a8_composition():
    """int8_dots=True must reproduce the true-W4A8 composition: each
    projection quantizes its input per-row onto the int8 MXU path
    (numerics of ops/int_matmul.matmul_w4a8)."""
    from aimet_tpu.ops.int_matmul import matmul_w4a8_xla

    (b, s, h, kh, d, dm, f, pos, cache, qkv, resid, cos, sin,
     wo, wg, wu, wgu, wd, wq, gamma, agamma) = _setup(seed=5)
    blocks = dict(block_a=512, block_g=512, block_d=512)

    # reference: attention kernel + per-matmul w4a8 + XLA glue
    ao, k_ref, v_ref = fused_decode_attention(
        qkv, cos, sin, cache.k, cache.v, cache.k_scale, cache.v_scale,
        jnp.int32(pos), n_heads=h, n_kv_heads=kh)

    def rmsnorm(x, g):
        import jax
        xf = x.astype(jnp.float32)
        r = jax.lax.rsqrt(jnp.mean(xf * xf, axis=1, keepdims=True) + 1e-5)
        return ((xf * r).astype(x.dtype) * g).astype(x.dtype)

    def mm(x, pair):
        wq_, sc = pair
        return matmul_w4a8_xla(x, wq_, sc).astype(x.dtype)

    import jax
    y = resid + mm(ao, wo)
    yh = rmsnorm(y, gamma)
    gate = mm(yh, wg).astype(jnp.float32)
    up = mm(yh, wu).astype(jnp.float32)
    hmid = (gate * jax.nn.sigmoid(gate) * up).astype(qkv.dtype)
    out_ref_v = y + mm(hmid, wd)
    qkvn_ref = mm(rmsnorm(out_ref_v, agamma), wq)

    out, qkvn, k_new, v_new = sol_decode_layer(
        qkv, resid, cache.k, cache.v, cache.k_scale, cache.v_scale,
        jnp.int32(pos), cos, sin, wo, wgu, wd, gamma,
        next_qkv=(wq, agamma), n_heads=h, n_kv_heads=kh,
        int8_dots=True, **blocks)

    np.testing.assert_array_equal(np.asarray(k_new), np.asarray(k_ref))
    # tolerance note: the kernel quantizes activations computed through
    # its own (bf16-stored) intermediates, so per-row quantize decisions
    # differ slightly from the reference chain's — measured, the int8
    # kernel sits at the SAME distance from the w4a8 reference (3.9%
    # max, 1.1e-3 rel-MSE) as the bf16 kernel does (3.2%, 0.9e-3):
    # inherent W4A8 activation-quant noise, not a defect
    for got, want, name in ((out, out_ref_v, "out"),
                            (qkvn, qkvn_ref, "qkv")):
        g = np.asarray(got, np.float32)
        w = np.asarray(want, np.float32)
        relmax = np.max(np.abs(g - w)) / max(np.max(np.abs(w)), 1e-9)
        relmse = np.mean((g - w) ** 2) / max(np.mean(w ** 2), 1e-12)
        assert relmax < 6e-2 and relmse < 3e-3, (name, relmax, relmse)
