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
