"""Fused decode-attention kernel vs the XLA decode path (interpret mode).

Parity anchor: ops/decode_attention_fused.fused_decode_attention must
reproduce serving/quantized_llm._attention_from_qkv (project_out=False)
bit-closely — same rope, same INT8-KV quantize/append, same GQA
scores/softmax/context math — so the serving decode loop can swap the
~12-op XLA glue for one kernel launch per layer.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aimet_tpu.models.transformer import TransformerConfig, rope_freqs
from aimet_tpu.ops.decode_attention_fused import fused_decode_attention
from aimet_tpu.ops.kv_cache import init_quantized_kv_cache, prefill_kv
from aimet_tpu.serving.quantized_llm import _attention_from_qkv


def _setup(b=4, s=32, h=4, kh=2, d=128, pos=7, seed=0):
    cfg = TransformerConfig(
        vocab_size=64, d_model=h * d, n_layers=1, n_heads=h, n_kv_heads=kh,
        d_ff=4 * h * d)
    rng = np.random.RandomState(seed)
    cache = init_quantized_kv_cache(b, s, kh, d)
    # prefill `pos` positions to establish scales + content
    kp = jnp.asarray(rng.randn(b, pos, kh, d).astype(np.float32))
    vp = jnp.asarray(rng.randn(b, pos, kh, d).astype(np.float32))
    cache = prefill_kv(cache, kp, vp, 0)
    qkv = jnp.asarray(
        rng.randn(b, (h + 2 * kh) * d).astype(np.float32)).astype(
        jnp.bfloat16)
    cos, sin = rope_freqs(cfg, jnp.asarray([pos]))
    return cfg, cache, qkv, cos, sin


@pytest.mark.parametrize("b,s,h,kh,pos", [
    (4, 32, 4, 2, 7),      # GQA rep=2
    (8, 32, 8, 8, 3),      # MHA rep=1
    (4, 64, 8, 2, 63),     # rep=4, append at the last slot
    (32, 32, 4, 2, 7),     # two batch groups of 16 (O(G^2) grouping)
])
def test_matches_xla_decode_path(b, s, h, kh, pos):
    d = 128
    cfg, cache, qkv, cos, sin = _setup(b, s, h, kh, d, pos)

    # XLA reference: _attention_from_qkv on (B, 1, ...) tokens
    span = jnp.arange(s)[None, :] <= jnp.asarray([pos])[:, None]
    mask = span[None, None, :, :]
    ref, ref_cache = _attention_from_qkv(
        cfg, None, qkv[:, None, :], cos, sin, mask, cache,
        jnp.int32(pos), "w4a8", prefill=False, project_out=False)

    ao, k_new, v_new = fused_decode_attention(
        qkv, cos, sin, cache.k, cache.v, cache.k_scale, cache.v_scale,
        jnp.int32(pos), n_heads=h, n_kv_heads=kh)

    np.testing.assert_array_equal(np.asarray(k_new),
                                  np.asarray(ref_cache.k))
    np.testing.assert_array_equal(np.asarray(v_new),
                                  np.asarray(ref_cache.v))
    got = np.asarray(ao, np.float32)
    want = np.asarray(ref[:, 0], np.float32)
    err = np.max(np.abs(got - want)) / max(np.max(np.abs(want)), 1e-9)
    assert err < 2e-2, err


def test_appended_row_quantizes_with_prefill_scales():
    b, s, h, kh, d, pos = 4, 32, 4, 2, 128, 7
    cfg, cache, qkv, cos, sin = _setup(b, s, h, kh, d, pos)
    ao, k_new, v_new = fused_decode_attention(
        qkv, cos, sin, cache.k, cache.v, cache.k_scale, cache.v_scale,
        jnp.int32(pos), n_heads=h, n_kv_heads=kh)
    # rows before pos untouched; rows after pos untouched (zeros)
    np.testing.assert_array_equal(np.asarray(k_new[:, :pos]),
                                  np.asarray(cache.k[:, :pos]))
    np.testing.assert_array_equal(np.asarray(k_new[:, pos + 1:]),
                                  np.asarray(cache.k[:, pos + 1:]))
    assert np.any(np.asarray(k_new[:, pos]) != 0)
