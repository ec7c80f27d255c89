"""Fused GQA decode-attention kernel parity (ops/decode_attention.py).

The kernel is a documented negative result for the 8B serving path (see
its module docstring) but stays parity-tested: it is the starting point
for any future whole-layer fusion work."""
import jax.numpy as jnp
import numpy as np
import pytest

from aimet_tpu.ops.decode_attention import (
    fused_gqa_decode_attention,
    fused_gqa_decode_attention_xla,
)


@pytest.mark.parametrize("pos", [0, 10, 23])
def test_fused_matches_xla(rng, pos):
    B, S, KH, rep, D = 4, 24, 2, 4, 16
    q = jnp.asarray(rng.randn(B, KH, rep, D).astype(np.float32))
    kc = jnp.asarray(rng.randint(-127, 128, (B, S, KH, D)), jnp.int8)
    vc = jnp.asarray(rng.randint(-127, 128, (B, S, KH, D)), jnp.int8)
    ks = jnp.asarray(np.abs(rng.randn(B, KH)).astype(np.float32) * 0.01)
    vs = jnp.asarray(np.abs(rng.randn(B, KH)).astype(np.float32) * 0.01)
    got = np.asarray(fused_gqa_decode_attention(q, kc, vc, ks, vs, pos))
    ref = np.asarray(fused_gqa_decode_attention_xla(q, kc, vc, ks, vs, pos))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_matches_serving_decode_attention(rng):
    """The XLA reference here IS the serving decode-attention math: cross
    check against quantized_llm._attention's einsum formulation."""
    B, S, KH, rep, D = 2, 12, 2, 2, 8
    q = jnp.asarray(rng.randn(B, 1, KH, rep, D).astype(np.float32))
    kc = jnp.asarray(rng.randint(-127, 128, (B, S, KH, D)), jnp.int8)
    vc = jnp.asarray(rng.randint(-127, 128, (B, S, KH, D)), jnp.int8)
    ks = jnp.asarray(np.abs(rng.randn(B, KH)).astype(np.float32) * 0.01)
    vs = jnp.asarray(np.abs(rng.randn(B, KH)).astype(np.float32) * 0.01)
    pos = 7

    import jax
    q5 = q * (ks[:, None, :, None, None] / np.sqrt(D)).astype(q.dtype)
    scores = jnp.einsum("btkrd,bskd->bkrts", q5, kc.astype(q.dtype),
                        preferred_element_type=jnp.float32)
    mask = (jnp.arange(S)[None, :] <= pos)[None, None, :, :]
    scores = jnp.where(mask[:, :, None], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    serving = jnp.einsum("bkrts,bskd->btkrd", probs, vc.astype(q.dtype))
    serving = serving * vs[:, None, :, None, None]

    ours = fused_gqa_decode_attention_xla(q[:, 0], kc, vc, ks, vs, pos)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(serving[:, 0]),
                               rtol=1e-4, atol=1e-6)
