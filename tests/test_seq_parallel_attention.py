"""Sequence-parallel (length-sharded KV) decode attention — the
long-context design row (SURVEY §5): distributed flash-decode partials with
exact log-sum-exp combine must equal dense single-device attention."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aimet_tpu.ops.kv_cache import (QuantizedKVCache, dequantize_kv,
                                    init_quantized_kv_cache, prefill_kv)
from aimet_tpu.ops.seq_parallel_attention import (
    combine_attention_partials,
    local_decode_attention_partials,
    seq_parallel_decode_attention,
    shard_kv_cache_seq,
)
from aimet_tpu.parallel.mesh import make_mesh
from jax.sharding import Mesh


@pytest.fixture
def mesh():
    devs = np.array(jax.devices()[:8]).reshape(8)
    return Mesh(devs, ("sp",))


def _dense_reference(q, cache, length):
    k, v = dequantize_kv(cache, jnp.float32)
    B, S, KH, D = k.shape
    H = q.shape[1]
    rep = H // KH
    k = jnp.repeat(k, rep, axis=2)
    v = jnp.repeat(v, rep, axis=2)
    scores = jnp.einsum("bhd,bshd->bhs", q, k) / np.sqrt(D)
    mask = jnp.arange(S)[None, None, :] < length
    scores = jnp.where(mask, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhs,bshd->bhd", probs, v)


def test_seq_parallel_matches_dense(mesh, rng):
    B, S, KH, H, D = 2, 64, 2, 4, 16
    length = 50   # part of the last shard is empty — masking must hold
    cache = init_quantized_kv_cache(B, S, KH, D)
    k = jnp.asarray(rng.randn(B, length, KH, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, length, KH, D).astype(np.float32))
    cache = prefill_kv(cache, k, v, 0)
    q = jnp.asarray(rng.randn(B, H, D).astype(np.float32))

    want = np.asarray(_dense_reference(q, cache, length))

    fn = seq_parallel_decode_attention(mesh, n_heads=H)
    sharded = shard_kv_cache_seq(cache, mesh)
    got = np.asarray(fn(q, sharded.k, sharded.v, sharded.k_scale,
                        sharded.v_scale, jnp.int32(length)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_empty_chunks_are_exact_zero_weight(mesh, rng):
    """length smaller than one shard: 7 of 8 devices contribute nothing,
    and the combine must still be exact (no NaN from all-masked chunks)."""
    B, S, KH, H, D = 1, 64, 1, 2, 8
    length = 5
    cache = init_quantized_kv_cache(B, S, KH, D)
    k = jnp.asarray(rng.randn(B, length, KH, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, length, KH, D).astype(np.float32))
    cache = prefill_kv(cache, k, v, 0)
    q = jnp.asarray(rng.randn(B, H, D).astype(np.float32))

    want = np.asarray(_dense_reference(q, cache, length))
    fn = seq_parallel_decode_attention(mesh, n_heads=H)
    sharded = shard_kv_cache_seq(cache, mesh)
    got = np.asarray(fn(q, sharded.k, sharded.v, sharded.k_scale,
                        sharded.v_scale, jnp.int32(length)))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_partials_combine_is_associative(rng):
    """The log-sum-exp combine over chunks equals one-shot softmax for any
    chunking (the invariant that makes growing contexts exact)."""
    B, H, D, S = 1, 2, 8, 32
    q = jnp.asarray(rng.randn(B, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
    valid = jnp.ones((B, S), bool)

    # dense
    scores = jnp.einsum("bhd,bshd->bhs", q, k) / np.sqrt(D)
    probs = jax.nn.softmax(scores, -1)
    want = np.asarray(jnp.einsum("bhs,bshd->bhd", probs, v))

    # manual two-chunk combine (no mesh needed: emulate pmax/psum)
    for split in (8, 16, 21):
        parts = []
        for sl in (slice(0, split), slice(split, S)):
            parts.append(local_decode_attention_partials(
                q, k[:, sl], v[:, sl], valid[:, sl]))
        m = jnp.maximum(parts[0][0], parts[1][0])
        l = sum(p[1] * jnp.exp(p[0] - m) for p in parts)
        o = sum(p[2] * jnp.exp(p[0] - m)[..., None] for p in parts)
        got = np.asarray(o / l[..., None])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
