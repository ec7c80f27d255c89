"""Native-layout ONNX export round-trip (VERDICT r4 next #8): arbitrary
traced JAX functions — including full transformer blocks with attention,
causal masks and rope — export eqn-by-eqn and reload bit-comparably
through our own reader (the same consuming path a third-party runtime
takes)."""
import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import pytest

from aimet_tpu.interop.onnx_export_native import export_onnx_native
from aimet_tpu.interop.onnx_reader import load_onnx


def _roundtrip(fn, params, args, tmp_path, tol=2e-5):
    path = str(tmp_path / "native.onnx")
    export_onnx_native(fn, params, args, path)
    ofn, oparams = load_onnx(path)
    got = ofn(oparams, *args)
    want = fn(params, *args)
    got_l = got if isinstance(got, tuple) else (got,)
    want_l = jax.tree_util.tree_leaves(want)
    for g, w in zip(got_l, want_l):
        g, w = np.asarray(g, np.float32), np.asarray(w, np.float32)
        err = np.max(np.abs(g - w)) / max(np.max(np.abs(w)), 1e-9)
        assert err < tol, err


class EncoderBlock(nn.Module):
    d: int = 32
    h: int = 4

    @nn.compact
    def __call__(self, x):
        B, T, D = x.shape
        hd = self.d // self.h
        xn = nn.LayerNorm(name="ln1")(x)
        q = nn.Dense(self.d, name="wq")(xn).reshape(B, T, self.h, hd)
        k = nn.Dense(self.d, name="wk")(xn).reshape(B, T, self.h, hd)
        v = nn.Dense(self.d, name="wv")(xn).reshape(B, T, self.h, hd)
        s = jnp.einsum("bthd,bshd->bhts", q, k) / np.sqrt(hd)
        mask = jnp.tril(jnp.ones((T, T), bool))
        s = jnp.where(mask[None, None], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhts,bshd->bthd", p, v).reshape(B, T, D)
        x = x + nn.Dense(self.d, name="wo")(o)
        xn2 = nn.LayerNorm(name="ln2")(x)
        hdn = nn.gelu(nn.Dense(self.d * 4, name="w1")(xn2))
        return x + nn.Dense(self.d, name="w2")(hdn)


class TestNativeExport:
    def test_transformer_block_roundtrip(self, tmp_path, rng):
        m = EncoderBlock()
        x = jnp.asarray(rng.randn(2, 8, 32).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x)
        _roundtrip(lambda v, x: m.apply(v, x), v, (x,), tmp_path)

    def test_full_decoder_model_roundtrip(self, tmp_path, rng):
        """models/transformer.py end-to-end: embedding gather, rope
        (const-folded tables), GQA repeat, causal mask, rmsnorm chains,
        lm_head — the exporter's const-folding + generic dot_general
        must cover the whole traced program."""
        from aimet_tpu.models.transformer import (Transformer,
                                                  TransformerConfig)
        cfg = TransformerConfig(vocab_size=50, d_model=32, n_layers=2,
                                n_heads=4, n_kv_heads=2, d_ff=64)
        m = Transformer(cfg)
        toks = jnp.asarray(rng.randint(0, 50, (2, 8)), jnp.int32)
        v = m.init(jax.random.PRNGKey(0), toks)
        _roundtrip(lambda v, t: m.apply(v, t), v, (toks,), tmp_path,
                   tol=5e-5)

    def test_mlp_with_reduce_and_argmax(self, tmp_path, rng):
        def fn(params, x):
            h = jnp.maximum(x @ params["w"] + params["b"], 0.0)
            pooled = h.mean(axis=1)
            return jnp.argmax(pooled, axis=-1), pooled.sum(-1)

        params = {"w": jnp.asarray(rng.randn(16, 8).astype(np.float32)),
                  "b": jnp.zeros((8,), jnp.float32)}
        x = jnp.asarray(rng.randn(4, 5, 16).astype(np.float32))
        _roundtrip(fn, params, (x,), tmp_path)
