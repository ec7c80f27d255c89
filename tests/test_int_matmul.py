"""Pallas kernel correctness vs XLA references (interpret mode on CPU;
compiled path exercised by bench.py on the real chip)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aimet_tpu.ops.int_matmul import (
    matmul_w4,
    matmul_w4_xla,
    matmul_w4a8,
    matmul_w4a8_xla,
    matmul_w8,
    matmul_w8_xla,
    matmul_w8a8,
    matmul_w8a8_xla,
    quantize_activation_per_row,
    quantize_weight_int4,
    quantize_weight_per_channel,
    unpack_int4,
)

# interpret mode is slow — keep shapes tiny but tile-aligned
M, K, N = 16, 256, 256
BLK = dict(block_m=8, block_n=128, block_k=128)


@pytest.fixture
def xw(rng):
    x = jnp.asarray(rng.randn(M, K).astype(np.float32))
    w = jnp.asarray(rng.randn(K, N).astype(np.float32) * 0.1)
    return x, w


class TestQuantizers:
    def test_weight_per_channel_roundtrip(self, xw):
        _, w = xw
        wq, s = quantize_weight_per_channel(w)
        assert wq.dtype == jnp.int8
        err = np.abs(np.asarray(wq, np.float32) * np.asarray(s)[None, :] - np.asarray(w))
        assert err.max() <= np.asarray(s).max() / 2 + 1e-6

    def test_int4_pack_unpack_roundtrip(self, xw):
        _, w = xw
        packed, s = quantize_weight_int4(w)
        assert packed.shape == (K // 2, N)
        wq = unpack_int4(packed)
        assert int(jnp.max(wq)) <= 7 and int(jnp.min(wq)) >= -7
        # unpacked dequant approximates w within int4 resolution
        err = np.abs(np.asarray(wq, np.float32) * np.asarray(s)[None, :] - np.asarray(w))
        assert err.max() <= np.asarray(s).max() / 2 + 1e-6

    def test_activation_per_row(self, xw):
        x, _ = xw
        xq, s = quantize_activation_per_row(x)
        err = np.abs(np.asarray(xq, np.float32) * np.asarray(s)[:, None] - np.asarray(x))
        assert err.max() <= np.asarray(s).max() / 2 + 1e-6


class TestKernelsVsXla:
    def test_w8(self, xw):
        x, w = xw
        wq, s = quantize_weight_per_channel(w)
        ref = matmul_w8_xla(x, wq, s)
        out = matmul_w8(x, wq, s, **BLK)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
        # and close to the fp matmul
        fp = x @ w
        rel = np.abs(np.asarray(out) - np.asarray(fp)).mean() / np.abs(fp).mean()
        assert rel < 0.01

    def test_w8a8(self, xw):
        x, w = xw
        wq, s = quantize_weight_per_channel(w)
        ref = matmul_w8a8_xla(x, wq, s)
        out = matmul_w8a8(x, wq, s, **BLK)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-3, atol=1e-3)

    def test_w4a8(self, xw):
        x, w = xw
        wp, s = quantize_weight_int4(w)
        ref = matmul_w4a8_xla(x, wp, s)
        out = matmul_w4a8(x, wp, s, **BLK)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-3, atol=1e-3)
        # and loosely against the float matmul
        fp = np.asarray(x) @ np.asarray(w)
        rel = np.mean((np.asarray(out) - fp) ** 2) / np.mean(fp ** 2)
        assert rel < 0.05  # int4 weight error dominates

    def test_w4(self, xw):
        x, w = xw
        packed, s = quantize_weight_int4(w)
        ref = matmul_w4_xla(x, packed, s)
        out = matmul_w4(x, packed, s, **BLK)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_unaligned_m(self, rng):
        x = jnp.asarray(rng.randn(5, 256).astype(np.float32))
        w = jnp.asarray(rng.randn(256, 256).astype(np.float32) * 0.1)
        wq, s = quantize_weight_per_channel(w)
        out = matmul_w8(x, wq, s, **BLK)
        assert out.shape == (5, 256)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(matmul_w8_xla(x, wq, s)),
                                   rtol=1e-4, atol=1e-4)


class TestGroupedInt4:
    def test_grouped_quant_beats_per_channel(self, rng):
        # weights with along-K scale drift: group scales adapt
        w = jnp.asarray((rng.randn(256, 128) *
                         np.logspace(-1, 1, 256)[:, None]).astype(np.float32))
        from aimet_tpu.ops.int_matmul import (
            matmul_w4_grouped_xla, quantize_weight_int4,
            quantize_weight_int4_grouped, unpack_int4, matmul_w4_xla)
        x = jnp.asarray(rng.randn(8, 256).astype(np.float32))
        fp = x @ w
        pc_p, pc_s = quantize_weight_int4(w)
        e_pc = float(jnp.mean(jnp.abs(matmul_w4_xla(x, pc_p, pc_s) - fp)))
        g_p, g_s = quantize_weight_int4_grouped(w, group_size=32)
        assert g_s.shape == (8, 128)
        e_g = float(jnp.mean(jnp.abs(
            matmul_w4_grouped_xla(x, g_p, g_s, 32) - fp)))
        assert e_g < e_pc * 0.7

    def test_grouped_kernel_matches_xla(self, rng):
        from aimet_tpu.ops.int_matmul import (
            matmul_w4_grouped, matmul_w4_grouped_xla,
            quantize_weight_int4_grouped)
        w = jnp.asarray((rng.randn(256, 256) * 0.1).astype(np.float32))
        x = jnp.asarray(rng.randn(16, 256).astype(np.float32))
        g_p, g_s = quantize_weight_int4_grouped(w, group_size=32)
        ref = matmul_w4_grouped_xla(x, g_p, g_s, 32)
        out = matmul_w4_grouped(x, g_p, g_s, group_size=32, block_m=8,
                                block_n=128, block_k=64)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


def test_w4_grouped_k_remainder_and_small_n(rng):
    """Padding regression (code review): K2 not divisible by block_k and
    N not divisible by block_n must still be exact."""
    from aimet_tpu.ops.int_matmul import (
        matmul_w4_grouped, matmul_w4_grouped_xla,
        quantize_weight_int4_grouped)

    K, N = 3072, 192          # K2=1536 (not % 1024), N not % 256
    w = jnp.asarray((rng.randn(K, N) * 0.1).astype(np.float32))
    wp, s = quantize_weight_int4_grouped(w, group_size=128)
    x = jnp.asarray(rng.randn(16, K).astype(np.float32))
    ref = matmul_w4_grouped_xla(x, wp, s, group_size=128,
                                out_dtype=jnp.float32)
    out = matmul_w4_grouped(x, wp, s, group_size=128,
                            out_dtype=jnp.float32)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_w8a8_fusedq_matches_xla(rng):
    """In-kernel dynamic activation quant (the default w8a8 route):
    bit-exact vs the XLA reference at f32 inputs, including non-multiple
    shapes (M/K padding)."""
    from aimet_tpu.ops.int_matmul import matmul_w8a8_fusedq

    for (m, k, n) in [(64, 256, 256), (100, 300, 200), (8, 128, 128)]:
        x = jnp.asarray(rng.randn(m, k).astype(np.float32))
        w = jnp.asarray(rng.randn(k, n).astype(np.float32) * 0.1)
        wq, sw = quantize_weight_per_channel(w)
        got = np.asarray(matmul_w8a8_fusedq(x, wq, sw, block_m=64,
                                            block_n=128))
        ref = np.asarray(matmul_w8a8_xla(x, wq, sw))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_q8_fused_col_bias(rng):
    """matmul_q8 col_bias: fused per-column epilogue add (zero-point
    correction path of the static w8a8 lowering)."""
    from aimet_tpu.ops.int_matmul import matmul_q8

    x = jnp.asarray(rng.randn(16, 256).astype(np.float32))
    w = jnp.asarray(rng.randn(256, 256).astype(np.float32) * 0.1)
    wq, sw = quantize_weight_per_channel(w)
    xq, sx = quantize_activation_per_row(x)
    bias = jnp.asarray(rng.randn(256).astype(np.float32))
    want = np.asarray(matmul_q8(xq, sx, wq, sw, **BLK)) + np.asarray(bias)
    got = np.asarray(matmul_q8(xq, sx, wq, sw, bias, **BLK))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
