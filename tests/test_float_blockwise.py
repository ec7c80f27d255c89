"""FP16/FP8 simulation and blockwise/LPBQ quantization tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aimet_tpu.quantization.blockwise import (
    blockwise_encoding,
    blockwise_quantize_dequantize,
    grouped_block_quantize_dequantize,
    lpbq_compress_scales,
)
from aimet_tpu.quantization.float_sim import (
    fake_cast_fp16,
    fake_cast_to_ieee_float,
    init_fp8_maxval_minmax,
    init_fp8_maxval_mse,
    quantize_to_fp8,
)


class TestFloatSim:
    def test_fp16_roundtrip(self, rng):
        x = jnp.asarray(rng.randn(256).astype(np.float32))
        y = fake_cast_fp16(x)
        assert y.dtype == jnp.float32
        # fp16 has ~3 decimal digits
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-3)
        assert np.any(np.asarray(y) != np.asarray(x))

    def test_fp8_representable_values_exact(self):
        # powers of two well inside range are exactly representable
        x = jnp.asarray([0.5, 1.0, 2.0, -1.0, -0.25])
        y = fake_cast_to_ieee_float(x, jnp.float32(4.0))
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-5)

    def test_fp8_clips_at_maxval(self):
        x = jnp.asarray([10.0, -10.0])
        y = fake_cast_to_ieee_float(x, jnp.float32(2.0))
        assert np.abs(np.asarray(y)).max() <= 2.0 + 1e-6

    def test_fp8_relative_error_bounded(self, rng):
        x = jnp.asarray(rng.randn(4096).astype(np.float32))
        mv = init_fp8_maxval_minmax(x)
        y = quantize_to_fp8(x, mv)
        rel = np.abs(np.asarray(y - x)) / (np.abs(np.asarray(x)) + 1e-6)
        # E4M3: 3 mantissa bits -> relative error <~ 2^-4 in normal range
        assert np.median(rel) < 0.07

    def test_fp8_mse_init_beats_or_matches_minmax(self, rng):
        data = np.concatenate([rng.randn(10000), [20.0]]).astype(np.float32)
        x = jnp.asarray(data)
        mv_mm = init_fp8_maxval_minmax(x)
        mv_mse = init_fp8_maxval_mse(x)
        e_mm = float(jnp.mean((quantize_to_fp8(x, mv_mm) - x) ** 2))
        e_mse = float(jnp.mean((quantize_to_fp8(x, mv_mse) - x) ** 2))
        # FP8's per-element log2 scales make clipping nearly free, so the
        # sweep may keep the full range — it must never be worse than minmax
        assert e_mse <= e_mm * 1.001

    def test_fp8_per_channel(self, rng):
        x = jnp.asarray((rng.randn(16, 4) * np.float32([1, 2, 4, 8])).astype(np.float32))
        mv = init_fp8_maxval_mse(x, channel_axis=1)
        assert mv.shape == (4,)
        y = quantize_to_fp8(x, mv, channel_axis=1)
        assert y.shape == x.shape


class TestBlockwise:
    def test_blockwise_beats_per_tensor_at_int4(self, rng):
        # weights with per-region scale variation
        w = jnp.asarray((rng.randn(128, 64) *
                         np.logspace(-1, 1, 128)[:, None]).astype(np.float32))
        from aimet_tpu.quantization.affine import (
            compute_encoding_from_min_max, quantize_dequantize_encoding,
            reduce_min_max)
        mn, mx = reduce_min_max(w)
        enc = compute_encoding_from_min_max(mn, mx, 4, True)
        e_pt = float(jnp.mean((quantize_dequantize_encoding(w, enc) - w) ** 2))
        out = blockwise_quantize_dequantize(w, block_size=32, axis=0, bitwidth=4)
        e_bw = float(jnp.mean((out - w) ** 2))
        assert e_bw < e_pt / 4

    def test_block_encoding_shapes(self, rng):
        w = jnp.asarray(rng.randn(64, 32).astype(np.float32))
        enc = blockwise_encoding(w, block_size=16, axis=0, bitwidth=4)
        assert enc.delta.shape == (4, 1, 32)

    def test_lpbq_scale_compression(self, rng):
        scale = jnp.asarray(np.abs(rng.randn(16)).astype(np.float32) + 0.1)
        deq, int_s, pg = lpbq_compress_scales(scale, group_size=16, axis=0,
                                              scale_bitwidth=4)
        assert deq.shape == scale.shape
        # integer multipliers in [1, 16]
        assert int_s.min() >= 1 and int_s.max() <= 16
        # compressed scales approximate the originals
        rel = np.abs(np.asarray(deq - scale)) / np.asarray(scale)
        assert rel.max() < 0.5

    def test_grouped_block_qdq(self, rng):
        w = jnp.asarray(rng.randn(128, 64).astype(np.float32))
        out, enc = grouped_block_quantize_dequantize(
            w, block_size=32, axis=0, bitwidth=4, scale_bitwidth=4)
        assert out.shape == w.shape
        # error worse than plain blockwise (scale quantization) but bounded
        plain = blockwise_quantize_dequantize(w, 32, 0, 4)
        e_plain = float(jnp.mean((plain - w) ** 2))
        e_lpbq = float(jnp.mean((out - w) ** 2))
        assert e_plain <= e_lpbq <= e_plain * 4 + 1e-8
