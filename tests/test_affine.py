"""Grid-math parity tests vs. the reference C++ semantics.

Oracles are hand-computed from getComputedEncodings
(quantization_utils.cpp:58-140) and quantizeValueCpu (trim_functions.cpp).
"""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from aimet_tpu.quantization import affine


def enc(mn, mx, bw=8, sym=False, strict=False, unsigned=False):
    return affine.compute_encoding_from_min_max(
        jnp.float32(mn), jnp.float32(mx), bw, sym, strict, unsigned)


class TestComputeEncoding:
    def test_symmetric_signed_8bit(self):
        e = enc(-1.0, 0.5, sym=True)
        # amax = 1.0; delta = 1/127; offset = -128
        assert np.isclose(float(e.delta), 1.0 / 127)
        assert float(e.offset) == -128
        assert np.isclose(float(e.min), -128 / 127)
        assert np.isclose(float(e.max), 1.0)

    def test_symmetric_strict(self):
        e = enc(-1.0, 1.0, sym=True, strict=True)
        # num_steps = 254; floor/ceil(254/2) = 127
        assert float(e.offset) == -127
        assert np.isclose(float(e.delta), 1.0 / 127)
        assert np.isclose(float(e.min), -1.0)
        assert np.isclose(float(e.max), 1.0)

    def test_unsigned_symmetric_positive_range(self):
        e = enc(0.0, 2.0, sym=True, unsigned=True)
        # all-positive + unsigned allowed -> asymmetric-style grid
        assert float(e.offset) == 0
        assert np.isclose(float(e.delta), 2.0 / 255)

    def test_unsigned_symmetric_negative_falls_back_to_signed(self):
        e = enc(-1.0, 2.0, sym=True, unsigned=True)
        assert float(e.offset) == -128
        assert np.isclose(float(e.delta), 2.0 / 127)

    def test_asymmetric_zero_snap(self):
        e = enc(-0.3, 1.0, sym=False)
        delta = 1.3 / 255
        b_zero = round(0.3 / delta)
        assert float(e.offset) == -b_zero
        assert np.isclose(float(e.min), delta * -b_zero, atol=1e-7)
        assert np.isclose(float(e.max), 1.3 + float(e.min), atol=1e-6)
        # zero must be exactly representable
        q0 = round(0.0 / float(e.delta)) - float(e.offset)
        assert (q0 + float(e.offset)) * float(e.delta) == 0.0

    def test_asymmetric_all_positive_keeps_range(self):
        e = enc(0.0, 1.0, sym=False)
        assert float(e.min) == 0.0
        assert float(e.max) == 1.0
        assert float(e.offset) == 0.0

    def test_asymmetric_all_negative(self):
        e = enc(-1.0, 0.0, sym=False)
        assert float(e.offset) == -255
        assert np.isclose(float(e.delta), 1.0 / 255)

    def test_vectorized_per_channel(self):
        mins = jnp.array([-1.0, -0.5, 0.0])
        maxs = jnp.array([1.0, 2.0, 4.0])
        e = affine.compute_encoding_from_min_max(mins, maxs, 8, True, False, False)
        assert e.delta.shape == (3,)
        np.testing.assert_allclose(
            np.asarray(e.delta), [1 / 127, 2 / 127, 4 / 127], rtol=1e-6)

    @pytest.mark.parametrize("bw", [4, 8, 16])
    def test_bitwidths(self, bw):
        e = enc(-1.0, 1.0, bw=bw, sym=True)
        ns = 2 ** bw - 1
        assert np.isclose(float(e.delta), 1.0 / math.floor(ns / 2))


class TestQuantDequant:
    def test_roundtrip_identity_on_grid(self, rng):
        e = enc(-1.0, 1.0, sym=True)
        # Points exactly on the grid survive the round trip bit-exactly.
        q_codes = jnp.arange(0, 256, dtype=jnp.float32)
        x = (q_codes + e.offset) * e.delta
        q = affine.quantize(x, e.delta, e.offset, e.num_steps)
        np.testing.assert_array_equal(np.asarray(q), np.asarray(q_codes))
        xr = affine.dequantize(q, e.delta, e.offset)
        np.testing.assert_allclose(np.asarray(xr), np.asarray(x), rtol=1e-6)

    def test_saturation(self):
        e = enc(-1.0, 1.0, sym=True)
        x = jnp.array([-10.0, 10.0])
        out = affine.quantize_dequantize_encoding(x, e)
        np.testing.assert_allclose(
            np.asarray(out), [float(e.min), float(e.max)], rtol=1e-6)

    def test_max_error_half_delta(self, rng):
        e = enc(-1.0, 1.0, sym=False)
        x = jnp.asarray(rng.uniform(-1, 1, 1024).astype(np.float32))
        out = affine.quantize_dequantize_encoding(x, e)
        err = np.abs(np.asarray(out) - np.asarray(x))
        assert err.max() <= float(e.delta) / 2 + 1e-7

    def test_per_channel_broadcast(self, rng):
        x = jnp.asarray(rng.randn(4, 8, 3, 3).astype(np.float32))
        mins, maxs = affine.reduce_min_max(x, channel_axis=0)
        e = affine.compute_encoding_from_min_max(mins, maxs, 8, True)
        out = affine.quantize_dequantize_encoding(x, e, channel_axis=0)
        assert out.shape == x.shape
        for c in range(4):
            ec = affine.compute_encoding_from_min_max(mins[c], maxs[c], 8, True)
            ref = affine.quantize_dequantize_encoding(x[c], ec)
            np.testing.assert_allclose(np.asarray(out[c]), np.asarray(ref), rtol=1e-6)

    def test_quantize_to_int_signed_symmetric(self, rng):
        x = jnp.asarray(rng.randn(64).astype(np.float32))
        mins, maxs = affine.reduce_min_max(x)
        e = affine.compute_encoding_from_min_max(mins, maxs, 8, True)
        q = affine.quantize_to_int(x, e, signed=True)
        assert q.dtype == jnp.int8
        deq = np.asarray(q, np.float32) * float(e.delta)
        np.testing.assert_allclose(
            deq, np.asarray(affine.quantize_dequantize_encoding(x, e)), atol=1e-6)

    def test_stochastic_rounding_unbiased(self):
        import jax
        e = enc(0.0, 255.0, sym=False)  # delta = 1
        x = jnp.full((20000,), 10.4, jnp.float32)
        q = affine.quantize(x, e.delta, e.offset, e.num_steps,
                            stochastic_key=jax.random.PRNGKey(0))
        mean = float(jnp.mean(q))
        assert abs(mean - 10.4) < 0.02


class TestGateMinMax:
    def test_includes_zero(self):
        mn, mx = affine.gate_min_max(jnp.float32(0.5), jnp.float32(1.0))
        assert float(mn) == 0.0 and float(mx) == 1.0

    def test_min_range(self):
        mn, mx = affine.gate_min_max(jnp.float32(0.0), jnp.float32(0.0))
        assert float(mx) - float(mn) >= 0.01 - 1e-7
