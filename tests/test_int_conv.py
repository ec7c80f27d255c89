"""Fused dequant-conv (ops/int_conv.py) vs lax.conv references."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aimet_tpu.ops.int_conv import (
    conv2d_w4, conv2d_w8, conv2d_w8a8,
    quantize_conv_weight_int4, quantize_conv_weight_per_channel)
from aimet_tpu.ops.int_matmul import unpack_int4


def _ref_conv(x, w, strides, padding):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.fixture
def setup(rng):
    x = jnp.asarray(rng.randn(2, 12, 12, 8).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 8, 16) * 0.2).astype(np.float32))
    return x, w


@pytest.mark.parametrize("strides,padding", [((1, 1), "SAME"),
                                             ((2, 2), "VALID")])
def test_conv_w8_matches_dequant_reference(setup, strides, padding):
    x, w = setup
    w_q, scale = quantize_conv_weight_per_channel(w)
    # exact reference: conv with the dequantized weights
    kh, kw, ci, co = w.shape
    w_deq2d = w_q.astype(jnp.float32) * scale[None, :]
    w_deq = jnp.transpose(w_deq2d.reshape(ci, kh, kw, co), (1, 2, 0, 3))
    ref = _ref_conv(x, w_deq, strides, padding)
    out = conv2d_w8(x, w_q, scale, (3, 3), strides=strides, padding=padding)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_conv_w8_close_to_fp(setup):
    x, w = setup
    w_q, scale = quantize_conv_weight_per_channel(w)
    ref = _ref_conv(x, w, (1, 1), "SAME")
    out = conv2d_w8(x, w_q, scale, (3, 3))
    err = float(jnp.mean((out - ref) ** 2) / jnp.mean(ref ** 2))
    assert err < 1e-4          # INT8 per-channel weight error only


def test_conv_w8a8_close_to_fp(setup):
    x, w = setup
    w_q, scale = quantize_conv_weight_per_channel(w)
    ref = _ref_conv(x, w, (1, 1), "SAME")
    out = conv2d_w8a8(x, w_q, scale, (3, 3))
    err = float(jnp.mean((out - ref) ** 2) / jnp.mean(ref ** 2))
    assert err < 5e-4          # adds per-pixel activation quant error


def test_conv_w4_matches_dequant_reference(setup):
    x, w = setup
    wp, scale = quantize_conv_weight_int4(w)
    w_deq2d = unpack_int4(wp).astype(jnp.float32) * scale[None, :]
    kh, kw, ci, co = w.shape
    w_deq = jnp.transpose(w_deq2d.reshape(ci, kh, kw, co), (1, 2, 0, 3))
    ref = _ref_conv(x, w_deq, (1, 1), "SAME")
    out = conv2d_w4(x, wp, scale, (3, 3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
