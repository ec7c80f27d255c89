"""Real-TPU kernel parity tier (VERDICT r1 weak #6).

The unit suite forces an 8-device CPU mesh (tests/conftest.py), so Pallas
kernels are only ever CI-tested in interpret mode. This tier runs the SAME
kernel-vs-XLA-reference parity checks compiled through Mosaic on the real
chip — catching Mosaic lowering regressions the interpreter can't.

Run manually (NOT under tests/, so the CPU conftest doesn't apply):
    python -m pytest tests_tpu/ -q
The driver's bench step also executes these checks inline (bench.py
``parity_check``) before timing, so every recorded benchmark run gates on
on-chip numerical correctness first.
"""
import jax
import numpy as np
import pytest

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp

if jax.devices()[0].platform not in ("tpu", "axon"):
    pytest.skip("real-TPU tier: requires a TPU device", allow_module_level=True)


def test_kernels_match_xla_on_chip():
    from bench import parity_check
    parity_check()


def test_int_conv_matches_fp_on_chip():
    from aimet_tpu.ops.int_conv import conv2d_w8a8_dynamic

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 16, 32) * 0.1).astype(np.float32))
    # per-output-channel symmetric int8 quant of the HWIO kernel
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-8) / 127.0
    wq = jnp.clip(jnp.round(w / s[None, None, None, :]),
                  -127, 127).astype(jnp.int8)
    got = np.asarray(conv2d_w8a8_dynamic(
        x, wq, s, strides=(1, 1), padding=((1, 1), (1, 1))))
    ref = np.asarray(jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))))
    rel = np.mean((got - ref) ** 2) / np.mean(ref ** 2)
    assert np.isfinite(got).all() and rel < 5e-3, rel
