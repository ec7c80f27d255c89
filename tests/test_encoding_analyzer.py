"""Analyzer tests mirroring the reference's gtest suites
(DlQuantization/test/TestTfEnhancedEncodingAnalyzer.cpp and friends):
synthetic Gaussian/uniform vectors with analytically-known expectations.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aimet_tpu.quantization.encoding_analyzer import (
    EncodingAnalyzer,
    HistogramState,
    MinMaxState,
    PDF_SIZE,
    update_histogram,
    update_min_max,
)


class TestMinMax:
    def test_running_min_max(self, rng):
        a = EncodingAnalyzer("minmax")
        st = a.init_state()
        st = a.update(st, jnp.asarray(rng.uniform(-1, 1, 1000).astype(np.float32)))
        st = a.update(st, jnp.asarray(rng.uniform(-2, 3, 1000).astype(np.float32)))
        assert float(st.min) < -1.9 and float(st.max) > 2.9
        enc = a.compute(st, bitwidth=8, symmetric=False)
        # asymmetric encoding covers the observed range (after grid snap)
        assert float(enc.min) <= float(st.min) + float(enc.delta)
        assert float(enc.max) >= float(st.max) - float(enc.delta)

    def test_zero_always_included(self):
        a = EncodingAnalyzer("minmax")
        st = a.update(a.init_state(), jnp.asarray(np.float32([5.0, 6.0])))
        enc = a.compute(st, bitwidth=8)
        assert float(enc.min) <= 0.0

    def test_compute_before_update_raises(self):
        a = EncodingAnalyzer("minmax")
        with pytest.raises(RuntimeError):
            a.compute(a.init_state(), bitwidth=8)

    def test_per_channel(self, rng):
        a = EncodingAnalyzer("minmax", channel_axis=1)
        x = jnp.asarray(rng.randn(16, 4).astype(np.float32) * np.float32([1, 2, 3, 4]))
        st = a.init_state(x.shape)
        st = a.update(st, x)
        enc = a.compute(st, bitwidth=8, symmetric=True)
        assert enc.delta.shape == (4,)
        d = np.asarray(enc.delta)
        assert np.all(np.diff(d) > 0)  # larger channels -> larger delta

    def test_update_is_jittable(self, rng):
        a = EncodingAnalyzer("minmax")
        st = a.init_state()
        upd = jax.jit(a.update)
        st = upd(st, jnp.asarray(rng.randn(100).astype(np.float32)))
        assert bool(st.updated)


class TestHistogram:
    def test_first_batch_fixes_range(self, rng):
        st = HistogramState.init()
        x = jnp.asarray(rng.uniform(-1, 1, 10000).astype(np.float32))
        st = update_histogram(st, x)
        assert bool(st.initialized)
        # Range enlarged 3x around the center (InitializePdf)
        assert float(st.xleft[0]) < -2.0
        assert float(st.xleft[-1]) > 2.0
        assert int(st.iterations) == 1
        np.testing.assert_allclose(float(jnp.sum(st.pdf)), 1.0, atol=1e-5)

    def test_all_zero_first_batch_skipped(self):
        st = HistogramState.init()
        st = update_histogram(st, jnp.zeros(100))
        assert not bool(st.initialized)
        st = update_histogram(st, jnp.ones(100))
        assert bool(st.initialized)

    def test_running_mean_over_batches(self, rng):
        st = HistogramState.init()
        x = jnp.asarray(rng.uniform(-1, 1, 1000).astype(np.float32))
        st1 = update_histogram(st, x)
        st2 = update_histogram(st1, x)
        # identical batches -> pdf unchanged by averaging
        np.testing.assert_allclose(np.asarray(st2.pdf), np.asarray(st1.pdf), atol=1e-6)
        assert int(st2.iterations) == 2

    def test_out_of_range_values_dropped(self, rng):
        st = HistogramState.init()
        st = update_histogram(st, jnp.asarray(rng.uniform(-1, 1, 1000).astype(np.float32)))
        st = update_histogram(st, jnp.asarray(np.float32([100.0] * 100)))
        # second batch fully out of range: pdf mass halves on average
        np.testing.assert_allclose(float(jnp.sum(st.pdf)), 0.5, atol=1e-5)

    def test_jit_and_scan(self, rng):
        st = HistogramState.init()
        xs = jnp.asarray(rng.randn(4, 1000).astype(np.float32))
        def step(s, x):
            return update_histogram(s, x), None
        st, _ = jax.lax.scan(step, st, xs)
        assert int(st.iterations) == 4


class TestSqnr:
    def test_gaussian_encoding_reasonable(self, rng):
        a = EncodingAnalyzer("sqnr")
        st = a.init_state()
        x = jnp.asarray(rng.randn(100000).astype(np.float32))
        st = a.update(st, x)
        enc = a.compute(st, bitwidth=8, symmetric=False)
        # SQNR-optimal range for a Gaussian at 8 bits covers most of the data
        assert -6.0 < float(enc.min) < -2.0
        assert 2.0 < float(enc.max) < 6.0
        assert float(enc.delta) > 0

    def test_symmetric_search(self, rng):
        a = EncodingAnalyzer("sqnr")
        st = a.update(a.init_state(), jnp.asarray(rng.randn(50000).astype(np.float32)))
        enc = a.compute(st, bitwidth=8, symmetric=True)
        assert float(enc.offset) == -128
        np.testing.assert_allclose(-float(enc.min) / 128, float(enc.max) / 127, rtol=1e-5)

    def test_all_zero_data_fallback(self):
        a = EncodingAnalyzer("sqnr")
        st = a.update(a.init_state(), jnp.zeros(100))
        enc = a.compute(st, bitwidth=8)
        # [-1, 1] fallback (TfEnhancedEncodingAnalyzer.cpp:90-104)
        assert float(enc.min) <= -0.9 and float(enc.max) >= 0.9

    def test_narrow_better_than_minmax_for_outliers(self, rng):
        # One large outlier: at low bitwidth the quantization cost of covering
        # it dominates the (GAMMA-weighted) saturation cost, so SQNR clips it;
        # minmax must cover it.
        data = np.concatenate([rng.randn(100000), [50.0]]).astype(np.float32)
        x = jnp.asarray(data)
        sq = EncodingAnalyzer("sqnr")
        mm = EncodingAnalyzer("minmax")
        e_sq = sq.compute(sq.update(sq.init_state(), x), 4)
        e_mm = mm.compute(mm.update(mm.init_state(), x), 4)
        assert float(e_sq.max) < float(e_mm.max) / 2
        # at 8 bits both cover (cost model keeps the outlier) but SQNR never
        # exceeds the observed range
        e_sq8 = sq.compute(sq.update(sq.init_state(), x), 8)
        assert float(e_sq8.max) <= float(e_mm.max) + 1e-3


class TestPercentile:
    def test_p100_degenerates_to_range(self, rng):
        a = EncodingAnalyzer("percentile", percentile=100.0)
        x = jnp.asarray(rng.uniform(-1, 1, 50000).astype(np.float32))
        enc = a.compute(a.update(a.init_state(), x), 8)
        assert float(enc.min) < -0.9 and float(enc.max) > 0.9

    def test_p99_clips_tails(self, rng):
        x = jnp.asarray(rng.randn(200000).astype(np.float32))
        a99 = EncodingAnalyzer("percentile", percentile=99.0)
        a100 = EncodingAnalyzer("percentile", percentile=100.0)
        e99 = a99.compute(a99.update(a99.init_state(), x), 8)
        e100 = a100.compute(a100.update(a100.init_state(), x), 8)
        assert float(e99.max) < float(e100.max)
        assert float(e99.min) > float(e100.min)
        # p99 of N(0,1) is ~2.33; histogram-grid resolution is coarse
        assert 1.5 < float(e99.max) < 3.2


class TestMse:
    def test_outlier_clipping(self, rng):
        data = np.concatenate([rng.randn(100000), [100.0]]).astype(np.float32)
        a = EncodingAnalyzer("mse")
        enc = a.compute(a.update(a.init_state(), jnp.asarray(data)), 4)
        assert float(enc.max) < 50.0

    def test_uniform_close_to_full_range(self, rng):
        x = jnp.asarray(rng.uniform(-1, 1, 100000).astype(np.float32))
        a = EncodingAnalyzer("mse")
        enc = a.compute(a.update(a.init_state(), x), 8)
        assert float(enc.min) < -0.8 and float(enc.max) > 0.8


class TestEntropy:
    def test_basic_range(self, rng):
        x = jnp.asarray(rng.randn(100000).astype(np.float32))
        a = EncodingAnalyzer("entropy")
        enc = a.compute(a.update(a.init_state(), x), 8)
        assert float(enc.min) < 0 < float(enc.max)
        assert float(enc.max) < 6.0

    def test_rescaling_histogram_grows(self, rng):
        a = EncodingAnalyzer("entropy")
        st = a.init_state()
        st = a.update(st, jnp.asarray(rng.uniform(-1, 1, 1000).astype(np.float32)))
        total1 = float(jnp.sum(st.hist))
        st = a.update(st, jnp.asarray(rng.uniform(-5, 5, 1000).astype(np.float32)))
        assert float(st.min) < -4 and float(st.max) > 4
        # counts preserved through the rescale
        np.testing.assert_allclose(float(jnp.sum(st.hist)), total1 + 1000, rtol=1e-3)


class TestPerChannelHistogram:
    def test_sqnr_per_channel(self, rng):
        a = EncodingAnalyzer("sqnr", channel_axis=0)
        x = jnp.asarray((rng.randn(3, 10000) * np.float32([[1], [2], [4]])).astype(np.float32))
        st = a.init_state(x.shape)
        st = a.update(st, x)
        enc = a.compute(st, 8, symmetric=True)
        d = np.asarray(enc.delta)
        assert d.shape == (3,)
        assert d[0] < d[1] < d[2]


def test_entropy_optimizes_at_low_bitwidths(rng):
    """KL calibration generalized past the reference's hardcoded 8-bit
    (EntropyEncodingAnalyzer.cpp nqb=255): at 4-bit a heavy-tailed
    distribution must clip the range rather than fall back to min/max."""
    import warnings

    a = EncodingAnalyzer("entropy")
    x = np.concatenate([rng.randn(20000).astype(np.float32),
                        np.asarray([40.0], np.float32)])  # one huge outlier
    st = a.update(a.init_state(), jnp.asarray(x))
    with warnings.catch_warnings():
        warnings.simplefilter("error")   # no fallback warning allowed
        enc = a.compute(st, bitwidth=4, symmetric=False)
    assert float(enc.max) < 20.0         # outlier clipped away
    assert float(enc.max) > 1.0
