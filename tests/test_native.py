"""Native C++ library parity tests: C++ searches must match the numpy
reference implementations on random calibration states."""
import jax.numpy as jnp
import numpy as np
import pytest

from aimet_tpu import native
from aimet_tpu.quantization import encoding_analyzer as ea


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")


def make_state(rng, dist="normal"):
    st = ea.HistogramState.init()
    if dist == "normal":
        x = rng.randn(50000).astype(np.float32)
    elif dist == "outlier":
        x = np.concatenate([rng.randn(50000), [30.0]]).astype(np.float32)
    else:
        x = np.abs(rng.randn(50000)).astype(np.float32)
    st = ea.update_histogram(st, jnp.asarray(x))
    return (np.asarray(st.xleft, np.float64), np.asarray(st.pdf, np.float64))


@pytest.mark.parametrize("dist", ["normal", "outlier", "positive"])
@pytest.mark.parametrize("symmetric", [False, True])
@pytest.mark.parametrize("bw", [4, 8])
def test_sqnr_parity(rng, dist, symmetric, bw):
    xleft, pdf = make_state(rng, dist)
    ref = ea._sqnr_search(xleft, pdf, bw, symmetric, False, False)
    got = native.sqnr_search(xleft, pdf, bw, symmetric, False, False)
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("pct", [100.0, 99.9, 99.0, 90.0])
def test_percentile_parity(rng, pct):
    xleft, pdf = make_state(rng)
    ref = ea._percentile_range(xleft, pdf, pct)
    got = native.percentile_range(xleft, pdf, pct)
    np.testing.assert_allclose(got, ref, rtol=1e-9)


@pytest.mark.parametrize("dist", ["normal", "outlier"])
@pytest.mark.parametrize("bw", [4, 8])
def test_mse_parity(rng, dist, bw):
    xleft, pdf = make_state(rng, dist)
    ref = ea._mse_search(xleft, pdf, bw, False, False, False)
    got = native.mse_search(xleft, pdf, bw, False, False, False)
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_batch_search(rng):
    states = [make_state(rng, d) for d in ("normal", "outlier", "positive")]
    xleft = np.stack([s[0] for s in states])
    pdf = np.stack([s[1] for s in states])
    out = native.sqnr_search_batch(xleft, pdf, 8, True)
    assert out.shape == (3, 4)
    for i in range(3):
        single = native.sqnr_search(xleft[i], pdf[i], 8, True)
        np.testing.assert_allclose(out[i], single)


def test_native_is_faster_for_many_channels(rng):
    import time
    states = [make_state(rng) for _ in range(32)]
    xleft = np.stack([s[0] for s in states])
    pdf = np.stack([s[1] for s in states])
    t0 = time.perf_counter()
    native.sqnr_search_batch(xleft, pdf, 8, False)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(32):
        ea._sqnr_search(xleft[i], pdf[i], 8, False, False, False)
    t_py = time.perf_counter() - t0
    assert t_native < t_py  # C++ beats numpy-per-channel
