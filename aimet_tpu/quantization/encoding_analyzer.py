"""Calibration observers and encoding analyzers.

Design split (TPU-first):
  - ``update(state, x)`` is a pure jittable function over a pytree state — it
    runs on-device once per calibration batch (the hot path, vectorized; can
    be ``lax.scan``-ed over batches and ``psum``-reduced across a mesh).
  - ``compute(state, ...)`` runs once at the end of calibration on the host
    (numpy) — grid searches (SQNR / MSE / KL) stay faithful to the reference
    without contorting them into jit.

Reference semantics reproduced:
  - 512-bin PDF, first batch fixes the range (3x enlarged), running-mean over
    batches — ``InitializePdf``/``UpdatePdf``
    (DlQuantization/src/math_functions.cpp:208-288); bucket mapping by
    ``round((x - left0)/width)`` with out-of-range values *dropped*
    (``GetHistogram_cpu``, math_functions.cpp:368-384).
  - Min-max analyzer: running min/max + zero-inclusion + MIN_RANGE=0.01
    (TfEncodingAnalyzer.cpp:60-100).
  - TF-enhanced SQNR grid search: candidates and GAMMA=3.0 cost
    (TfEnhancedEncodingAnalyzer.cpp:79-400).
  - Percentile: CDF clipping over the averaged PDF
    (PercentileEncodingAnalyzer.cpp:120-200).
  - MSE: bin-edge candidate cross-product, pdf-weighted fake-quant MSE
    (MseEncodingAnalyzer.cpp:130-264).
  - Entropy (KL): auto-rescaling histogram (math_functions.cpp:477-560) +
    TensorRT-style sliding-window KL with histogram conditioning
    (EntropyEncodingAnalyzer.cpp:156-400).
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .affine import (
    AffineEncoding,
    compute_encoding_from_min_max,
    gate_min_max,
    num_quant_steps,
)

PDF_SIZE = 512
MIN_RANGE = 0.01
GAMMA = 3.0  # saturation-cost weight (TfEnhancedEncodingAnalyzer.h:102)

# Use the native (C++) host-side searches when the library builds; the numpy
# implementations below remain the semantic reference and the fallback.
USE_NATIVE = True


def _native():
    if not USE_NATIVE:
        return None
    try:
        from .. import native as _native_mod
    except Exception:
        return None
    return _native_mod if _native_mod.available() else None


# ---------------------------------------------------------------------------
# Observer states (pytrees) and jittable updates
# ---------------------------------------------------------------------------

@struct.dataclass
class MinMaxState:
    """Running min/max accumulator. Leading dims = channel dims (or none)."""
    min: jax.Array
    max: jax.Array
    updated: jax.Array  # bool

    @classmethod
    def init(cls, shape=()):
        return cls(
            min=jnp.full(shape, jnp.inf, jnp.float32),
            max=jnp.full(shape, -jnp.inf, jnp.float32),
            updated=jnp.zeros(shape, bool),
        )


@struct.dataclass
class HistogramState:
    """Fixed-grid 512-bin running-mean PDF (reference ``PDF`` struct)."""
    xleft: jax.Array       # (..., 512) left edges
    pdf: jax.Array         # (..., 512) running-mean probability density
    iterations: jax.Array  # (...,) int32
    initialized: jax.Array  # (...,) bool
    updated: jax.Array     # (...,) bool — any data seen (even all-zero)

    @classmethod
    def init(cls, shape=()):
        return cls(
            xleft=jnp.zeros(shape + (PDF_SIZE,), jnp.float32),
            pdf=jnp.zeros(shape + (PDF_SIZE,), jnp.float32),
            iterations=jnp.zeros(shape, jnp.int32),
            initialized=jnp.zeros(shape, bool),
            updated=jnp.zeros(shape, bool),
        )


@struct.dataclass
class RescalingHistogramState:
    """Auto-rescaling histogram (reference ``TensorProfilingParams``)."""
    hist: jax.Array        # (..., 512) raw counts
    min: jax.Array         # (...,)
    max: jax.Array         # (...,)
    initialized: jax.Array  # (...,) bool
    updated: jax.Array     # (...,) bool — any data seen (even all-zero)

    @classmethod
    def init(cls, shape=()):
        return cls(
            hist=jnp.zeros(shape + (PDF_SIZE,), jnp.float32),
            min=jnp.zeros(shape, jnp.float32),
            max=jnp.zeros(shape, jnp.float32),
            initialized=jnp.zeros(shape, bool),
            updated=jnp.zeros(shape, bool),
        )


def update_min_max(state: MinMaxState, x: jax.Array) -> MinMaxState:
    """Per-tensor update: x is flattened. (TfEncodingAnalyzer::updateStats)"""
    bmin = jnp.min(x).astype(jnp.float32)
    bmax = jnp.max(x).astype(jnp.float32)
    return MinMaxState(
        min=jnp.minimum(state.min, bmin),
        max=jnp.maximum(state.max, bmax),
        updated=jnp.ones_like(state.updated),
    )


def _initialize_pdf_edges(bmin, bmax):
    """InitializePdf (math_functions.cpp:208-241), signed variant."""
    bmax = jnp.where(bmin == bmax, bmin + 0.01, bmax)
    center = (bmax + bmin) / 2
    lo = center - 3 * (center - bmin)
    hi = center + 3 * (bmax - center)
    bucket = (hi - lo) / PDF_SIZE
    return lo + jnp.arange(PDF_SIZE, dtype=jnp.float32) * bucket


def update_histogram(state: HistogramState, x: jax.Array) -> HistogramState:
    """UpdatePdf (math_functions.cpp:244-288). ``x`` is 1-D (flattened)."""
    x = x.astype(jnp.float32)
    bmin, bmax = jnp.min(x), jnp.max(x)
    all_zero_batch = (bmin == 0) & (bmax == 0)

    cand_xleft = _initialize_pdf_edges(bmin, bmax)
    init_now = jnp.logical_and(~state.initialized, ~all_zero_batch)
    xleft = jnp.where(state.initialized, state.xleft, cand_xleft)
    active = state.initialized | init_now

    bucket = xleft[1] - xleft[0]
    safe_bucket = jnp.where(bucket == 0, 1.0, bucket)
    idx = jnp.round((x - xleft[0]) / safe_bucket).astype(jnp.int32)
    valid = (idx >= 0) & (idx < PDF_SIZE)
    counts = jnp.zeros((PDF_SIZE,), jnp.float32).at[
        jnp.clip(idx, 0, PDF_SIZE - 1)
    ].add(valid.astype(jnp.float32))
    prob = counts / x.size
    iters = state.iterations.astype(jnp.float32)
    new_pdf = (state.pdf * iters + prob) / (iters + 1)

    return HistogramState(
        xleft=xleft,
        pdf=jnp.where(active, new_pdf, state.pdf),
        iterations=jnp.where(active, state.iterations + 1, state.iterations),
        initialized=active,
        updated=jnp.ones_like(state.updated),
    )


def _rescale_counts(hist, old_min, old_max, new_min, new_max):
    """Proportional-overlap redistribution of counts onto a new equal grid.

    Vectorized equivalent of the reference's histogram rescale
    (math_functions.cpp:503-560): each source bin's mass is split across the
    destination bins it overlaps, proportional to overlap length.
    """
    src_w = (old_max - old_min) / PDF_SIZE
    dst_w = (new_max - new_min) / PDF_SIZE
    i = jnp.arange(PDF_SIZE, dtype=jnp.float32)
    src_lo = old_min + i * src_w          # (512,)
    src_hi = src_lo + src_w
    dst_lo = new_min + i * dst_w          # (512,)
    dst_hi = dst_lo + dst_w
    # overlap[s, d] = |[src_lo_s, src_hi_s] ∩ [dst_lo_d, dst_hi_d]| / src_w
    overlap = jnp.maximum(
        0.0,
        jnp.minimum(src_hi[:, None], dst_hi[None, :])
        - jnp.maximum(src_lo[:, None], dst_lo[None, :]),
    ) / jnp.where(src_w == 0, 1.0, src_w)
    return hist @ overlap


def update_rescaling_histogram(
    state: RescalingHistogramState, x: jax.Array
) -> RescalingHistogramState:
    """updateTensorHistogram_cpu (math_functions.cpp:477-560)."""
    x = x.astype(jnp.float32)
    bmin, bmax = jnp.min(x), jnp.max(x)
    all_zero = (bmin == 0) & (bmax == 0)
    bmax = jnp.where(bmin == bmax, bmin + 0.01, bmax)

    cur_min = jnp.where(state.initialized, state.min, bmin)
    cur_max = jnp.where(state.initialized, state.max, bmax)
    new_min = jnp.minimum(cur_min, bmin)
    new_max = jnp.maximum(cur_max, bmax)

    needs_rescale = state.initialized & ((bmin < state.min) | (bmax > state.max))
    rescaled = _rescale_counts(state.hist, cur_min, cur_max, new_min, new_max)
    hist = jnp.where(needs_rescale, rescaled, state.hist)

    width = (new_max - new_min) / PDF_SIZE
    safe_w = jnp.where(width == 0, 1.0, width)
    idx = jnp.clip(((x - new_min) / safe_w).astype(jnp.int32), 0, PDF_SIZE - 1)
    counts = jnp.zeros((PDF_SIZE,), jnp.float32).at[idx].add(1.0)
    hist = hist + counts

    active = state.initialized | ~all_zero
    return RescalingHistogramState(
        hist=jnp.where(active, hist, state.hist),
        min=jnp.where(active, new_min, state.min),
        max=jnp.where(active, new_max, state.max),
        initialized=active,
        updated=jnp.ones_like(state.updated),
    )


# ---------------------------------------------------------------------------
# Host-side encoding computation (numpy)
# ---------------------------------------------------------------------------

def _fallback_encoding(bitwidth, symmetric, strict, unsigned):
    """All-zero-data fallback covering [-1, 1]
    (TfEnhancedEncodingAnalyzer::computeEncoding, .cpp:85-107)."""
    ns = num_quant_steps(bitwidth)
    delta = 2.0 / ns
    offset = math.floor(-1.0 / delta)
    mn = offset * delta
    mx = mn + ns * delta
    return float(mn), float(mx), float(delta), float(offset)


def _find_range_of_aggregate_stats(xleft: np.ndarray, pdf: np.ndarray):
    """First/last nonzero PDF bins, include 0, enforce MIN_RANGE
    (TfEnhancedEncodingAnalyzer.cpp:256-292)."""
    nz = np.nonzero(pdf > 0)[0]
    if nz.size == 0:
        mn, mx = float(xleft[0]), float(xleft[-1])
    else:
        mn, mx = float(xleft[nz[0]]), float(xleft[nz[-1]])
    mn = min(mn, 0.0)
    mx = max(mx, 0.0)
    mx = max(mx, mn + MIN_RANGE)
    return mn, mx


def _quant_and_sat_cost_vec(xleft, pdf, bitwidth, deltas, offsets):
    """Vectorized _quantAndSatCost (TfEnhancedEncodingAnalyzer.cpp:307-350)
    over a batch of candidates. deltas/offsets: (K,). Returns (K,) costs."""
    ns = 2 ** bitwidth - 1
    pdf_start = xleft[0]
    pdf_step = xleft[1] - xleft[0]
    mids = pdf_start + np.arange(PDF_SIZE) * pdf_step + pdf_step / 2  # (512,)

    min_val = deltas * offsets                     # (K,)
    max_val = deltas * (offsets + ns)
    min_ind = np.clip(np.floor((min_val - pdf_start) / pdf_step).astype(np.int64), 0, PDF_SIZE - 1)
    max_ind = np.clip(np.floor((max_val - pdf_start) / pdf_step).astype(np.int64), 0, PDF_SIZE - 1)

    bins = np.arange(PDF_SIZE)[None, :]            # (1, 512)
    min_mid = mids[min_ind][:, None]               # (K, 1)
    max_mid = mids[max_ind][:, None]

    in_bottom = bins < min_ind[:, None]
    in_top = bins >= max_ind[:, None]
    in_mid = ~(in_bottom | in_top)

    sat_bottom = np.sum(pdf[None, :] * (mids[None, :] - min_mid) ** 2 * in_bottom, axis=1)
    sat_top = np.sum(pdf[None, :] * (mids[None, :] - max_mid) ** 2 * in_top, axis=1)

    d = deltas[:, None]
    o = offsets[:, None]
    quantized = np.round(mids[None, :] / d - o)
    dequantized = d * (quantized + o)
    quant_cost = np.sum(pdf[None, :] * (mids[None, :] - dequantized) ** 2 * in_mid, axis=1)

    return GAMMA * (sat_bottom + sat_top) + quant_cost


def _sqnr_search(xleft, pdf, bitwidth, symmetric, strict, unsigned):
    """TfEnhanced getComputedEncodings (TfEnhancedEncodingAnalyzer.cpp:355-400)."""
    mn, mx = _find_range_of_aggregate_stats(xleft, pdf)
    ns = num_quant_steps(bitwidth, strict_symmetric=symmetric and strict)
    fns = float(ns)

    deltas, offsets = [], []
    if symmetric:
        # _pickTestCandidatesSymmetric (.cpp:217-254)
        if mn == 0.0 and unsigned:
            delta_max = mx / fns
            test_offset = 0.0
        else:
            delta_max = max(abs(mx), abs(mn)) / (fns / 2.0)
            test_offset = float(math.floor(-fns / 2))
        for i in range(1, 102):
            deltas.append(i / 100.0 * delta_max)
            offsets.append(test_offset)
    else:
        # _pickTestCandidatesAsymmetric (.cpp:178-214)
        observed_delta = (mx - mn) / fns
        observed_offset = round(mn / observed_delta)
        obs_min = observed_delta * observed_offset
        obs_max = observed_delta * (observed_offset + fns)
        delta_max = observed_delta
        for fi in range(1, 18):
            f = fi / 16.0
            for i in range(21):
                test_delta = f * delta_max
                test_offset = -fns + fns / 20.0 * i
                test_offset = int(test_offset)
                # _clampToObservedMinMax (.cpp:150-175)
                tmin = test_delta * test_offset
                tmax = test_delta * (test_offset + fns)
                if tmin < obs_min and tmax > obs_max:
                    continue
                tmin = max(obs_min, tmin)
                tmax = min(obs_max, tmax)
                if tmin == tmax:
                    continue
                test_delta = (tmax - tmin) / fns
                test_offset = round(tmin / test_delta)
                deltas.append(test_delta)
                offsets.append(float(test_offset))
        deltas.append(observed_delta)
        offsets.append(float(observed_offset))

    deltas = np.asarray(deltas, np.float64)
    offsets = np.asarray(offsets, np.float64)
    costs = _quant_and_sat_cost_vec(xleft.astype(np.float64), pdf.astype(np.float64),
                                    bitwidth, deltas, offsets)
    best = int(np.argmin(costs))
    best_delta, best_offset = float(deltas[best]), float(offsets[best])
    best_min = best_delta * best_offset
    best_max = best_delta * (best_offset + fns)
    return best_min, best_max, best_delta, best_offset


def _percentile_range(xleft, pdf, percentile):
    """_computePercentileRange (PercentileEncodingAnalyzer.cpp:133-196).

    The min/max range comes from findOriginalRange (zero-included,
    MIN_RANGE-gated) and the percentile thresholds are computed in FLOAT32
    like the C++ (``float leftPercentile = 1 - percentile / 100``) — the
    float32 threshold admits cdf values that sit exactly on k/N boundaries,
    shifting the selected bin by one vs a double threshold
    (golden-vector checked: tests/test_reference_vectors.py
    pct999_strict_nm2_1)."""
    mn, mx = _find_range_of_aggregate_stats_original(xleft, pdf)
    if percentile == 100.0:
        return mn, mx
    width = float(xleft[1] - xleft[0])
    pct_min = float(xleft[0])
    pct_max = float(xleft[-1]) + width
    cdf = np.cumsum(pdf)
    left_p = float(np.float32(1.0) - np.float32(percentile) / np.float32(100.0))
    hit = np.nonzero(cdf >= left_p)[0]
    if hit.size:
        pct_min = float(xleft[hit[0]])
    right_p = float(np.float32(percentile) / np.float32(100.0))
    for i in range(PDF_SIZE - 1, -1, -1):
        if cdf[i] < right_p and xleft[i] < mx:
            pct_max = float(xleft[i]) + width
            break
    if pct_min == pct_max:
        pct_max += width
    return pct_min, pct_max


def _encoding_tuple_from_min_max(mn, mx, bitwidth, symmetric, strict, unsigned):
    enc = compute_encoding_from_min_max(
        jnp.float32(mn), jnp.float32(mx), bitwidth, symmetric, strict, unsigned)
    return float(enc.min), float(enc.max), float(enc.delta), float(enc.offset)


def _mse_search(xleft, pdf, bitwidth, symmetric, strict, unsigned):
    """_minimizeMSE (MseEncodingAnalyzer.cpp:136-264)."""
    width = float(xleft[1] - xleft[0])
    mn, mx = _find_range_of_aggregate_stats_original(xleft, pdf)
    mx = mx + width

    # Bin edges between mn and mx aligned to the histogram grid.
    edges = [mn]
    e = float(xleft[0])
    hist_max = float(xleft[-1]) + width
    while e <= hist_max + 1e-12:
        if mn <= e <= mx:
            edges.append(e)
        e += width
    edges = np.asarray(edges, np.float64)

    neg = edges[edges < 0]
    pos = edges[edges > 0]
    min_cands = np.concatenate([neg, [0.0]])
    max_cands = np.concatenate([pos, [0.0]])
    cand_min, cand_max = np.meshgrid(min_cands, max_cands, indexing="ij")
    cand_min = cand_min.ravel()[:-1]  # drop trailing {0,0}
    cand_max = cand_max.ravel()[:-1]

    # Bin centers + their pdf values.
    n_centers = len(edges) - 1
    centers = mn + width / 2 + np.arange(n_centers) * width
    pdf_idx = np.clip(np.floor((centers - xleft[0]) / width).astype(np.int64), 0, PDF_SIZE - 1)
    center_pdf = pdf[pdf_idx]

    # Vectorized cost over all candidates.
    enc = compute_encoding_from_min_max(
        jnp.asarray(cand_min, jnp.float32), jnp.asarray(cand_max, jnp.float32),
        bitwidth, symmetric, strict, unsigned)
    d = np.asarray(enc.delta, np.float64)[:, None]
    o = np.asarray(enc.offset, np.float64)[:, None]
    d = np.where(d == 0, 1e-30, d)
    clamped = np.clip(centers[None, :], cand_min[:, None], cand_max[:, None])
    q = np.round(clamped / d - o)
    deq = d * (q + o)
    costs = np.sum(center_pdf[None, :] * (centers[None, :] - deq) ** 2, axis=1)
    best = int(np.argmin(costs))
    return float(cand_min[best]), float(cand_max[best])


def _find_range_of_aggregate_stats_original(xleft, pdf):
    """findOriginalRange (math_functions.cpp:404-430): first/last nonzero
    bin edges, zero-included, with the 0.01 MIN_RANGE floor — golden-vector
    checked (the zero-inclusion shifts the MSE analyzer's candidate grid
    for all-nonnegative data; tests/test_reference_vectors.py
    mse_unsigned_relu)."""
    nz = np.nonzero(pdf > 0)[0]
    if nz.size == 0:
        mn, mx = float(xleft[0]), float(xleft[-1])
    else:
        mn, mx = float(xleft[nz[0]]), float(xleft[nz[-1]])
    mn = min(mn, 0.0)
    mx = max(mx, 0.0)
    mx = max(mx, mn + 0.01)
    return mn, mx


def _condition_histogram(h):
    """_conditionHistogram (EntropyEncodingAnalyzer.cpp:156-198)."""
    eps_zero = 0.0001
    if h.size == 0:
        return h
    is_zero = h == 0
    num_zeros = int(is_zero.sum())
    if num_zeros == h.size:
        return h
    eps_nonzero = eps_zero * num_zeros / (h.size - num_zeros)
    if eps_nonzero >= 1.0:
        return h
    out = h.copy()
    out[is_zero] += eps_zero
    out[~is_zero] -= eps_nonzero
    return out


def _compute_kl(p, q):
    p = p / p.sum()
    q = q / q.sum()
    mask = (p > 0) & (q > 0)
    return float(np.sum(p[mask] * np.log(p[mask] / q[mask])))


def _optimize_kl(hist, hist_min, hist_max, bitwidth, symmetric, strict, unsigned):
    """_optimizeKL (EntropyEncodingAnalyzer.cpp:227-400)."""
    hist = np.asarray(hist, np.float64)
    if symmetric and (hist_min < 0 or not unsigned):
        amax = max(abs(hist_max), abs(hist_min))
        hist = _rescale_hist_np(hist, hist_min, hist_max, -amax, amax)
        hist_min, hist_max = -amax, amax

    num_bins = hist.size
    # quantized-bin count at the target precision. The reference hardcodes
    # 255 because its torch entry point only calls this at 8-bit
    # (EntropyEncodingAnalyzer.cpp); generalizing to 2^bw - 1 makes KL
    # calibration meaningful for every bitwidth the histogram can resolve.
    nqb = (1 << bitwidth) - 1
    if num_bins == 0 or num_bins < nqb:
        if num_bins:
            import warnings
            warnings.warn(
                f"entropy (KL) calibration needs a histogram with at least "
                f"2^bw-1 = {nqb} bins (have {num_bins}); bitwidth="
                f"{bitwidth} falls back to the full observed range",
                stacklevel=3)
        return hist_min, hist_max

    bin_w = (hist_max - hist_min) / num_bins
    best_div = np.inf
    t_min, t_max = hist_min, hist_max
    start, stop = 0, num_bins - 1

    while stop - start + 1 >= nqb:
        win = stop - start + 1
        p = hist[start:stop + 1].copy()
        p[0] += hist[:start + 1].sum() - hist[start]
        p[-1] += hist[stop:].sum() - hist[stop]

        merged = win / nqb
        q = np.zeros(win)
        for qi in range(nqb):
            i0 = int(math.ceil(qi * merged))
            i1 = int(math.ceil((qi + 1) * merged)) if qi < nqb - 1 else win
            seg = hist[start + i0:start + i1]
            norm = int((seg != 0).sum())
            if norm:
                fill = seg.sum() / norm
                q[i0:i1] = np.where(seg != 0, fill, 0.0)
        if p.sum() == 0 or q.sum() == 0:
            break
        p = _condition_histogram(p)
        q = _condition_histogram(q)
        div = _compute_kl(p, q)
        if div < best_div:
            best_div = div
            t_min = hist_min + start * bin_w
            t_max = hist_min + (stop + 1) * bin_w
        if symmetric or strict:
            start += 1
            stop -= 1
        else:
            symm_loss = hist[start] + hist[stop]
            left_loss = hist[start] + hist[start + 1]
            right_loss = hist[stop] + hist[stop - 1]
            if symm_loss <= left_loss and symm_loss <= right_loss:
                start += 1
                stop -= 1
            elif left_loss < right_loss:
                start += 2
            else:
                stop -= 2
    return t_min, t_max


def _rescale_hist_np(src, smin, smax, dmin, dmax):
    """rescaleHistogram (math_functions.cpp:562-640), proportional overlap."""
    if src.size == 0 or (smin == dmin and smax == dmax):
        return src
    n = src.size
    sw = (smax - smin) / n
    dw = (dmax - dmin) / n
    i = np.arange(n)
    slo = smin + i * sw
    shi = slo + sw
    dlo = dmin + i * dw
    dhi = dlo + dw
    overlap = np.maximum(
        0.0, np.minimum(shi[:, None], dhi[None, :]) - np.maximum(slo[:, None], dlo[None, :])
    ) / (sw if sw != 0 else 1.0)
    return src @ overlap


# ---------------------------------------------------------------------------
# Analyzer front-end
# ---------------------------------------------------------------------------

SCHEMES = ("minmax", "sqnr", "percentile", "mse", "entropy")


class EncodingAnalyzer:
    """Static-config calibration analyzer.

    ``scheme``: one of minmax / sqnr (TF-enhanced) / percentile / mse / entropy
    — mirrors ``QuantizationMode`` (Quantization.hpp:83-108).
    ``channel_axis``: None for per-tensor; an axis index for per-channel.
    """

    def __init__(self, scheme: str = "sqnr", channel_axis: Optional[int] = None,
                 percentile: float = 100.0):
        if scheme not in SCHEMES:
            raise ValueError(f"unknown scheme {scheme!r}; expected one of {SCHEMES}")
        self.scheme = scheme
        self.channel_axis = channel_axis
        self.percentile = percentile

    # -- state ------------------------------------------------------------
    def init_state(self, tensor_shape: Tuple[int, ...] = ()):
        shape = ()
        if self.channel_axis is not None:
            shape = (tensor_shape[self.channel_axis],)
        if self.scheme == "minmax":
            return MinMaxState.init(shape)
        if self.scheme == "entropy":
            return RescalingHistogramState.init(shape)
        return HistogramState.init(shape)

    def _per_channel_view(self, x: jax.Array) -> jax.Array:
        ax = self.channel_axis
        x = jnp.moveaxis(x, ax, 0)
        return x.reshape(x.shape[0], -1)

    # -- jittable update --------------------------------------------------
    def update(self, state, x: jax.Array):
        if self.scheme == "minmax":
            fn = update_min_max
        elif self.scheme == "entropy":
            fn = update_rescaling_histogram
        else:
            fn = update_histogram
        if self.channel_axis is None:
            return fn(state, x.reshape(-1))
        return jax.vmap(fn)(state, self._per_channel_view(x))

    # -- host-side encoding computation -----------------------------------
    def compute(self, state, bitwidth: int = 8, symmetric: bool = False,
                strict_symmetric: bool = False,
                unsigned_symmetric: bool = False) -> AffineEncoding:
        if self.channel_axis is None:
            vals = self._compute_one(
                jax.tree_util.tree_map(np.asarray, state),
                bitwidth, symmetric, strict_symmetric, unsigned_symmetric)
            mins, maxs, deltas, offsets = (np.float32(v) for v in vals)
        else:
            state_np = jax.tree_util.tree_map(np.asarray, state)
            n = int(jax.tree_util.tree_leaves(state_np)[0].shape[0])
            nat = _native()
            if (self.scheme == "sqnr" and nat is not None
                    and bool(np.all(np.asarray(state_np.initialized)))):
                # one batched native call instead of n ctypes round-trips
                out = nat.sqnr_search_batch(
                    np.asarray(state_np.xleft, np.float64),
                    np.asarray(state_np.pdf, np.float64),
                    bitwidth, symmetric, strict_symmetric, unsigned_symmetric)
                mins, maxs, deltas, offsets = (
                    out[:, j].astype(np.float32) for j in range(4))
            else:
                rows = [
                    self._compute_one(
                        jax.tree_util.tree_map(lambda a, i=i: a[i], state_np),
                        bitwidth, symmetric, strict_symmetric, unsigned_symmetric)
                    for i in range(n)
                ]
                mins, maxs, deltas, offsets = (
                    np.asarray(col, np.float32) for col in zip(*rows))
        return AffineEncoding(
            min=jnp.asarray(mins), max=jnp.asarray(maxs),
            delta=jnp.asarray(deltas), offset=jnp.asarray(offsets),
            bitwidth=bitwidth, symmetric=symmetric,
            strict_symmetric=strict_symmetric,
            unsigned_symmetric=unsigned_symmetric)

    def _compute_one(self, state, bitwidth, symmetric, strict, unsigned):
        if self.scheme == "minmax":
            if not bool(state.updated):
                raise RuntimeError("compute_encodings called before any calibration data")
            mn, mx = gate_min_max(jnp.float32(state.min), jnp.float32(state.max))
            return _encoding_tuple_from_min_max(
                float(mn), float(mx), bitwidth, symmetric, strict, unsigned)

        if self.scheme == "entropy":
            if not bool(state.initialized):
                if not bool(state.updated):
                    raise RuntimeError(
                        "compute_encodings called before any calibration data")
                return _fallback_encoding(bitwidth, symmetric, strict, unsigned)
            mn, mx = _optimize_kl(state.hist, float(state.min), float(state.max),
                                  bitwidth, symmetric, strict, unsigned)
            mn, mx = min(mn, 0.0), max(mx, 0.0)
            return _encoding_tuple_from_min_max(mn, mx, bitwidth, symmetric, strict, unsigned)

        # PDF-based schemes
        if not bool(state.initialized):
            if not bool(state.updated):
                raise RuntimeError(
                    "compute_encodings called before any calibration data")
            # Saw data but it was all zeros: [-1, 1] fallback
            # (TfEnhancedEncodingAnalyzer.cpp:85-107)
            return _fallback_encoding(bitwidth, symmetric, strict, unsigned)
        xleft = np.asarray(state.xleft, np.float64)
        pdf = np.asarray(state.pdf, np.float64)
        nat = _native()
        if self.scheme == "sqnr":
            if nat is not None:
                return nat.sqnr_search(xleft, pdf, bitwidth, symmetric,
                                       strict, unsigned)
            return _sqnr_search(xleft, pdf, bitwidth, symmetric, strict, unsigned)
        if self.scheme == "percentile":
            if nat is not None:
                mn, mx = nat.percentile_range(xleft, pdf, self.percentile)
            else:
                mn, mx = _percentile_range(xleft, pdf, self.percentile)
            mn, mx = min(mn, 0.0), max(mx, 0.0)
            return _encoding_tuple_from_min_max(mn, mx, bitwidth, symmetric, strict, unsigned)
        if self.scheme == "mse":
            if nat is not None:
                mn, mx = nat.mse_search(xleft, pdf, bitwidth, symmetric,
                                        strict, unsigned)
            else:
                mn, mx = _mse_search(xleft, pdf, bitwidth, symmetric, strict, unsigned)
            mn, mx = min(mn, 0.0), max(mx, 0.0)
            return _encoding_tuple_from_min_max(mn, mx, bitwidth, symmetric, strict, unsigned)
        raise AssertionError(self.scheme)
