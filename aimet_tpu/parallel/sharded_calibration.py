"""Distributed calibration: merge observer states across data-parallel
workers.

No reference counterpart (the reference calibrates single-process —
SURVEY §2.5); this implements the TPU-native design: each worker updates
its own observer state over its data shard, then states are merged exactly:

  - min/max observers: elementwise min/min, max/max;
  - fixed-grid PDFs: rescale every worker histogram onto the union grid
    (proportional overlap, same math as the auto-rescaling histogram), then
    combine as an iteration-weighted mean — identical to having seen all
    batches sequentially up to grid resolution;
  - auto-rescaling histograms: rescale to the union range and sum counts.

The merge is a pure function over pytrees, so it can run under ``jit`` with
``jax.lax`` collectives (tree_psum) or host-side after gathering.
"""
from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from ..quantization.encoding_analyzer import (
    PDF_SIZE,
    HistogramState,
    MinMaxState,
    RescalingHistogramState,
    _rescale_counts,
)


def merge_min_max(states: Sequence[MinMaxState]) -> MinMaxState:
    mins = jnp.stack([s.min for s in states])
    maxs = jnp.stack([s.max for s in states])
    upd = jnp.stack([s.updated for s in states])
    return MinMaxState(min=jnp.min(mins, 0), max=jnp.max(maxs, 0),
                       updated=jnp.any(upd, 0))


def merge_histograms(states: Sequence[HistogramState]) -> HistogramState:
    """Iteration-weighted merge on the union grid."""
    active = [s for s in states if bool(s.initialized)]
    if not active:
        return states[0]
    lo = min(float(s.xleft[0]) for s in active)
    widths = [float(s.xleft[1] - s.xleft[0]) for s in active]
    hi = max(float(s.xleft[-1]) + w for s, w in zip(active, widths))
    width = (hi - lo) / PDF_SIZE
    xleft = lo + jnp.arange(PDF_SIZE, dtype=jnp.float32) * width

    total_iters = sum(int(s.iterations) for s in active)
    pdf = jnp.zeros((PDF_SIZE,), jnp.float32)
    for s, w in zip(active, widths):
        old_hi = float(s.xleft[-1]) + w
        rescaled = _rescale_counts(s.pdf, float(s.xleft[0]), old_hi, lo, hi)
        pdf = pdf + rescaled * (int(s.iterations) / total_iters)

    return HistogramState(
        xleft=xleft, pdf=pdf,
        iterations=jnp.int32(total_iters),
        initialized=jnp.bool_(True),
        updated=jnp.bool_(True))


def merge_rescaling_histograms(
        states: Sequence[RescalingHistogramState]) -> RescalingHistogramState:
    active = [s for s in states if bool(s.initialized)]
    if not active:
        return states[0]
    lo = min(float(s.min) for s in active)
    hi = max(float(s.max) for s in active)
    hist = jnp.zeros((PDF_SIZE,), jnp.float32)
    for s in active:
        hist = hist + _rescale_counts(s.hist, float(s.min), float(s.max), lo, hi)
    return RescalingHistogramState(
        hist=hist, min=jnp.float32(lo), max=jnp.float32(hi),
        initialized=jnp.bool_(True), updated=jnp.bool_(True))


def merge_observer_states(worker_states: Sequence[dict]) -> dict:
    """Merge {quantizer-name: state} dicts from N workers."""
    merged = {}
    for name in worker_states[0]:
        states = [ws[name] for ws in worker_states]
        s0 = states[0]
        if isinstance(s0, MinMaxState):
            merged[name] = merge_min_max(states)
        elif isinstance(s0, HistogramState):
            merged[name] = merge_histograms(states)
        elif isinstance(s0, RescalingHistogramState):
            merged[name] = merge_rescaling_histograms(states)
        else:
            raise TypeError(type(s0))
    return merged


def calibrate_data_parallel(sim, params, shards: Sequence[Sequence]):
    """Calibrate ``sim`` with each worker's data shard independently, then
    merge states and compute encodings — the multi-host calibration flow
    (each shard would run on its own host; here they run sequentially to
    validate the merge math)."""
    from ..quantization.encoding_analyzer import EncodingAnalyzer

    sim.compute_param_encodings(params)
    analyzers = {}
    for name, spec in sim.quantizers.items():
        if spec.kind == "param":
            continue
        analyzers[name] = EncodingAnalyzer(
            spec.scheme, channel_axis=None, percentile=spec.percentile)

    worker_states = []
    for shard in shards:
        obs = {n: a.init_state() for n, a in analyzers.items()}

        @jax.jit
        def observe_step(obs, params, *batch):
            _, obs, _ = sim._run(params, batch, "observe", obs_states=dict(obs),
                                 analyzers=analyzers, encodings=sim._encodings)
            return obs

        for batch in shard:
            if not isinstance(batch, (tuple, list)):
                batch = (batch,)
            obs = observe_step(obs, params, *batch)
        worker_states.append(obs)

    merged = merge_observer_states(worker_states)
    sim._analyzers = analyzers
    sim._obs_states = merged
    sim._calib_params = params
    for name, analyzer in analyzers.items():
        if name in sim._frozen:
            continue
        spec = sim.quantizers[name]
        sim._encodings[name] = analyzer.compute(
            merged[name], bitwidth=spec.bitwidth, symmetric=spec.symmetric,
            strict_symmetric=spec.strict_symmetric,
            unsigned_symmetric=spec.unsigned_symmetric)
    return sim._encodings
