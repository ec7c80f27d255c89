"""Greedy per-layer compression-ratio selection.

Port of GreedyCompRatioSelectAlgo (aimet_common/comp_ratio_select.py:90-449):
phase 1 sweeps each layer over candidate ratios and records eval scores;
a monotonic fit (curve_fit.py:47) cleans the curves; phase 2 binary-searches
a global score threshold so the aggregate cost meets the target ratio, and
reads each layer's ratio off its fitted curve.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..graph.connected_graph import ConnectedGraph, Op
from .cost import Cost, layer_cost


@dataclasses.dataclass
class GreedySelectionParameters:
    """aimet_common/defs.py:173."""
    target_comp_ratio: float
    num_comp_ratio_candidates: int = 10
    use_monotonic_fit: bool = True


def monotonic_fit(ratios: np.ndarray, scores: np.ndarray) -> np.ndarray:
    """Enforce non-decreasing score vs ratio (curve_fit.py:47: isotonic
    regression via pool-adjacent-violators)."""
    y = scores.astype(np.float64).copy()
    n = len(y)
    w = np.ones(n)
    # PAV
    i = 0
    ys = list(y)
    ws = list(w)
    idx = [[k] for k in range(n)]
    k = 0
    while k < len(ys) - 1:
        if ys[k] > ys[k + 1] + 1e-12:
            merged_w = ws[k] + ws[k + 1]
            merged_y = (ys[k] * ws[k] + ys[k + 1] * ws[k + 1]) / merged_w
            ys[k] = merged_y
            ws[k] = merged_w
            idx[k] = idx[k] + idx[k + 1]
            del ys[k + 1], ws[k + 1], idx[k + 1]
            k = max(0, k - 1)
        else:
            k += 1
    out = np.empty(n)
    for yk, ik in zip(ys, idx):
        for j in ik:
            out[j] = yk
    return out


class GreedyCompRatioSelect:
    """eval_fn(layer_name, comp_ratio) -> score; higher is better."""

    def __init__(self, graph: ConnectedGraph, layers: Sequence[Op],
                 eval_fn: Callable[[Dict[str, float]], float],
                 params: GreedySelectionParameters,
                 cost_fn: Optional[Callable[[Op, float], float]] = None):
        self.graph = graph
        self.layers = list(layers)
        self.eval_fn = eval_fn
        self.params = params
        # cost of a layer at a given ratio (default: proportional MAC)
        self.cost_fn = cost_fn or (lambda op, r: layer_cost(op).mac * r)

    def _candidates(self) -> np.ndarray:
        n = self.params.num_comp_ratio_candidates
        return np.arange(1, n) / n  # (1/n .. (n-1)/n), excl. 1.0

    def select(self) -> Tuple[Dict[str, float], Dict[str, np.ndarray]]:
        cands = self._candidates()
        curves: Dict[str, np.ndarray] = {}
        # phase 1: per-layer eval sweeps (comp_ratio_select.py:366)
        for op in self.layers:
            scores = np.array([
                self.eval_fn({op.name: float(r)}) for r in cands])
            if self.params.use_monotonic_fit:
                scores = monotonic_fit(cands, scores)
            curves[op.name] = scores

        # phase 2: binary search a global score threshold (:216-449)
        total_orig = sum(layer_cost(op).mac for op in self.layers)
        target = self.params.target_comp_ratio

        def ratios_for_score(score) -> Dict[str, float]:
            out = {}
            for op in self.layers:
                sc = curves[op.name]
                ok = np.nonzero(sc >= score)[0]
                out[op.name] = float(cands[ok[0]]) if ok.size else 1.0
            return out

        def agg_ratio(ratios) -> float:
            cost = 0.0
            for op in self.layers:
                r = ratios[op.name]
                cost += self.cost_fn(op, r) if r < 1.0 else layer_cost(op).mac
            return cost / max(total_orig, 1e-12)

        # score threshold up => each layer needs a larger ratio to clear it
        # => less compression. Find the highest threshold still meeting the
        # target aggregate ratio.
        lo = min(float(c.min()) for c in curves.values())
        hi = max(float(c.max()) for c in curves.values())
        for _ in range(50):
            mid = (lo + hi) / 2
            if agg_ratio(ratios_for_score(mid)) <= target:
                lo = mid
            else:
                hi = mid
        ratios = ratios_for_score(lo)
        if agg_ratio(ratios) > target:
            # even the lowest threshold misses the target: take min candidates
            ratios = {op.name: float(cands[0]) for op in self.layers}
        return ratios, curves
