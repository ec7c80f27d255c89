"""Automatic Mixed Precision (AMP) — greedy bitwidth assignment.

Port of the reference's GreedyMixedPrecisionAlgo
(aimet_common/amp/mixed_precision_algo.py:100-800, quantizer_groups.py:46,
user API aimet_torch/mixed_precision.py:132 choose_mixed_precision):

  Phase 1: for each quantizer group, set it alone to each lower-precision
  candidate and record the eval score -> per-group sensitivity list.
  Phase 2: sort (group, candidate) pairs by score descending; flip groups to
  lower precision cumulatively, re-evaluating, building the pareto front of
  (running cost, accuracy); stop when accuracy drops below
  ``allowed_accuracy_drop``.

Quantizer groups here are per-op: the op's output activation quantizer plus
its param quantizers (the reference discovers groups over the
ConnectedGraph the same way).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..quantsim.qsim import QuantizationSimModel


@dataclasses.dataclass(frozen=True)
class Candidate:
    """(activation_bw, param_bw) pair."""
    act_bw: int
    param_bw: int


@dataclasses.dataclass
class QuantizerGroup:
    name: str
    act_quantizers: List[str]
    param_quantizers: List[str]

    def bit_cost(self, cand: Candidate) -> float:
        return (len(self.act_quantizers) * cand.act_bw
                + len(self.param_quantizers) * cand.param_bw)


def find_quantizer_groups(sim: QuantizationSimModel) -> List[QuantizerGroup]:
    """One group per graph op owning quantizers (amp/quantizer_groups.py:62)."""
    groups = []
    for op in sim.graph.ops:
        acts = [op.name] if op.name in sim.quantizers else []
        params = [p.param_path for p in op.param_products.values()
                  if p.param_path in sim.quantizers]
        if acts or params:
            groups.append(QuantizerGroup(op.name, acts, params))
    return groups


@dataclasses.dataclass
class AmpResult:
    group_bitwidths: Dict[str, Candidate]
    pareto_front: List[Tuple[float, float]]   # (relative bit cost, accuracy)
    baseline_accuracy: float
    final_accuracy: float
    phase1_scores: Dict[Tuple[str, Candidate], float]


class GreedyMixedPrecision:
    def __init__(self, sim: QuantizationSimModel, params,
                 candidates: Sequence[Candidate],
                 eval_fn: Callable[[Callable], float],
                 allowed_accuracy_drop: float):
        """candidates must be ordered highest precision first; the first is
        the baseline (max precision)."""
        self.sim = sim
        self.params = params
        self.candidates = list(candidates)
        self.eval_fn = eval_fn
        self.allowed_drop = allowed_accuracy_drop
        self.groups = find_quantizer_groups(sim)

    def _set_group(self, group: QuantizerGroup, cand: Candidate):
        for n in group.act_quantizers:
            self.sim.set_bitwidth(n, cand.act_bw)
        for n in group.param_quantizers:
            self.sim.set_bitwidth(n, cand.param_bw)

    def _eval(self) -> float:
        return self.eval_fn(
            lambda *args: self.sim.quantized_fn(self.params, *args))

    def run(self) -> AmpResult:
        base_cand = self.candidates[0]
        lower = self.candidates[1:]
        for g in self.groups:
            self._set_group(g, base_cand)
        baseline = self._eval()

        # Phase 1: per-group sensitivity (mixed_precision_algo.py:610)
        phase1: Dict[Tuple[str, Candidate], float] = {}
        for g in self.groups:
            for cand in lower:
                self._set_group(g, cand)
                phase1[(g.name, cand)] = self._eval()
                self._set_group(g, base_cand)

        # Phase 2: greedy flips by descending score (:742)
        order = sorted(phase1.items(), key=lambda kv: kv[1], reverse=True)
        group_by_name = {g.name: g for g in self.groups}
        assignment = {g.name: base_cand for g in self.groups}
        max_cost = sum(g.bit_cost(base_cand) for g in self.groups)
        pareto: List[Tuple[float, float]] = [(1.0, baseline)]
        acc = baseline
        for (gname, cand), _ in order:
            g = group_by_name[gname]
            # only move to lower precision than currently assigned
            cur = assignment[gname]
            if g.bit_cost(cand) >= g.bit_cost(cur):
                continue
            self._set_group(g, cand)
            new_acc = self._eval()
            if baseline - new_acc > self.allowed_drop:
                self._set_group(g, cur)  # revert
                continue
            assignment[gname] = cand
            acc = new_acc
            cost = sum(group_by_name[n].bit_cost(c)
                       for n, c in assignment.items()) / max_cost
            pareto.append((cost, acc))

        return AmpResult(assignment, pareto, baseline, acc, phase1)


def choose_mixed_precision(sim: QuantizationSimModel, params,
                           candidates: Sequence[Candidate],
                           eval_fn: Callable, allowed_accuracy_drop: float
                           ) -> AmpResult:
    """User API (mixed_precision.py:132). Leaves ``sim`` configured at the
    chosen per-group bitwidths."""
    algo = GreedyMixedPrecision(sim, params, candidates, eval_fn,
                                allowed_accuracy_drop)
    return algo.run()
