"""AutoQuant — automatic PTQ pipeline with early exit.

Port of AutoQuantBase (aimet_torch/v1/auto_quant.py:204-1500): applies the
PTQ stack in order of increasing cost — plain quantsim -> BN-fold + CLE ->
AdaRound — evaluating after each stage, stopping as soon as the accuracy
target is met, and returning the best result with a per-stage diagnostics
record (the reference's eval-manager sessions, :848-1030).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

from ..graph.connected_graph import ConnectedGraph
from ..quantsim.config import QuantSimConfig
from ..quantsim.qsim import QuantizationSimModel
from .adaround import AdaroundParameters, apply_adaround
from .cle import equalize_model


@dataclasses.dataclass
class StageResult:
    name: str
    accuracy: float
    applied: bool


@dataclasses.dataclass
class AutoQuantResult:
    best_stage: str
    accuracy: float
    params: object
    sim: QuantizationSimModel
    history: List[StageResult]

    def diagnostics(self) -> str:
        lines = ["AutoQuant stages:"]
        for s in self.history:
            mark = "*" if s.name == self.best_stage else " "
            lines.append(f" {mark} {s.name}: {s.accuracy:.5f}")
        return "\n".join(lines)


class AutoQuant:
    """auto_quant = AutoQuant(fn, example_args, params, data, eval_fn);
    result = auto_quant.optimize(allowed_accuracy_drop)."""

    def __init__(self, fn, example_args, params, calib_batches: Sequence,
                 eval_fn: Callable[[Callable], float],
                 config: Optional[QuantSimConfig] = None,
                 quant_scheme: str = "sqnr",
                 default_param_bw: int = 8, default_output_bw: int = 8,
                 adaround_params: Optional[AdaroundParameters] = None):
        self.fn = fn
        self.example_args = example_args
        self.params = params
        self.calib = list(calib_batches)
        self.eval_fn = eval_fn
        self.config = config
        self.quant_scheme = quant_scheme
        self.param_bw = default_param_bw
        self.output_bw = default_output_bw
        self.adaround_params = adaround_params or AdaroundParameters(
            num_iterations=1000)

    def _make_sim(self, params) -> QuantizationSimModel:
        sim = QuantizationSimModel(
            self.fn, (params,) + tuple(self.example_args[1:]),
            config=self.config, quant_scheme=self.quant_scheme,
            default_param_bw=self.param_bw,
            default_output_bw=self.output_bw)
        sim.compute_encodings(params, iter(self.calib))
        return sim

    def _eval(self, sim, params) -> float:
        return self.eval_fn(lambda *a: sim.quantized_fn(params, *a))

    def optimize(self, allowed_accuracy_drop: float = 0.0,
                 fp32_accuracy: Optional[float] = None) -> AutoQuantResult:
        history: List[StageResult] = []
        if fp32_accuracy is None:
            fp32_accuracy = self.eval_fn(
                lambda *a: self.fn(self.params, *a))
        history.append(StageResult("fp32", fp32_accuracy, False))
        target = fp32_accuracy - allowed_accuracy_drop

        best = ("quantsim", -float("inf"), self.params, None)

        # Stage 1: plain quantsim (auto_quant.py W32 eval + quantsim)
        sim = self._make_sim(self.params)
        acc = self._eval(sim, self.params)
        history.append(StageResult("quantsim", acc, True))
        best = max(best, ("quantsim", acc, self.params, sim),
                   key=lambda t: t[1])
        if acc >= target:
            return self._result(best, history)

        # Stage 2: BN fold + CLE (+ HBF)
        graph = ConnectedGraph(self.fn, (self.params,) + tuple(self.example_args[1:]))
        eq_params = equalize_model(graph, self.params)
        sim2 = self._make_sim(eq_params)
        acc2 = self._eval(sim2, eq_params)
        history.append(StageResult("cle", acc2, True))
        best = max(best, ("cle", acc2, eq_params, sim2), key=lambda t: t[1])
        if acc2 >= target:
            return self._result(best, history)

        # Stage 3: AdaRound on the better of {original, CLE'd} params
        base_params = best[2]
        sim3 = self._make_sim(base_params)
        ada_params = apply_adaround(sim3, base_params, self.calib,
                                    self.adaround_params)
        sim3.compute_encodings(ada_params, iter(self.calib))
        acc3 = self._eval(sim3, ada_params)
        history.append(StageResult("adaround", acc3, True))
        best = max(best, ("adaround", acc3, ada_params, sim3),
                   key=lambda t: t[1])
        return self._result(best, history)

    @staticmethod
    def _result(best, history) -> AutoQuantResult:
        name, acc, params, sim = best
        return AutoQuantResult(best_stage=name, accuracy=acc, params=params,
                               sim=sim, history=history)


class AutoQuantWithAutoMixedPrecision(AutoQuant):
    """AutoQuant + AMP final stage (v1/auto_quant.py:1497): after the PTQ
    pipeline, raise the weakest quantizer groups to the higher-precision
    candidates until the accuracy target is met."""

    def __init__(self, *args, amp_candidates=None, **kwargs):
        super().__init__(*args, **kwargs)
        from .amp import Candidate
        self.amp_candidates = amp_candidates or [
            Candidate(16, 16), Candidate(self.output_bw, self.param_bw)]

    def optimize(self, allowed_accuracy_drop: float = 0.0,
                 fp32_accuracy: Optional[float] = None) -> AutoQuantResult:
        result = super().optimize(allowed_accuracy_drop, fp32_accuracy)
        fp32 = result.history[0].accuracy
        if result.accuracy >= fp32 - allowed_accuracy_drop:
            return result
        # Stage 4: AMP (greedy flips from the high-precision baseline)
        from .amp import choose_mixed_precision
        sim, params = result.sim, result.params

        def eval_fn(forward):
            return self.eval_fn(forward)

        amp = choose_mixed_precision(sim, params, self.amp_candidates,
                                     eval_fn, allowed_accuracy_drop)
        acc = amp.final_accuracy
        result.history.append(StageResult("amp", acc, True))
        if acc > result.accuracy:
            return AutoQuantResult("amp", acc, params, sim, result.history)
        return result
