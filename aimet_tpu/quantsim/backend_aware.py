"""Backend-aware quantsim: constrain quantizer settings to what the target
backend supports.

Port of the reference's op-def pipeline (ModelOpDefParser — DlQuantization/
src/ParserModule.cpp, backend_aware_quantsim_utility.py, supported_kernels
validation v1/quantsim.py:1891): an op-def file declares, per op type, the
supported (activation, param) dtype/bitwidth pairs; the configurator snaps
each quantizer to a supported kernel and reports violations.

Op-def formats accepted: JSON (native) and a QNN-style XML subset
(<OpDef><Name>..<SupportedKernel><Activation bitwidth=..><Param ..>).
"""
from __future__ import annotations

import dataclasses
import json
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Sequence, Tuple

from .config import _aimet_types
from .qsim import QuantizationSimModel


@dataclasses.dataclass(frozen=True)
class SupportedKernel:
    act_bitwidth: int
    act_dtype: str = "int"
    param_bitwidth: int = 8
    param_dtype: str = "int"


@dataclasses.dataclass
class OpDef:
    name: str
    supported_kernels: List[SupportedKernel]


class ModelOpDefParser:
    """Parses op-def files into {our-op-type: [SupportedKernel]}."""

    def __init__(self, op_defs: Dict[str, List[SupportedKernel]]):
        self.op_defs = op_defs

    @classmethod
    def from_json(cls, path: str) -> "ModelOpDefParser":
        with open(path) as f:
            raw = json.load(f)
        out: Dict[str, List[SupportedKernel]] = {}
        for name, kernels in raw.items():
            sks = [SupportedKernel(
                act_bitwidth=k["activation"]["bitwidth"],
                act_dtype=k["activation"].get("dtype", "int"),
                param_bitwidth=k.get("param", {}).get("bitwidth", 8),
                param_dtype=k.get("param", {}).get("dtype", "int"))
                for k in kernels]
            for t in _aimet_types(name):
                out[t] = sks
        return cls(out)

    @classmethod
    def from_xml(cls, path: str) -> "ModelOpDefParser":
        tree = ET.parse(path)
        out: Dict[str, List[SupportedKernel]] = {}
        for opdef in tree.getroot().iter("OpDef"):
            name_el = opdef.find("Name")
            if name_el is None:
                continue
            sks = []
            for sk in opdef.iter("SupportedKernel"):
                act = sk.find("Activation")
                par = sk.find("Param")
                sks.append(SupportedKernel(
                    act_bitwidth=int(act.get("bitwidth", "8")) if act is not None else 8,
                    act_dtype=(act.get("dtype", "int") if act is not None else "int"),
                    param_bitwidth=int(par.get("bitwidth", "8")) if par is not None else 8,
                    param_dtype=(par.get("dtype", "int") if par is not None else "int")))
            for t in _aimet_types(name_el.text.strip()):
                out[t] = sks
        return cls(out)

    def supported_kernels_for(self, op_type: str) -> Optional[List[SupportedKernel]]:
        return self.op_defs.get(op_type)


def apply_backend_constraints(sim: QuantizationSimModel,
                              parser: ModelOpDefParser,
                              strict: bool = False) -> List[str]:
    """Snap each quantizer to the closest supported kernel; returns a list of
    human-readable adjustment/violation messages
    (validate_supported_kernels semantics)."""
    messages = []
    for op in sim.graph.ops:
        kernels = parser.supported_kernels_for(op.type)
        if not kernels:
            continue
        act_bws = sorted({k.act_bitwidth for k in kernels})
        param_bws = sorted({k.param_bitwidth for k in kernels})
        if op.name in sim.quantizers:
            spec = sim.quantizers[op.name]
            if spec.bitwidth not in act_bws:
                target = min(act_bws, key=lambda b: abs(b - spec.bitwidth))
                if strict:
                    messages.append(
                        f"VIOLATION {op.name}: activation bw {spec.bitwidth} "
                        f"unsupported (supported: {act_bws})")
                else:
                    sim.set_bitwidth(op.name, target) if sim.encodings.get(op.name) is not None \
                        else sim.quantizers.__setitem__(
                            op.name, dataclasses.replace(spec, bitwidth=target))
                    messages.append(
                        f"{op.name}: activation bw {spec.bitwidth} -> {target}")
        for prod in op.param_products.values():
            name = prod.param_path
            if name not in sim.quantizers:
                continue
            spec = sim.quantizers[name]
            if spec.bitwidth not in param_bws:
                target = min(param_bws, key=lambda b: abs(b - spec.bitwidth))
                if strict:
                    messages.append(
                        f"VIOLATION {name}: param bw {spec.bitwidth} "
                        f"unsupported (supported: {param_bws})")
                else:
                    if sim.encodings.get(name) is not None:
                        sim.set_bitwidth(name, target)
                    else:
                        sim.quantizers[name] = dataclasses.replace(
                            spec, bitwidth=target)
                    messages.append(f"{name}: param bw {spec.bitwidth} -> {target}")
    return messages
