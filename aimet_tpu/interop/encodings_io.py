"""Reference-format encodings interop: torch-name mapping + round-trip.

The reference exports two encodings files per sim (v1/quantsim.py:940-1044):
an ONNX-flavor ``<prefix>.encodings`` keyed by ONNX tensor names, and a
torch-flavor ``<prefix>_torch.encodings`` keyed by torch module / param names
(``activation_encodings[layer]['input'|'output'][idx]``,
``param_encodings['layer.weight']``).  This module provides the TPU-native
sim with that same interchange surface for models imported via
:func:`aimet_tpu.interop.torch_import.from_torch`:

* :func:`build_torch_name_map` — align sim quantizer names with torch
  module/param names.  Param quantizers map syntactically (their names are
  pytree key-paths of the ``{module: {attr: array}}`` import convention);
  activation quantizers are matched **by value**: one torch forward with
  output hooks on every leaf module, one sim fp forward capturing every
  quantized product, then tensors are paired ``allclose``-wise in execution
  order.  This is the TPU-native analogue of the reference's CustomMarker
  identity-wrapping trick for recovering torch<->onnx node names
  (onnx_utils.py:288-313, 419) — but exact, since we compare the actual
  tensors instead of graph surgery.
* :func:`export_reference_encodings` — write a ``*_torch.encodings``-shaped
  JSON (+ a ``*_name_map.json`` artifact) so encodings produced here are
  consumable by QNN-style toolchains that understand the reference format.
* :func:`load_reference_encodings` — load a reference-produced torch-flavor
  ``.encodings`` dict onto the sim (load_encodings, v1/quantsim.py:1696),
  translating torch names back to sim quantizer names.

ONNX-flavor activation keys (bare ONNX tensor names) cannot be recovered
without the original ONNX graph; ``load_reference_encodings`` still consumes
such files' ``param_encodings`` (torch-named in both flavors) and reports
unmatched activation keys instead of guessing.
"""
from __future__ import annotations

import json
import re
from dataclasses import dataclass, field, replace
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "TorchNameMap",
    "build_torch_name_map",
    "export_reference_encodings",
    "load_reference_encodings",
]

_KEYSTR_RE = re.compile(r"\['([^']+)'\]")


def _param_torch_name(keystr: str) -> Optional[str]:
    """``['features.0.0']['weight']`` -> ``features.0.0.weight``."""
    parts = _KEYSTR_RE.findall(keystr)
    if not parts:
        return None
    return ".".join(parts)


@dataclass
class TorchNameMap:
    """Bidirectional quantizer-name <-> torch-name mapping.

    ``params``:      sim param-quantizer name -> ``module.attr`` torch name.
    ``activations``: sim act-quantizer name   -> ``(layer, 'input'|'output')``.
    ``unmatched_layers``: torch leaf modules whose output tensor matched no
    quantized product (not quantized, inside control flow, or pass-through).
    ``unmatched_quantizers``: sim quantizers with no torch-side name.
    """
    params: Dict[str, str] = field(default_factory=dict)
    activations: Dict[str, Tuple[str, str]] = field(default_factory=dict)
    unmatched_layers: List[str] = field(default_factory=list)
    unmatched_quantizers: List[str] = field(default_factory=list)

    def to_json(self) -> Dict[str, Any]:
        return {
            "params": dict(self.params),
            "activations": {k: list(v) for k, v in self.activations.items()},
            "unmatched_layers": list(self.unmatched_layers),
            "unmatched_quantizers": list(self.unmatched_quantizers),
        }

    @classmethod
    def from_json(cls, d: Dict[str, Any]) -> "TorchNameMap":
        return cls(
            params=dict(d.get("params", {})),
            activations={k: tuple(v) for k, v in
                         d.get("activations", {}).items()},
            unmatched_layers=list(d.get("unmatched_layers", [])),
            unmatched_quantizers=list(d.get("unmatched_quantizers", [])),
        )


def _torch_leaf_outputs(torch_module, example_args) -> List[Tuple[str, Any]]:
    """[(qualified_name, output ndarray)] for every leaf module, in
    execution order (a module called twice contributes twice)."""
    import torch

    torch_module = torch_module.eval()
    outs: List[Tuple[str, Any]] = []
    hooks = []

    def mk_hook(name):
        def hook(_mod, _inp, out):
            if isinstance(out, torch.Tensor):
                outs.append((name, out.detach().cpu().numpy()))
        return hook

    for name, mod in torch_module.named_modules():
        if name and not list(mod.children()):
            hooks.append(mod.register_forward_hook(mk_hook(name)))
    try:
        with torch.no_grad():
            torch_module(*[torch.as_tensor(np.asarray(a))
                           for a in example_args])
    finally:
        for h in hooks:
            h.remove()
    return outs


def build_torch_name_map(sim, torch_module, params, example_args,
                         *, rtol: float = 2e-3, atol: float = 1e-4
                         ) -> TorchNameMap:
    """Align the sim's quantizer names with torch module/param names.

    ``sim`` must wrap a function imported with ``from_torch(torch_module)``
    and traced with ``example_args`` (the model's positional inputs, sans
    params).  Tolerances compare fp32 torch vs fp32 XLA outputs.
    """
    nm = TorchNameMap()

    # ---- params: syntactic (import convention {module: {attr: array}})
    for qname, spec in sim.quantizers.items():
        if spec.kind != "param":
            continue
        tname = _param_torch_name(qname)
        if tname is None:
            nm.unmatched_quantizers.append(qname)
        else:
            nm.params[qname] = tname

    # ---- activations: value matching
    ops_q = [op for op in sim.graph.ops if op.name in sim.quantizers
             and sim.quantizers[op.name].kind == "act"]
    captured = sim.collect_activations(
        params, example_args, [op.output.name for op in ops_q], mode="fp")
    vals = [np.asarray(captured[op.output.name])
            if op.output.name in captured else None for op in ops_q]
    torch_outs = _torch_leaf_outputs(torch_module, example_args)

    op_to_layer: Dict[str, str] = {}
    cursor = 0
    for layer_name, t_out in torch_outs:
        t_out = np.asarray(t_out)
        match = None
        order = list(range(cursor, len(ops_q))) + list(range(0, cursor))
        for j in order:
            v = vals[j]
            if v is None or ops_q[j].name in op_to_layer:
                continue
            if v.shape != t_out.shape:
                continue
            if np.allclose(v, t_out, rtol=rtol, atol=atol):
                match = j
                break
        if match is None:
            nm.unmatched_layers.append(layer_name)
            continue
        op_to_layer[ops_q[match].name] = layer_name
        cursor = match + 1

    for op in ops_q:
        if op.name in op_to_layer:
            nm.activations[op.name] = (op_to_layer[op.name], "output")
        else:
            nm.unmatched_quantizers.append(op.name)

    # ---- per-op input quantizers ("<op>_input") and model inputs
    # ops without output quantizers (e.g. conv inside a conv+BN supergroup)
    # still have a torch identity via their param paths
    layer_of = {}
    for op in sim.graph.ops:
        for prod in op.param_products.values():
            tname = _param_torch_name(prod.param_path or "")
            if tname and "." in tname:
                layer_of[op.name] = tname.rsplit(".", 1)[0]
                break
    layer_of.update(op_to_layer)
    for qname, spec in sim.quantizers.items():
        if spec.kind == "param" or qname in nm.activations:
            continue
        if qname.endswith("_input") and qname[:-6] in layer_of:
            nm.activations[qname] = (layer_of[qname[:-6]], "input")
        elif spec.kind == "input":
            # model input: key it as the first mapped consuming op's 'input'
            # (the reference attaches input-quantizer encodings to the
            # consuming wrapped layer the same way).
            try:
                i = int(qname.rsplit("_", 1)[1])
                var = sim.graph.input_vars[i]
                prod = sim.graph.products[id(var)]
                layer = next((layer_of[c.name] for c in prod.consumers
                              if c.name in layer_of), None)
            except (ValueError, IndexError, KeyError):
                layer = None
            if layer is not None:
                nm.activations[qname] = (layer, "input")
            else:
                nm.unmatched_quantizers.append(qname)
        elif qname not in nm.unmatched_quantizers:
            nm.unmatched_quantizers.append(qname)
    return nm


# ---------------------------------------------------------------------------
# export
# ---------------------------------------------------------------------------

def _as_entry_list(entries) -> List[dict]:
    return entries if isinstance(entries, list) else [entries]


def export_reference_encodings(sim, name_map: TorchNameMap, path: str,
                               prefix: str) -> Tuple[str, str]:
    """Write ``<prefix>_torch.encodings`` (reference torch flavor,
    v1/quantsim.py:1036-1044) and ``<prefix>_name_map.json``.

    Returns (encodings_path, name_map_path).
    """
    base = sim.export_encodings()  # 0.6.1 dict keyed by sim names
    act: Dict[str, Any] = {}
    par: Dict[str, Any] = {}
    for qname, entries in base["param_encodings"].items():
        tname = name_map.params.get(qname)
        if tname is not None:
            par[tname] = entries
    for qname, entries in base["activation_encodings"].items():
        loc = name_map.activations.get(qname)
        if loc is None:
            # no torch identity (e.g. an op inside a multi-op module
            # expansion): write it flat under its sim name, like the
            # reference's flat ONNX-flavor activation keys, so our own
            # loader can round-trip it losslessly.
            act[qname] = (entries[0] if len(entries) == 1 else entries)
            continue
        layer, io = loc
        slot = act.setdefault(layer, {})
        idxs = slot.setdefault(io, {})
        # one tensor per slot in our sim; reference indexes multi-IO modules
        idxs[str(len(idxs))] = (entries[0] if len(entries) == 1 else entries)
    doc = {
        "version": "0.6.1",
        "activation_encodings": act,
        "param_encodings": par,
        "excluded_layers": [],
    }
    enc_path = f"{path}/{prefix}_torch.encodings"
    with open(enc_path, "w") as f:
        json.dump(doc, f, indent=2, sort_keys=True)
    map_path = f"{path}/{prefix}_name_map.json"
    with open(map_path, "w") as f:
        json.dump(name_map.to_json(), f, indent=2, sort_keys=True)
    return enc_path, map_path


# ---------------------------------------------------------------------------
# load
# ---------------------------------------------------------------------------

def load_reference_encodings(sim, encodings: Dict[str, Any],
                             name_map: TorchNameMap,
                             *, strict: bool = False) -> Dict[str, List[str]]:
    """Load a reference-produced torch-flavor ``.encodings`` dict onto the
    sim (reference load path: v1/quantsim.py:1696 load_encodings).

    Accepts both entry shapes (single dict or per-channel list) and both
    activation layouts (torch flavor ``{layer: {'input'/'output': {idx: e}}}``;
    flat ONNX-flavor activation keys are reported as unmatched since bare
    ONNX tensor names are not recoverable without the ONNX graph).

    Returns ``{"loaded": [...], "unmatched": [...]}`` of sim quantizer names
    / foreign keys.  ``strict=True`` raises on any unmatched foreign key.
    """
    rev_par = {v: k for k, v in name_map.params.items()}
    rev_act: Dict[Tuple[str, str], str] = {
        (layer, io): q for q, (layer, io) in name_map.activations.items()}

    translated_act: Dict[str, Any] = {}
    translated_par: Dict[str, Any] = {}
    loaded: List[str] = []
    unmatched: List[str] = []

    def _is_float(entries) -> bool:
        e0 = _as_entry_list(entries)[0]
        return str(e0.get("dtype", "int")).lower() == "float"

    for tname, entries in encodings.get("param_encodings", {}).items():
        qname = rev_par.get(tname)
        if qname is None:
            unmatched.append(f"param:{tname}")
            continue
        if _is_float(entries):
            unmatched.append(f"float:{tname}")
            continue
        translated_par[qname] = _as_entry_list(entries)
        loaded.append(qname)

    for key, val in encodings.get("activation_encodings", {}).items():
        if isinstance(val, dict) and ("input" in val or "output" in val):
            for io, idxs in val.items():
                if io not in ("input", "output"):
                    unmatched.append(f"act:{key}.{io}")
                    continue
                qname = rev_act.get((key, io))
                if qname is None:
                    unmatched.append(f"act:{key}.{io}")
                    continue
                entries = (idxs.get("0") if isinstance(idxs, dict)
                           else idxs)
                if entries is None and isinstance(idxs, dict) and idxs:
                    entries = next(iter(idxs.values()))
                if entries is None:
                    unmatched.append(f"act:{key}.{io}")
                    continue
                translated_act[qname] = _as_entry_list(entries)
                loaded.append(qname)
        elif key in sim.quantizers and not _is_float(val):
            # flat key naming a sim quantizer directly (our own exports'
            # unmapped-quantizer entries)
            translated_act[key] = _as_entry_list(val)
            loaded.append(key)
        else:
            # flat ONNX-tensor-name key: not recoverable without the graph
            unmatched.append(f"act:{key}")

    if strict and unmatched:
        raise KeyError(f"unmatched encodings keys: {unmatched}")

    # honour foreign bitwidth/symmetry before reconstruction
    for qname, entries in {**translated_par, **translated_act}.items():
        e0 = entries[0]
        spec = sim.quantizers[qname]
        bw = int(e0.get("bitwidth", spec.bitwidth))
        sym = e0.get("is_symmetric")
        sym = spec.symmetric if sym is None else str(sym).lower() == "true"
        if bw != spec.bitwidth or sym != spec.symmetric:
            sim.quantizers[qname] = replace(spec, bitwidth=bw, symmetric=sym)

    sim.load_encodings({"activation_encodings": translated_act,
                        "param_encodings": translated_par})
    return {"loaded": loaded, "unmatched": unmatched}
