"""Encodings interop round-trip: torch-name mapping, reference-format
export, and loading reference-produced `.encodings` files — VERDICT r1 #6;
mirrors the reference's torch-flavor export/load
(v1/quantsim.py:940-1044, 1696)."""
import json

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn

from aimet_tpu.interop import from_torch
from aimet_tpu.interop.encodings_io import (
    TorchNameMap,
    build_torch_name_map,
    export_reference_encodings,
    load_reference_encodings,
)
from aimet_tpu.quantsim.qsim import QuantizationSimModel


class NamedCNN(nn.Module):
    """Every op is a named submodule so torch hooks see each output."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 8, 3, padding=1)
        self.bn1 = nn.BatchNorm2d(8)
        self.relu1 = nn.ReLU()
        self.pool = nn.MaxPool2d(2)
        self.dw = nn.Conv2d(8, 8, 3, padding=1, groups=8)
        self.hs = nn.Hardswish()
        self.gap = nn.AdaptiveAvgPool2d(1)
        self.flat = nn.Flatten()
        self.fc = nn.Linear(8, 5)
        self.sm = nn.Softmax(dim=-1)

    def forward(self, x):
        y = self.pool(self.relu1(self.bn1(self.conv1(x))))
        y = self.hs(self.dw(y))
        return self.sm(self.fc(self.flat(self.gap(y))))


def _make_sim(seed=0):
    torch.manual_seed(seed)
    m = NamedCNN().eval()
    fn, params = from_torch(m)
    x = np.random.RandomState(0).randn(2, 3, 16, 16).astype(np.float32)
    sim = QuantizationSimModel(fn, (params, x))
    sim.compute_encodings(params, [x])
    return m, fn, params, x, sim


def test_name_map_params_and_activations():
    m, fn, params, x, sim = _make_sim()
    nm = build_torch_name_map(sim, m, params, (x,))

    # params map syntactically from the import pytree convention
    assert nm.params["['conv1']['weight']"] == "conv1.weight"
    assert nm.params["['fc']['weight']"] == "fc.weight"

    # param-bearing and parameterless module outputs are value-matched,
    # including the multi-op hardswish expansion (module -> its LAST op)
    layers = {layer for layer, _io in nm.activations.values()}
    for expect in ("relu1", "pool", "dw", "hs", "fc", "sm"):
        assert expect in layers, (expect, sorted(layers))
    # model input is attached to the first consuming layer as 'input'
    assert nm.activations.get("model_input_0") == ("conv1", "input")
    # every mapped quantizer exists in the sim
    for q in list(nm.params) + list(nm.activations):
        assert q in sim.quantizers


def test_export_load_roundtrip_bit_exact(tmp_path):
    m, fn, params, x, sim = _make_sim()
    nm = build_torch_name_map(sim, m, params, (x,))
    enc_path, map_path = export_reference_encodings(
        sim, nm, str(tmp_path), "cnn")

    with open(enc_path) as f:
        doc = json.load(f)
    assert doc["version"] == "0.6.1"
    assert "conv1.weight" in doc["param_encodings"]
    assert "output" in doc["activation_encodings"]["relu1"]

    # fresh sim, same fn: load through the torch-name translation
    sim2 = QuantizationSimModel(fn, (params, x))
    with open(map_path) as f:
        nm2 = TorchNameMap.from_json(json.load(f))
    report = load_reference_encodings(sim2, doc, nm2)
    assert not [u for u in report["unmatched"] if not u.startswith("float:")]

    want = sim.quantized_fn(params, x)
    got = sim2.quantized_fn(params, x)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_load_reference_shaped_file():
    """A hand-written dict in the reference's exported shape (per-channel
    param list, string bools, string indices, input/output nesting) loads
    onto the right quantizers and overrides bitwidth."""
    m, fn, params, x, sim = _make_sim()
    nm = build_torch_name_map(sim, m, params, (x,))

    n_ch = 8
    ref = {
        "version": "0.6.1",
        "param_encodings": {
            "conv1.weight": [
                {"bitwidth": 4, "dtype": "int", "is_symmetric": "True",
                 "min": -0.5 - 0.01 * i, "max": 0.5 + 0.01 * i,
                 "scale": (0.5 + 0.01 * i) / 7, "offset": -8}
                for i in range(n_ch)
            ],
            "fc.bias": [  # not quantized here -> reported unmatched
                {"bitwidth": 8, "dtype": "int", "is_symmetric": "False",
                 "min": -1.0, "max": 1.0, "scale": 2 / 255, "offset": -128}
            ],
        },
        "activation_encodings": {
            "relu1": {"output": {"0": {
                "bitwidth": 8, "dtype": "int", "is_symmetric": "False",
                "min": 0.0, "max": 6.0, "scale": 6 / 255, "offset": 0}}},
            "123_onnx_tensor": [  # flat onnx-flavor key: unmappable
                {"bitwidth": 8, "dtype": "int", "is_symmetric": "False",
                 "min": 0.0, "max": 1.0, "scale": 1 / 255, "offset": 0}],
        },
        "excluded_layers": [],
    }
    report = load_reference_encodings(sim, ref, nm)
    assert "['conv1']['weight']" in report["loaded"]
    assert "param:fc.bias" in report["unmatched"]
    assert "act:123_onnx_tensor" in report["unmatched"]

    # bitwidth override 8 -> 4 applied to the spec
    assert sim.quantizers["['conv1']['weight']"].bitwidth == 4
    enc = sim._encodings["['conv1']['weight']"]
    np.testing.assert_allclose(
        np.asarray(enc.delta).reshape(-1),
        [(0.5 + 0.01 * i) / 7 for i in range(n_ch)], rtol=1e-6)
    relu_q = next(q for q, (layer, io) in nm.activations.items()
                  if layer == "relu1" and io == "output")
    np.testing.assert_allclose(float(np.asarray(
        sim._encodings[relu_q].max)), 6.0, rtol=1e-6)

    with pytest.raises(KeyError):
        load_reference_encodings(sim, ref, nm, strict=True)
