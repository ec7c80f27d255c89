"""ONNX artifact round-trip (VERDICT r2 missing #4: a deployable model
graph for non-JAX consumers). The exporter hand-serializes ModelProto
(no `onnx` package in this environment); the reader parses + executes the
bytes with jnp — exactly what a consuming toolchain does."""
import json
import shutil
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aimet_tpu.graph.connected_graph import ConnectedGraph
from aimet_tpu.interop.onnx_export import export_onnx, export_quantsim_onnx
from aimet_tpu.interop.onnx_reader import load_onnx, parse_onnx
from aimet_tpu.models.cnn import TinyCNN, init_model


def _roundtrip(model, shape, tmp_path, rng, tol=1e-5):
    v, _ = init_model(model, shape)
    fn = lambda v, x: model.apply(v, x)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    g = ConnectedGraph(fn, (v, x))
    path = str(tmp_path / "m.onnx")
    export_onnx(g, v, path)
    ofn, oparams = load_onnx(path)
    got = np.asarray(ofn(oparams, jnp.transpose(x, (0, 3, 1, 2))))
    want = np.asarray(fn(v, x))
    err = np.max(np.abs(got - want)) / max(np.max(np.abs(want)), 1e-9)
    assert err < tol, err
    return path


class TestOnnxRoundTrip:
    def test_tinycnn(self, tmp_path, rng):
        _roundtrip(TinyCNN(num_classes=4), (2, 8, 8, 1), tmp_path, rng)

    def test_mobilenet_v2(self, tmp_path, rng):
        from aimet_tpu.models.mobilenet_v2 import MobileNetV2
        _roundtrip(MobileNetV2(num_classes=4, width_mult=0.35),
                   (1, 32, 32, 3), tmp_path, rng)

    def test_resnet18(self, tmp_path, rng):
        from aimet_tpu.models.resnet import ResNet18
        _roundtrip(ResNet18(num_classes=4, num_filters=8),
                   (1, 32, 32, 3), tmp_path, rng)

    @pytest.mark.skipif(shutil.which("protoc") is None,
                        reason="protoc not available")
    def test_protoc_parses_wire_format(self, tmp_path, rng):
        path = _roundtrip(TinyCNN(num_classes=4), (2, 8, 8, 1),
                          tmp_path, rng)
        with open(path, "rb") as f:
            out = subprocess.run(["protoc", "--decode_raw"], stdin=f,
                                 capture_output=True)
        assert out.returncode == 0
        assert b"model_input_0" in out.stdout


class TestQuantsimOnnxArtifact:
    def test_encodings_keys_match_onnx_names(self, tmp_path, rng):
        """The reference contract (onnx_utils.py:419): activation
        encodings keyed by ONNX tensor name, param encodings by
        initializer name."""
        from aimet_tpu.quantsim.qsim import QuantizationSimModel
        model = TinyCNN(num_classes=4)
        v, _ = init_model(model, (2, 8, 8, 1))
        fn = lambda v, x: model.apply(v, x)
        x = jnp.asarray(rng.randn(2, 8, 8, 1).astype(np.float32))
        sim = QuantizationSimModel(fn, (v, x), quant_scheme="minmax")
        sim.compute_encodings(v, iter([(x,)]))
        export_quantsim_onnx(sim, v, str(tmp_path), "model")

        parsed = parse_onnx(str(tmp_path / "model.onnx"))
        tensor_names = {o for n in parsed["nodes"] for o in n["outputs"]}
        tensor_names |= {n for n, _ in parsed["inputs"]}
        init_names = set(parsed["initializers"])
        enc = json.load(open(tmp_path / "model.encodings"))
        for k in enc["activation_encodings"]:
            assert k in tensor_names, k
        for k in enc["param_encodings"]:
            assert k in init_names, k


def test_quantsim_over_loaded_onnx(tmp_path, rng):
    """The aimet_onnx workflow in miniature: bring an ONNX model, run the
    quantsim over it (reference: aimet_onnx/quantsim.py:140 builds an
    InferenceSession + QcQuantizeOp; here load_onnx gives a pure JAX fn
    and the quantizing interpreter does the rest)."""
    from aimet_tpu.quantsim.qsim import QuantizationSimModel
    model = TinyCNN(num_classes=4)
    v, _ = init_model(model, (2, 8, 8, 1))
    fn = lambda v, x: model.apply(v, x)
    x = jnp.asarray(rng.randn(2, 8, 8, 1).astype(np.float32))
    g = ConnectedGraph(fn, (v, x))
    path = str(tmp_path / "m.onnx")
    export_onnx(g, v, path)

    ofn, oparams = load_onnx(path)
    x_nchw = jnp.transpose(x, (0, 3, 1, 2))
    sim = QuantizationSimModel(ofn, (oparams, x_nchw),
                               quant_scheme="minmax")
    sim.compute_encodings(oparams, iter([(x_nchw,)]))
    q = np.asarray(sim.quantized_fn(oparams, x_nchw))
    fp = np.asarray(ofn(oparams, x_nchw))
    assert q.shape == fp.shape
    err = np.mean((q - fp) ** 2) / (np.mean(fp ** 2) + 1e-12)
    assert err < 5e-3, err
