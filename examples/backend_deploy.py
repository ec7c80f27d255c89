"""Backend-aware deployment: calibrate, snap to the backend's supported
kernels, validate, and emit the ONNX + encodings artifact pair.

The reference flow: QuantizationSimModel -> backend-aware config
(ModelOpDefParser over QNN op-def XML) -> supported_kernels validation ->
sim.export() producing ONNX + .encodings for the target toolchain
(backend_aware_quantsim_utility.py, v1/quantsim.py:486,1891,
onnx_utils.py:419). Here the artifact is then re-read and executed — the
consumer's side of the contract — with jnp.
"""
import json
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from aimet_tpu.interop.onnx_export import export_quantsim_onnx
from aimet_tpu.interop.onnx_reader import load_onnx, parse_onnx
from aimet_tpu.models.cnn import TinyCNN, init_model
from aimet_tpu.quantsim.backend_aware import (ModelOpDefParser,
                                              apply_backend_constraints,
                                              validate_supported_kernels)
from aimet_tpu.quantsim.qsim import QuantizationSimModel

MASTER_XML = """<OpDefList>
  <OpDef><Name>Conv2d</Name>
    <Input><Name>in[0]</Name><Datatype>QNN_DATATYPE_UFIXED_POINT_8</Datatype>
      <Shape><Rank>4D</Rank></Shape></Input>
    <Input><Name>in[1]</Name>
      <Description><Content>weights</Content></Description>
      <Datatype>QNN_DATATYPE_SFIXED_POINT_8</Datatype>
      <Shape><Rank>4D</Rank></Shape></Input>
    <Output><Name>out[0]</Name><Datatype>QNN_DATATYPE_UFIXED_POINT_8</Datatype>
      <Shape><Rank>4D</Rank></Shape></Output>
  </OpDef>
  <OpDef><Name>Gemm</Name>
    <Input><Name>in[0]</Name><Datatype>QNN_DATATYPE_UFIXED_POINT_8</Datatype>
      <Shape><Rank>2D</Rank></Shape></Input>
    <Input><Name>in[1]</Name>
      <Description><Content>weights</Content></Description>
      <Datatype>QNN_DATATYPE_SFIXED_POINT_8</Datatype>
      <Shape><Rank>2D</Rank></Shape></Input>
    <Output><Name>out[0]</Name><Datatype>QNN_DATATYPE_UFIXED_POINT_8</Datatype>
      <Shape><Rank>2D</Rank></Shape></Output>
  </OpDef>
</OpDefList>"""


def main():
    rng = np.random.RandomState(0)
    model = TinyCNN(num_classes=4)
    v, _ = init_model(model, (2, 8, 8, 1))
    fn = lambda v, x: model.apply(v, x)
    x = jnp.asarray(rng.randn(2, 8, 8, 1).astype(np.float32))

    # calibrate at 16-bit, then snap to the backend's 8-bit kernels
    sim = QuantizationSimModel(fn, (v, x), quant_scheme="minmax",
                               default_output_bw=16, default_param_bw=16)
    sim.compute_encodings(v, iter([(x,)]))

    with tempfile.TemporaryDirectory() as td:
        opdef = f"{td}/backend.xml"
        open(opdef, "w").write(MASTER_XML)
        parser = ModelOpDefParser.from_qnn_xml(opdef)
        msgs = apply_backend_constraints(sim, parser)
        print(f"backend snapping: {len(msgs)} quantizers adjusted")
        bad = validate_supported_kernels(sim, parser, action="warn")
        print(f"supported_kernels violations after snapping: {len(bad)}")

        # the deployment artifact pair
        onnx_path = export_quantsim_onnx(sim, v, td, "model")
        enc = json.load(open(f"{td}/model.encodings"))
        print(f"artifact: {onnx_path.split('/')[-1]} + model.encodings "
              f"({len(enc['activation_encodings'])} act / "
              f"{len(enc['param_encodings'])} param entries)")

        # consumer side: parse + execute the bytes, names line up
        parsed = parse_onnx(onnx_path)
        tensor_names = {o for n in parsed["nodes"] for o in n["outputs"]}
        tensor_names |= {n for n, _ in parsed["inputs"]}
        assert all(k in tensor_names for k in enc["activation_encodings"])
        ofn, oparams = load_onnx(onnx_path)
        got = ofn(oparams, jnp.transpose(x, (0, 3, 1, 2)))
        ref = fn(v, x)
        err = float(jnp.max(jnp.abs(got - ref)))
        print(f"consumer round-trip max err vs JAX forward: {err:.2e}")


if __name__ == "__main__":
    main()
