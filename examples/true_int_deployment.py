"""Calibrate -> lower to true INT -> export: the TPU deployment pipeline.

The reference's deployment story ends at encodings export (the Qualcomm
runtime executes the INT model); here the TPU is the target, so the same
calibrated sim lowers directly to INT kernels and the artifact is a
safetensors file with INT codes + scales.

Run: python examples/true_int_deployment.py  (CPU or TPU)
"""
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from aimet_tpu.models.cnn import TinyCNN, init_model
from aimet_tpu.quantsim.lowering import lower_to_int
from aimet_tpu.quantsim.qsim import QuantizationSimModel


def main():
    model = TinyCNN(num_classes=10)
    variables, x = init_model(model, (8, 16, 16, 3))
    fn = lambda p, x: model.apply(p, x)

    rng = np.random.RandomState(0)
    batches = [jnp.asarray(rng.randn(8, 16, 16, 3).astype(np.float32))
               for _ in range(4)]

    # 1. calibrate
    sim = QuantizationSimModel(fn, (variables, x), quant_scheme="sqnr",
                               default_param_bw=8, default_output_bw=8)
    sim.compute_encodings(variables, iter(batches))

    # 2. lower to true INT execution (weight-only and full static INT8)
    for mode in ("w8", "w8a8"):
        lowered = lower_to_int(sim, variables, mode=mode)
        out = jax.jit(lambda p, x: lowered(p, x))(variables, batches[0])
        ref = fn(variables, batches[0])
        rel = float(jnp.mean((out - ref) ** 2) / jnp.mean(ref ** 2))
        print(f"{mode}: lowered {len(lowered.lowered_ops)} ops "
              f"(skipped {len(lowered.skipped_ops)}), rel MSE vs FP {rel:.5f}")

    # 3. export artifacts: encodings JSON + INT weights + compiler IR
    with tempfile.TemporaryDirectory() as d:
        sim.export(d, "model")
        st = sim.export_safetensors(d, "model", variables, quantized=True)
        hlo = sim.export_stablehlo(d, "model", variables, x)
        print(f"exported: {d}/model.encodings, {st}, {hlo}")


if __name__ == "__main__":
    main()
