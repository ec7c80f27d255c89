"""PTQ quickstart: DFQ + AdaRound on MobileNetV2 (synthetic data).

Mirrors the reference's Examples/torch/quantization flow: BN fold -> CLE ->
quantsim calibration -> AdaRound -> export.
Run: python examples/ptq_quickstart.py  (CPU ok; TPU if available)
"""
import jax
import jax.numpy as jnp
import numpy as np

from aimet_tpu import QuantizationSimModel
from aimet_tpu.algorithms import apply_adaround, equalize_model
from aimet_tpu.algorithms.adaround import AdaroundParameters
from aimet_tpu.graph import ConnectedGraph
from aimet_tpu.models import MobileNetV2


def main():
    model = MobileNetV2(num_classes=10, width_mult=0.25)
    x = jnp.ones((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    fn = lambda v, x: model.apply(v, x)

    rng = np.random.RandomState(0)
    batches = [jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
               for _ in range(4)]

    # 1. data-free equalization (BN fold + CLE + high-bias fold)
    graph = ConnectedGraph(fn, (variables, x))
    variables = equalize_model(graph, variables)
    print("equalized")

    # 2. quantsim + calibration (SQNR scheme)
    sim = QuantizationSimModel(fn, (variables, x), quant_scheme="sqnr",
                               default_param_bw=8, default_output_bw=8)
    sim.compute_encodings(variables, iter(batches))
    print(f"calibrated {len(sim.encodings)} quantizers")

    # 3. AdaRound the weights (short run for the example)
    variables = apply_adaround(
        sim, variables, batches,
        AdaroundParameters(num_batches=2, num_iterations=200))
    print("adarounded")

    # 4. quantized inference + export
    out = jax.jit(sim.quantized_fn)(variables, batches[0])
    print("quantized output:", np.asarray(out[0, :4]))
    sim.export("/tmp", "mnv2_example")
    print("exported /tmp/mnv2_example.encodings")


if __name__ == "__main__":
    main()
