"""Compression pipeline: spatial SVD + greedy ratio selection, then INT8.

Mirrors the reference's compression examples
(Examples/torch/compression/spatial_svd*, channel_pruning*): compress a
CNN to ~50% MACs with auto (greedy) ratio selection, fine-tune-free eval,
then quantize the compressed model — the BASELINE rows 7-8 workflow.

Runs on CPU or TPU:  python examples/compression_pipeline.py
"""
import jax
import jax.numpy as jnp
import numpy as np

from aimet_tpu.compression.compressor import ModelCompressor
from aimet_tpu.models.cnn import TinyCNN, init_model
from aimet_tpu.quantsim.qsim import QuantizationSimModel


def main():
    model = TinyCNN(num_classes=10)
    variables, x = init_model(model, (8, 16, 16, 3))
    fn = lambda p, x: model.apply(p, x)

    rng = np.random.RandomState(0)
    batches = [jnp.asarray(rng.randn(8, 16, 16, 3).astype(np.float32))
               for _ in range(4)]
    ref = fn(variables, batches[0])

    def eval_fn(model_callable):
        out = model_callable(variables, batches[0])
        return -float(jnp.mean((out - ref) ** 2))   # higher = better

    compressed, stats = ModelCompressor.compress_model(
        fn, (variables, x), variables, scheme="spatial_svd",
        eval_fn=eval_fn, target_comp_ratio=0.5)
    print(f"MAC compression ratio: {stats.mac_compression_ratio:.2f} "
          f"(target 0.5)")

    # quantize the compressed model (compression then PTQ, like the
    # reference's combined pipeline)
    sim = QuantizationSimModel(
        lambda p, x: compressed(p, x), (variables, x),
        quant_scheme="sqnr", default_param_bw=8, default_output_bw=8)
    sim.compute_encodings(variables, iter(batches))
    q = sim.quantized_fn(variables, batches[0])
    err = float(jnp.mean((q - ref) ** 2) / jnp.mean(ref ** 2))
    print(f"compressed+INT8 relative MSE vs FP dense: {err:.4f}")


if __name__ == "__main__":
    main()
