"""QAT with range learning: train both weights and encoding (min, max).

Mirrors the reference's QAT range-learning examples
(Examples/torch/quantization/qat_range_learning*).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from aimet_tpu import QuantizationSimModel
from aimet_tpu.models import TinyMLP
from aimet_tpu.models.cnn import init_model


def main():
    model = TinyMLP(features=32)
    variables, x = init_model(model, (16, 16))
    fn = lambda v, x: model.apply(v, x)

    rng = np.random.RandomState(0)
    batches = [jnp.asarray(rng.randn(16, 16).astype(np.float32))
               for _ in range(4)]
    labels = [jnp.asarray(rng.randint(0, 10, 16), jnp.int32) for _ in range(4)]

    sim = QuantizationSimModel(fn, (variables, x), quant_scheme="minmax",
                               default_param_bw=4, default_output_bw=8)
    sim.compute_encodings(variables, iter(batches))

    qat_apply, enc = sim.qat_fn()
    opt = optax.adam(1e-3)
    state = opt.init((variables, enc))

    @jax.jit
    def step(params, enc, state, xb, yb):
        def loss_fn(params, enc):
            logits = qat_apply(params, enc, xb)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yb).mean()

        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(params, enc)
        updates, state = opt.update(grads, state)
        (params, enc) = optax.apply_updates((params, enc), updates)
        return params, enc, state, loss

    params = variables
    for epoch in range(5):
        for xb, yb in zip(batches, labels):
            params, enc, state, loss = step(params, enc, state, xb, yb)
        print(f"epoch {epoch}: loss {float(loss):.4f}")

    sim.update_encodings_from_qat(enc)
    out = sim.quantized_fn(params, batches[0])
    print("final quantized logits:", np.asarray(out[0, :4]))


if __name__ == "__main__":
    main()
