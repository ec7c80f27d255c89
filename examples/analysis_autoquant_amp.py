"""Analysis + automation workflows: QuantAnalyzer, AutoQuant, AMP.

Mirrors the reference's quant_analyzer / autoquant / AMP notebooks
(notebooks/quant_analyzer.ipynb, Examples/torch/quantization/{autoquant,
AMP}.ipynb) on the TPU-native API: one tiny CNN, a synthetic eval task,
and the three tools composed end-to-end with HTML artifacts.
"""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from aimet_tpu.algorithms import (AutoQuant, Candidate, QuantAnalyzer,
                                  choose_mixed_precision)
from aimet_tpu.algorithms.quant_analyzer import QuantAnalyzer as _QA
from aimet_tpu.models.cnn import TinyCNN
from aimet_tpu.quantsim.qsim import QuantizationSimModel
from aimet_tpu.utils.visualization import visualize_amp_pareto


def make_task(seed=0, n=128, img=16, classes=8):
    rng = np.random.RandomState(seed)
    deltas = rng.randn(classes, img, img, 1).astype(np.float32)
    labels = rng.randint(0, classes, n)
    x = 0.3 * deltas[labels] + 0.05 * rng.randn(n, img, img, 1)
    return jnp.asarray(x.astype(np.float32)), jnp.asarray(labels)


def train(model, variables, x, y, epochs=20):
    import optax
    opt = optax.adam(3e-3)

    def loss_fn(v):
        logits = model.apply(v, x)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()

    @jax.jit
    def step(v, s):
        g = jax.grad(loss_fn)(v)
        u, s = opt.update(g, s)
        return optax.apply_updates(v, u), s

    state = opt.init(variables)
    for _ in range(epochs):
        variables, state = step(variables, state)
    return variables


def main():
    model = TinyCNN(num_classes=8)
    x, y = make_task()
    variables = model.init(jax.random.PRNGKey(0), x[:2])
    variables = train(model, variables, x, y)
    fn = lambda v, a: model.apply(v, a)

    def eval_fn(forward):
        # the sim replays a traced jaxpr, so eval at the traced batch size
        hits = 0
        for i in range(0, x.shape[0], 32):
            logits = forward(x[i:i + 32])
            hits += int(jnp.sum(jnp.argmax(logits, -1) == y[i:i + 32]))
        return hits / x.shape[0]

    calib = [x[i * 32:(i + 1) * 32] for i in range(4)]
    out_dir = tempfile.mkdtemp(prefix="aimet_tpu_analysis_")

    # --- QuantAnalyzer: per-quantizer sensitivity + HTML report ----------
    sim = QuantizationSimModel(fn, (variables, x[:32]))
    sim.compute_encodings(variables, iter(calib))
    qa = QuantAnalyzer(sim, variables, eval_fn)
    result = qa.analyze(mse_batches=calib[:1])
    _QA.export_html(result, os.path.join(out_dir, "quant_analyzer.html"))
    worst = sorted(result.per_quantizer_sensitivity.items(),
                   key=lambda kv: kv[1])[:3]
    print(f"fp={result.fp_accuracy:.3f} int8={result.quantized_accuracy:.3f}"
          f" most-sensitive={[(n, round(s, 3)) for n, s in worst]}")

    # --- AutoQuant: staged PTQ pipeline with diagnostics -----------------
    aq = AutoQuant(fn, (variables, x[:32]), variables, calib, eval_fn)
    aq_result = aq.optimize(allowed_accuracy_drop=0.05)
    aq_result.export_diagnostics(os.path.join(out_dir, "autoquant.html"))
    print(aq_result.diagnostics())

    # --- AMP: greedy mixed precision over (act, param) candidates --------
    sim2 = QuantizationSimModel(fn, (variables, x[:32]))
    sim2.compute_encodings(variables, iter(calib))
    amp = choose_mixed_precision(
        sim2, variables,
        candidates=[Candidate(8, 8), Candidate(8, 4), Candidate(16, 8)],
        eval_fn=eval_fn, allowed_accuracy_drop=0.05)
    visualize_amp_pareto(amp, os.path.join(out_dir, "amp.html"))
    print(f"AMP: baseline {amp.baseline_accuracy:.3f} -> final "
          f"{amp.final_accuracy:.3f}; "
          f"{sum(1 for c in amp.group_bitwidths.values() if c.param_bw < 8)}"
          f" groups dropped below 8-bit params")
    print(f"artifacts in {out_dir}")


if __name__ == "__main__":
    main()
