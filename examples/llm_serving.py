"""INT4 weight-only LLM serving with INT8 KV cache + continuous batching.

The true-quant execution path (BASELINE config 5): weights stored as packed
INT4, dequantization fused into the matmuls (Pallas on TPU), KV cache INT8.
"""
import jax
import jax.numpy as jnp
import numpy as np

from aimet_tpu.models import Transformer, TransformerConfig
from aimet_tpu.serving import ContinuousBatcher, QuantizedLLM


def main(num_requests: int = 6, max_new_tokens: int = 12):
    cfg = TransformerConfig.tiny(vocab_size=512)
    model = Transformer(cfg)
    tokens = jnp.zeros((1, 8), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), tokens)

    # Optional (essential for W8A8 modes): fold per-channel activation
    # outliers into the weights before quantizing — SmoothQuant, discovered
    # automatically at the RMSNorm->qkv/mlp sites and float-exact.
    from aimet_tpu.algorithms import apply_smooth_quant
    rng0 = np.random.RandomState(1)
    calib = [jnp.asarray(rng0.randint(0, 512, (1, 8)))]
    fn = lambda p, t: model.apply(p, t)[0]
    variables, _ = apply_smooth_quant(fn, (variables, tokens), variables,
                                      calib, alpha=0.5)

    llm = QuantizedLLM(variables, cfg, mode="w4", max_len=64)
    batcher = ContinuousBatcher(llm, num_slots=4)

    rng = np.random.RandomState(0)
    reqs = [batcher.submit(list(rng.randint(0, 512, rng.randint(3, 10))),
                           max_new_tokens=max_new_tokens)
            for _ in range(num_requests)]
    steps = batcher.run_until_done()
    print(f"served {len(reqs)} requests in {steps} engine steps")
    for r in reqs[:3]:
        print(f"  req {r.uid}: prompt {r.prompt[:4]}... -> {r.generated}")


if __name__ == "__main__":
    main()
