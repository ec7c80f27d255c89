"""Multi-host quantized LLM serving over ICI + DCN.

Brings together the distributed runtime (parallel/distributed.py) and the
sharded serving engine (serving/multihost.py): every host runs this same
script; tp shards weights + KV cache within each host's chips (ICI), dp
spreads the request batch across hosts (DCN).

Single-host demo (8 virtual devices):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        JAX_PLATFORMS=cpu python examples/multihost_serving.py
Multi-host: set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
JAX_PROCESS_ID (or run on Cloud TPU where they auto-detect).
"""
import jax
import jax.numpy as jnp
import numpy as np

from aimet_tpu.models.transformer import Transformer, TransformerConfig
from aimet_tpu.parallel.distributed import (
    all_gather_to_host, global_batch_from_local, initialize, multihost_mesh)
from aimet_tpu.serving.multihost import ShardedQuantizedLLM
from aimet_tpu.serving.quantized_llm import quantize_transformer_weights


def main():
    initialize()                       # no-op single-process
    n = len(jax.devices())
    tp = 2 if n % 2 == 0 else 1
    mesh = multihost_mesh(tp=tp, dp=n // tp)

    cfg = TransformerConfig.tiny(vocab_size=128)
    model = Transformer(cfg)
    tokens0 = jnp.zeros((2, 8), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), tokens0)
    qw = quantize_transformer_weights(variables, cfg, "w8")

    with mesh:
        llm = ShardedQuantizedLLM(qw, cfg, mesh, mode="w8", max_len=64)
        # each host contributes its local slice of the global batch
        dp = mesh.shape["dp"]
        local_b = max(1, 2 * dp // jax.process_count())
        local = np.random.RandomState(jax.process_index()).randint(
            0, cfg.vocab_size, (local_b, 8)).astype(np.int32)
        tokens = global_batch_from_local(mesh, local)
        out = llm.generate(tokens, num_steps=8)
        host_out = all_gather_to_host(out)
    print(f"process {jax.process_index()}: generated {host_out.shape} "
          f"tokens over mesh {dict(mesh.shape)}")


if __name__ == "__main__":
    main()
