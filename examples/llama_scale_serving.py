"""Serving at memory scales where floats cannot exist: the Llama-8B recipe.

The round-4 north-star flow (bench_llama8b.py runs it at full 8.03B scale
on a real v5e chip: INT4 weights 4.8 GB where bf16 would need 16.1 GB >
the whole HBM). This example demonstrates the same code path at a small
config so it runs anywhere:

  1. `random_quantized_weights` — build the model DIRECTLY in quantized
     storage (int codes + scales drawn on device); for a real checkpoint
     use `quantize_transformer_weights` on (possibly streamed) params.
  2. `pad_vocab_for_decode` (applied automatically) — vocab padded to the
     decode kernel's block so the 263 MB lm_head never gets re-padded
     inside jit (a measured 3x lm_head slowdown at 8B).
  3. INT8 KV cache + GQA attention computed directly on int8 K/V.
  4. Greedy decode inside one jit (`lax.scan` over steps).

Run: python examples/llama_scale_serving.py
"""
import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

from aimet_tpu.models.transformer import TransformerConfig
from aimet_tpu.ops.kv_cache import init_quantized_kv_cache
from aimet_tpu.serving.quantized_llm import (
    quantized_forward,
    quantized_weight_bytes,
    random_quantized_weights,
)


def main(batch: int = 4, prefill: int = 8, steps: int = 6):
    # TransformerConfig.llama3_8b() is the real thing; `small` keeps this
    # example runnable on CPU in seconds
    cfg = TransformerConfig.small(vocab_size=1000)
    qw = random_quantized_weights(cfg, mode="w4a8", seed=0)
    print(f"quantized weight tree: "
          f"{quantized_weight_bytes(qw) / 1e6:.1f} MB "
          f"(bf16 would be ~4x the projection bytes)")

    max_len = prefill + steps + 2
    caches = [init_quantized_kv_cache(batch, max_len, cfg.n_kv_heads,
                                      cfg.head_dim)
              for _ in range(cfg.n_layers)]
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(0, cfg.vocab_size, (batch, prefill)),
                         jnp.int32)

    prefill_fn = jax.jit(partial(quantized_forward, prefill=True,
                                 mode="w4a8"), static_argnames=("cfg",))
    logits, caches = prefill_fn(qw, cfg, tokens, caches, 0)
    tok = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)

    @jax.jit
    def decode(qw, tok, caches, start):
        def body(carry, _):
            tok, caches, pos = carry
            logits, caches = quantized_forward(qw, cfg, tok, caches, pos,
                                               prefill=False, mode="w4a8")
            nxt = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)
            return (nxt, caches, pos + 1), nxt

        _, toks = jax.lax.scan(body, (tok, caches, start), None,
                               length=steps)
        return toks

    toks = decode(qw, tok, caches, jnp.int32(prefill))
    out = np.asarray(toks)[:, :, 0].T          # (batch, steps)
    assert out.shape == (batch, steps) and np.isfinite(out).all()
    print(f"decoded {steps} steps x batch {batch}: {out[0].tolist()}")


if __name__ == "__main__":
    main()
