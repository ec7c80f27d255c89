"""LLM QAT + knowledge distillation, sharded over a (dp, tp) mesh.

TPU-native re-design of the fork's flagship example
(Examples/torch/quantization/llm_qat_kd/finetune_llm_qat_kd.py): the
reference spins up two DeepSpeed ZeRO engines (FP teacher + quantsim
student) on GPUs; here both models live inside ONE jitted GSPMD train
step — teacher weights and student weights are sharded with the same
tensor-parallel rules, the batch is data-parallel, and XLA inserts the
ICI collectives.

Run (any host; uses a virtual 8-device CPU mesh if no TPU slice):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        JAX_PLATFORMS=cpu python examples/llm_qat_kd.py
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from aimet_tpu.algorithms.kd import (
    KDConfig, init_kd_state, make_qat_kd_step, shift_labels)
from aimet_tpu.models.transformer import Transformer, TransformerConfig
from aimet_tpu.parallel.mesh import (
    batch_sharding, make_mesh, replicated, shard_params)
from aimet_tpu.quantsim.qsim import QuantizationSimModel


def main():
    n = len(jax.devices())
    tp = 2 if n % 2 == 0 else 1
    mesh = make_mesh(dp=n // tp, tp=tp)
    dp = n // tp

    cfg = TransformerConfig.tiny(vocab_size=128)
    model = Transformer(cfg)
    batch, seqlen = dp * 2, 16
    tokens0 = jnp.zeros((batch, seqlen), jnp.int32)
    teacher_params = model.init(jax.random.PRNGKey(0), tokens0)
    apply_fn = lambda v, t: model.apply(v, t)

    # Student starts from the teacher weights (the usual QAT-KD setup).
    sim = QuantizationSimModel(apply_fn, (teacher_params, tokens0),
                               quant_scheme="sqnr",
                               default_param_bw=4, default_output_bw=8)
    rng = np.random.RandomState(0)
    calib = [jnp.asarray(rng.randint(0, cfg.vocab_size, (batch, seqlen)),
                         jnp.int32) for _ in range(4)]
    sim.compute_encodings(teacher_params, iter(calib))

    opt = optax.adamw(1e-4)
    kcfg = KDConfig(temperature=2.0, alpha=0.5, enc_lr=1e-5)
    state0, step = make_qat_kd_step(sim, apply_fn, opt, kcfg)
    state = init_kd_state(state0, teacher_params, opt)

    p_sh = shard_params(teacher_params, mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P
    opt_sh = jax.tree_util.tree_map(
        lambda l: NamedSharding(mesh, P(*([None] * l.ndim)))
        if hasattr(l, "ndim") else replicated(mesh), state.opt_state)
    enc_sh = jax.tree_util.tree_map(lambda _: replicated(mesh), state.enc)
    tok_sh = batch_sharding(mesh, 2)
    state_sh = type(state)(params=p_sh, enc=enc_sh, opt_state=opt_sh)

    step = jax.jit(step, in_shardings=(state_sh, p_sh, tok_sh, tok_sh),
                   out_shardings=(state_sh, replicated(mesh)))

    state = jax.device_put(state, state_sh)
    teacher_d = jax.device_put(teacher_params, p_sh)
    for i in range(10):
        toks = jax.device_put(
            jnp.asarray(rng.randint(0, cfg.vocab_size, (batch, seqlen)),
                        jnp.int32), tok_sh)
        state, loss = step(state, teacher_d, toks, shift_labels(toks))
        print(f"step {i}: kd-qat loss {float(loss):.4f}")


if __name__ == "__main__":
    main()
