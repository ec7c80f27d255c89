"""QAT with knowledge distillation (LLM QAT + KD).

TPU-native equivalent of the fork's flagship workflow
(Examples/torch/quantization/llm_qat_kd/finetune_llm_qat_kd.py:207-382):
a frozen FP teacher distills into a fake-quantized student trained with
range-learning QAT. The reference builds two DeepSpeed engines (student +
teacher) and mixes cross-entropy with a temperature-scaled KL term; here
teacher and student run inside ONE jitted train step so XLA fuses both
forwards, and sharding is pure GSPMD: shard params/batch over a (dp, tp)
`Mesh` and the same step scales from 1 chip to a slice with collectives
riding ICI (no DeepSpeed/ZeRO machinery needed — remat + sharding cover
the memory story).

Loss (standard Hinton KD, matching the reference's formulation):
    L = (1-alpha) * CE(student_logits, labels)
      + alpha * T^2 * KL(softmax(teacher/T) || softmax(student/T))
with next-token shift and a label mask for padding.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class KDConfig:
    """Hyper-parameters for QAT + distillation.

    temperature / alpha mirror the reference's KD args
    (llm_qat_kd/finetune_llm_qat_kd.py: kd loss mixes CE and KL);
    enc_lr is the separate (smaller) learning rate for the learned
    encoding (min, max) parameters — the reference trains encoding
    params with the same optimizer but a param group; a dedicated SGD
    keeps the quant grid stable.
    """
    temperature: float = 2.0
    alpha: float = 0.5
    enc_lr: float = 1e-5
    ignore_index: int = -100
    remat: bool = False   # rematerialize the student forward (trade FLOPs
                          # for HBM — replaces the reference's ZeRO tricks)


def kd_loss(student_logits: jax.Array, teacher_logits: jax.Array,
            labels: jax.Array, cfg: KDConfig = KDConfig()) -> jax.Array:
    """Combined CE + distillation loss for next-token LM training.

    student_logits/teacher_logits: (B, T, V) float; labels: (B, T) int32
    (already shifted by the caller, or use :func:`shift_labels`).
    Positions where ``labels == cfg.ignore_index`` are masked out of both
    terms.
    """
    mask = (labels != cfg.ignore_index)
    safe_labels = jnp.where(mask, labels, 0)
    denom = jnp.maximum(mask.sum(), 1)

    ce = optax.softmax_cross_entropy_with_integer_labels(
        student_logits, safe_labels)
    ce = (ce * mask).sum() / denom

    t = cfg.temperature
    s_logp = jax.nn.log_softmax(student_logits / t, axis=-1)
    t_prob = jax.nn.softmax(jax.lax.stop_gradient(teacher_logits) / t, axis=-1)
    # true KL(p_t || p_s) per position (non-negative; the entropy term is
    # constant w.r.t. the student but keeps the reported loss interpretable)
    kl = (t_prob * (jnp.log(jnp.clip(t_prob, 1e-20)) - s_logp)).sum(-1)
    kl = (kl * mask).sum() / denom

    return (1.0 - cfg.alpha) * ce + cfg.alpha * (t * t) * kl


def shift_labels(tokens: jax.Array, pad_id: Optional[int] = None,
                 ignore_index: int = -100) -> jax.Array:
    """Next-token labels: labels[t] = tokens[t+1], last position ignored."""
    labels = jnp.concatenate(
        [tokens[:, 1:], jnp.full_like(tokens[:, :1], ignore_index)], axis=1)
    if pad_id is not None:
        labels = jnp.where(labels == pad_id, ignore_index, labels)
    return labels


class KDTrainState(NamedTuple):
    params: Any          # student weights
    enc: Any             # learned-grid encoding (min, max) pytree
    opt_state: Any


def make_qat_kd_step(sim, teacher_apply: Callable,
                     optimizer: optax.GradientTransformation,
                     cfg: KDConfig = KDConfig()
                     ) -> Tuple[KDTrainState, Callable]:
    """Build a jittable QAT+KD train step.

    ``sim`` is a calibrated :class:`QuantizationSimModel` of the student;
    ``teacher_apply(teacher_params, tokens) -> logits`` is the frozen FP
    teacher (often the same architecture with the pre-finetune weights).

    Returns ``(state0, step)`` with
    ``step(state, teacher_params, tokens, labels) -> (state, loss)``.
    ``teacher_params`` is threaded as an argument (not captured) so the
    caller can shard it over the mesh like any other operand. Jit the
    returned step with `in_shardings` from `parallel.mesh.shard_params`
    for multi-chip runs (see examples/llm_qat_kd.py).
    """
    qat_apply, enc0 = sim.qat_fn()
    if cfg.remat:
        qat_apply = jax.checkpoint(qat_apply)
    state0 = KDTrainState(params=None, enc=enc0, opt_state=None)

    def loss_fn(params, enc, teacher_params, tokens, labels):
        s_logits = qat_apply(params, enc, tokens)
        t_logits = teacher_apply(teacher_params, tokens)
        return kd_loss(s_logits, t_logits, labels, cfg)

    def step(state: KDTrainState, teacher_params, tokens, labels):
        loss, (g_params, g_enc) = jax.value_and_grad(
            loss_fn, argnums=(0, 1))(state.params, state.enc,
                                     teacher_params, tokens, labels)
        updates, opt_state = optimizer.update(g_params, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        # range learning: SGD on (min, max), like the reference's separate
        # encoding-param group (v1/qc_quantize_op.py:947 LearnedGrid).
        enc = jax.tree_util.tree_map(lambda e, g: e - cfg.enc_lr * g,
                                     state.enc, g_enc)
        return KDTrainState(params, enc, opt_state), loss

    return state0, step


def init_kd_state(state0: KDTrainState, student_params,
                  optimizer: optax.GradientTransformation) -> KDTrainState:
    """Fill in params/opt_state (split from make_qat_kd_step so the caller
    can device_put/shard the pytrees first)."""
    return KDTrainState(params=student_params, enc=state0.enc,
                        opt_state=optimizer.init(student_params))
