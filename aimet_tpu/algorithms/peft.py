"""PEFT / LoRA quantization utilities.

Port of aimet_torch/peft.py:61-400 (LoraLayer + PeftQuantUtils): quantize
and freeze a base model while keeping low-rank adapters trainable and
swappable.  Functional design: adapters live in their own pytree; the
combined forward is ``base(x) + scale * (x @ A) @ B`` traced through the
quantsim graph so the base weights keep their frozen encodings while
adapter matmuls stay unquantized (or get their own quantizers).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import tree_util as jtu


@dataclasses.dataclass
class LoraConfig:
    rank: int = 8
    alpha: float = 16.0
    target_patterns: Tuple[str, ...] = ("kernel",)


def init_lora_params(key, params, config: LoraConfig):
    """One (A, B) pair per 2-D kernel leaf matching target_patterns."""
    adapters = {}
    flat = jtu.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = jtu.keystr(path)
        if leaf.ndim != 2:
            continue
        if not any(p in name for p in config.target_patterns):
            continue
        k_in, k_out = leaf.shape
        key, k1 = jax.random.split(key)
        adapters[name] = {
            "A": jax.random.normal(k1, (k_in, config.rank),
                                   leaf.dtype) * 0.01,
            "B": jnp.zeros((config.rank, k_out), leaf.dtype),
        }
    return adapters


def lora_apply_fn(base_fn: Callable, params, adapters,
                  config: LoraConfig) -> Callable:
    """Build ``fn(adapters, *inputs)`` that runs the base model with
    LoRA-merged weights.

    The merge ``W + (alpha/r) * A @ B`` happens in the parameter tree, so
    the base fn (and any quantsim built over it) is reused unchanged; base
    weights can be quantized/frozen while only ``adapters`` is trained.
    """
    scaling = config.alpha / config.rank
    from ..utils.pytree import set_leaves

    def merged_params(adapters):
        flat = jtu.tree_flatten_with_path(params)[0]
        updates = {}
        for path, leaf in flat:
            name = jtu.keystr(path)
            if name in adapters:
                ad = adapters[name]
                updates[name] = leaf + scaling * (ad["A"] @ ad["B"])
        return set_leaves(params, updates)

    def fn(adapters, *inputs):
        return base_fn(merged_params(adapters), *inputs)

    return fn


class PeftQuantUtils:
    """Quantsim-side helpers (peft.py:183 PeftQuantUtils)."""

    @staticmethod
    def freeze_base_model_encodings(sim):
        """Freeze every base param encoding so adapter training / swapping
        cannot disturb them."""
        for name, spec in sim.quantizers.items():
            if spec.kind == "param" and name in sim.encodings:
                sim.set_encoding(name, sim.encodings[name], freeze=True)

    @staticmethod
    def quantized_lora_fn(sim, params, adapters, config: LoraConfig):
        """Quantized forward with merged LoRA weights: the merged kernel is
        fake-quantized with the (frozen) base encoding — matching on-target
        deployment where adapters fold into the quantized base weight."""
        fn = lora_apply_fn(lambda p, *a: sim.quantized_fn(p, *a),
                           params, adapters, config)
        return fn

    @staticmethod
    def swap_adapters(fn_builder, new_adapters):
        """Adapters are just a pytree — swapping is passing a different one."""
        return new_adapters
