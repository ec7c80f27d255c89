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


def lora_unmerged_fn(base_fn: Callable, example_args, params,
                     config: LoraConfig) -> Callable:
    """QLoRA-deployment form: ``fn(combined, *inputs)`` with
    ``combined = {"base": params, "adapters": adapters}`` where every
    adapted layer computes ``base_op(x) + (alpha/r) * (x @ A) @ B`` as
    SEPARATE matmuls (reference LoraLayer.forward, peft.py:101-117).

    Unlike :func:`lora_apply_fn` (which folds adapters into the base
    kernel), the adapter matmuls appear as their own ops when a
    QuantizationSimModel traces this function — so A/B weights and the
    adapter-path activations get their own quantizers, matching the
    reference's per-adapter quantizer placement."""
    from ..algorithms.adaround import _layer_apply
    from ..graph.connected_graph import ConnectedGraph
    from ..graph.interpreter import evaluate_with_replacements

    graph = ConnectedGraph(base_fn, (params,) + tuple(example_args))
    out_shape = jax.eval_shape(base_fn, params, *example_args)
    out_tree = jtu.tree_structure(out_shape)
    scaling = config.alpha / config.rank

    # target ops: layers whose kernel path has an adapter entry
    targets = []
    for op in graph.ops:
        if op.type not in ("linear", "conv", "depthwise_conv"):
            continue
        k = op.param_products.get("kernel")
        if k is not None and len(k.shape) == 2 \
                and any(p in k.param_path for p in config.target_patterns):
            targets.append((op, k.param_path,
                            op.param_products.get("bias")))

    def fn(combined, *inputs):
        base, adapters = combined["base"], combined["adapters"]
        leaves = jtu.tree_leaves(base)
        reps = {}
        for op, kpath, bias_prod in targets:
            if kpath not in adapters:
                continue
            ad = adapters[kpath]
            w = leaves[graph._param_leaf_index[kpath]]
            bias = (leaves[graph._param_leaf_index[bias_prod.param_path]]
                    if bias_prod is not None else None)

            def rep(x, op=op, w=w, bias=bias, ad=ad):
                delta = ((x @ ad["A"]) @ ad["B"]) * scaling
                return _layer_apply(op, x, w, bias) + delta

            reps[op.name] = rep
        return evaluate_with_replacements(graph, base, inputs, reps,
                                          out_tree)

    return fn


class PeftQuantUtils:
    """Quantsim-side helpers (peft.py:183 PeftQuantUtils)."""

    ADAPTER_KEY = "['adapters']"

    @staticmethod
    def build_adapter_sim(base_fn, example_args, params, adapters,
                          config: LoraConfig, **sim_kwargs):
        """Sim over the UNMERGED LoRA forward: base layers and adapter
        matmuls each own quantizers (get_quantized_lora_layer,
        peft.py:348)."""
        from ..quantsim.qsim import QuantizationSimModel

        fn = lora_unmerged_fn(base_fn, example_args, params, config)
        combined = {"base": params, "adapters": adapters}
        return QuantizationSimModel(
            fn, (combined,) + tuple(example_args), **sim_kwargs), combined

    @classmethod
    def _is_adapter_quantizer(cls, sim, name, spec) -> bool:
        if spec.kind == "param":
            return cls.ADAPTER_KEY in name
        # activation quantizer: op whose params live under adapters
        try:
            op = sim.graph.get_op(name[:-6] if name.endswith("_input")
                                  else name)
        except (KeyError, ValueError):
            return False
        return any(p.param_path and cls.ADAPTER_KEY in p.param_path
                   for p in op.param_products.values())

    @classmethod
    def set_bitwidth_for_lora_adapters(cls, sim, output_bw: int,
                                       param_bw: int):
        """Adapter quantizers to (output_bw, param_bw)
        (peft.py:325-346)."""
        for name, spec in list(sim.quantizers.items()):
            if not cls._is_adapter_quantizer(sim, name, spec):
                continue
            sim.set_bitwidth(name, param_bw if spec.kind == "param"
                             else output_bw)

    @staticmethod
    def freeze_base_model_param_quantizers(sim):
        """(peft.py:288)"""
        for name, spec in sim.quantizers.items():
            if spec.kind == "param" \
                    and PeftQuantUtils.ADAPTER_KEY not in name \
                    and name in sim.encodings:
                sim.set_encoding(name, sim.encodings[name], freeze=True)

    @classmethod
    def freeze_base_model_activation_quantizers(cls, sim):
        """(peft.py:301)"""
        for name, spec in sim.quantizers.items():
            if spec.kind != "param" and name in sim.encodings \
                    and not cls._is_adapter_quantizer(sim, name, spec):
                sim.set_encoding(name, sim.encodings[name], freeze=True)

    @classmethod
    def freeze_base_model(cls, sim):
        """(peft.py:316)"""
        cls.freeze_base_model_param_quantizers(sim)
        cls.freeze_base_model_activation_quantizers(sim)

    # kept for back-compat with the merged flow
    freeze_base_model_encodings = freeze_base_model_param_quantizers

    @staticmethod
    def quantized_lora_fn(sim, params, adapters, config: LoraConfig):
        """Quantized forward with merged LoRA weights: the merged kernel is
        fake-quantized with the (frozen) base encoding — matching on-target
        deployment where adapters fold into the quantized base weight."""
        fn = lora_apply_fn(lambda p, *a: sim.quantized_fn(p, *a),
                           params, adapters, config)
        return fn

    @staticmethod
    def export_adapter_weights(adapters, path: str, prefix: str) -> str:
        """Adapter-only safetensors artifact (peft.py:388)."""
        import numpy as np
        from safetensors.numpy import save_file

        tensors = {}
        for kname, ab in adapters.items():
            for role, arr in ab.items():
                tensors[f"{kname}.{role}"] = np.asarray(arr)
        out = f"{path}/{prefix}_adapters.safetensors"
        save_file(tensors, out)
        return out

    @staticmethod
    def enable_adapter_and_load_weights(weights_path: str):
        """Load a swapped-in adapter set (peft.py:414)."""
        from safetensors.numpy import load_file

        adapters: Dict[str, Dict[str, jnp.ndarray]] = {}
        for key, arr in load_file(weights_path).items():
            kname, role = key.rsplit(".", 1)
            adapters.setdefault(kname, {})[role] = jnp.asarray(arr)
        return adapters

    @staticmethod
    def disable_lora_adapters(adapters):
        """Zeroed adapters == exact base model (peft.py:439)."""
        return jtu.tree_map(jnp.zeros_like, adapters)

    @classmethod
    def export_adapter_encodings(cls, sim) -> Dict:
        """Encodings subset covering only the adapter quantizers — the
        per-adapter artifact exported alongside adapter weights
        (track_lora_meta_data + export flow, peft.py:143-181)."""
        full = sim.export_encodings()
        keep_act = {}
        keep_par = {}
        for name, spec in sim.quantizers.items():
            if not cls._is_adapter_quantizer(sim, name, spec):
                continue
            src = (full["param_encodings"] if spec.kind == "param"
                   else full["activation_encodings"])
            dst = keep_par if spec.kind == "param" else keep_act
            if name in src:
                dst[name] = src[name]
        return {"version": full["version"],
                "activation_encodings": keep_act,
                "param_encodings": keep_par}

    @staticmethod
    def swap_adapters(fn_builder, new_adapters):
        """Adapters are just a pytree — swapping is passing a different one."""
        return new_adapters
