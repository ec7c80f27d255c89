"""ModelCompressor — the user-facing compression API.

Port of the reference's compress_model flow (aimet_torch/compress.py:50,
compression_factory.py:60, aimet_common/compression_algo.py:53): pick a
scheme (spatial_svd / weight_svd / channel_pruning), select per-layer
compression ratios (greedy auto mode or manual), and return a compressed
model function plus statistics.

The compressed model is the traced graph evaluated with factored/pruned op
replacements (graph/interpreter.py) — jittable, shardable, exportable.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax import tree_util as jtu

from ..graph.connected_graph import ConnectedGraph, Op
from ..graph.interpreter import evaluate_with_replacements
from .channel_pruning import (make_channel_pruned_replacements,
                              make_multi_channel_pruned_replacements)
from .cost import (Cost, layer_cost, model_cost, rank_for_comp_ratio,
                   ranks_for_comp_ratio_ssvd, spatial_svd_cost,
                   successive_svd_cost, weight_svd_cost)
from .greedy import GreedyCompRatioSelect, GreedySelectionParameters
from .svd import (make_spatial_svd_replacement,
                  make_successive_svd_replacement,
                  make_weight_svd_replacement)


@dataclasses.dataclass
class CompressionStats:
    original_cost: Cost
    compressed_cost: Cost
    per_layer_ratios: Dict[str, float]

    @property
    def mac_compression_ratio(self) -> float:
        return self.compressed_cost.mac / max(self.original_cost.mac, 1e-12)


class CompressedModel:
    """A compressed network: graph + op replacements, callable like the
    original fn(params, *args)."""

    def __init__(self, graph: ConnectedGraph, replacements: Dict[str, Callable],
                 out_tree=None, stats: Optional[CompressionStats] = None):
        self.graph = graph
        self.replacements = replacements
        self._out_tree = out_tree
        self.stats = stats

    def __call__(self, params, *args):
        return evaluate_with_replacements(
            self.graph, params, args, self.replacements, self._out_tree)


class ModelCompressor:
    """compress_model entry point (compress.py:50)."""

    SCHEMES = ("spatial_svd", "weight_svd", "successive_svd",
               "channel_pruning")

    @staticmethod
    def _compressible_layers(graph: ConnectedGraph, scheme: str,
                             ignore: Sequence[str] = ()) -> List[Op]:
        types = {"spatial_svd": ("conv",),
                 "weight_svd": ("conv", "linear"),
                 "successive_svd": ("conv",),
                 "channel_pruning": ("conv",)}[scheme]
        return [op for op in graph.ops
                if op.type in types and "kernel" in op.param_products
                and op.name not in ignore]

    @staticmethod
    def _op_weights(graph, params, op):
        """(kernel, bias) of a layer op — from the param pytree, or (for a
        re-traced compressed graph whose weights became closure constants)
        from the jaxpr consts."""
        leaves = jtu.tree_leaves(params)
        if "kernel" in op.param_products:
            w = leaves[graph._param_leaf_index[
                op.param_products["kernel"].param_path]]
            bias = None
            if "bias" in op.param_products:
                bias = leaves[graph._param_leaf_index[
                    op.param_products["bias"].param_path]]
            return w, bias
        const_of = {id(v): c for v, c in
                    zip(graph.jaxpr.constvars, graph.consts)}
        rhs = graph.resolve_var(op.eqns[0].invars[1])
        if id(rhs) not in const_of:
            raise ValueError(
                f"{op.name}: weights are neither params nor constants; "
                f"cannot compress this layer further")
        w = const_of[id(rhs)]
        bias = None
        for e in op.eqns[1:]:
            if e.primitive.name != "add":
                continue
            for v in e.invars:
                rv = None if isinstance(v, jax.extend.core.Literal) \
                    else graph.resolve_var(v)
                if rv is not None and id(rv) in const_of:
                    b = np.asarray(const_of[id(rv)])
                    bias = b.reshape(-1)
        return w, bias

    @classmethod
    def _make_replacement(cls, graph, params, op, ratio, scheme,
                          act_samples=None):
        w, bias = cls._op_weights(graph, params, op)
        if scheme == "spatial_svd":
            rank = rank_for_comp_ratio(op, ratio, "spatial_svd")
            return {op.name: make_spatial_svd_replacement(op, w, bias, rank)}
        if scheme == "weight_svd":
            rank = rank_for_comp_ratio(op, ratio, "weight_svd")
            return {op.name: make_weight_svd_replacement(op, w, bias, rank)}
        if scheme == "successive_svd":
            r, s = ranks_for_comp_ratio_ssvd(op, ratio)
            return {op.name: make_successive_svd_replacement(op, w, bias,
                                                             r, s)}
        if scheme == "channel_pruning":
            x_s = y_s = None
            if act_samples is not None and op.name in act_samples:
                x_s, y_s = act_samples[op.name]
            return make_channel_pruned_replacements(
                graph, params, op, ratio, x_s, y_s)
        raise ValueError(scheme)

    @classmethod
    def compress_model(cls, fn, example_args, params, scheme: str,
                       eval_fn: Optional[Callable] = None,
                       target_comp_ratio: float = 0.5,
                       num_candidates: int = 10,
                       manual_ratios: Optional[Dict[str, float]] = None,
                       ignore_layers: Sequence[str] = (),
                       act_samples=None) -> Tuple[CompressedModel, CompressionStats]:
        """Auto (greedy, needs eval_fn) or manual per-layer ratio compression.

        eval_fn(model_callable) -> score (higher better), evaluated on
        candidate single-layer compressions during greedy selection.
        """
        assert scheme in cls.SCHEMES, scheme
        graph = ConnectedGraph(fn, example_args)
        out_shape = jax.eval_shape(fn, *example_args)
        out_tree = jtu.tree_structure(out_shape)
        layers = cls._compressible_layers(graph, scheme, ignore_layers)

        if manual_ratios is None:
            assert eval_fn is not None, "auto mode needs eval_fn"

            def greedy_eval(ratio_map: Dict[str, float]) -> float:
                if scheme == "channel_pruning":
                    reps, _ = make_multi_channel_pruned_replacements(
                        graph, params, ratio_map, act_samples)
                else:
                    reps = {}
                    for name, r in ratio_map.items():
                        op = graph.get_op(name)
                        reps.update(cls._make_replacement(
                            graph, params, op, r, scheme, act_samples))
                model = CompressedModel(graph, reps, out_tree)
                return eval_fn(model)

            sel = GreedyCompRatioSelect(
                graph, layers, greedy_eval,
                GreedySelectionParameters(target_comp_ratio, num_candidates),
                cost_fn=lambda op, r: (
                    spatial_svd_cost(op, rank_for_comp_ratio(op, r, "spatial_svd")).mac
                    if scheme == "spatial_svd" else
                    successive_svd_cost(op, *ranks_for_comp_ratio_ssvd(op, r)).mac
                    if scheme == "successive_svd" else
                    weight_svd_cost(op, rank_for_comp_ratio(op, r, "weight_svd")).mac
                    if scheme == "weight_svd" else layer_cost(op).mac * r))
            ratios, _ = sel.select()
        else:
            ratios = dict(manual_ratios)

        replacements: Dict[str, Callable] = {}
        compressed_cost = Cost(0, 0)
        orig = model_cost(graph)
        if scheme == "channel_pruning":
            # one joint winnow plan: seeds sharing a channel space (residual
            # trunks, concat segments) must shrink consistently
            active = {n: r for n, r in ratios.items() if r < 1.0}
            replacements, _plan = make_multi_channel_pruned_replacements(
                graph, params, active, act_samples)
        for op in graph.ops:
            r = ratios.get(op.name, 1.0)
            if op.name in ratios and r < 1.0:
                if scheme != "channel_pruning":
                    replacements.update(cls._make_replacement(
                        graph, params, op, r, scheme, act_samples))
                if scheme == "spatial_svd":
                    compressed_cost += spatial_svd_cost(
                        op, rank_for_comp_ratio(op, r, "spatial_svd"))
                elif scheme == "weight_svd":
                    compressed_cost += weight_svd_cost(
                        op, rank_for_comp_ratio(op, r, "weight_svd"))
                elif scheme == "successive_svd":
                    compressed_cost += successive_svd_cost(
                        op, *ranks_for_comp_ratio_ssvd(op, r))
                else:
                    c = layer_cost(op)
                    compressed_cost += Cost(c.memory * r, c.mac * r)
            else:
                compressed_cost += layer_cost(op)

        stats = CompressionStats(orig, compressed_cost, ratios)
        model = CompressedModel(graph, replacements, out_tree, stats)
        return model, stats
