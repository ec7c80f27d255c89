"""Winnow: channel-mask propagation and model reduction.

Port of the reference's winnow subsystem (aimet_common/winnow/mask.py:123-436
connectivity classes, mask_propagation_winnower.py:46, torch
winnow/winnow.py:48 winnow_model): given per-layer input-channel masks,
propagate them through the graph (Direct ops pass masks, Add joins them,
Stop ops block) and produce a reduced model via op replacement.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from jax import tree_util as jtu

from ..algorithms.adaround import _layer_apply
from ..algorithms.bn_fold import _conv_axes
from ..graph.connected_graph import ConnectedGraph, Op
from ..graph.interpreter import evaluate_with_replacements

# Connectivity classes (winnow/mask.py):
DIRECT = {"relu", "clip", "maxpool", "avgpool", "max", "min", "scale",
          "sigmoid", "tanh", "gelu", "silu"}
STOP = {"concat", "reshape", "softmax", "mean", "linear"}


def propagate_channel_mask(graph: ConnectedGraph, op: Op,
                           keep: np.ndarray) -> Optional[Op]:
    """Walk upstream from ``op``'s input through Direct ops to the layer
    whose output channels must shrink. Returns that layer (or None)."""
    prev = op.inputs[0].producer
    hops = 0
    while prev is not None and prev.type in DIRECT and hops < 8:
        if len(prev.inputs) != 1:
            return None
        prev = prev.inputs[0].producer
        hops += 1
    if prev is not None and prev.type in ("conv", "depthwise_conv", "linear"):
        return prev
    return None


def winnow_model(graph: ConnectedGraph, params,
                 masks: Dict[str, Sequence[int]],
                 out_tree=None):
    """Remove the given input channels from each named op.

    ``masks``: op name -> list of input-channel indices to REMOVE.
    Returns (callable reduced model, replacement dict).
    """
    replacements: Dict[str, Callable] = {}
    leaves = jtu.tree_leaves(params)

    for name, remove in masks.items():
        op = graph.get_op(name)
        out_ax, in_ax, _ = _conv_axes(op)
        w = leaves[graph._param_leaf_index[op.param_products["kernel"].param_path]]
        n_in = w.shape[in_ax]
        keep = np.asarray(sorted(set(range(n_in)) - set(remove)))
        bias = None
        if "bias" in op.param_products:
            bias = leaves[graph._param_leaf_index[
                op.param_products["bias"].param_path]]
        w_k = jnp.take(w, keep, axis=in_ax)

        prev = propagate_channel_mask(graph, op, keep)
        if prev is None:
            raise ValueError(
                f"cannot winnow {name}: upstream mask propagation blocked")
        p_out_ax, _, _ = _conv_axes(prev)
        pw = leaves[graph._param_leaf_index[
            prev.param_products["kernel"].param_path]]
        pw_k = jnp.take(pw, keep, axis=p_out_ax)
        p_bias = None
        if "bias" in prev.param_products:
            p_bias = jnp.take(
                leaves[graph._param_leaf_index[
                    prev.param_products["bias"].param_path]], keep, axis=0)

        replacements[prev.name] = (
            lambda x, _p=prev, _w=pw_k, _b=p_bias: _layer_apply(_p, x, _w, _b))
        replacements[name] = (
            lambda x, _o=op, _w=w_k, _b=bias: _layer_apply(_o, x, _w, _b))

    def reduced_model(params, *args):
        return evaluate_with_replacements(graph, params, args, replacements,
                                          out_tree)

    return reduced_model, replacements
