"""Empirical bias correction.

Port of the reference's correct_bias empirical path
(aimet_torch/bias_correction.py:153-197 / native DlEqualization/src/
BiasCorrection.cpp): for each conv/linear layer in topological order, compare
the layer's pre-activation outputs between the FP model and the
quantized-so-far model over calibration batches, and subtract the
per-channel mean error from the bias.

Sequential: after correcting layer n, the quantized model for layer n+1 runs
with the corrected biases (matches the reference's layer-by-layer loop).
"""
from __future__ import annotations

from typing import Dict, Iterable, List, Optional

import jax.numpy as jnp
import numpy as np
from jax import tree_util as jtu

from ..graph.connected_graph import ConnectedGraph, Op
from ..quantsim.qsim import QuantizationSimModel
from ..utils.pytree import set_leaves
from .bn_fold import _conv_axes


def _correctable_layers(graph: ConnectedGraph) -> List[Op]:
    return [op for op in graph.ops
            if op.type in ("conv", "depthwise_conv", "linear")
            and "bias" in op.param_products]


def _channel_mean(x, channel_axis):
    axes = tuple(d for d in range(x.ndim) if d != channel_axis)
    return jnp.mean(x, axis=axes)


def correct_bias(sim: QuantizationSimModel, params, data_batches: List,
                 num_batches: Optional[int] = None):
    """Returns bias-corrected params.

    ``sim`` must already have encodings computed (its quantized forward is the
    'quantized model'). ``data_batches`` is a list of model-input batches
    (replayed once per layer).
    """
    if not isinstance(data_batches, (list, tuple)):
        data_batches = list(data_batches)
    if num_batches is not None:
        data_batches = data_batches[:num_batches]
    graph = sim.graph
    layers = _correctable_layers(graph)

    # FP reference means, captured in one pass per batch
    prod_names = [op.output.name for op in layers]
    fp_means: Dict[str, jnp.ndarray] = {}
    for batch in data_batches:
        args = batch if isinstance(batch, (tuple, list)) else (batch,)
        caps = sim.collect_activations(params, args, prod_names, mode="fp")
        for op in layers:
            _, _, feat_ax = _conv_axes(op)
            m = _channel_mean(caps[op.output.name], feat_ax)
            fp_means[op.name] = fp_means.get(op.name, 0.0) + m / len(data_batches)

    corrected = params
    for op in layers:
        _, _, feat_ax = _conv_axes(op)
        q_mean = 0.0
        for batch in data_batches:
            args = batch if isinstance(batch, (tuple, list)) else (batch,)
            caps = sim.collect_activations(corrected, args, [op.output.name],
                                           mode="quantized")
            q_mean = q_mean + _channel_mean(caps[op.output.name], feat_ax) / len(data_batches)
        error = q_mean - fp_means[op.name]
        bias_path = op.param_products["bias"].param_path
        leaves = jtu.tree_leaves(corrected)
        bias = leaves[graph._param_leaf_index[bias_path]]
        corrected = set_leaves(corrected, {bias_path: bias - error})
        # keep the sim's param encodings in sync with the corrected weights
        sim.compute_param_encodings(corrected)
    return corrected
