"""Bias correction: empirical and analytical (BN-based).

Empirical (aimet_torch/bias_correction.py:153-197): per layer, compare the
pre-activation outputs between FP and quantized-so-far models over
calibration batches and subtract the per-channel mean error from the bias.
Sequential: layer n+1 sees layer n's corrected bias.

Analytical / data-free (DlEqualization/src/BiasCorrection.cpp:48-140
BnBasedBiasCorrection): the expected quantization error is
``epsilon @ E[x]`` where epsilon = sum_spatial(W_q - W) and E[x] is the
closed-form mean of the preceding BN's output distribution N(beta, gamma)
through the activation (identity / relu / relu6 truncated-normal means).
"""
from __future__ import annotations

from typing import Dict, Iterable, List, Optional

import jax
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


def _phi(x):
    return 1.0 / jnp.sqrt(2 * jnp.pi) * jnp.exp(-0.5 * x * x)


def _normal_cdf(x):
    return jax.scipy.special.erfc(-x / jnp.sqrt(2.0)) / 2.0


def _expectation_through_activation(gamma, beta, activation: str):
    """E[f(X)], X ~ N(beta, gamma) — calcExpectationPerChannel
    (BiasCorrection.cpp:58-80)."""
    if activation == "none":
        return beta
    if activation == "relu6":
        a, b = 0.0, 6.0
        Z = _normal_cdf((b - beta) / gamma) - _normal_cdf((a - beta) / gamma)
        z = _phi((a - beta) / gamma) - _phi((b - beta) / gamma)
        return (gamma * z + beta * Z
                + a * _normal_cdf((a - beta) / gamma)
                + b * (1 - _normal_cdf((b - beta) / gamma)))
    # relu
    return beta * (1 - _normal_cdf(-beta / gamma)) + gamma * _phi(-beta / gamma)


def _upstream_bn_and_activation(graph, op):
    """Walk the layer's input back through relu/clip to a batchnorm op;
    returns (bn_op or None, activation string)."""
    act = "none"
    cur = op.inputs[0].producer
    hops = 0
    while cur is not None and hops < 4:
        if cur.type == "clip":
            act = "relu6"
        elif cur.type == "relu":
            if act != "relu6":
                act = "relu"
        elif cur.type == "batchnorm":
            return cur, act
        else:
            return None, act
        cur = cur.inputs[0].producer
        hops += 1
    return None, act


def correct_bias_analytical(sim: QuantizationSimModel, params):
    """Data-free bias correction for layers preceded by BN (+relu/relu6).

    Returns corrected params (call_analytical_py_correct_bias,
    aimet_torch/bias_correction.py:214-258).
    """
    import jax
    from ..algorithms.bn_fold import _bn_role_paths
    from ..quantization.grads import quantize_dequantize

    graph = sim.graph
    sim.compute_param_encodings(params)
    leaves = jtu.tree_leaves(params)
    updates = {}
    for op in _correctable_layers(graph):
        bn, act = _upstream_bn_and_activation(graph, op)
        if bn is None:
            continue
        roles = _bn_role_paths(bn)
        if "scale" not in roles or "bias" not in roles:
            continue
        gamma = leaves[graph._param_leaf_index[roles["scale"]]]
        beta = leaves[graph._param_leaf_index[roles["bias"]]]
        ex = _expectation_through_activation(jnp.abs(gamma), beta, act)

        kpath = op.param_products["kernel"].param_path
        if kpath not in sim.encodings:
            continue
        spec = sim.quantizers[kpath]
        w = leaves[graph._param_leaf_index[kpath]]
        enc = sim.encodings[kpath]
        if spec.channel_axis is not None:
            shape = [1] * w.ndim
            shape[spec.channel_axis] = -1
            emin = jnp.reshape(enc.min, shape)
            emax = jnp.reshape(enc.max, shape)
        else:
            emin, emax = enc.min, enc.max
        w_q = quantize_dequantize(w, emin, emax, bitwidth=spec.bitwidth,
                                  symmetric=spec.symmetric)
        out_ax, in_ax, _ = _conv_axes(op)
        eps = w_q - w
        spatial = tuple(d for d in range(w.ndim) if d not in (out_ax, in_ax))
        eps2 = jnp.sum(eps, axis=spatial) if spatial else eps  # (in/out order varies)
        if op.type == "depthwise_conv" or w.shape[in_ax] == 1:
            error = jnp.squeeze(eps2) * ex
        elif out_ax < in_ax:
            error = eps2 @ ex
        else:
            error = ex @ eps2
        bias_path = op.param_products["bias"].param_path
        bias = leaves[graph._param_leaf_index[bias_path]]
        updates[bias_path] = bias - error
    return set_leaves(params, updates)


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
        # (no encoding resync needed: biases are unquantized by default and
        # kernel encodings are untouched by bias updates)
    return corrected
