"""Channel pruning with least-squares weight reconstruction.

Port of the reference's channel pruner (aimet_common/channel_pruner.py:43,
aimet_torch/channel_pruning/weight_reconstruction.py:58-130,
input_match_search.py): for a target layer, keep the highest-magnitude input
channels, winnow the *previous* layer's corresponding output channels, and
reconstruct the target layer's weights by linear least squares on sampled
(input, output) activation pairs.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.connected_graph import ConnectedGraph, Op
from ..algorithms.bn_fold import _conv_axes


def select_channels_to_keep(w, num_keep: int, in_axis: int) -> np.ndarray:
    """Indices of input channels with largest weight magnitude
    (channel_pruner.py:43: sum of |w| per input channel)."""
    axes = tuple(d for d in range(w.ndim) if d != in_axis)
    mag = np.asarray(jnp.sum(jnp.abs(w), axis=axes))
    keep = np.sort(np.argsort(mag)[::-1][:num_keep])
    return keep


def reconstruct_weights(x_samples, y_samples, op: Op, keep, w, bias):
    """Least-squares refit of the pruned layer's kernel so that
    conv(x[:, keep], w') ~= y (weight_reconstruction.py:58-130).

    x_samples: layer input (N,H,W,I) or (N,I); y_samples: original layer
    output (pre-activation).
    """
    # y_samples is the op's output *including* its bias-add (the graph folds
    # the bias into the op); regress against the bias-free target since the
    # replacement op re-adds the bias (reference weight_reconstruction.py).
    if bias is not None:
        y_samples = y_samples - bias
    if op.type == "linear":
        x_k = x_samples[:, keep]
        sol = jnp.linalg.lstsq(x_k, y_samples)[0]
        return sol
    # conv: extract patches so the problem becomes linear regression
    kh, kw = w.shape[0], w.shape[1]
    strides = tuple(op.attrs["window_strides"])
    patches = jax.lax.conv_general_dilated_patches(
        x_samples[..., keep], (kh, kw), strides, op.attrs["padding"],
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x_samples[..., keep].shape,
            (kh, kw, len(keep), 1),
            ("NHWC", "HWIO", "NHWC")))
    # patches: (N, OH, OW, I*kh*kw) with feature order (c, kh, kw)
    n, oh, ow, f = patches.shape
    A = patches.reshape(-1, f)
    B = y_samples.reshape(-1, y_samples.shape[-1])
    # subsample rows for tractability (input_match_search.py:285)
    if A.shape[0] > 4096:
        idx = np.random.RandomState(0).choice(A.shape[0], 4096, replace=False)
        A, B = A[idx], B[idx]
    sol = jnp.linalg.lstsq(A, B)[0]            # (I*kh*kw, O)
    w_new = sol.reshape(len(keep), kh, kw, w.shape[-1]).transpose(1, 2, 0, 3)
    return w_new


def make_channel_pruned_replacements(
    graph: ConnectedGraph, params, op: Op, comp_ratio: float,
    x_samples=None, y_samples=None,
) -> Dict[str, Callable]:
    """Prune ``op``'s input channels to ``comp_ratio`` fraction.

    Returns replacements for (a) the previous layer (producing only the kept
    channels) and (b) ``op`` itself (consuming the reduced input). Weight
    reconstruction is applied when activation samples are provided.
    """
    from jax import tree_util as jtu

    leaves = jtu.tree_leaves(params)
    out_ax, in_ax, _ = _conv_axes(op)
    w = leaves[graph._param_leaf_index[op.param_products["kernel"].param_path]]
    bias = None
    if "bias" in op.param_products:
        bias = leaves[graph._param_leaf_index[op.param_products["bias"].param_path]]

    n_in = w.shape[in_ax]
    num_keep = max(1, int(round(n_in * comp_ratio)))
    keep = select_channels_to_keep(w, num_keep, in_ax)

    # walk back through channel-preserving ops (winnow mask propagation,
    # aimet_common/winnow/mask.py Direct-connectivity ops); every hop must be
    # single-consumer or the pruned channels would corrupt a sibling branch
    prev = op.inputs[0].producer
    hops = 0
    while prev is not None and prev.type in ("relu", "clip", "maxpool",
                                             "avgpool", "max", "min") and hops < 6:
        if len(prev.output.consumers) != 1:
            raise ValueError(
                f"cannot winnow input of {op.name}: {prev.name}'s output has "
                f"multiple consumers")
        prev = prev.inputs[0].producer
        hops += 1
    if prev is None or prev.type not in ("conv", "linear", "depthwise_conv"):
        raise ValueError(f"cannot winnow input of {op.name}: no previous layer")
    if len(prev.output.consumers) != 1:
        raise ValueError(
            f"cannot winnow input of {op.name}: {prev.name}'s output has "
            f"multiple consumers")
    p_out_ax, _, _ = _conv_axes(prev)
    pw = leaves[graph._param_leaf_index[prev.param_products["kernel"].param_path]]
    pw_k = jnp.take(pw, keep, axis=p_out_ax)
    p_bias = None
    if "bias" in prev.param_products:
        p_bias = jnp.take(
            leaves[graph._param_leaf_index[prev.param_products["bias"].param_path]],
            keep, axis=0)

    w_k = jnp.take(w, keep, axis=in_ax)
    if x_samples is not None and y_samples is not None:
        w_k = reconstruct_weights(x_samples, y_samples, op, keep, w, bias)

    from ..algorithms.adaround import _layer_apply

    def prev_fn(x):
        return _layer_apply(prev, x, pw_k, p_bias)

    def op_fn(x):
        return _layer_apply(op, x, w_k, bias)

    return {prev.name: prev_fn, op.name: op_fn}
