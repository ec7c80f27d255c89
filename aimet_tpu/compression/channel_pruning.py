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


def make_multi_channel_pruned_replacements(
    graph: ConnectedGraph, params, ratio_map: Dict[str, float],
    act_samples=None,
):
    """Prune several layers' input channels in ONE winnow plan.

    Seeds sharing a channel space (e.g. several convs reading one residual
    trunk) are merged by the mask propagation (winnow.plan_winnow), so the
    resulting replacements are mutually consistent — unlike per-layer
    pruning, where overlapping plans would clobber each other.

    ``act_samples``: optional {op name: (x_samples, y_samples)} for
    least-squares weight reconstruction (weight_reconstruction.py:58-130).
    Returns (replacements dict, WinnowPlan).
    """
    from jax import tree_util as jtu

    from .winnow import _feature_axis, winnow_model

    leaves = jtu.tree_leaves(params)
    masks: Dict[str, list] = {}
    for name, ratio in ratio_map.items():
        op = graph.get_op(name)
        _, in_ax, _ = _conv_axes(op)
        w = leaves[graph._param_leaf_index[
            op.param_products["kernel"].param_path]]
        n_in = w.shape[in_ax]
        num_keep = max(1, int(round(n_in * ratio)))
        keep = select_channels_to_keep(w, num_keep, in_ax)
        masks[name] = sorted(set(range(n_in)) - set(keep.tolist()))

    reduced, replacements = winnow_model(graph, params, masks)
    plan = reduced.plan

    if act_samples:
        from ..algorithms.adaround import _layer_apply

        for name in masks:
            if name not in act_samples:
                continue
            op = graph.get_op(name)
            out_ax, in_ax, _ = _conv_axes(op)
            w = leaves[graph._param_leaf_index[
                op.param_products["kernel"].param_path]]
            bias = None
            if "bias" in op.param_products:
                bias = leaves[graph._param_leaf_index[
                    op.param_products["bias"].param_path]]
            # the seed's final keep can be narrower than requested after
            # space merging: read it back from the plan
            in_keeps = [k for role, ax, k in plan.layer_slices[name]
                        if role == "kernel" and ax == in_ax]
            actual_keep = in_keeps[0]
            for k in in_keeps[1:]:
                actual_keep = np.intersect1d(actual_keep, k)
            out_keeps = [k for role, ax, k in plan.layer_slices[name]
                         if role == "kernel" and ax == out_ax]

            x_s, y_s = act_samples[name]
            if out_keeps:  # output also pruned by another seed's space
                ofax = _feature_axis(op, op.output)
                y_s = jnp.take(y_s, out_keeps[0], axis=ofax)
                if bias is not None:
                    bias = jnp.take(bias, out_keeps[0], axis=0)
                w = jnp.take(w, out_keeps[0], axis=out_ax)
            w_k = reconstruct_weights(x_s, y_s, op, actual_keep, w, bias)
            gathered = name in plan.gathers
            in_feat_ax = _feature_axis(op, op.inputs[0]) if gathered else None

            def op_fn(x, op=op, w_k=w_k, bias=bias, keep=actual_keep,
                      gathered=gathered, in_feat_ax=in_feat_ax):
                if gathered:
                    x = jnp.take(x, jnp.asarray(keep), axis=in_feat_ax)
                return _layer_apply(op, x, w_k, bias)

            replacements[name] = op_fn

    return replacements, plan


def make_channel_pruned_replacements(
    graph: ConnectedGraph, params, op: Op, comp_ratio: float,
    x_samples=None, y_samples=None,
) -> Dict[str, Callable]:
    """Single-layer convenience wrapper over
    :func:`make_multi_channel_pruned_replacements`."""
    samples = None
    if x_samples is not None and y_samples is not None:
        samples = {op.name: (x_samples, y_samples)}
    reps, _plan = make_multi_channel_pruned_replacements(
        graph, params, {op.name: comp_ratio}, samples)
    return reps
