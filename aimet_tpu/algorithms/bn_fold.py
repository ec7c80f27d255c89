"""Batch-norm folding (graph-driven, framework-agnostic).

Equivalent of the reference's fold_all_batch_norms
(aimet_torch/batch_norm_fold.py:81, native math DlEqualization/src/
BatchNormFold.cpp) — but instead of hardcoding the BN formula (and its eps),
the BN op's per-channel affine transform ``y = a*x + b`` is *extracted
numerically* from the traced graph: we evaluate the batchnorm op-group's
equations (plus their weight-preprocessing closure) at x=0 and x=1.  This
works for any affine normalization pattern the tracer grouped, with no
assumptions beyond per-channel affinity.

Folding (conv -> BN):  W' = a ⊙ W (along out-channel), b' = a*b + b_bn, and
the BN leaves are rewritten so the BN op becomes identity (or a pure bias add
when the conv has no bias leaf to absorb ``b_bn`` into).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import tree_util as jtu
from jax.extend.core import Literal

from ..graph.connected_graph import ConnectedGraph, Op
from ..quantsim.qsim import _eval_eqn
from ..utils.pytree import set_leaves


def _closure_eqns(graph: ConnectedGraph, op: Op, stop_vars: set) -> List:
    """All eqns needed to evaluate ``op.eqns`` from params + ``stop_vars``."""
    producer = {}
    for e in graph.jaxpr.eqns:
        for ov in e.outvars:
            producer[id(ov)] = e
    needed, order, visiting = set(), [], set()

    def visit(e):
        if id(e) in needed or id(e) in visiting:
            return
        visiting.add(id(e))
        for v in e.invars:
            if isinstance(v, Literal) or id(v) in stop_vars:
                continue
            pe = producer.get(id(v))
            if pe is not None:
                visit(pe)
        visiting.discard(id(e))
        needed.add(id(e))
        order.append(e)

    for e in op.eqns:
        visit(e)
    return order


def bn_affine_params(graph: ConnectedGraph, params, bn_op: Op,
                     channel_axis: int) -> Tuple[jax.Array, jax.Array]:
    """Extract per-channel (a, b) such that the BN op computes y = a*x + b."""
    in_prod = bn_op.inputs[0]
    stop = {id(in_prod.var)}
    order = _closure_eqns(graph, bn_op, stop)

    env = {}
    for v, c in zip(graph.jaxpr.constvars, graph.consts):
        env[id(v)] = c
    flat = jtu.tree_leaves(params)
    # param invars only — graph invars beyond params are data (unused here)
    for var in graph.jaxpr.invars:
        path = graph.param_var_paths.get(id(var))
        if path is not None:
            env[id(var)] = flat[graph._param_leaf_index[path]]

    def run(x):
        local = dict(env)
        local[id(in_prod.var)] = x
        for e in order:
            ins = [v.val if isinstance(v, Literal) else local[id(v)]
                   for v in e.invars]
            outs = _eval_eqn(e, ins)
            for ov, o in zip(e.outvars, outs):
                local[id(ov)] = o
        return local[id(bn_op.output.var)]

    shape = in_prod.shape
    b_full = run(jnp.zeros(shape, jnp.float32))
    a_full = run(jnp.ones(shape, jnp.float32)) - b_full

    idx = tuple(slice(None) if ax == channel_axis else 0
                for ax in range(len(shape)))
    return a_full[idx], b_full[idx]


def _conv_axes(op: Op):
    """(out_axis, in_axis) of the kernel; feature axis of the output."""
    if op.type in ("conv", "depthwise_conv", "conv_transpose"):
        dn = op.attrs["dimension_numbers"]
        return dn.rhs_spec[0], dn.rhs_spec[1], dn.out_spec[1]
    if op.type == "linear":
        dn = op.attrs["dimension_numbers"]
        (lhs_c, rhs_c), _ = dn
        kernel = op.param_products["kernel"]
        free = [d for d in range(len(kernel.shape)) if d not in rhs_c]
        out_ax = free[-1]
        in_ax = rhs_c[0]
        out_feature_axis = op.output.shape and len(op.output.shape) - 1
        return out_ax, in_ax, out_feature_axis
    raise ValueError(f"not a foldable layer: {op.type}")


def _bn_role_paths(bn_op: Op) -> Dict[str, str]:
    roles = {}
    for path in bn_op.attrs.get("param_roots", []):
        low = path.lower()
        if "mean" in low:
            roles["mean"] = path
        elif "var" in low:
            roles["var"] = path
        elif "scale" in low or "gamma" in low or "weight" in low:
            roles["scale"] = path
        elif "bias" in low or "beta" in low:
            roles["bias"] = path
    return roles


def find_foldable_pairs(graph: ConnectedGraph) -> List[Tuple[Op, Op]]:
    """(layer, bn) pairs where the BN directly consumes the layer output."""
    pairs = []
    for bn in graph.ops_of_type("batchnorm"):
        prod = bn.inputs[0].producer
        if prod is None:
            continue
        if prod.type not in ("conv", "depthwise_conv", "linear"):
            continue
        if len(prod.output.consumers) != 1:
            continue
        pairs.append((prod, bn))
    return pairs


def fold_all_batch_norms(graph: ConnectedGraph, params,
                         return_bn_info: bool = False):
    """Fold every conv/linear->BN pair; returns the new params tree (and,
    optionally, per-layer BN info used by high-bias fold).

    BN info records the original (gamma, beta) leaves' values for CLE's
    high-bias fold (cross_layer_equalization.py HbfImpl).
    """
    updates = {}
    bn_info: Dict[str, Dict] = {}
    flat = jtu.tree_leaves(params)

    for layer, bn in find_foldable_pairs(graph):
        out_ax, _, out_feat_ax = _conv_axes(layer)
        a, b = bn_affine_params(graph, params, bn, out_feat_ax)

        kernel_path = layer.param_products["kernel"].param_path
        w = flat[graph._param_leaf_index[kernel_path]]
        shape = [1] * w.ndim
        shape[out_ax] = -1
        updates[kernel_path] = w * jnp.reshape(a, shape)

        roles = _bn_role_paths(bn)
        has_scale = "scale" in roles and "bias" in roles
        if not has_scale:
            raise NotImplementedError(
                f"BN fold requires scale+bias leaves on {bn.name} "
                f"(roots: {bn.attrs.get('param_roots')})")
        gamma = flat[graph._param_leaf_index[roles["scale"]]]
        beta = flat[graph._param_leaf_index[roles["bias"]]]

        bias_prod = layer.param_products.get("bias")
        if bias_prod is not None:
            bias = flat[graph._param_leaf_index[bias_prod.param_path]]
            updates[bias_prod.param_path] = a * bias + b
            # BN -> identity: gamma' = gamma/a, beta' = 0, mean' = 0
            updates[roles["scale"]] = gamma / a
            updates[roles["bias"]] = jnp.zeros_like(beta)
            if "mean" in roles:
                updates[roles["mean"]] = jnp.zeros_like(
                    flat[graph._param_leaf_index[roles["mean"]]])
        else:
            # no conv bias leaf: BN keeps the shift (y = x + b)
            updates[roles["scale"]] = gamma / a
            updates[roles["bias"]] = b
            if "mean" in roles:
                updates[roles["mean"]] = jnp.zeros_like(
                    flat[graph._param_leaf_index[roles["mean"]]])

        bn_info[layer.name] = {
            "bn_op": bn.name, "gamma": np.asarray(gamma), "beta": np.asarray(beta),
            "a": np.asarray(a), "b": np.asarray(b)}

    new_params = set_leaves(params, updates)
    if return_bn_info:
        return new_params, bn_info
    return new_params
