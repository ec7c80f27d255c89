"""Cross-Layer Equalization + High-Bias Fold (DFQ).

Graph-driven port of the reference's equalize_model pipeline
(aimet_torch/cross_layer_equalization.py:988: BN fold -> cross-layer scaling
-> high-bias fold) with the Python-impl formulas
(aimet_common/cross_layer_equalization.py:620-760):

  pair scaling      S_i = max|W1_i| / sqrt(max|W1_i| * max|W2_i|)
  depthwise triple  S12 = r1 / cbrt(r1*r2*r3),  S23 = cbrt(r1*r2*r3) / r3
  high-bias fold    absorb = max(0, beta - 3|gamma|) (ReLU between layers),
                    b1 -= absorb, b2 += (sum_spatial W2) @ absorb

All reductions are axis-generic via each layer's dimension_numbers (the
reference hardcodes torch OIHW layouts).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from jax import tree_util as jtu

from ..graph.connected_graph import ConnectedGraph, Op
from ..utils.pytree import set_leaves
from .bn_fold import _bn_role_paths, _conv_axes, fold_all_batch_norms

_SCALABLE = ("conv", "depthwise_conv", "linear")
# Activations CLE may scale through. ``clip`` (relu6) is only approximately
# scale-invariant; including it mirrors the reference's ReLU6 -> ReLU
# replacement before scaling (cross_layer_equalization.py:988 flow).
_TRANSPARENT = ("relu", "clip")


def _next_scalable(op: Op) -> Tuple[Optional[Op], bool]:
    """Follow single-consumer links through ReLU/BN-identity to the next
    conv/linear. Returns (layer, relu_between)."""
    relu_between = False
    cur = op
    for _ in range(4):
        cons = cur.output.consumers
        if len(cons) != 1:
            return None, relu_between
        nxt = cons[0]
        if nxt.type in _SCALABLE:
            return nxt, relu_between
        if nxt.type in _TRANSPARENT:
            relu_between = True
            cur = nxt
            continue
        if nxt.type == "batchnorm":
            # assume already folded to identity/bias — scaling passes through
            cur = nxt
            continue
        return None, relu_between
    return None, relu_between


def find_cls_sets(graph: ConnectedGraph) -> List[Tuple[Op, ...]]:
    """Consecutive layer groups for scaling: pairs (L1, L2) and depthwise
    triples (conv, depthwise_conv, conv) (GraphSearchUtils,
    cross_layer_equalization.py:87)."""
    sets = []
    triple_interior = set()
    for op in graph.ops:
        if op.type not in _SCALABLE:
            continue
        if op.name in triple_interior:
            continue  # already scaled as the middle of a depthwise triple
        nxt, _ = _next_scalable(op)
        if nxt is None:
            continue
        if op.type == "conv" and nxt.type == "depthwise_conv":
            nxt2, _ = _next_scalable(nxt)
            if nxt2 is not None and nxt2.type in ("conv", "linear"):
                sets.append((op, nxt, nxt2))
                triple_interior.add(nxt.name)
            # a conv->depthwise *pair* cannot be scaled: the depthwise
            # kernel's input axis has size 1 (scaling would mis-broadcast)
            continue
        if nxt.type == "depthwise_conv":
            continue
        sets.append((op, nxt))
    return sets


def _weight_range(w, keep_axis):
    axes = tuple(d for d in range(w.ndim) if d != keep_axis)
    return jnp.max(jnp.abs(w), axis=axes)


class _ParamView:
    def __init__(self, graph, params):
        self.graph = graph
        self.leaves = list(jtu.tree_leaves(params))
        self.updates = {}

    def get(self, path):
        if path in self.updates:
            return self.updates[path]
        return self.leaves[self.graph._param_leaf_index[path]]

    def set(self, path, val):
        self.updates[path] = val


def _scale_pair(pv: _ParamView, l1: Op, l2: Op):
    """compute+fold scaling for a (layer1, layer2) pair. Returns S."""
    out1, _, _ = _conv_axes(l1)
    _, in2, _ = _conv_axes(l2)
    k1p = l1.param_products["kernel"].param_path
    k2p = l2.param_products["kernel"].param_path
    w1, w2 = pv.get(k1p), pv.get(k2p)

    r1 = _weight_range(w1, out1)
    r2 = _weight_range(w2, in2)
    s = r1 / jnp.sqrt(r1 * r2)
    s = jnp.nan_to_num(s, nan=1.0, posinf=1.0, neginf=1.0)
    s = jnp.where(s == 0.0, 1.0, s)

    sh1 = [1] * w1.ndim
    sh1[out1] = -1
    sh2 = [1] * w2.ndim
    sh2[in2] = -1
    pv.set(k1p, w1 / jnp.reshape(s, sh1))
    pv.set(k2p, w2 * jnp.reshape(s, sh2))
    b1 = l1.param_products.get("bias")
    if b1 is not None:
        pv.set(b1.param_path, pv.get(b1.param_path) / s)
    return s


def _scale_triple(pv: _ParamView, l1: Op, l2: Op, l3: Op):
    """Depthwise-separable triple scaling (ScaleFactorCalculator.cpp:100-114)."""
    out1, _, _ = _conv_axes(l1)
    out2, _, _ = _conv_axes(l2)
    _, in3, _ = _conv_axes(l3)
    k1p = l1.param_products["kernel"].param_path
    k2p = l2.param_products["kernel"].param_path
    k3p = l3.param_products["kernel"].param_path
    w1, w2, w3 = pv.get(k1p), pv.get(k2p), pv.get(k3p)

    r1 = _weight_range(w1, out1)
    r2 = _weight_range(w2, out2)
    r3 = _weight_range(w3, in3)
    cbrt = jnp.cbrt(r1 * r2 * r3)
    s12 = r1 / cbrt
    s23 = cbrt / r3
    s12 = jnp.where(jnp.isfinite(s12) & (s12 != 0), s12, 1.0)
    s23 = jnp.where(jnp.isfinite(s23) & (s23 != 0), s23, 1.0)

    sh1 = [1] * w1.ndim
    sh1[out1] = -1
    sh2 = [1] * w2.ndim
    sh2[out2] = -1
    sh3 = [1] * w3.ndim
    sh3[in3] = -1
    pv.set(k1p, w1 / jnp.reshape(s12, sh1))
    pv.set(k2p, w2 * jnp.reshape(s12 / s23, sh2))
    pv.set(k3p, w3 * jnp.reshape(s23, sh3))
    b1 = l1.param_products.get("bias")
    if b1 is not None:
        pv.set(b1.param_path, pv.get(b1.param_path) / s12)
    b2 = l2.param_products.get("bias")
    if b2 is not None:
        pv.set(b2.param_path, pv.get(b2.param_path) / s23)
    return s12, s23


def scale_cls_sets(graph: ConnectedGraph, params):
    """CrossLayerScaling.scale_model equivalent. Returns (params, scale_info)
    where scale_info[layer_name] = per-channel scale applied to that layer's
    outputs (for HBF's beta/gamma rescaling)."""
    pv = _ParamView(graph, params)
    scale_info: Dict[str, Dict] = {}
    for cls_set in find_cls_sets(graph):
        if len(cls_set) == 2:
            s = _scale_pair(pv, *cls_set)
            scale_info[cls_set[0].name] = {"scale": np.asarray(s),
                                           "next": cls_set[1].name}
        else:
            s12, s23 = _scale_triple(pv, *cls_set)
            scale_info[cls_set[0].name] = {"scale": np.asarray(s12),
                                           "next": cls_set[1].name}
            scale_info[cls_set[1].name] = {"scale": np.asarray(s23),
                                           "next": cls_set[2].name}
    return set_leaves(params, pv.updates), scale_info


def high_bias_fold(graph: ConnectedGraph, params, bn_info: Dict[str, Dict],
                   scale_info: Dict[str, Dict]):
    """HighBiasFold (aimet_common/cross_layer_equalization.py:686-760).

    For each scaled pair whose first layer had a folded BN and a ReLU-ish
    activation between: absorb = max(0, beta - 3|gamma|) (beta/gamma divided
    by the CLE scale), b1 -= absorb, b2 += (sum_spatial W2) @ absorb.
    """
    pv = _ParamView(graph, params)
    for l1_name, info in scale_info.items():
        if l1_name not in bn_info:
            continue
        l1 = graph.get_op(l1_name)
        l2 = graph.get_op(info["next"])
        _, relu_between = _next_scalable(l1)

        s = jnp.asarray(info["scale"])
        beta = jnp.asarray(bn_info[l1_name]["beta"]) / s
        gamma = jnp.asarray(bn_info[l1_name]["gamma"]) / s

        if relu_between:
            absorb = jnp.maximum(0.0, beta - 3.0 * jnp.abs(gamma))
        else:
            absorb = beta

        # previous-layer bias: conv bias leaf, else the BN's bias leaf
        b1_prod = l1.param_products.get("bias")
        if b1_prod is not None:
            b1_path = b1_prod.param_path
        else:
            bn_op = graph.get_op(bn_info[l1_name]["bn_op"])
            roles = _bn_role_paths(bn_op)
            b1_path = roles.get("bias")
            if b1_path is None:
                continue
        pv.set(b1_path, pv.get(b1_path) - absorb)

        # current-layer bias correction: needs a bias leaf on l2
        b2_prod = l2.param_products.get("bias")
        if b2_prod is None:
            # cannot absorb without a bias; revert
            pv.set(b1_path, pv.get(b1_path) + absorb)
            continue
        out2, in2, _ = _conv_axes(l2)
        w2 = pv.get(l2.param_products["kernel"].param_path)
        axes = tuple(d for d in range(w2.ndim) if d not in (out2, in2))
        wmat = jnp.sum(w2, axis=axes)  # (out, in) or (in, out) order varies
        if w2.shape[in2] == 1 or l2.type == "depthwise_conv":
            corr = jnp.squeeze(wmat) * absorb
        else:
            # contract over the in-channel dimension
            if out2 < in2:
                corr = wmat @ absorb      # wmat is (out, in)
            else:
                corr = absorb @ wmat      # wmat is (in, out)
        pv.set(b2_prod.param_path, pv.get(b2_prod.param_path) + corr)
    return set_leaves(params, pv.updates)


def equalize_model(graph: ConnectedGraph, params):
    """The DFQ pipeline: BN fold -> CLS -> HBF (equalize_model,
    aimet_torch/cross_layer_equalization.py:988)."""
    params, bn_info = fold_all_batch_norms(graph, params, return_bn_info=True)
    params, scale_info = scale_cls_sets(graph, params)
    params = high_bias_fold(graph, params, bn_info, scale_info)
    return params
