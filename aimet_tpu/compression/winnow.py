"""Winnow: channel-mask propagation and model reduction.

TPU-native re-design of the reference's winnow subsystem
(aimet_common/winnow/mask.py:123-436 connectivity classes,
mask_propagation_winnower.py:46, torch winnow/winnow.py:48 winnow_model).
Instead of the reference's binary-mask fixpoint over per-op
InternalConnectivity objects, removals are propagated as index *sets* over
a breadth-first walk of the product graph:

* Direct ops (relu/clip/pools/affine scale) pass the set through
  (DirectInternalConnectivity).
* Elementwise joins (add/sub/mul/...) require the removal on every operand
  (AddInternalConnectivity: an output channel is winnowable only when all
  input branches winnow it — here enforced by propagating the same set into
  each operand's branch).
* Fan-out products propagate into every consumer
  (SplitInternalConnectivity).
* Concat maps the set across segment offsets both ways
  (ConcatInternalConnectivity).
* conv/linear are space boundaries (NullInternalConnectivity): a reader
  slices its kernel's input axis, a writer its output axis (+ bias).
* BatchNorm / per-channel affine ops slice their per-channel parameters.

If propagation hits something unprunable (model IO, grouped conv, an op we
cannot rebuild), the plan falls back to a channel-gather at the seed layer's
input — functionally the reference's DownsampleLayer insertion
(winnow/winnow_utils.py DownsampleLayer) placed at the seed: the seed layer
still shrinks, upstream stays intact.

The reduced model is the original traced graph evaluated with replacement
closures (graph/interpreter.py) — pure, jittable, and XLA compiles it to
the same program as a hand-rebuilt reduced model; params stay untouched.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import tree_util as jtu
from jax.extend.core import Literal

from ..algorithms.adaround import _layer_apply
from ..algorithms.bn_fold import _conv_axes, bn_affine_params
from ..graph.connected_graph import ConnectedGraph, Op
from ..graph.interpreter import evaluate_with_replacements

# Connectivity classes (winnow/mask.py):
DIRECT = {"relu", "clip", "maxpool", "avgpool", "window_sum", "max", "min",
          "sigmoid", "tanh", "gelu", "silu", "softsign", "leaky_relu",
          "identity"}
ELEMWISE = {"add", "sub", "mul", "div", "max", "min"}
LAYERS = {"conv", "linear"}
PARAM_DIRECT = {"batchnorm", "scale", "depthwise_conv"}


class _Blocked(Exception):
    """Raised when a removal set cannot propagate past an op."""


@dataclasses.dataclass
class WinnowPlan:
    """Result of mask propagation for one or more seeds."""
    # op name -> list of (param role, axis, keep indices ndarray)
    layer_slices: Dict[str, List[Tuple[str, int, np.ndarray]]] = \
        dataclasses.field(default_factory=dict)
    # ops needing functional rebuild (direct/elemwise/affine), op name -> kind
    rebuilt_ops: Dict[str, str] = dataclasses.field(default_factory=dict)
    # affine rebuilds: op name -> (channel axis, keep indices)
    affine_ops: Dict[str, Tuple[int, np.ndarray]] = \
        dataclasses.field(default_factory=dict)
    # seed op name -> keep indices for an input gather (fallback path)
    gathers: Dict[str, np.ndarray] = dataclasses.field(default_factory=dict)
    # seed op name -> reason string when falling back to a gather
    fallbacks: Dict[str, str] = dataclasses.field(default_factory=dict)


def _feature_axis(op: Op, prod) -> Optional[int]:
    """Channel axis of ``prod`` from the perspective of layer op ``op``."""
    if op.type in ("conv", "depthwise_conv", "conv_transpose"):
        dn = op.attrs["dimension_numbers"]
        if prod is op.output:
            return dn.out_spec[1]
        return dn.lhs_spec[1]
    if op.type == "linear":
        if prod is op.output:
            return len(prod.shape) - 1
        # traced lhs contracts its last dim; the product may be a
        # pre-reshape alias — only (N, C) / (N, C, 1...) / (N, 1..., C)
        # shapes map channels 1:1
        n_in = op.param_products["kernel"].shape[
            op.attrs["dimension_numbers"][0][1][0]]
        cand = [d for d in range(1, len(prod.shape))
                if prod.shape[d] == n_in]
        others = [d for d in range(1, len(prod.shape))
                  if prod.shape[d] != n_in]
        if len(cand) >= 1 and all(prod.shape[d] == 1 for d in others):
            return cand[0]
        return None
    return None


class _Propagator:
    """Fixpoint removal-set propagation over (product, axis) nodes.

    Each node accumulates the removal indices expressed in ITS OWN channel
    coordinate frame (``_seen``); a visit propagates only the not-yet-seen
    delta. Because every transfer function (concat offset shifts, segment
    splits, elementwise pass-through, layer slices) is index-wise, deltas
    compose — so seeds whose channel spaces meet across a concat are
    reconciled in the correct frame at every node, rather than by unioning
    raw index sets across frames (the round-2 advisor's repro: a
    concat-consumer seed and a segment-consumer seed naming the same
    physical channel now slice BOTH segment writers consistently)."""

    def __init__(self, graph: ConnectedGraph):
        self.graph = graph
        # actions
        self.layer_slices: Dict[str, List[Tuple[str, int, np.ndarray]]] = {}
        self.rebuilt: Dict[str, str] = {}
        # op name -> (axis, accumulated removal set, channel count)
        self.affine: Dict[str, Tuple[int, Set[int], int]] = {}
        # (var id, axis) -> removal indices already propagated through
        self._seen: Dict[Tuple[int, int], Set[int]] = {}
        self._model_out_ids = {
            id(graph.resolve_var(v)) for v in graph.jaxpr.outvars
            if not isinstance(v, Literal)}

    # -- helpers ----------------------------------------------------------
    def _keep(self, n: int, remove: Set[int]) -> np.ndarray:
        bad = sorted(c for c in remove if not 0 <= c < n)
        if bad:
            raise ValueError(
                f"channel indices {bad} out of range for size-{n} axis")
        return np.asarray(sorted(set(range(n)) - remove))

    def _add_layer_slice(self, op: Op, role: str, axis: int,
                         n: int, remove: Set[int]):
        self.layer_slices.setdefault(op.name, []).append(
            (role, axis, self._keep(n, remove)))

    # -- per-op transfer --------------------------------------------------
    def _through_op_downstream(self, op: Op, prod, axis: int,
                               remove: Set[int]):
        """``prod`` (an input of ``op``) loses channels: make ``op`` cope."""
        t = op.type
        if t in LAYERS:
            fax = _feature_axis(op, prod)
            if fax != axis:
                raise _Blocked(f"{op.name}: channel axis mismatch")
            if t == "conv" and op.attrs.get("feature_group_count", 1) != 1:
                raise _Blocked(f"{op.name}: grouped conv input")
            _, in_ax, _ = _conv_axes(op)
            self._add_layer_slice(op, "kernel", in_ax,
                                  op.param_products["kernel"].shape[in_ax],
                                  remove)
            return  # space boundary: stops here
        if t == "depthwise_conv":
            dn = op.attrs["dimension_numbers"]
            if prod.shape[dn.lhs_spec[1]] != op.output.shape[dn.out_spec[1]]:
                raise _Blocked(f"{op.name}: depthwise multiplier != 1")
            out_ax = dn.rhs_spec[0]
            self._add_layer_slice(op, "kernel", out_ax,
                                  op.param_products["kernel"].shape[out_ax],
                                  remove)
            if "bias" in op.param_products:
                self._add_layer_slice(op, "bias", 0,
                                      op.param_products["bias"].shape[0],
                                      remove)
            self.rebuilt[op.name] = "depthwise"
            self._visit(op.output, dn.out_spec[1], remove)
            return
        if t in ("batchnorm", "scale") and op.param_products:
            for role, pp in op.param_products.items():
                if len(pp.shape) == 1 and pp.shape[0] == prod.shape[axis]:
                    continue  # sliced via the affine rebuild
                if pp.shape not in ((), (1,)):
                    raise _Blocked(f"{op.name}: non-per-channel param")
            self.rebuilt[op.name] = "affine"
            # accumulate (removals may arrive in several deltas)
            prev_ax, prev, _ = self.affine.get(op.name, (axis, set(), 0))
            if prev and prev_ax != axis:
                # two different channel axes reached the same affine op:
                # the earlier removal indices would silently be
                # reinterpreted in the new axis's frame
                raise _Blocked(
                    f"{op.name}: channel removals on conflicting axes "
                    f"{prev_ax} and {axis}")
            self.affine[op.name] = (axis, set(prev) | set(remove),
                                    prod.shape[axis])
            self._visit(op.output, axis, remove)
            return
        if t in ELEMWISE and len(op.inputs) > 1:
            if len(op.output.shape) <= axis \
                    or op.output.shape[axis] != prod.shape[axis]:
                raise _Blocked(f"{op.name}: elementwise reshapes channels")
            self.rebuilt[op.name] = "replay"
            # every operand must lose the same channels
            # (AddInternalConnectivity backward: in := out)
            for other in op.inputs:
                if other is prod:
                    continue
                if len(other.shape) != len(op.output.shape) or \
                        other.shape[axis] not in (op.output.shape[axis],):
                    if len(other.shape) <= axis or other.shape[axis] == 1:
                        continue  # broadcast operand: unaffected
                    raise _Blocked(f"{op.name}: operand shape mismatch")
                self._visit(other, axis, remove)
            self._visit(op.output, axis, remove)
            return
        if t in DIRECT or t == "custom_jvp" \
                or (t == "scale" and not op.param_products) \
                or (t in ELEMWISE and len(op.inputs) == 1):
            if len(op.output.shape) != len(prod.shape) \
                    or op.output.shape[axis] != prod.shape[axis]:
                raise _Blocked(f"{op.name}: not channel-preserving")
            self.rebuilt[op.name] = "replay"
            self._visit(op.output, axis, remove)
            return
        if t == "mean":
            axes = tuple(op.attrs.get("axes", ()))
            if axis in axes:
                raise _Blocked(f"{op.name}: reduces the channel axis")
            new_axis = axis - sum(1 for a in axes if a < axis)
            self.rebuilt[op.name] = "replay"
            self._visit(op.output, new_axis, remove)
            return
        if t == "concat":
            cat_ax = op.attrs.get("dimension")
            if cat_ax != axis:
                raise _Blocked(
                    f"{op.name}: concat on axis {cat_ax} not supported "
                    f"for channel axis {axis}")
            # offset this operand's removals into the output space
            # (ConcatInternalConnectivity forward)
            off = 0
            for p in op.inputs:
                if p is prod:
                    break
                off += p.shape[axis]
            self.rebuilt[op.name] = "replay"
            self._visit(op.output, axis, {c + off for c in remove})
            return
        raise _Blocked(f"{op.name}: unsupported consumer type {t!r}")

    def _through_op_upstream(self, op: Op, axis: int, remove: Set[int]):
        """``op``'s output loses channels: shrink what produces them."""
        t = op.type
        if t in LAYERS:
            fax = _feature_axis(op, op.output)
            if fax != axis:
                raise _Blocked(f"{op.name}: output channel axis mismatch")
            if t == "conv" and op.attrs.get("feature_group_count", 1) != 1:
                raise _Blocked(f"{op.name}: grouped conv output")
            out_ax, _, _ = _conv_axes(op)
            self._add_layer_slice(op, "kernel", out_ax,
                                  op.param_products["kernel"].shape[out_ax],
                                  remove)
            if "bias" in op.param_products:
                self._add_layer_slice(op, "bias", 0,
                                      op.param_products["bias"].shape[0],
                                      remove)
            return
        if t == "depthwise_conv":
            # the input product's consumer loop (via _visit) records the
            # kernel/bias slicing in _through_op_downstream
            dn = op.attrs["dimension_numbers"]
            self._visit(op.inputs[0], dn.lhs_spec[1], remove)
            return
        if t in ("batchnorm", "scale") and op.param_products:
            # downstream handling via the input product records the affine
            # rebuild and validates the params
            self._visit(op.inputs[0], axis, remove)
            return
        if t in ELEMWISE and len(op.inputs) > 1:
            self.rebuilt[op.name] = "replay"
            for prod in op.inputs:
                if len(prod.shape) <= axis or prod.shape[axis] == 1:
                    continue  # broadcast operand
                if prod.shape[axis] != op.output.shape[axis]:
                    raise _Blocked(f"{op.name}: operand shape mismatch")
                self._visit(prod, axis, remove)
            return
        if t in DIRECT or t == "custom_jvp" \
                or (t == "scale" and not op.param_products) \
                or (t in ELEMWISE and len(op.inputs) == 1):
            prod = op.inputs[0]
            if len(prod.shape) != len(op.output.shape) \
                    or prod.shape[axis] != op.output.shape[axis]:
                raise _Blocked(f"{op.name}: not channel-preserving")
            self.rebuilt[op.name] = "replay"
            self._visit(prod, axis, remove)
            return
        if t == "mean":
            axes = tuple(op.attrs.get("axes", ()))
            old_axis = axis
            for a in sorted(axes):
                if a <= old_axis:
                    old_axis += 1
            self.rebuilt[op.name] = "replay"
            self._visit(op.inputs[0], old_axis, remove)
            return
        if t == "concat":
            cat_ax = op.attrs.get("dimension")
            if cat_ax != axis:
                raise _Blocked(f"{op.name}: concat axis mismatch")
            self.rebuilt[op.name] = "replay"
            off = 0
            for p in op.inputs:
                seg = {c - off for c in remove
                       if off <= c < off + p.shape[axis]}
                if seg:
                    self._visit(p, axis, seg)
                off += p.shape[axis]
            return
        raise _Blocked(f"{op.name}: unsupported producer type {t!r}")

    # -- graph walk -------------------------------------------------------
    def _visit(self, prod, axis: int, remove: Set[int]):
        """Channels ``remove`` (in ``prod``'s own frame) vanish from tensor
        ``prod`` along ``axis``: reconcile its producer and every consumer
        (Split connectivity is implicit: one product, all consumers). Only
        the not-yet-propagated delta walks on, so repeated visits from
        multiple seeds converge to a fixpoint."""
        key = (id(prod.var), axis)
        seen = self._seen.setdefault(key, set())
        new = set(remove) - seen
        if not new:
            return
        seen |= new
        if id(self.graph.resolve_var(prod.var)) in self._model_out_ids \
                or prod.var in set(self.graph.jaxpr.outvars):
            raise _Blocked(f"{prod.name}: model output cannot shrink")
        if prod.kind == "input":
            raise _Blocked(f"{prod.name}: model input cannot shrink")
        if prod.producer is not None:
            self._through_op_upstream(prod.producer, axis, new)
        elif prod.kind != "param":
            raise _Blocked(f"{prod.name}: no producer")
        for consumer in prod.consumers:
            self._through_op_downstream(consumer, prod, axis, new)


def plan_winnow(graph: ConnectedGraph,
                masks: Dict[str, Sequence[int]]) -> WinnowPlan:
    """Propagate input-channel removals for each seed op and produce a
    slicing/rebuild plan (mask_propagation_winnower.py:46).

    ``masks``: op name -> input channels to REMOVE from that conv/linear.
    Seeds whose propagation is blocked fall back to an input gather at the
    seed (DownsampleLayer-equivalent).
    """
    plan = WinnowPlan()
    seeds = []
    for name, remove in masks.items():
        op = graph.get_op(name)
        if op.type not in ("conv", "linear", "depthwise_conv"):
            raise ValueError(f"cannot winnow {name}: type {op.type!r}")
        remove = set(int(c) for c in remove)
        _, in_ax, _ = _conv_axes(op)
        n_in = op.param_products["kernel"].shape[in_ax]
        bad = sorted(c for c in remove if not 0 <= c < n_in)
        if bad:
            raise ValueError(
                f"cannot winnow {name}: channel indices {bad} out of range "
                f"for {n_in} input channels")
        in_fax = _feature_axis(op, op.inputs[0])
        if in_fax is None:
            raise ValueError(
                f"cannot winnow {name}: input channel axis is ambiguous "
                f"(aliased input of shape {op.inputs[0].shape})")
        seeds.append((name, op, remove, in_ax, n_in, in_fax))

    # pass 1: vet each seed alone; blocked seeds fall back to a gather
    active = []
    for name, op, remove, in_ax, n_in, in_fax in seeds:
        probe = _Propagator(graph)
        try:
            probe._visit(op.inputs[0], in_fax, remove)
        except _Blocked as e:
            plan.fallbacks[name] = str(e)
            plan.gathers[name] = np.asarray(
                sorted(set(range(n_in)) - remove))
            plan.layer_slices.setdefault(name, []).append(
                ("kernel", in_ax, plan.gathers[name]))
            continue
        active.append((name, op, remove, in_ax, n_in, in_fax))

    # pass 2: ONE fixpoint propagation over all vetted seeds. Each seed's
    # removal set enters in its own frame; shared channel spaces are
    # reconciled per node by the delta accumulation (including frame
    # translation through concat offsets), so no raw-index-set merging
    # across coordinate frames ever happens.
    while True:
        prop = _Propagator(graph)
        blocked = None
        try:
            for name, op, remove, in_ax, n_in, in_fax in active:
                prop._add_layer_slice(op, "kernel", in_ax, n_in, remove)
                prop._visit(op.inputs[0], in_fax, remove)
        except _Blocked as e:  # pragma: no cover - pass 1 already vetted
            blocked = (name, op, remove, in_ax, n_in, str(e))
        if blocked is None:
            break
        name, op, remove, in_ax, n_in, msg = blocked
        plan.fallbacks[name] = msg
        keep = np.asarray(sorted(set(range(n_in)) - remove))
        plan.gathers[name] = keep
        plan.layer_slices.setdefault(name, []).append(
            ("kernel", in_ax, keep))
        active = [s for s in active if s[0] != name]

    for opn, slices in prop.layer_slices.items():
        plan.layer_slices.setdefault(opn, []).extend(slices)
    plan.rebuilt_ops.update(prop.rebuilt)
    for opn, (axis, removeset, n) in prop.affine.items():
        plan.affine_ops[opn] = (
            axis, np.asarray(sorted(set(range(n)) - removeset)))
    return plan


# ---------------------------------------------------------------------------
# replacement construction
# ---------------------------------------------------------------------------

def _dedupe_slices(slices):
    """Combine repeated (role, axis) slices by intersecting keeps."""
    merged: Dict[Tuple[str, int], np.ndarray] = {}
    for role, axis, keep in slices:
        k = (role, axis)
        if k in merged:
            merged[k] = np.intersect1d(merged[k], keep)
        else:
            merged[k] = keep
    return [(role, axis, keep) for (role, axis), keep in merged.items()]


def _replay_fn(graph: ConnectedGraph, op: Op) -> Callable:
    """Re-execute the op's own eqns on new inputs — shape-polymorphic for
    elementwise/reduction/window primitives (their params are rank-based,
    not shape-baked)."""
    from ..quantsim.qsim import _eval_eqn

    # bind: for each op input product, the eqn-level var it feeds; jaxpr
    # constvars referenced by the group are bound to their const values
    resolve = graph.resolve_var
    group_outs = {id(ov) for e in op.eqns for ov in e.outvars}
    const_of = {id(v): c
                for v, c in zip(graph.jaxpr.constvars, graph.consts)}
    bind_of: Dict[int, int] = {}
    consts_used: Dict[int, Any] = {}
    for e in op.eqns:
        for v in e.invars:
            if isinstance(v, Literal) or id(v) in group_outs \
                    or id(v) in bind_of or id(v) in consts_used:
                continue
            if id(v) in const_of:
                consts_used[id(v)] = const_of[id(v)]
                continue
            rv = resolve(v)
            for i, p in enumerate(op.inputs):
                if rv is p.var or v is p.var:
                    bind_of[id(v)] = i
                    break

    def fn(*xs):
        env = dict(consts_used)
        for vid, i in bind_of.items():
            env[vid] = xs[i]

        def rd(v):
            if isinstance(v, Literal):
                return v.val
            return env[id(v)]

        out = None
        for e in op.eqns:
            outs = _eval_eqn(e, [rd(v) for v in e.invars])
            for ov, o in zip(e.outvars, outs):
                env[id(ov)] = o
                out = o
        return out

    fn._nary = True
    return fn


def _affine_fn(graph: ConnectedGraph, params, op: Op, keep: np.ndarray,
               axis: int) -> Callable:
    """Per-channel affine rebuild for batchnorm/scale ops: probe the traced
    subgraph for y = a*x + b (bn_fold.bn_affine_params) and slice."""
    a, b = bn_affine_params(graph, params, op, axis)
    a_k = jnp.take(jnp.asarray(a), keep, axis=0)
    b_k = jnp.take(jnp.asarray(b), keep, axis=0)
    ndim = len(op.output.shape)

    def fn(x):
        shape = [1] * ndim
        shape[axis] = -1
        return x * a_k.reshape(shape) + b_k.reshape(shape)

    return fn


def _layer_fn(graph: ConnectedGraph, params, op: Op,
              slices, gather: Optional[np.ndarray]) -> Callable:
    leaves = jtu.tree_leaves(params)
    w = leaves[graph._param_leaf_index[op.param_products["kernel"].param_path]]
    bias = None
    if "bias" in op.param_products:
        bias = leaves[graph._param_leaf_index[
            op.param_products["bias"].param_path]]
    fgc = op.attrs.get("feature_group_count", 1)
    for role, axis, keep in slices:
        if role == "kernel":
            w = jnp.take(w, keep, axis=axis)
            if op.type == "depthwise_conv" \
                    and axis == op.attrs["dimension_numbers"].rhs_spec[0]:
                fgc = len(keep)
        elif role == "bias" and bias is not None:
            bias = jnp.take(bias, keep, axis=axis)

    in_ax = None
    if gather is not None:
        in_ax = _feature_axis(op, op.inputs[0])

    if op.type == "depthwise_conv" and fgc != op.attrs.get(
            "feature_group_count", 1):
        dn = op.attrs["dimension_numbers"]

        def fn(x):
            out = jax.lax.conv_general_dilated(
                x, w, window_strides=op.attrs["window_strides"],
                padding=op.attrs["padding"], dimension_numbers=dn,
                feature_group_count=fgc)
            if bias is not None:
                shape = [1] * out.ndim
                shape[dn.out_spec[1]] = -1
                out = out + jnp.reshape(bias, shape)
            return out
        return fn

    lhs_shape = op.attrs.get("lhs_shape")

    def fn(x):
        if gather is not None:
            x = jnp.take(x, jnp.asarray(gather), axis=in_ax)
        if op.type == "linear" and lhs_shape is not None \
                and x.ndim != len(lhs_shape) and len(lhs_shape) == 2:
            # pre-dense flatten alias with a channel count that changed:
            # re-derive instead of using the traced (stale) lhs_shape
            x = x.reshape(x.shape[0], -1)
        return _layer_apply(op, x, w, bias)
    return fn


def winnow_model(graph: ConnectedGraph, params,
                 masks: Dict[str, Sequence[int]],
                 out_tree=None):
    """Remove the given input channels from each named op.

    ``masks``: op name -> list of input-channel indices to REMOVE.
    Returns (callable reduced model, replacement dict); the plan is
    attached as ``reduced.plan`` (fallbacks included).
    """
    plan = plan_winnow(graph, masks)
    replacements: Dict[str, Callable] = {}

    for opn, slices in plan.layer_slices.items():
        op = graph.get_op(opn)
        replacements[opn] = _layer_fn(
            graph, params, op, _dedupe_slices(slices),
            plan.gathers.get(opn))

    for opn, kind in plan.rebuilt_ops.items():
        if opn in replacements:
            continue
        op = graph.get_op(opn)
        if kind == "affine":
            axis, keep = plan.affine_ops[opn]
            replacements[opn] = _affine_fn(graph, params, op, keep, axis)
        else:
            replacements[opn] = _replay_fn(graph, op)

    def reduced_model(params, *args):
        return evaluate_with_replacements(graph, params, args, replacements,
                                          out_tree)

    reduced_model.plan = plan
    return reduced_model, replacements


def propagate_channel_mask(graph: ConnectedGraph, op: Op,
                           keep: np.ndarray) -> Optional[Op]:
    """Walk upstream from ``op``'s input through Direct ops to the layer
    whose output channels must shrink. Returns that layer (or None).
    Retained for the simple single-chain callers (channel_pruning)."""
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
