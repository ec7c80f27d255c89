"""Generic graph evaluation with op replacement.

Used by the compression subsystem: a compressed model is the original traced
graph evaluated with some ops substituted by factored/pruned equivalents
(the reference instead rebuilds torch module trees — module_reducer.py).
The substituted function is pure and jittable; XLA compiles it to the same
program as a hand-rebuilt model.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
from jax import tree_util as jtu
from jax.extend.core import Literal

from ..quantsim.qsim import _eval_eqn
from .connected_graph import ConnectedGraph

# pure data-movement primitives whose traced shapes a replacement may
# invalidate; their failures are tolerated (poisoned) because replacement
# closures re-derive layouts themselves
_MOVEMENT_PRIMS = {"reshape", "broadcast_in_dim", "squeeze", "expand_dims",
                   "transpose", "rev", "slice", "convert_element_type",
                   "copy"}

_POISON = object()


def evaluate_with_replacements(
    graph: ConnectedGraph, params, args,
    replacements: Optional[Dict[str, Callable]] = None,
    out_tree=None,
):
    """Evaluate the traced jaxpr; for each op in ``replacements`` skip its
    eqns and set its output to ``replacement(x)`` (x = the op's data input).
    """
    replacements = replacements or {}
    jaxpr = graph.jaxpr
    flat = jtu.tree_leaves((params,) + tuple(args))
    env: Dict[int, Any] = {}

    def read(v):
        return v.val if isinstance(v, Literal) else env[id(v)]

    for v, c in zip(jaxpr.constvars, graph.consts):
        env[id(v)] = c
    for var, val in zip(jaxpr.invars, flat):
        env[id(var)] = val

    skip_eqns = {}
    emit_at = {}
    for name, fn in replacements.items():
        op = graph.get_op(name)
        for e in op.eqns:
            skip_eqns[id(e)] = op
        # compute the replacement when the last eqn of the group is reached
        emit_at[id(op.eqns[-1])] = (op, fn)

    def _input_val(op, prod):
        # prefer the resolved Product var (pre-alias tensor) — replacement
        # closures reshape for themselves; the eqn-level (post-reshape) var
        # may be shape-invalidated after a channel reduction
        if id(prod.var) in env and env[id(prod.var)] is not _POISON:
            return read(prod.var)
        for e in op.eqns:
            for v in e.invars:
                if isinstance(v, Literal):
                    continue
                if (v is prod.var or graph.resolve_var(v) is prod.var) \
                        and id(v) in env:
                    return read(v)
        return read(prod.var)

    for eqn in jaxpr.eqns:
        if id(eqn) in skip_eqns:
            if id(eqn) in emit_at:
                op, fn = emit_at[id(eqn)]
                if getattr(fn, "_nary", False):
                    env[id(op.output.var)] = fn(
                        *[_input_val(op, p) for p in op.inputs])
                else:
                    x_var = op.eqns[0].invars[0]
                    x = (read(x_var) if isinstance(x_var, Literal)
                         or id(x_var) in env else read(op.inputs[0].var))
                    env[id(op.output.var)] = fn(x)
            continue
        vals = [read(v) for v in eqn.invars]
        movement = eqn.primitive.name in _MOVEMENT_PRIMS
        if any(v is _POISON for v in vals):
            if not movement:
                raise RuntimeError(
                    f"eqn {eqn.primitive.name} consumes a tensor whose "
                    f"traced shape was invalidated by an op replacement")
            outs = [_POISON] * len(eqn.outvars)
        else:
            try:
                outs = _eval_eqn(eqn, vals)
            except (TypeError, ValueError):
                # shape-baked movement eqn (e.g. a reshape traced before a
                # channel reduction): poison its outputs; replacements read
                # the pre-alias tensor, so poison is only fatal if a real
                # compute eqn consumes it (raised above)
                if not movement:
                    raise
                outs = [_POISON] * len(eqn.outvars)
        for ov, o in zip(eqn.outvars, outs):
            env[id(ov)] = o

    outs = [read(v) for v in jaxpr.outvars]
    if any(o is _POISON for o in outs):
        raise RuntimeError("model output shape was invalidated by an op "
                           "replacement")
    if out_tree is not None:
        return jtu.tree_unflatten(out_tree, outs)
    return outs[0] if len(outs) == 1 else tuple(outs)
