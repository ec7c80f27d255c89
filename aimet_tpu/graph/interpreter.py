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

    for eqn in jaxpr.eqns:
        if id(eqn) in skip_eqns:
            if id(eqn) in emit_at:
                op, fn = emit_at[id(eqn)]
                # the op's first eqn's lhs is the ACTUAL input value — the
                # Product var may resolve through passthrough aliases
                # (e.g. a reshape before a dense) to an earlier tensor
                x_var = op.eqns[0].invars[0]
                x = (read(x_var) if isinstance(x_var, Literal)
                     or id(x_var) in env else read(op.inputs[0].var))
                env[id(op.output.var)] = fn(x)
            continue
        outs = _eval_eqn(eqn, [read(v) for v in eqn.invars])
        for ov, o in zip(eqn.outvars, outs):
            env[id(ov)] = o

    outs = [read(v) for v in jaxpr.outvars]
    if out_tree is not None:
        return jtu.tree_unflatten(out_tree, outs)
    return outs[0] if len(outs) == 1 else tuple(outs)
