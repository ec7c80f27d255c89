"""BN re-estimation: recompute BN running statistics over calibration data.

Port of aimet_torch/bn_reestimation.py:132 — after QAT perturbs the weights,
the stored BN running mean/var no longer match the quantized network's
activation statistics; re-estimate them from data.  Graph-driven: capture
each batchnorm op's *input* activations and recompute per-channel
mean/variance, then rewrite the BN leaves.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax.numpy as jnp
from jax import tree_util as jtu

from ..graph.connected_graph import ConnectedGraph
from ..quantsim.qsim import QuantizationSimModel
from ..utils.pytree import set_leaves
from .bn_fold import _bn_role_paths


def reestimate_bn_stats(sim: QuantizationSimModel, params,
                        data_batches: Sequence, mode: str = "quantized"):
    """Returns params with updated BN running mean/var (per-channel stats of
    the BN inputs over ``data_batches``, run through the quantized model)."""
    graph = sim.graph
    bn_ops = graph.ops_of_type("batchnorm")
    if not bn_ops:
        return params
    prods = [op.inputs[0].name for op in bn_ops]

    sums: Dict[str, jnp.ndarray] = {}
    sqs: Dict[str, jnp.ndarray] = {}
    count = 0
    n_elems: Dict[str, int] = {}
    for batch in data_batches:
        args = batch if isinstance(batch, (tuple, list)) else (batch,)
        caps = sim.collect_activations(params, args, prods, mode=mode)
        for op in bn_ops:
            x = caps[op.inputs[0].name]
            axes = tuple(range(x.ndim - 1))  # feature-last convention
            sums[op.name] = sums.get(op.name, 0.0) + jnp.sum(x, axis=axes)
            sqs[op.name] = sqs.get(op.name, 0.0) + jnp.sum(x * x, axis=axes)
            n_elems[op.name] = n_elems.get(op.name, 0) + int(
                jnp.prod(jnp.asarray(x.shape[:-1])))
        count += 1
    if count == 0:
        raise RuntimeError("no data batches")

    updates = {}
    for op in bn_ops:
        roles = _bn_role_paths(op)
        if "mean" not in roles or "var" not in roles:
            continue
        n = n_elems[op.name]
        mean = sums[op.name] / n
        var = sqs[op.name] / n - mean ** 2
        updates[roles["mean"]] = mean.astype(jnp.float32)
        updates[roles["var"]] = jnp.maximum(var, 1e-12).astype(jnp.float32)
    return set_leaves(params, updates)
