"""Device-mesh utilities and sharding rules.

The reference has no model-parallel runtime (SURVEY §2.5); this layer is the
TPU-native design: a (dp, tp) Mesh with NamedSharding annotations, letting
XLA insert ICI collectives.  Tensor-parallel rules follow the standard
megatron layout: column-parallel for qkv/gate/up kernels (shard output dim),
row-parallel for o/down kernels (shard input dim), embedding sharded on
vocab; everything else (norms, biases, encodings) replicated.
"""
from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax import tree_util as jtu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = dp * tp
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


# (path-regex, PartitionSpec) rules, first match wins
TRANSFORMER_RULES = [
    (r"embed.*embedding", P("tp", None)),         # vocab-sharded embedding
    (r"(wq|wk|wv|w_gate|w_up).*kernel", P(None, "tp")),   # column parallel
    (r"(wo|w_down).*kernel", P("tp", None)),              # row parallel
    (r"lm_head.*kernel", P(None, "tp")),
    (r".*", P()),                                          # replicate
]


def spec_for_path(path: str, rules=TRANSFORMER_RULES) -> P:
    for pat, spec in rules:
        if re.search(pat, path):
            return spec
    return P()


def shard_params(params, mesh: Mesh, rules=TRANSFORMER_RULES):
    """NamedSharding for every leaf by path rule (dims that don't divide the
    mesh axis fall back to replicated)."""
    def leaf_sharding(path, leaf):
        spec = spec_for_path(jtu.keystr(path), rules)
        # sanity: only keep axis spec if divisible
        parts = []
        for ax, s in enumerate(spec):
            if s is None:
                parts.append(None)
                continue
            size = mesh.shape[s]
            if ax < leaf.ndim and leaf.shape[ax] % size == 0:
                parts.append(s)
            else:
                parts.append(None)
        parts += [None] * (getattr(leaf, "ndim", 0) - len(parts))
        return NamedSharding(mesh, P(*parts))

    return jtu.tree_map_with_path(leaf_sharding, params)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 2):
    return NamedSharding(mesh, P(*(("dp",) + (None,) * (ndim - 1))))
