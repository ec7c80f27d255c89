"""Pytree helpers for updating parameter leaves addressed by path string."""
from __future__ import annotations

from typing import Any, Dict

from jax import tree_util as jtu


def leaf_index_map(tree) -> Dict[str, int]:
    """Map keystr path -> index in tree_flatten order."""
    flat = jtu.tree_flatten_with_path(tree)[0]
    return {jtu.keystr(path): i for i, (path, _) in enumerate(flat)}


def get_leaf(tree, path: str):
    flat = jtu.tree_flatten_with_path(tree)[0]
    for p, leaf in flat:
        if jtu.keystr(p) == path:
            return leaf
    raise KeyError(path)


def set_leaves(tree, updates: Dict[str, Any]):
    """Return a copy of ``tree`` with the leaves at ``updates``' paths replaced."""
    leaves, treedef = jtu.tree_flatten(tree)
    index = leaf_index_map(tree)
    for path, val in updates.items():
        leaves[index[path]] = val
    return jtu.tree_unflatten(treedef, leaves)
