"""Layer cost model (memory / MAC) and SVD cost functions.

Port of the reference's cost calculators
(aimet_common/cost_calculator.py:71-380): per-layer memory = #weights,
MAC = #weights * output spatial size; spatial-SVD layer (Noc,Nic,kh,kw) ->
(r,Nic,kh,1)+(Noc,r,1,kw); weight-SVD -> (r,Nic,kh,kw)+(Noc,r,1,1).
"""
from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Tuple

import numpy as np

from ..graph.connected_graph import ConnectedGraph, Op
from ..algorithms.bn_fold import _conv_axes


@dataclasses.dataclass
class Cost:
    memory: float
    mac: float

    def __add__(self, other):
        return Cost(self.memory + other.memory, self.mac + other.mac)

    def __sub__(self, other):
        return Cost(self.memory - other.memory, self.mac - other.mac)


def _kernel_shape(op: Op):
    """Kernel shape; for re-traced compressed graphs the kernel may be a
    closure constant instead of a param product — read the conv/dot eqn's
    rhs aval then."""
    if "kernel" in op.param_products:
        return op.param_products["kernel"].shape
    return tuple(op.eqns[0].invars[1].aval.shape)


def _conv_dims(op: Op):
    """Returns (kh, kw, n_in, n_out, out_h, out_w) in layout-agnostic form."""
    dn = op.attrs["dimension_numbers"]
    kshape = _kernel_shape(op)
    out_shape = op.output.shape
    n_out = kshape[dn.rhs_spec[0]]
    n_in = kshape[dn.rhs_spec[1]]
    spatial = [kshape[i] for i in dn.rhs_spec[2:]]
    kh, kw = (spatial + [1, 1])[:2]
    out_spatial = [out_shape[i] for i in dn.out_spec[2:]]
    oh, ow = (out_spatial + [1, 1])[:2]
    return kh, kw, n_in, n_out, oh, ow


def layer_cost(op: Op) -> Cost:
    if op.type in ("conv", "depthwise_conv"):
        kh, kw, n_in, n_out, oh, ow = _conv_dims(op)
        mem = kh * kw * n_in * n_out
        return Cost(mem, mem * oh * ow)
    if op.type == "linear":
        mem = int(np.prod(_kernel_shape(op)))
        return Cost(mem, mem)
    return Cost(0, 0)


def spatial_svd_cost(op: Op, rank: int) -> Cost:
    kh, kw, n_in, n_out, oh, ow = _conv_dims(op)
    mem = n_in * rank * kh + rank * n_out * kw
    # first conv output spatial: (oh, full width); approximate with oh*ow both
    mac = n_in * rank * kh * oh * ow + rank * n_out * kw * oh * ow
    return Cost(mem, mac)


def weight_svd_cost(op: Op, rank: int) -> Cost:
    if op.type == "linear":
        n_in, n_out = op.param_products["kernel"].shape
        mem = n_in * rank + rank * n_out
        return Cost(mem, mem)
    kh, kw, n_in, n_out, oh, ow = _conv_dims(op)
    mem = kh * kw * n_in * rank + rank * n_out
    mac = kh * kw * n_in * rank * oh * ow + rank * n_out * oh * ow
    return Cost(mem, mac)


def successive_svd_cost(op: Op, rank_r: int, rank_s: int) -> Cost:
    """TYPE_SUCCESSIVE (SvdAlgorithm.cpp:102-106):
    (I*s) + (s*r*kh*kw) + (r*O), each times the output spatial size."""
    kh, kw, n_in, n_out, oh, ow = _conv_dims(op)
    mem = n_in * rank_s + rank_s * rank_r * kh * kw + rank_r * n_out
    return Cost(mem, mem * oh * ow)


def ranks_for_comp_ratio_ssvd(op: Op, comp_ratio: float) -> Tuple[int, int]:
    """(r, s) pair for successive SVD at the target MAC ratio: the rank
    pool enumerates valid pairs (SvdAlgorithm.cpp:221-240); pick the pair
    with the largest retained-capacity proxy r*s under the budget."""
    kh, kw, n_in, n_out, _, _ = _conv_dims(op)
    budget = comp_ratio * layer_cost(op).mac
    best, best_score = (1, 1), -1
    for r in range(1, n_out + 1):
        max_s = min(n_in, r * kh * kw)
        # largest s under budget for this r (cost is monotone in s)
        lo, hi = 1, max_s
        if successive_svd_cost(op, r, 1).mac > budget:
            continue
        while lo < hi:
            mid = (lo + hi + 1) // 2
            if successive_svd_cost(op, r, mid).mac <= budget:
                lo = mid
            else:
                hi = mid - 1
        score = r * lo
        if score > best_score:
            best, best_score = (r, lo), score
    return best


def max_spatial_svd_rank(op: Op) -> int:
    """min(Nic*kh, Noc*kw) (cost_calculator.py:290-326)."""
    kh, kw, n_in, n_out, _, _ = _conv_dims(op)
    return min(n_in * kh, n_out * kw)


def max_weight_svd_rank(op: Op) -> int:
    if op.type == "linear":
        n_in, n_out = op.param_products["kernel"].shape
        return min(n_in, n_out)
    kh, kw, n_in, n_out, _, _ = _conv_dims(op)
    return min(n_in * kh * kw, n_out)


def rank_for_comp_ratio(op: Op, comp_ratio: float, mode: str = "spatial_svd",
                        rounding_multiplicity: int = 1) -> int:
    """Largest rank whose cost <= comp_ratio * original cost
    (comp_ratio_rounder.py:62-120 semantics, cost-metric = MAC)."""
    orig = layer_cost(op).mac
    max_rank = (max_spatial_svd_rank(op) if mode == "spatial_svd"
                else max_weight_svd_rank(op))
    cost_fn = spatial_svd_cost if mode == "spatial_svd" else weight_svd_cost
    best = 1
    for r in range(1, max_rank + 1):
        if cost_fn(op, r).mac <= comp_ratio * orig:
            best = r
        else:
            break
    best = max(1, (best // rounding_multiplicity) * rounding_multiplicity)
    return best


def model_cost(graph: ConnectedGraph) -> Cost:
    total = Cost(0, 0)
    for op in graph.ops:
        total = total + layer_cost(op)
    return total
