"""SmoothQuant-style activation-outlier smoothing (beyond-reference).

The reference's DFQ/CLE (cross_layer_equalization.py) equalizes WEIGHT
ranges between consecutive layers; it has no answer for per-channel
ACTIVATION outliers — the failure mode that breaks W8A8 LLM quantization
(post-norm hidden states carry 10-100x channel-range spread, so a
per-tensor activation grid wastes almost all of its codes on a few
channels). SmoothQuant (Xiao et al., 2022, arXiv:2211.10438) migrates
that difficulty into the weights with a per-input-channel scale

    s_j = amax_act_j**alpha / amax_w_j**(1 - alpha)

applied as ``x' = x / s`` and ``W'[j, :] = s_j * W[j, :]``. Here the
division is *folded into the producing op's parameters* (RMSNorm/LayerNorm
elementwise gamma — the standard LLM placement — or a preceding
linear/conv's output channels), so the whole transform is a pure param
rewrite: mathematically exact in float (like CLE), and a strict win for
per-tensor activation quantizers.

TPU-native shape: graph-driven discovery over the jaxpr ConnectedGraph +
one vectorized calibration pass (per-channel amax reduced across batches);
no module wrapping, no graph surgery — the user's fn is untouched and the
smoothed params drop into ``QuantizationSimModel`` / ``lower_to_int``.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..graph.connected_graph import ConnectedGraph, Op
from ..utils.logger import AimetLogger
from ..utils.pytree import set_leaves

logger = AimetLogger.get_area_logger(AimetLogger.LogAreas.Quant)

# producer op types whose params can absorb the 1/s factor
_FOLDABLE_PRODUCERS = ("scale", "batchnorm", "linear")


@dataclasses.dataclass
class SmoothTarget:
    """One smoothing site: ``producer``'s output feeds only ``consumers``
    (linear layers contracting over their input's last axis)."""
    producer: Op
    consumers: List[Op]

    @property
    def act_product_name(self) -> str:
        return self.producer.output.name


def _linear_in_channels(op: Op) -> Optional[int]:
    """Input-channel count of a plain dense layer (kernel (C_in, C_out),
    contraction over the activation's last axis); None if not that shape."""
    k = op.param_products.get("kernel")
    if k is None or len(k.shape) != 2:
        return None
    return int(k.shape[0])


def _per_channel_param_paths(op: Op, channels: int) -> List[str]:
    """Param paths of ``op`` that broadcast per-channel over the last axis
    (shape (C,) or (..., 1, C))."""
    paths = []
    for prod in op.param_products.values():
        shp = tuple(prod.shape)
        if shp and shp[-1] == channels and int(np.prod(shp)) == channels:
            paths.append(prod.param_path)
    return paths


def find_smooth_targets(graph: ConnectedGraph) -> List[SmoothTarget]:
    """Discover smoothing sites: groups of dense layers sharing a producer
    whose params can exactly absorb the per-channel division.

    Rules (all must hold, otherwise the site is skipped):
      - every consumer of the producer's output is a 2-D ``linear``
        (e.g. RMSNorm feeding wq/wk/wv, or feeding w_gate/w_up);
      - the producer is a ``scale``/``batchnorm`` with per-channel params
        on the same channel count, or a ``linear`` (fold into its output
        channels + bias).
    """
    targets = []
    for op in graph.ops:
        if op.type not in _FOLDABLE_PRODUCERS:
            continue
        consumers = op.output.consumers
        if not consumers or op.output.is_model_output:
            continue
        cin = _linear_in_channels(consumers[0])
        if cin is None:
            continue
        if not all(c.type == "linear" and _linear_in_channels(c) == cin
                   for c in consumers):
            continue
        if op.type in ("scale", "batchnorm"):
            if not _per_channel_param_paths(op, cin):
                continue
        else:  # linear producer: its output channels are the smooth axis
            if _linear_in_channels(op) is None or \
                    int(op.param_products["kernel"].shape[1]) != cin:
                continue
        targets.append(SmoothTarget(op, list(consumers)))
    return targets


def compute_smoothing_scales(act_amax: jnp.ndarray, w_amax: jnp.ndarray,
                             alpha: float = 0.5) -> jnp.ndarray:
    """s_j = act_j^alpha / w_j^(1-alpha), guarded so dead channels and
    degenerate ranges stay at 1 (no-op)."""
    act = jnp.maximum(jnp.asarray(act_amax, jnp.float32), 0.0)
    w = jnp.maximum(jnp.asarray(w_amax, jnp.float32), 0.0)
    s = jnp.power(act, alpha) / jnp.power(jnp.maximum(w, 1e-12), 1.0 - alpha)
    s = jnp.nan_to_num(s, nan=1.0, posinf=1.0, neginf=1.0)
    return jnp.where((act <= 1e-12) | (w <= 1e-12) | (s <= 1e-12), 1.0, s)


def _collect_act_amax(sim, params, batches, product_names: Sequence[str]
                      ) -> Dict[str, jnp.ndarray]:
    """Per-channel (last axis) abs-max of each named product, reduced over
    all calibration batches."""
    amax: Dict[str, jnp.ndarray] = {}
    for batch in batches:
        args = batch if isinstance(batch, (tuple, list)) else (batch,)
        caps = sim.collect_activations(params, args, product_names,
                                       mode="fp")
        for name, val in caps.items():
            red = jnp.max(jnp.abs(val.astype(jnp.float32)),
                          axis=tuple(range(val.ndim - 1)))
            amax[name] = red if name not in amax else jnp.maximum(
                amax[name], red)
    return amax


def apply_smooth_quant(fn, example_args, params, batches: Iterable,
                       *, alpha: float = 0.5,
                       graph: Optional[ConnectedGraph] = None,
                       targets: Optional[List[SmoothTarget]] = None):
    """Smooth activation outliers into weights ahead of W8A8 quantization.

    Args:
      fn: the model function ``fn(params, *inputs)``.
      example_args: ``(params, *example_inputs)`` used for tracing.
      params: the float parameters to transform.
      batches: iterable of calibration inputs (a batch array, or a tuple of
        the fn's non-param args) — same convention as ``compute_encodings``.
      alpha: migration strength (0 = all difficulty stays in activations,
        1 = all moved to weights). 0.5 is the paper default.
      graph/targets: optional pre-built graph / site list.

    Returns:
      (new_params, info) where info maps each producer op name to the
      applied scale vector (for inspection/plots).
    """
    from ..quantsim.qsim import QuantizationSimModel

    graph = graph or ConnectedGraph(fn, example_args)
    if targets is None:
        targets = find_smooth_targets(graph)
    if not targets:
        logger.info("smooth_quant: no foldable sites found")
        return params, {}

    sim = QuantizationSimModel(fn, example_args)
    batches = list(batches)
    act_amax = _collect_act_amax(
        sim, params, batches, [t.act_product_name for t in targets])

    leaves_idx = graph._param_leaf_index
    from jax import tree_util as jtu
    leaves = list(jtu.tree_leaves(params))

    def get(path):
        return leaves[leaves_idx[path]]

    updates: Dict[str, jnp.ndarray] = {}

    def upd(path, val):
        updates[path] = val
        leaves[leaves_idx[path]] = val

    info: Dict[str, jnp.ndarray] = {}
    for t in targets:
        cin = _linear_in_channels(t.consumers[0])
        # weight amax per input channel, max-combined across the group
        w_amax = None
        for c in t.consumers:
            wa = jnp.max(jnp.abs(get(c.param_products["kernel"].param_path
                                     ).astype(jnp.float32)), axis=1)
            w_amax = wa if w_amax is None else jnp.maximum(w_amax, wa)
        s = compute_smoothing_scales(act_amax[t.act_product_name], w_amax,
                                     alpha)
        info[t.producer.name] = s

        # consumers: W'[j, :] = s_j * W[j, :]
        for c in t.consumers:
            kp = c.param_products["kernel"].param_path
            upd(kp, get(kp) * s[:, None].astype(get(kp).dtype))
        # producer: divide the per-channel params by s
        if t.producer.type in ("scale", "batchnorm"):
            for pp in _per_channel_param_paths(t.producer, cin):
                p = get(pp)
                upd(pp, (p.reshape(-1) / s).reshape(p.shape).astype(p.dtype))
        else:  # linear producer: scale output channels of kernel (+ bias)
            kp = t.producer.param_products["kernel"].param_path
            upd(kp, get(kp) / s[None, :].astype(get(kp).dtype))
            bp = t.producer.param_products.get("bias")
            if bp is not None:
                b = get(bp.param_path)
                upd(bp.param_path, (b / s).astype(b.dtype))
        logger.info("smooth_quant: %s -> %s (spread %.1fx -> %.1fx)",
                    t.producer.name,
                    [c.name for c in t.consumers],
                    float(jnp.max(act_amax[t.act_product_name])
                          / jnp.maximum(jnp.min(jnp.where(
                              act_amax[t.act_product_name] > 0,
                              act_amax[t.act_product_name], jnp.inf)),
                              1e-12)),
                    float(jnp.max(act_amax[t.act_product_name] / s)
                          / jnp.maximum(jnp.min(jnp.where(
                              act_amax[t.act_product_name] > 0,
                              act_amax[t.act_product_name] / s, jnp.inf)),
                              1e-12)))

    return set_leaves(params, updates), info
