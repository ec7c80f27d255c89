"""Sequential MSE (SeqMSE) — per-layer weight-encoding grid search.

Port of aimet_torch/v1/seq_mse.py:102-623: for each supported layer in
topological order, try ``num_candidates`` shrunken (min, max) candidates
``(i+1)/K * (w_min, w_max)``, pick the per-output-channel argmin of the
layer-output reconstruction loss (MSE or negative SQNR), freeze the chosen
encoding.  Inputs can come from the quantized-so-far model ('symqt',
default), the FP model ('symfp'), or mixed ('asym') — seq_mse.py:281-291.

TPU-native: the candidate sweep is one vmapped evaluation (K candidates x
all output channels in a single batched matmul/conv), not a Python loop
over candidates.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import tree_util as jtu

from ..quantization.affine import compute_encoding_from_min_max, reduce_min_max
from ..quantization.grads import quantize_dequantize
from ..quantsim.qsim import QuantizationSimModel
from .adaround import _layer_apply
from .bn_fold import _conv_axes


def apply_seq_mse(sim: QuantizationSimModel, params, data_batches: Sequence,
                  num_candidates: int = 20, loss_fn: str = "mse",
                  inp_symmetry: str = "symqt"):
    """Freeze per-layer weight encodings chosen by sequential MSE.

    Returns the list of optimized layer names; encodings are set+frozen on
    ``sim`` (apply_seq_mse -> optimize_module, seq_mse.py:107,467).
    """
    if not isinstance(data_batches, (list, tuple)):
        data_batches = list(data_batches)
    graph = sim.graph
    sim.compute_param_encodings(params)

    layers = [op for op in graph.ops
              if op.type in ("conv", "depthwise_conv", "linear")
              and "kernel" in op.param_products
              and op.param_products["kernel"].param_path in sim.quantizers]

    leaves = jtu.tree_leaves(params)
    optimized = []
    for op in layers:
        kpath = op.param_products["kernel"].param_path
        spec = sim.quantizers[kpath]
        w = leaves[graph._param_leaf_index[kpath]]
        bias = None
        if "bias" in op.param_products:
            bias = leaves[graph._param_leaf_index[
                op.param_products["bias"].param_path]]

        ch_axis = spec.channel_axis
        w_min, w_max = reduce_min_max(w, channel_axis=ch_axis)

        in_name = op.inputs[0].name
        xq_list, xfp_list = [], []
        for batch in data_batches:
            args = batch if isinstance(batch, (tuple, list)) else (batch,)
            if inp_symmetry in ("symqt", "asym"):
                xq_list.append(sim.collect_activations(
                    params, args, [in_name], mode="quantized")[in_name])
            if inp_symmetry in ("symfp", "asym"):
                xfp_list.append(sim.collect_activations(
                    params, args, [in_name], mode="fp")[in_name])
        if inp_symmetry == "symqt":
            x_q, x_fp = xq_list, xq_list
        elif inp_symmetry == "symfp":
            x_q, x_fp = xfp_list, xfp_list
        else:
            x_q, x_fp = xq_list, xfp_list

        _, _, out_feat_ax = _conv_axes(op)
        fracs = jnp.arange(1, num_candidates + 1, dtype=jnp.float32) / num_candidates

        # FP reference outputs don't depend on the candidate: compute once
        out_fps = [_layer_apply(op, xfp, w, bias) for xfp in x_fp]

        def candidate_loss(frac):
            cand_enc = compute_encoding_from_min_max(
                w_min * frac, w_max * frac, spec.bitwidth, spec.symmetric,
                spec.strict_symmetric, spec.unsigned_symmetric)
            if ch_axis is not None:
                shape = [1] * w.ndim
                shape[ch_axis] = -1
                emin = jnp.reshape(cand_enc.min, shape)
                emax = jnp.reshape(cand_enc.max, shape)
            else:
                emin, emax = cand_enc.min, cand_enc.max
            w_q = quantize_dequantize(
                w, emin, emax, bitwidth=spec.bitwidth, symmetric=spec.symmetric,
                strict_symmetric=spec.strict_symmetric,
                unsigned_symmetric=spec.unsigned_symmetric)
            total = 0.0
            for xq, out_fp in zip(x_q, out_fps):
                out_q = _layer_apply(op, xq, w_q, bias)
                axes = tuple(d for d in range(out_q.ndim) if d != out_feat_ax)
                if loss_fn == "mse":
                    total = total + jnp.mean((out_q - out_fp) ** 2, axis=axes)
                else:  # neg_sqnr (seq_mse.py:602)
                    noise = jnp.mean((out_q - out_fp) ** 2, axis=axes)
                    signal = jnp.mean(out_fp ** 2, axis=axes)
                    total = total - signal / (noise + 1e-10)
            return total  # (C,) per-output-channel loss

        losses = jax.jit(jax.vmap(candidate_loss))(fracs)  # (K, C)

        if ch_axis is not None:
            best = jnp.argmin(losses, axis=0)               # (C,)
            best_f = fracs[best]
        else:
            # per-tensor: output-channel losses summed (single choice)
            best = jnp.argmin(jnp.sum(losses, axis=1))
            best_f = fracs[best]
        enc = compute_encoding_from_min_max(
            w_min * best_f, w_max * best_f, spec.bitwidth, spec.symmetric,
            spec.strict_symmetric, spec.unsigned_symmetric)
        sim.set_encoding(kpath, enc, freeze=True)
        optimized.append(op.name)
    return optimized
