"""Torch-model importer: torch.fx graph -> pure JAX function + param pytree.

The reference is a *torch* toolkit — its users arrive holding ``nn.Module``s.
This module lets them bring those models straight into the TPU-native
quantsim: ``fn, params = from_torch(model)`` yields exactly the
``fn(params, *inputs)`` interface that :class:`QuantizationSimModel`
consumes.

Design: like the reference's model preparer
(aimet_torch/model_preparer.py:125-262, 445), we symbolically trace with
``torch.fx``; but instead of rewriting the torch module tree we *interpret*
the fx graph with jax.numpy, so the result is a jit-traceable pure function
(weights live in an explicit pytree, torch is only needed at import time).
Layout is kept NCHW/OIHW bit-faithful to torch — XLA re-layouts for the MXU
at compile time, so no transposition pass is needed.

Coverage: the module/function/method vocabulary of the reference's test-model
zoo (TrainingExtensions/torch/test/python/models/test_models.py,
mnist_torch_model.py, mobilenet.py): Conv1d/2d (grouped, dilated, transposed),
Linear, BatchNorm, LayerNorm/GroupNorm, Embedding, pooling (max/avg/adaptive),
the standard activation zoo, residual adds, cat/chunk/view/permute/flatten,
and attention-style matmul/softmax chains.
"""
from __future__ import annotations

import math
import operator
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["from_torch"]


def _pair(v):
    if isinstance(v, (tuple, list)):
        return tuple(int(x) for x in v)
    return (int(v), int(v))


def _to_jnp(t, dtype):
    a = np.asarray(t.detach().cpu().numpy())
    if np.issubdtype(a.dtype, np.floating):
        a = a.astype(dtype)
    return jnp.asarray(a)


# ---------------------------------------------------------------------------
# Functional building blocks (jax side)
# ---------------------------------------------------------------------------

def _conv_nd(x, w, b, stride, padding, dilation, groups, transposed=False,
             output_padding=(0, 0)):
    """torch Conv1d/2d semantics on NC(H)W / OI(H)W arrays."""
    spatial = x.ndim - 2
    stride = stride[:spatial]
    padding = padding[:spatial]
    dilation = dilation[:spatial]
    pads = [(p, p) for p in padding]
    if spatial == 1:
        dn = ("NCH", "OIH", "NCH")
    else:
        dn = ("NCHW", "OIHW", "NCHW")
    if transposed:
        # torch ConvTranspose weight is (I, O/groups, *k); gradient-style conv
        pads = [(d * (k - 1) - p, d * (k - 1) - p + op)
                for p, d, k, op in zip(padding, dilation,
                                       w.shape[2:], output_padding)]
        if groups != 1:
            # (I, O/g, *k) -> per-group flip/swap -> (O, I/g, *k)
            ig, og = w.shape[0] // groups, w.shape[1]
            wg = w.reshape((groups, ig) + w.shape[1:])
            wg = jnp.swapaxes(wg, 1, 2)          # (g, O/g, I/g, *k)
            w = wg.reshape((groups * og, ig) + w.shape[2:])
        else:
            w = jnp.swapaxes(w, 0, 1)
        w = jnp.flip(w, axis=tuple(range(2, w.ndim)))
        out = jax.lax.conv_general_dilated(
            x, w, window_strides=(1,) * spatial, padding=pads,
            lhs_dilation=stride, rhs_dilation=dilation,
            dimension_numbers=dn, feature_group_count=groups)
    else:
        out = jax.lax.conv_general_dilated(
            x, w, window_strides=stride, padding=pads,
            rhs_dilation=dilation, dimension_numbers=dn,
            feature_group_count=groups)
    if b is not None:
        out = out + b.reshape((1, -1) + (1,) * spatial)
    return out


def _linear(x, w, b):
    out = x @ w.T
    if b is not None:
        out = out + b
    return out


def _batch_norm(x, mean, var, weight, bias, eps):
    shape = (1, -1) + (1,) * (x.ndim - 2)
    inv = jax.lax.rsqrt(var + eps).reshape(shape)
    out = (x - mean.reshape(shape)) * inv
    if weight is not None:
        out = out * weight.reshape(shape)
    if bias is not None:
        out = out + bias.reshape(shape)
    return out


def _layer_norm(x, normalized_shape, weight, bias, eps):
    axes = tuple(range(x.ndim - len(normalized_shape), x.ndim))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    out = (x - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        out = out * weight
    if bias is not None:
        out = out + bias
    return out


def _group_norm(x, num_groups, weight, bias, eps):
    n, c = x.shape[:2]
    xg = x.reshape((n, num_groups, c // num_groups) + x.shape[2:])
    axes = tuple(range(2, xg.ndim))
    mean = jnp.mean(xg, axis=axes, keepdims=True)
    var = jnp.var(xg, axis=axes, keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    out = xg.reshape(x.shape)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    if weight is not None:
        out = out * weight.reshape(shape)
    if bias is not None:
        out = out + bias.reshape(shape)
    return out


def _max_pool2d(x, kernel, stride=None, padding=(0, 0), dilation=(1, 1),
                ceil_mode=False):
    kernel, padding, dilation = _pair(kernel), _pair(padding), _pair(dilation)
    stride = kernel if stride is None or stride == () else _pair(stride)
    if ceil_mode:
        pads = []
        for i, (s, k, p, d) in enumerate(
                zip(stride, kernel, padding, dilation)):
            size = x.shape[2 + i]
            eff_k = d * (k - 1) + 1
            out = -(-(size + 2 * p - eff_k) // s) + 1
            need = (out - 1) * s + eff_k - size - p
            pads.append((p, max(p, need)))
    else:
        pads = [(p, p) for p in padding]
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 1) + kernel,
        window_strides=(1, 1) + stride,
        padding=[(0, 0), (0, 0)] + pads,
        window_dilation=(1, 1) + dilation)


def _avg_pool2d(x, kernel, stride=None, padding=(0, 0),
                count_include_pad=True, ceil_mode=False):
    kernel, padding = _pair(kernel), _pair(padding)
    stride = kernel if stride is None or stride == () else _pair(stride)
    pads = [(0, 0), (0, 0)] + [(p, p) for p in padding]
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, window_dimensions=(1, 1) + kernel,
        window_strides=(1, 1) + stride, padding=pads)
    if count_include_pad or padding == (0, 0):
        return summed / float(np.prod(kernel))
    ones = jnp.ones(x.shape[2:], x.dtype)[None, None]
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, window_dimensions=(1, 1) + kernel,
        window_strides=(1, 1) + stride, padding=pads)
    return summed / counts


def _adaptive_avg_pool2d(x, output_size):
    oh, ow = _pair(output_size)
    h, w = x.shape[2], x.shape[3]
    if (h % oh) or (w % ow):
        raise NotImplementedError(
            "adaptive_avg_pool2d with non-divisible output size")
    xr = x.reshape(x.shape[:2] + (oh, h // oh, ow, w // ow))
    return jnp.mean(xr, axis=(3, 5))


def _softmax(x, dim=-1):
    return jax.nn.softmax(x, axis=dim)


_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "relu6": lambda x: jnp.clip(x, 0.0, 6.0),
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "silu": jax.nn.silu,
    "gelu": jax.nn.gelu,
    "hardswish": jax.nn.hard_swish,
    "hardsigmoid": lambda x: jnp.clip(x / 6.0 + 0.5, 0.0, 1.0),
    "hardtanh": lambda x, mn=-1.0, mx=1.0: jnp.clip(x, mn, mx),
    "elu": jax.nn.elu,
    "leaky_relu": lambda x, s=0.01: jax.nn.leaky_relu(x, s),
    "softplus": jax.nn.softplus,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "log_softmax": lambda x, dim=-1: jax.nn.log_softmax(x, axis=dim),
}


# ---------------------------------------------------------------------------
# fx interpretation
# ---------------------------------------------------------------------------

def _normalize_dims(args):
    """torch permute/mean accept either a tuple or splatted ints."""
    if len(args) == 1 and isinstance(args[0], (tuple, list)):
        return tuple(args[0])
    return tuple(args)


class _TorchGraphFunction:
    """Replays a traced torch.fx graph with jax.numpy.

    Instances are callables ``fn(params, *inputs)`` suitable for
    :class:`QuantizationSimModel` / ``jax.jit``.
    """

    def __init__(self, graph_module, dtype):
        import torch

        self._torch = torch
        self.gm = graph_module
        self.dtype = dtype
        self.params: Dict[str, Any] = {}
        self._module_meta: Dict[str, Tuple[str, dict]] = {}
        self._collect_modules()

    def module_call_sequence(self):
        """``[(qualified_name, kind, meta)]`` for every call_module node in
        fx graph (= execution) order.  Used by interop.encodings_io to align
        torch module paths with ConnectedGraph ops — the TPU-native analogue
        of the reference's CustomMarker torch-name<->onnx-node recovery
        (onnx_utils.py:288-313)."""
        seq = []
        for node in self.gm.graph.nodes:
            if node.op == "call_module":
                kind, meta = self._module_meta[node.target]
                seq.append((node.target, kind, meta))
        return seq

    # -- import-time ------------------------------------------------------
    def _collect_modules(self):
        import torch.nn as nn

        for node in self.gm.graph.nodes:
            if node.op == "call_module":
                mod = self.gm.get_submodule(node.target)
                self._module_meta[node.target] = self._lower_module(
                    node.target, mod)
            elif node.op == "get_attr":
                t = self.gm
                for part in node.target.split("."):
                    t = getattr(t, part)
                self.params[node.target] = _to_jnp(t, self.dtype)

    def _lower_module(self, name, m):
        import torch.nn as nn

        def grab(*attrs):
            entry = {}
            for a in attrs:
                t = getattr(m, a, None)
                if t is not None:
                    entry[a] = _to_jnp(t, self.dtype)
            if entry:
                self.params[name] = entry
            return entry

        if isinstance(m, (nn.Conv1d, nn.Conv2d, nn.ConvTranspose1d,
                          nn.ConvTranspose2d)):
            grab("weight", "bias")
            return ("conv", dict(
                stride=_pair(m.stride), padding=_pair(m.padding),
                dilation=_pair(m.dilation), groups=m.groups,
                transposed=isinstance(m, (nn.ConvTranspose1d,
                                          nn.ConvTranspose2d)),
                output_padding=_pair(getattr(m, "output_padding", 0))))
        if isinstance(m, nn.Linear):
            grab("weight", "bias")
            return ("linear", {})
        if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d, nn.BatchNorm3d)):
            grab("weight", "bias", "running_mean", "running_var")
            return ("batch_norm", dict(eps=m.eps))
        if isinstance(m, nn.LayerNorm):
            grab("weight", "bias")
            return ("layer_norm", dict(
                normalized_shape=tuple(m.normalized_shape), eps=m.eps))
        if isinstance(m, nn.GroupNorm):
            grab("weight", "bias")
            return ("group_norm", dict(num_groups=m.num_groups, eps=m.eps))
        if isinstance(m, nn.Embedding):
            grab("weight")
            return ("embedding", {})
        if isinstance(m, nn.MaxPool2d):
            return ("max_pool2d", dict(
                kernel=m.kernel_size, stride=m.stride, padding=m.padding,
                dilation=m.dilation, ceil_mode=m.ceil_mode))
        if isinstance(m, nn.AvgPool2d):
            return ("avg_pool2d", dict(
                kernel=m.kernel_size, stride=m.stride, padding=m.padding,
                count_include_pad=m.count_include_pad,
                ceil_mode=m.ceil_mode))
        if isinstance(m, nn.AdaptiveAvgPool2d):
            return ("adaptive_avg_pool2d", dict(output_size=m.output_size))
        if isinstance(m, nn.Flatten):
            return ("flatten", dict(start=m.start_dim, end=m.end_dim))
        if isinstance(m, (nn.Dropout, nn.Dropout2d, nn.Identity)):
            return ("identity", {})
        if isinstance(m, (nn.LSTM, nn.GRU)):
            # the fork's flagship model family (qc_quantize_recurrent.py:122,
            # lib_changes/aimet_torch/quantsim.py:88-89 enables LSTM/GRU):
            # land torch RNNs on our scan-based cells
            # (quantsim/recurrent.py lstm_step/gru_step layout)
            if getattr(m, "proj_size", 0):
                raise NotImplementedError(
                    f"from_torch: LSTM proj_size at '{name}'")
            mode = "lstm" if isinstance(m, nn.LSTM) else "gru"
            entry = {}
            for layer in range(m.num_layers):
                for rev in ([False, True] if m.bidirectional else [False]):
                    sfx = f"l{layer}" + ("_reverse" if rev else "")
                    wih = getattr(m, f"weight_ih_{sfx}")
                    whh = getattr(m, f"weight_hh_{sfx}")
                    sub = {"kernel": _to_jnp(wih.t().contiguous(),
                                             self.dtype),
                           "recurrent_kernel": _to_jnp(
                               whh.t().contiguous(), self.dtype)}
                    if m.bias:
                        bih = _to_jnp(getattr(m, f"bias_ih_{sfx}"),
                                      self.dtype)
                        bhh = _to_jnp(getattr(m, f"bias_hh_{sfx}"),
                                      self.dtype)
                        if mode == "lstm":
                            # both biases add into the same gate preact
                            sub["bias"] = bih + bhh
                        else:
                            # GRU: b_hh sits inside the reset-gated term
                            sub["bias"] = bih
                            sub["recurrent_bias"] = bhh
                    entry[sfx] = sub
            self.params[name] = entry
            return (mode, dict(num_layers=m.num_layers,
                               bidirectional=m.bidirectional,
                               batch_first=m.batch_first,
                               hidden_size=m.hidden_size))
        if isinstance(m, nn.Softmax):
            return ("softmax", dict(dim=m.dim))
        if isinstance(m, nn.PReLU):
            grab("weight")
            return ("prelu", {})
        # activation modules map by lowercased class name
        key = type(m).__name__.lower()
        if key in ("leakyrelu",):
            return ("act", dict(name="leaky_relu",
                                kwargs=dict(s=m.negative_slope)))
        if key in ("hardtanh",):
            return ("act", dict(name="hardtanh",
                                kwargs=dict(mn=m.min_val, mx=m.max_val)))
        if key in ("logsoftmax",):
            return ("act", dict(name="log_softmax", kwargs=dict(dim=m.dim)))
        if key in ("gelu",):
            approx = getattr(m, "approximate", "none") == "tanh"
            return ("act", dict(name="gelu",
                                kwargs=dict(approximate=approx)))
        if key in _ACTIVATIONS:
            return ("act", dict(name=key, kwargs={}))
        raise NotImplementedError(
            f"from_torch: unsupported module {type(m).__name__} at '{name}'")

    # -- run-time ---------------------------------------------------------
    def _run_module(self, target, params, args, kwargs):
        kind, meta = self._module_meta[target]
        p = params.get(target, {})
        x = args[0]
        if kind == "conv":
            return _conv_nd(x, p["weight"], p.get("bias"), **meta)
        if kind == "linear":
            return _linear(x, p["weight"], p.get("bias"))
        if kind == "batch_norm":
            return _batch_norm(x, p["running_mean"], p["running_var"],
                               p.get("weight"), p.get("bias"), meta["eps"])
        if kind == "layer_norm":
            return _layer_norm(x, meta["normalized_shape"], p.get("weight"),
                               p.get("bias"), meta["eps"])
        if kind == "group_norm":
            return _group_norm(x, meta["num_groups"], p.get("weight"),
                               p.get("bias"), meta["eps"])
        if kind == "embedding":
            return jnp.take(p["weight"], x, axis=0)
        if kind == "max_pool2d":
            return _max_pool2d(x, meta["kernel"], meta["stride"],
                               meta["padding"], meta["dilation"],
                               meta["ceil_mode"])
        if kind == "avg_pool2d":
            return _avg_pool2d(x, meta["kernel"], meta["stride"],
                               meta["padding"], meta["count_include_pad"],
                               meta["ceil_mode"])
        if kind == "adaptive_avg_pool2d":
            return _adaptive_avg_pool2d(x, meta["output_size"])
        if kind == "flatten":
            return self._flatten(x, meta["start"], meta["end"])
        if kind == "identity":
            return x
        if kind == "softmax":
            return _softmax(x, meta["dim"])
        if kind == "prelu":
            w = p["weight"].reshape((1, -1) + (1,) * (x.ndim - 2)) \
                if x.ndim > 1 and p["weight"].size > 1 else p["weight"]
            return jnp.where(x >= 0, x, w * x)
        if kind == "act":
            name = meta["name"]
            if name == "gelu":
                return jax.nn.gelu(x, approximate=meta["kwargs"]["approximate"])
            return _ACTIVATIONS[name](x, **meta["kwargs"])
        if kind in ("lstm", "gru"):
            return self._run_rnn(kind, meta, p, args)
        raise AssertionError(kind)

    @staticmethod
    def _run_rnn(kind, meta, p, args):
        """torch nn.LSTM/nn.GRU semantics on the scan-based cells
        (quantsim/recurrent.py): per layer (and direction) one
        ``lax.scan`` over time; returns (output, h_n) / (output,
        (h_n, c_n)) exactly like torch."""
        from ..quantsim.recurrent import gru_step, lstm_step

        x = args[0]
        if meta["batch_first"]:
            x = jnp.swapaxes(x, 0, 1)               # (T, B, I)
        T, B, _ = x.shape
        H = meta["hidden_size"]
        dirs = 2 if meta["bidirectional"] else 1
        n_state = meta["num_layers"] * dirs

        if len(args) > 1 and args[1] is not None:
            if kind == "lstm":
                h0, c0 = args[1]
            else:
                h0, c0 = args[1], None
        else:
            h0 = jnp.zeros((n_state, B, H), x.dtype)
            c0 = jnp.zeros((n_state, B, H), x.dtype) \
                if kind == "lstm" else None

        def run_dir(sub, xseq, h, c):
            if kind == "lstm":
                def step(carry, x_t):
                    hh, cc = carry
                    hh, cc = lstm_step(sub, x_t, hh, cc)
                    return (hh, cc), hh
                (hT, cT), ys = jax.lax.scan(step, (h, c), xseq)
                return ys, hT, cT
            def step(hh, x_t):
                hh = gru_step(sub, x_t, hh)
                return hh, hh
            hT, ys = jax.lax.scan(step, h, xseq)
            return ys, hT, None

        hs, cs = [], []
        for layer in range(meta["num_layers"]):
            outs = []
            for d, rev in enumerate([False, True][:dirs]):
                sfx = f"l{layer}" + ("_reverse" if rev else "")
                idx = layer * dirs + d
                xseq = x[::-1] if rev else x
                ys, hT, cT = run_dir(p[sfx], xseq, h0[idx],
                                     None if c0 is None else c0[idx])
                outs.append(ys[::-1] if rev else ys)
                hs.append(hT)
                cs.append(cT)
            x = outs[0] if dirs == 1 else jnp.concatenate(outs, axis=-1)
        y = jnp.swapaxes(x, 0, 1) if meta["batch_first"] else x
        h_n = jnp.stack(hs)
        if kind == "lstm":
            return y, (h_n, jnp.stack(cs))
        return y, h_n

    @staticmethod
    def _flatten(x, start=0, end=-1):
        nd = x.ndim
        start = start % nd
        end = end % nd
        new_shape = (x.shape[:start] + (-1,) + x.shape[end + 1:]) \
            if end >= start else x.shape
        return jnp.reshape(x, new_shape)

    def _run_function(self, target, args, kwargs):
        torch = self._torch
        F = torch.nn.functional
        tname = getattr(target, "__name__", str(target))

        if target in (operator.add, torch.add):
            return args[0] + args[1]
        if target in (operator.sub, torch.sub):
            return args[0] - args[1]
        if target in (operator.mul, torch.mul):
            return args[0] * args[1]
        if target in (operator.truediv, torch.div):
            return args[0] / args[1]
        if target in (operator.matmul, torch.matmul, torch.bmm, torch.mm):
            return args[0] @ args[1]
        if target is operator.floordiv:
            return args[0] // args[1]
        if target is operator.mod:
            return args[0] % args[1]
        if target is operator.neg:
            return -args[0]
        if target in (operator.pow, torch.pow):
            return args[0] ** args[1]
        if target is operator.getitem:
            return args[0][args[1]]
        if target is getattr:
            if args[1] == "shape":
                return tuple(args[0].shape)
            if args[1] in ("dtype", "device"):
                return getattr(args[0], args[1], None)
            raise NotImplementedError(f"getattr({args[1]!r})")
        if target in (torch.cat, torch.concat):
            dim = kwargs.get("dim", args[1] if len(args) > 1 else 0)
            return jnp.concatenate(args[0], axis=dim)
        if target is torch.stack:
            dim = kwargs.get("dim", args[1] if len(args) > 1 else 0)
            return jnp.stack(args[0], axis=dim)
        if target is torch.flatten:
            return self._flatten(args[0], *(list(args[1:]) or [0]))
        if target is torch.chunk:
            dim = kwargs.get("dim", args[2] if len(args) > 2 else 0)
            return tuple(jnp.array_split(args[0], args[1], axis=dim))
        if target in (torch.transpose,):
            return jnp.swapaxes(args[0], args[1], args[2])
        if target is torch.permute:
            return jnp.transpose(args[0], _normalize_dims(args[1:]))
        if target in (torch.mean,):
            return jnp.mean(args[0],
                            axis=kwargs.get("dim",
                                            args[1] if len(args) > 1 else None),
                            keepdims=kwargs.get("keepdim", False))
        if target in (torch.sum,):
            return jnp.sum(args[0],
                           axis=kwargs.get("dim",
                                           args[1] if len(args) > 1 else None),
                           keepdims=kwargs.get("keepdim", False))
        if target is torch.clamp:
            lo = kwargs.get("min", args[1] if len(args) > 1 else None)
            hi = kwargs.get("max", args[2] if len(args) > 2 else None)
            return jnp.clip(args[0], lo, hi)
        if target is F.hardtanh:
            lo = kwargs.get("min_val", args[1] if len(args) > 1 else -1.0)
            hi = kwargs.get("max_val", args[2] if len(args) > 2 else 1.0)
            return jnp.clip(args[0], lo, hi)
        if target in (torch.sqrt,):
            return jnp.sqrt(args[0])
        if target in (torch.rsqrt,):
            return jax.lax.rsqrt(args[0])
        if target in (torch.exp,):
            return jnp.exp(args[0])
        if target in (torch.log,):
            return jnp.log(args[0])
        if target in (torch.abs,):
            return jnp.abs(args[0])
        if target in (torch.sin,):
            return jnp.sin(args[0])
        if target in (torch.cos,):
            return jnp.cos(args[0])
        if target in (torch.sigmoid, F.sigmoid):
            return jax.nn.sigmoid(args[0])
        if target in (torch.tanh, F.tanh):
            return jnp.tanh(args[0])
        if target in (torch.softmax, F.softmax):
            return _softmax(args[0], kwargs.get("dim",
                                                args[1] if len(args) > 1
                                                else -1))
        if target is F.log_softmax:
            return jax.nn.log_softmax(
                args[0], axis=kwargs.get("dim",
                                         args[1] if len(args) > 1 else -1))
        if target in (torch.relu, F.relu):
            return jax.nn.relu(args[0])
        if target is F.relu6:
            return jnp.clip(args[0], 0.0, 6.0)
        if target is F.silu:
            return jax.nn.silu(args[0])
        if target is F.gelu:
            approx = kwargs.get("approximate", "none") == "tanh"
            return jax.nn.gelu(args[0], approximate=approx)
        if target is F.hardswish:
            return jax.nn.hard_swish(args[0])
        if target is F.hardsigmoid:
            return jnp.clip(args[0] / 6.0 + 0.5, 0.0, 1.0)
        if target is F.elu:
            return jax.nn.elu(args[0])
        if target is F.leaky_relu:
            return jax.nn.leaky_relu(
                args[0], kwargs.get("negative_slope",
                                    args[1] if len(args) > 1 else 0.01))
        if target is F.mish:
            return _ACTIVATIONS["mish"](args[0])
        if target is F.softplus:
            return jax.nn.softplus(args[0])
        if target is F.dropout:
            return args[0]
        if target is F.linear:
            return _linear(args[0], args[1],
                           args[2] if len(args) > 2 else kwargs.get("bias"))
        if target is F.conv2d:
            w = args[1]
            b = args[2] if len(args) > 2 else kwargs.get("bias")
            return _conv_nd(args[0], w, b,
                            _pair(kwargs.get("stride", 1)),
                            _pair(kwargs.get("padding", 0)),
                            _pair(kwargs.get("dilation", 1)),
                            kwargs.get("groups", 1))
        if target is F.max_pool2d:
            return _max_pool2d(args[0], args[1] if len(args) > 1
                               else kwargs["kernel_size"],
                               kwargs.get("stride",
                                          args[2] if len(args) > 2 else None),
                               _pair(kwargs.get("padding", 0)),
                               _pair(kwargs.get("dilation", 1)),
                               kwargs.get("ceil_mode", False))
        if target is F.avg_pool2d:
            return _avg_pool2d(args[0], args[1] if len(args) > 1
                               else kwargs["kernel_size"],
                               kwargs.get("stride",
                                          args[2] if len(args) > 2 else None),
                               _pair(kwargs.get("padding", 0)),
                               kwargs.get("count_include_pad", True),
                               kwargs.get("ceil_mode", False))
        if target is F.adaptive_avg_pool2d:
            return _adaptive_avg_pool2d(args[0], args[1])
        if target is F.pad:
            pad, mode = args[1], kwargs.get("mode", "constant")
            value = kwargs.get("value", 0.0) or 0.0
            if mode != "constant":
                raise NotImplementedError(f"F.pad mode={mode}")
            x = args[0]
            cfg = [(0, 0)] * x.ndim
            for i in range(len(pad) // 2):
                cfg[x.ndim - 1 - i] = (pad[2 * i], pad[2 * i + 1])
            return jnp.pad(x, cfg, constant_values=value)
        if target is F.interpolate:
            x = args[0]
            scale = kwargs.get("scale_factor")
            mode = kwargs.get("mode", "nearest")
            if mode != "nearest" or scale is None:
                raise NotImplementedError("F.interpolate beyond nearest/scale")
            s = _pair(scale)
            return jnp.repeat(jnp.repeat(x, int(s[0]), axis=2),
                              int(s[1]), axis=3)
        raise NotImplementedError(f"from_torch: unsupported function {tname}")

    def _run_method(self, target, args, kwargs):
        x, rest = args[0], args[1:]
        if target in ("view", "reshape"):
            shape = rest[0] if (len(rest) == 1 and
                                isinstance(rest[0], (tuple, list))) else rest
            return jnp.reshape(x, tuple(shape))
        if target == "size":
            return x.shape[rest[0]] if rest else tuple(x.shape)
        if target == "permute":
            return jnp.transpose(x, _normalize_dims(rest))
        if target == "transpose":
            return jnp.swapaxes(x, rest[0], rest[1])
        if target == "t":
            return x.T
        if target == "flatten":
            return self._flatten(x, *(list(rest) or [0]))
        if target in ("contiguous", "detach", "clone", "cpu", "float", "to"):
            return x
        if target == "mean":
            return jnp.mean(x, axis=kwargs.get("dim",
                                               rest[0] if rest else None),
                            keepdims=kwargs.get("keepdim", False))
        if target == "sum":
            return jnp.sum(x, axis=kwargs.get("dim",
                                              rest[0] if rest else None),
                           keepdims=kwargs.get("keepdim", False))
        if target == "squeeze":
            return jnp.squeeze(x, axis=rest[0] if rest else None)
        if target == "unsqueeze":
            return jnp.expand_dims(x, rest[0])
        if target == "chunk":
            dim = kwargs.get("dim", rest[1] if len(rest) > 1 else 0)
            return tuple(jnp.array_split(x, rest[0], axis=dim))
        if target == "split":
            dim = kwargs.get("dim", rest[1] if len(rest) > 1 else 0)
            size = rest[0]
            n = x.shape[dim]
            idx = list(range(size, n, size))
            return tuple(jnp.split(x, idx, axis=dim))
        if target == "clamp":
            lo = kwargs.get("min", rest[0] if rest else None)
            hi = kwargs.get("max", rest[1] if len(rest) > 1 else None)
            return jnp.clip(x, lo, hi)
        if target == "expand":
            shape = rest[0] if (len(rest) == 1 and
                                isinstance(rest[0], (tuple, list))) else rest
            tgt = [x.shape[i] if s == -1 else s for i, s in enumerate(shape)]
            return jnp.broadcast_to(x, tuple(tgt))
        if target == "repeat":
            reps = rest[0] if (len(rest) == 1 and
                               isinstance(rest[0], (tuple, list))) else rest
            return jnp.tile(x, tuple(reps))
        if target == "pow":
            return x ** rest[0]
        if target == "matmul":
            return x @ rest[0]
        if target in ("add", "sub", "mul", "div"):
            ops = {"add": operator.add, "sub": operator.sub,
                   "mul": operator.mul, "div": operator.truediv}
            return ops[target](x, rest[0])
        if target == "softmax":
            return _softmax(x, kwargs.get("dim", rest[0] if rest else -1))
        if target == "sigmoid":
            return jax.nn.sigmoid(x)
        if target == "tanh":
            return jnp.tanh(x)
        if target == "relu":
            return jax.nn.relu(x)
        if target == "masked_fill":
            return jnp.where(rest[0], rest[1], x)
        raise NotImplementedError(f"from_torch: unsupported method .{target}()")

    # -- entry ------------------------------------------------------------
    def __call__(self, params, *inputs):
        env: Dict[Any, Any] = {}
        it = iter(inputs)

        def load(a):
            import torch.fx as fx
            if isinstance(a, fx.Node):
                return env[a]
            if isinstance(a, (tuple, list)):
                return type(a)(load(x) for x in a)
            if isinstance(a, dict):
                return {k: load(v) for k, v in a.items()}
            if isinstance(a, slice):
                return slice(load(a.start), load(a.stop), load(a.step))
            return a

        out = None
        for node in self.gm.graph.nodes:
            if node.op == "placeholder":
                env[node] = next(it)
            elif node.op == "get_attr":
                env[node] = params[node.target] \
                    if node.target in params else self.params[node.target]
            elif node.op == "call_module":
                env[node] = self._run_module(
                    node.target, params, load(node.args), load(node.kwargs))
            elif node.op == "call_function":
                env[node] = self._run_function(
                    node.target, load(node.args), load(node.kwargs))
            elif node.op == "call_method":
                env[node] = self._run_method(
                    node.target, load(node.args), load(node.kwargs))
            elif node.op == "output":
                out = load(node.args[0])
            else:
                raise NotImplementedError(node.op)
        return out


def from_torch(module, *, dtype=jnp.float32
               ) -> Tuple[Callable, Dict[str, Any]]:
    """Import a torch ``nn.Module`` as ``(fn, params)`` for the quantsim.

    ``fn(params, *inputs)`` is a pure jit-traceable JAX function replaying
    the fx-traced graph; ``params`` is a ``{qualified_name: {attr: array}}``
    pytree of the module's weights/buffers (fp32 by default).  The module is
    put in eval mode first — BN uses running stats, dropout is identity —
    matching the reference quantsim's eval-time semantics
    (aimet_torch/v1/quantsim.py:445-446 runs calibration under eval()).
    """
    import torch

    module = module.eval()
    with torch.no_grad():
        gm = torch.fx.symbolic_trace(module)
    f = _TorchGraphFunction(gm, dtype)
    return f, dict(f.params)
