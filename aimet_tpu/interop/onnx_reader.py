"""Minimal ONNX reader + jnp executor (no `onnx` package needed).

Two roles:
  * round-trip validation of `interop/onnx_export.py` artifacts — the
    tests parse the serialized bytes and execute them with jnp, comparing
    against the original JAX function (what a consumer toolchain does);
  * an ONNX on-ramp (the aimet_onnx-style entry point; reference:
    aimet_onnx/quantsim.py:487-524 builds an onnxruntime
    InferenceSession — here XLA is the session): ``load_onnx(path)``
    returns ``(fn, params)`` with ``fn(params, *inputs)`` pure and
    jit-able. Supported ops: conv-net set (Conv, Gemm, pools,
    activations, elementwise, Concat, Flatten, Clip, Pad,
    BatchNormalization) + transformer set (MatMul, LayerNormalization,
    Gelu/Erf, Softmax w/ axis, Slice/Split/Squeeze/Unsqueeze,
    ReduceMean/Sum/Max/Min, Gather, Cast, Constant, Shape/Expand/Where/
    Equal, Resize nearest/linear) + LSTM (forward/reverse/bidirectional,
    iofc gates, lax.scan time loop).

    Shape-operands (Slice starts/ends, Split sizes, axes tensors) must be
    initializers or Constant outputs — data-dependent shapes cannot jit.

The parser is a generic protobuf wire-format walker interpreting the
stable onnx.proto3 field numbers.
"""
from __future__ import annotations

import math
import struct
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# --------------------------------------------------------------------------
# wire parsing
# --------------------------------------------------------------------------


def _read_vint(buf: bytes, i: int) -> Tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _fields(buf: bytes) -> List[Tuple[int, int, Any]]:
    """[(field, wire, value)] — value is int for varint/fixed, bytes for
    length-delimited."""
    out = []
    i = 0
    while i < len(buf):
        key, i = _read_vint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, i = _read_vint(buf, i)
        elif wire == 2:
            ln, i = _read_vint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wire == 5:
            v = struct.unpack("<I", buf[i:i + 4])[0]
            i += 4
        elif wire == 1:
            v = struct.unpack("<Q", buf[i:i + 8])[0]
            i += 8
        else:
            raise ValueError(f"wire type {wire}")
        out.append((field, wire, v))
    return out


def _get(fields, n):
    return [v for f, _, v in fields if f == n]


def _parse_tensor(buf: bytes) -> Tuple[str, np.ndarray]:
    fs = _fields(buf)
    dims = [int(v) for f, w, v in fs if f == 1 and w == 0]
    dt = (_get(fs, 2) or [1])[0]
    name = (_get(fs, 8) or [b""])[0].decode()
    raw = (_get(fs, 9) or [b""])[0]
    np_dt = {1: np.float32, 7: np.int64, 3: np.int8,
             6: np.int32, 9: np.bool_}[int(dt)]
    arr = np.frombuffer(raw, dtype=np_dt).reshape(dims)
    return name, arr


def _signed64(v: int) -> int:
    """Protobuf int64 varints are 64-bit two's complement."""
    return v - (1 << 64) if v >= (1 << 63) else v


def _parse_attr(buf: bytes) -> Tuple[str, Any]:
    fs = _fields(buf)
    name = _get(fs, 1)[0].decode()
    floats = [struct.unpack("<f", struct.pack("<I", v))[0]
              for f, w, v in fs if f == 7 and w == 5]
    ints = [_signed64(int(v)) for f, w, v in fs if f == 8 and w == 0]
    if ints:
        return name, ints
    if floats:
        return name, floats
    for f, w, v in fs:
        if f == 2 and w == 5:
            return name, struct.unpack("<f", struct.pack("<I", v))[0]
        if f == 3 and w == 0:
            return name, _signed64(int(v))
        if f == 4 and w == 2:
            return name, v.decode()
        if f == 5 and w == 2:
            return name, _parse_tensor(v)[1]
    return name, None


def _parse_node(buf: bytes) -> Dict[str, Any]:
    fs = _fields(buf)
    return {
        "inputs": [v.decode() for f, _, v in fs if f == 1],
        "outputs": [v.decode() for f, _, v in fs if f == 2],
        "name": (_get(fs, 3) or [b""])[0].decode(),
        "op_type": _get(fs, 4)[0].decode(),
        "attrs": dict(_parse_attr(a) for a in _get(fs, 5)),
    }


def _parse_vinfo(buf: bytes) -> Tuple[str, Tuple[int, ...]]:
    fs = _fields(buf)
    name = _get(fs, 1)[0].decode()
    shape: Tuple[int, ...] = ()
    tp = _get(fs, 2)
    if tp:
        tt = _get(_fields(tp[0]), 1)
        if tt:
            sh = _get(_fields(tt[0]), 2)
            if sh:
                dims = []
                for d in _get(_fields(sh[0]), 1):
                    dv = _get(_fields(d), 1)
                    dims.append(int(dv[0]) if dv else -1)
                shape = tuple(dims)
    return name, shape


def parse_onnx(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        buf = f.read()
    fs = _fields(buf)
    graph = _fields(_get(fs, 7)[0])
    return {
        "producer": (_get(fs, 2) or [b""])[0].decode(),
        "nodes": [_parse_node(n) for n in _get(graph, 1)],
        "initializers": dict(_parse_tensor(t) for t in _get(graph, 5)),
        "inputs": [_parse_vinfo(v) for v in _get(graph, 11)],
        "outputs": [_parse_vinfo(v) for v in _get(graph, 12)],
    }


# --------------------------------------------------------------------------
# jnp execution
# --------------------------------------------------------------------------


def _conv(x, w, b, attrs):
    pads = attrs.get("pads", [0, 0, 0, 0])
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=tuple(attrs.get("strides", (1, 1))),
        padding=((pads[0], pads[2]), (pads[1], pads[3])),
        rhs_dilation=tuple(attrs.get("dilations", (1, 1))),
        feature_group_count=int(attrs.get("group", 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if b is not None:
        out = out + b.reshape(1, -1, 1, 1)
    return out


def _conv_transpose(x, w, b, attrs):
    """ONNX ConvTranspose (NCHW, W is (C_in, C_out/group, kH, kW)):
    gradient-of-conv semantics via lhs-dilated conv with a spatially
    flipped, IO-swapped kernel. Covers strides/pads/dilations/
    output_padding/group; rejects auto_pad and explicit output_shape."""
    if attrs.get("auto_pad", "NOTSET") not in ("NOTSET", b"NOTSET"):
        raise NotImplementedError("ConvTranspose auto_pad")
    if attrs.get("output_shape"):
        raise NotImplementedError("ConvTranspose output_shape")
    g = int(attrs.get("group", 1))
    kh, kw = w.shape[2], w.shape[3]
    dh, dw = attrs.get("dilations", (1, 1))
    sh, sw = attrs.get("strides", (1, 1))
    pads = attrs.get("pads", [0, 0, 0, 0])
    oph, opw = attrs.get("output_padding", (0, 0))
    # (Cin, Cout/g, kh, kw) -> OIHW for the forward conv: O = g*Cout/g,
    # I = Cin/g, spatially flipped
    ci, cog = w.shape[0], w.shape[1]
    wf = w.reshape(g, ci // g, cog, kh, kw)
    wf = jnp.flip(wf, axis=(3, 4))
    wf = jnp.transpose(wf, (0, 2, 1, 3, 4)).reshape(g * cog, ci // g, kh, kw)
    keh, kew = (kh - 1) * dh + 1, (kw - 1) * dw + 1
    pad = ((keh - 1 - pads[0], keh - 1 - pads[2] + oph),
           (kew - 1 - pads[1], kew - 1 - pads[3] + opw))
    out = jax.lax.conv_general_dilated(
        x, wf, window_strides=(1, 1), padding=pad,
        lhs_dilation=(sh, sw), rhs_dilation=(dh, dw),
        feature_group_count=g,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if b is not None:
        out = out + b.reshape(1, -1, 1, 1)
    return out


def _gru(node, ins, a):
    """ONNX GRU (zrh gate order, default activations Sigmoid/Tanh, layout
    0): X (T, B, I), W (D, 3H, I), R (D, 3H, H), B (D, 6H). Returns
    (Y (T, D, B, H), Y_h (D, B, H)). linear_before_reset both variants."""
    X, W, R = ins[0], ins[1], ins[2]
    hidden = R.shape[2]
    n_dirs = W.shape[0]
    direction = a.get("direction", "forward")
    if direction not in ("forward", "reverse", "bidirectional"):
        raise NotImplementedError(f"GRU direction {direction!r}")
    if (direction == "bidirectional") != (n_dirs == 2):
        raise ValueError("GRU direction/W mismatch")
    if a.get("activations") not in (None, ["Sigmoid", "Tanh"],
                                    ["Sigmoid", "Tanh"] * n_dirs):
        raise NotImplementedError("GRU non-default activations")
    if len(ins) > 4 and ins[4] is not None:
        raise NotImplementedError("GRU sequence_lens not supported")
    if a.get("clip") is not None:
        raise NotImplementedError("GRU clip not supported")
    lbr = bool(a.get("linear_before_reset", 0))
    B = ins[3] if len(ins) > 3 and ins[3] is not None else \
        jnp.zeros((n_dirs, 6 * hidden), X.dtype)
    T, batch, _ = X.shape
    h0 = ins[5] if len(ins) > 5 and ins[5] is not None else \
        jnp.zeros((n_dirs, batch, hidden), X.dtype)

    def run_dir(xs, w, r, b, h_init):
        wb, rb = b[:3 * hidden], b[3 * hidden:]
        wz, wr, wh = jnp.split(w, 3, axis=0)          # zrh order
        rz, rr, rh = jnp.split(r, 3, axis=0)
        wbz, wbr, wbh = jnp.split(wb, 3)
        rbz, rbr, rbh = jnp.split(rb, 3)

        def step(h, x_t):
            z = jax.nn.sigmoid(x_t @ wz.T + h @ rz.T + wbz + rbz)
            rg = jax.nn.sigmoid(x_t @ wr.T + h @ rr.T + wbr + rbr)
            if lbr:
                hh = jnp.tanh(x_t @ wh.T + rg * (h @ rh.T + rbh) + wbh)
            else:
                hh = jnp.tanh(x_t @ wh.T + (rg * h) @ rh.T + rbh + wbh)
            h_new = (1 - z) * hh + z * h
            return h_new, h_new

        h_l, ys = jax.lax.scan(step, h_init, xs)
        return ys, h_l

    if direction == "reverse":
        ys, h_l = run_dir(X[::-1], W[0], R[0], B[0], h0[0])
        return ys[::-1][:, None], h_l[None]
    ys_f, h_f = run_dir(X, W[0], R[0], B[0], h0[0])
    if n_dirs == 1:
        return ys_f[:, None], h_f[None]
    ys_b, h_b = run_dir(X[::-1], W[1], R[1], B[1], h0[1])
    return (jnp.stack([ys_f, ys_b[::-1]], axis=1),
            jnp.stack([h_f, h_b]))


def _pool(x, attrs, kind):
    k = attrs["kernel_shape"]
    s = attrs.get("strides", k)
    pads = attrs.get("pads", [0, 0, 0, 0])
    window = (1, 1, k[0], k[1])
    strides = (1, 1, s[0], s[1])
    pad = ((0, 0), (0, 0), (pads[0], pads[2]), (pads[1], pads[3]))
    if kind == "max":
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, window,
                                     strides, pad)
    acc = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides, pad)
    return acc / (k[0] * k[1])


def _static_ints(x) -> List[int]:
    """Constant operand -> python ints (Slice/Split/axes operands must be
    initializers or Constant outputs — data-dependent shapes can't jit)."""
    arr = np.asarray(x)
    if arr.ndim == 0:
        return [int(arr)]
    return [int(v) for v in arr]


_CAST_DT = {1: jnp.float32, 6: jnp.int32, 7: jnp.int64, 9: jnp.bool_,
            10: jnp.float16, 11: jnp.float64, 3: jnp.int8, 16: jnp.bfloat16}


def _lstm(node, ins, a):
    """ONNX LSTM (opset 7+ default activations f=Sigmoid g=Tanh h=Tanh),
    iofc gate order, layout 0: X (T, B, I), W (D, 4H, I), R (D, 4H, H),
    B (D, 8H). Returns (Y (T, D, B, H), Y_h (D, B, H), Y_c (D, B, H)).
    Mirrors the reference's recurrent quantsim target semantics
    (aimet_onnx rnn models; NightlyTests/onnx/test_rnn_quantsim.py)."""
    X, W, R = ins[0], ins[1], ins[2]
    hidden = R.shape[2]
    n_dirs = W.shape[0]
    direction = a.get("direction", "forward")
    if direction not in ("forward", "reverse", "bidirectional"):
        raise NotImplementedError(f"LSTM direction {direction!r}")
    if (direction == "bidirectional") != (n_dirs == 2):
        raise ValueError(f"LSTM direction={direction!r} but W has "
                         f"{n_dirs} direction slices")
    if a.get("activations") not in (None, ["Sigmoid", "Tanh", "Tanh"],
                                    ["Sigmoid", "Tanh", "Tanh"] * n_dirs):
        raise NotImplementedError(
            "LSTM non-default activations not supported")
    if len(ins) > 4 and ins[4] is not None:
        raise NotImplementedError("LSTM sequence_lens not supported")
    if len(ins) > 7 and ins[7] is not None:
        raise NotImplementedError("LSTM peephole weights (P) not supported")
    if a.get("clip") is not None or a.get("input_forget"):
        raise NotImplementedError("LSTM clip/input_forget not supported")
    B = ins[3] if len(ins) > 3 and ins[3] is not None else \
        jnp.zeros((n_dirs, 8 * hidden), X.dtype)
    T, batch, _ = X.shape
    h0 = ins[5] if len(ins) > 5 and ins[5] is not None else \
        jnp.zeros((n_dirs, batch, hidden), X.dtype)
    c0 = ins[6] if len(ins) > 6 and ins[6] is not None else \
        jnp.zeros((n_dirs, batch, hidden), X.dtype)

    def run_dir(xs, w, r, b, h_init, c_init):
        wb, rb = b[:4 * hidden], b[4 * hidden:]

        def step(carry, x_t):
            h, c = carry
            gates = x_t @ w.T + h @ r.T + wb + rb
            i, o, f, g = jnp.split(gates, 4, axis=-1)      # iofc order
            i = jax.nn.sigmoid(i)
            o = jax.nn.sigmoid(o)
            f = jax.nn.sigmoid(f)
            g = jnp.tanh(g)
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        (h_l, c_l), ys = jax.lax.scan(step, (h_init, c_init), xs)
        return ys, h_l, c_l

    if direction == "reverse":
        ys_r, h_r, c_r = run_dir(X[::-1], W[0], R[0], B[0], h0[0], c0[0])
        return ys_r[::-1][:, None], h_r[None], c_r[None]
    ys_f, h_f, c_f = run_dir(X, W[0], R[0], B[0], h0[0], c0[0])
    if n_dirs == 1:
        return ys_f[:, None], h_f[None], c_f[None]
    ys_b, h_b, c_b = run_dir(X[::-1], W[1], R[1], B[1], h0[1], c0[1])
    Y = jnp.stack([ys_f, ys_b[::-1]], axis=1)              # (T, 2, B, H)
    return Y, jnp.stack([h_f, h_b]), jnp.stack([c_f, c_b])


def _run_node(node, val):
    t = node["op_type"]
    ins = [val[n] if n else None for n in node["inputs"]]
    a = node["attrs"]
    if t == "Conv":
        return _conv(ins[0], ins[1], ins[2] if len(ins) > 2 else None, a)
    if t == "Gemm":
        x = ins[0].T if a.get("transA") else ins[0]
        y = x @ (ins[1].T if a.get("transB") else ins[1])
        y = y * a.get("alpha", 1.0)
        if len(ins) > 2:
            y = y + ins[2] * a.get("beta", 1.0)
        return y
    if t == "MatMul":
        return jnp.matmul(ins[0], ins[1])
    if t == "BatchNormalization":
        # inference form: scale, B, mean, var along axis 1 (NCHW channel)
        x, scale, b, mean, var = ins[:5]
        shape = [1, -1] + [1] * (x.ndim - 2)
        eps = a.get("epsilon", 1e-5)
        return ((x - mean.reshape(shape))
                * (scale.reshape(shape)
                   * jax.lax.rsqrt(var.reshape(shape) + eps))
                + b.reshape(shape))
    if t == "LayerNormalization":
        axis = a.get("axis", -1)
        eps = a.get("epsilon", 1e-5)
        x = ins[0]
        axes = tuple(range(axis % x.ndim, x.ndim))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=axes, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + eps)
        y = y * ins[1]
        if len(ins) > 2 and ins[2] is not None:
            y = y + ins[2]
        return y
    if t == "Relu":
        return jnp.maximum(ins[0], 0)
    if t == "Sigmoid":
        return jax.nn.sigmoid(ins[0])
    if t == "Tanh":
        return jnp.tanh(ins[0])
    if t == "Gelu":
        approx = a.get("approximate", "none")
        return jax.nn.gelu(ins[0], approximate=(approx == "tanh"))
    if t == "Erf":
        return jax.lax.erf(ins[0])
    if t == "Softmax":
        return jax.nn.softmax(ins[0], axis=a.get("axis", -1))
    if t in ("Add", "Sub", "Mul", "Div", "Min", "Max", "Pow"):
        f = {"Add": jnp.add, "Sub": jnp.subtract, "Mul": jnp.multiply,
             "Div": jnp.divide, "Min": jnp.minimum, "Max": jnp.maximum,
             "Pow": jnp.power}[t]
        return f(ins[0], ins[1])
    if t == "Sqrt":
        return jnp.sqrt(ins[0])
    if t == "Neg":
        return -ins[0]
    if t == "Exp":
        return jnp.exp(ins[0])
    if t == "Log":
        return jnp.log(ins[0])
    if t == "Identity":
        return ins[0]
    if t == "Cast":
        return ins[0].astype(_CAST_DT[int(a["to"])])
    if t == "Constant":
        return jnp.asarray(a["value"])
    if t == "Clip":
        lo = ins[1] if len(ins) > 1 else None
        hi = ins[2] if len(ins) > 2 else None
        return jnp.clip(ins[0], lo, hi)
    if t == "MaxPool":
        return _pool(ins[0], a, "max")
    if t == "AveragePool":
        return _pool(ins[0], a, "avg")
    if t == "GlobalAveragePool":
        return jnp.mean(ins[0], axis=(2, 3), keepdims=True)
    if t == "Flatten":
        return ins[0].reshape(ins[0].shape[0], -1)
    if t == "Concat":
        return jnp.concatenate(ins, axis=a["axis"])
    if t == "Reshape":
        return ins[0].reshape([int(d) for d in np.asarray(ins[1])])
    if t == "Transpose":
        return jnp.transpose(ins[0], a["perm"])
    if t == "Slice":
        x = ins[0]
        if len(ins) > 1:                       # opset 10+: operands
            starts = _static_ints(ins[1])
            ends = _static_ints(ins[2])
            axes = _static_ints(ins[3]) if len(ins) > 3 and \
                ins[3] is not None else list(range(len(starts)))
            steps = _static_ints(ins[4]) if len(ins) > 4 and \
                ins[4] is not None else [1] * len(starts)
        else:                                  # opset 1: attributes
            starts, ends = a["starts"], a["ends"]
            axes = a.get("axes", list(range(len(starts))))
            steps = [1] * len(starts)
        idx = [slice(None)] * x.ndim
        for s, e, ax, st in zip(starts, ends, axes, steps):
            dim = x.shape[ax % x.ndim]
            # ONNX clamps INT_MAX/INT_MIN-style bounds to the dim; for
            # negative steps an effective end of -1 means "past element
            # 0" = python stop=None
            s = max(s + dim, 0) if s < 0 else min(s, dim)
            if e < 0:
                e = e + dim
                e = None if (st < 0 and e < 0) else max(e, 0)
            else:
                e = min(e, dim)
            idx[ax % x.ndim] = slice(s, e, st)
        return x[tuple(idx)]
    if t == "Split":
        x = ins[0]
        axis = a.get("axis", 0) % x.ndim
        if len(ins) > 1 and ins[1] is not None:      # opset 13: operand
            sizes = _static_ints(ins[1])
        elif "split" in a:
            sizes = a["split"]
        else:
            n = len(node["outputs"])
            sizes = [x.shape[axis] // n] * n
        offs = np.cumsum([0] + list(sizes))
        return tuple(jax.lax.slice_in_dim(x, int(offs[i]), int(offs[i + 1]),
                                          axis=axis)
                     for i in range(len(sizes)))
    if t == "Squeeze":
        axes = (_static_ints(ins[1]) if len(ins) > 1 and ins[1] is not None
                else a.get("axes"))
        if axes is None:
            return jnp.squeeze(ins[0])
        return jnp.squeeze(ins[0], axis=tuple(ax % ins[0].ndim
                                              for ax in axes))
    if t == "Unsqueeze":
        axes = (_static_ints(ins[1]) if len(ins) > 1 else a["axes"])
        y = ins[0]
        # ONNX: axes index into the OUTPUT shape (rank = ndim + len(axes))
        out_ndim = y.ndim + len(axes)
        for ax in sorted(ax % out_ndim for ax in axes):
            y = jnp.expand_dims(y, ax)
        return y
    if t == "Pad":
        x = ins[0]
        mode = a.get("mode", "constant")
        if len(ins) > 1 and ins[1] is not None:      # opset 11+: operand
            pads = _static_ints(ins[1])
            cval = float(np.asarray(ins[2])) if len(ins) > 2 and \
                ins[2] is not None else 0.0
        else:
            pads = a["pads"]
            cval = a.get("value", 0.0)
        nd = x.ndim
        width = [(pads[i], pads[i + nd]) for i in range(nd)]
        if mode == "constant":
            return jnp.pad(x, width, constant_values=cval)
        return jnp.pad(x, width,
                       mode={"reflect": "reflect", "edge": "edge"}[mode])
    if t == "ReduceMean":
        axes = (a.get("axes") if "axes" in a else
                (_static_ints(ins[1]) if len(ins) > 1 and ins[1] is not None
                 else None))
        keep = bool(a.get("keepdims", 1))
        return jnp.mean(ins[0], axis=None if axes is None else tuple(axes),
                        keepdims=keep)
    if t == "Gather":
        axis = a.get("axis", 0)
        # ONNX allows negative indices (index + dim, opset 13+); jnp.take's
        # default clamps them to 0 — 'wrap' (mod dim) matches the spec for
        # all in-range indices (ADVICE r4 #3)
        return jnp.take(ins[0], jnp.asarray(ins[1]).astype(jnp.int32),
                        axis=axis, mode="wrap")
    if t == "Shape":
        # static under jit: the shape IS a trace-time constant
        return np.asarray(ins[0].shape, np.int64)
    if t == "Expand":
        target = _static_ints(ins[1])
        return jnp.broadcast_to(ins[0], np.broadcast_shapes(
            tuple(ins[0].shape), tuple(target)))
    if t == "Where":
        return jnp.where(ins[0], ins[1], ins[2])
    if t == "Equal":
        return jnp.equal(ins[0], ins[1])
    if t in ("ReduceSum", "ReduceMax", "ReduceMin"):
        f = {"ReduceSum": jnp.sum, "ReduceMax": jnp.max,
             "ReduceMin": jnp.min}[t]
        axes = (a.get("axes") if "axes" in a else
                (_static_ints(ins[1]) if len(ins) > 1 and ins[1] is not None
                 else None))
        return f(ins[0], axis=None if axes is None else tuple(axes),
                 keepdims=bool(a.get("keepdims", 1)))
    if t == "Resize":
        # nearest/linear upsampling via scales (input 2 or 3 per opset),
        # NCHW; the common torch-exported interpolate form
        x = ins[0]
        scales = sizes = None
        if len(ins) > 2 and ins[2] is not None and np.asarray(ins[2]).size:
            scales = np.asarray(ins[2], np.float64)
        if len(ins) > 3 and ins[3] is not None and np.asarray(ins[3]).size:
            sizes = _static_ints(ins[3])
        if sizes is None:
            if scales is None:
                raise NotImplementedError("Resize without scales/sizes")
            # ONNX computes output dims as floor(d * s), not round
            # (ADVICE r4 #4)
            sizes = [int(math.floor(d * s)) for d, s in zip(x.shape, scales)]
        mode = a.get("mode", "nearest")
        method = {"nearest": "nearest", "linear": "bilinear"}.get(mode)
        if method is None:
            raise NotImplementedError(f"Resize mode {mode!r}")
        if mode == "nearest":
            # jax.image.resize 'nearest' picks source pixels like ORT's
            # 'floor' nearest_mode with half_pixel coordinates; ORT's
            # DEFAULT is round_prefer_floor, which differs only at exact
            # .5 source coordinates — i.e. never for integral scale
            # factors. Reject configurations we cannot reproduce.
            nm = a.get("nearest_mode", "round_prefer_floor")
            integral = all(float(s).is_integer() for s in (
                scales if scales is not None
                else [o / d for o, d in zip(sizes, x.shape)]))
            if nm not in ("floor",) and not integral:
                raise NotImplementedError(
                    f"Resize nearest_mode {nm!r} with non-integral scales "
                    f"is not bit-reproducible by jax.image.resize")
        return jax.image.resize(x, tuple(sizes), method=method)
    if t == "LSTM":
        return _lstm(node, ins, a)
    if t == "GRU":
        return _gru(node, ins, a)
    if t == "ConvTranspose":
        return _conv_transpose(ins[0], ins[1],
                               ins[2] if len(ins) > 2 else None, a)
    if t == "InstanceNormalization":
        x, scale, b = ins[:3]
        axes = tuple(range(2, x.ndim))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        shape = [1, -1] + [1] * (x.ndim - 2)
        eps = a.get("epsilon", 1e-5)
        return (x - mean) * jax.lax.rsqrt(var + eps) \
            * scale.reshape(shape) + b.reshape(shape)
    if t in ("ArgMax", "ArgMin"):
        if a.get("select_last_index"):
            raise NotImplementedError(f"{t} select_last_index")
        axis = a.get("axis", 0)
        f = jnp.argmax if t == "ArgMax" else jnp.argmin
        idx = f(ins[0], axis=axis).astype(jnp.int64)
        return jnp.expand_dims(idx, axis) if a.get("keepdims", 1) else idx
    if t == "TopK":
        k = _static_ints(ins[1])[0]
        axis = a.get("axis", -1)
        largest = bool(a.get("largest", 1))
        x = jnp.moveaxis(ins[0], axis, -1)
        vals, idx = jax.lax.top_k(x if largest else -x, k)
        if not largest:
            vals = -vals
        return (jnp.moveaxis(vals, -1, axis),
                jnp.moveaxis(idx, -1, axis).astype(jnp.int64))
    if t == "LeakyRelu":
        alpha = a.get("alpha", 0.01)
        return jnp.where(ins[0] >= 0, ins[0], alpha * ins[0])
    if t == "Elu":
        alpha = a.get("alpha", 1.0)
        return jnp.where(ins[0] >= 0, ins[0],
                         alpha * (jnp.exp(ins[0]) - 1.0))
    if t == "PRelu":
        slope = ins[1]
        return jnp.where(ins[0] >= 0, ins[0], slope * ins[0])
    if t == "HardSigmoid":
        alpha, beta = a.get("alpha", 0.2), a.get("beta", 0.5)
        return jnp.clip(alpha * ins[0] + beta, 0.0, 1.0)
    if t == "HardSwish":
        return ins[0] * jnp.clip(ins[0] / 6.0 + 0.5, 0.0, 1.0)
    if t == "Softplus":
        return jax.nn.softplus(ins[0])
    if t == "Abs":
        return jnp.abs(ins[0])
    if t in ("Floor", "Ceil", "Round"):
        f = {"Floor": jnp.floor, "Ceil": jnp.ceil, "Round": jnp.round}[t]
        return f(ins[0])
    if t == "Reciprocal":
        return 1.0 / ins[0]
    if t in ("Greater", "Less", "GreaterOrEqual", "LessOrEqual"):
        f = {"Greater": jnp.greater, "Less": jnp.less,
             "GreaterOrEqual": jnp.greater_equal,
             "LessOrEqual": jnp.less_equal}[t]
        return f(ins[0], ins[1])
    if t == "Not":
        return jnp.logical_not(ins[0])
    if t in ("And", "Or", "Xor"):
        f = {"And": jnp.logical_and, "Or": jnp.logical_or,
             "Xor": jnp.logical_xor}[t]
        return f(ins[0], ins[1])
    if t == "Sum":
        out = ins[0]
        for x in ins[1:]:
            out = out + x
        return out
    if t == "Tile":
        return jnp.tile(ins[0], _static_ints(ins[1]))
    if t == "ConstantOfShape":
        val = a.get("value")
        fill = np.asarray(val).reshape(-1)[0] if val is not None else 0.0
        dt = np.asarray(val).dtype if val is not None else np.float32
        return jnp.full(_static_ints(ins[0]), fill, dtype=dt)
    if t == "Range":
        start, limit, delta = (_static_ints(v)[0] for v in ins[:3])
        return jnp.arange(start, limit, delta,
                          dtype=np.asarray(ins[0]).dtype)
    raise NotImplementedError(f"onnx_reader: op {t}")


def load_onnx(path: str):
    """Parse an ONNX file into ``(fn, params)``:
    ``fn(params, *inputs) -> output(s)`` in the model's native (NCHW)
    layout; params = {initializer name: array}."""
    model = parse_onnx(path)
    # int64 initializers are shape/index operands (Reshape shapes, Slice
    # starts/ends, Split sizes, Gather indices): bake them as numpy
    # constants so they stay concrete under jit — they parameterize the
    # PROGRAM, they are not data
    consts = {k: np.asarray(v) for k, v in model["initializers"].items()
              if np.asarray(v).dtype == np.int64}
    params = {k: jnp.asarray(v) for k, v in model["initializers"].items()
              if k not in consts}
    in_names = [n for n, _ in model["inputs"]]
    out_names = [n for n, _ in model["outputs"]]
    nodes = model["nodes"]

    def fn(params, *inputs):
        val = dict(consts)
        val.update(params)
        for n, x in zip(in_names, inputs):
            val[n] = x
        for node in nodes:
            out = _run_node(node, val)
            if isinstance(out, tuple):          # Split / LSTM: multi-output
                for nm, o in zip(node["outputs"], out):
                    if nm:
                        val[nm] = o
            else:
                val[node["outputs"][0]] = out
        outs = [val[n] for n in out_names]
        return outs[0] if len(outs) == 1 else tuple(outs)

    return fn, params
