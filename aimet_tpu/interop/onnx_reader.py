"""Minimal ONNX reader + jnp executor (no `onnx` package needed).

Two roles:
  * round-trip validation of `interop/onnx_export.py` artifacts — the
    tests parse the serialized bytes and execute them with jnp, comparing
    against the original JAX function (what a consumer toolchain does);
  * an ONNX on-ramp for the supported op subset (Conv, Gemm, pools,
    activations, elementwise, Concat, Flatten, GlobalAveragePool, Clip):
    ``load_onnx(path)`` returns ``(fn, params)`` with
    ``fn(params, *inputs)`` pure and jit-able — the aimet_onnx-style
    entry point in miniature (reference: aimet_onnx/quantsim.py builds an
    InferenceSession; here XLA is the session).

The parser is a generic protobuf wire-format walker interpreting the
stable onnx.proto3 field numbers.
"""
from __future__ import annotations

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
             6: np.int32}[int(dt)]
    arr = np.frombuffer(raw, dtype=np_dt).reshape(dims)
    return name, arr


def _parse_attr(buf: bytes) -> Tuple[str, Any]:
    fs = _fields(buf)
    name = _get(fs, 1)[0].decode()
    floats = [struct.unpack("<f", struct.pack("<I", v))[0]
              for f, w, v in fs if f == 7 and w == 5]
    ints = [int(v) for f, w, v in fs if f == 8 and w == 0]
    if ints:
        return name, ints
    if floats:
        return name, floats
    for f, w, v in fs:
        if f == 2 and w == 5:
            return name, struct.unpack("<f", struct.pack("<I", v))[0]
        if f == 3 and w == 0:
            return name, int(v)
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


def _run_node(node, val):
    t = node["op_type"]
    ins = [val[n] for n in node["inputs"]]
    a = node["attrs"]
    if t == "Conv":
        return _conv(ins[0], ins[1], ins[2] if len(ins) > 2 else None, a)
    if t == "Gemm":
        y = ins[0] @ (ins[1].T if a.get("transB") else ins[1])
        if len(ins) > 2:
            y = y + ins[2]
        return y
    if t == "Relu":
        return jnp.maximum(ins[0], 0)
    if t == "Sigmoid":
        return jax.nn.sigmoid(ins[0])
    if t == "Tanh":
        return jnp.tanh(ins[0])
    if t == "Softmax":
        return jax.nn.softmax(ins[0], axis=a.get("axis", -1))
    if t in ("Add", "Sub", "Mul", "Div", "Min", "Max"):
        f = {"Add": jnp.add, "Sub": jnp.subtract, "Mul": jnp.multiply,
             "Div": jnp.divide, "Min": jnp.minimum, "Max": jnp.maximum}[t]
        return f(ins[0], ins[1])
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
    raise NotImplementedError(f"onnx_reader: op {t}")


def load_onnx(path: str):
    """Parse an ONNX file into ``(fn, params)``:
    ``fn(params, *inputs) -> output(s)`` in the model's native (NCHW)
    layout; params = {initializer name: array}."""
    model = parse_onnx(path)
    params = {k: jnp.asarray(v) for k, v in model["initializers"].items()}
    in_names = [n for n, _ in model["inputs"]]
    out_names = [n for n, _ in model["outputs"]]
    nodes = model["nodes"]

    def fn(params, *inputs):
        val = dict(params)
        for n, x in zip(in_names, inputs):
            val[n] = x
        for node in nodes:
            out = _run_node(node, val)
            val[node["outputs"][0]] = out
        outs = [val[n] for n in out_names]
        return outs[0] if len(outs) == 1 else tuple(outs)

    return fn, params
