"""ONNX graph export — the deployable artifact for non-JAX consumers.

The reference's export contract is an ONNX model + encodings JSON whose
activation keys are ONNX tensor names and whose param keys are initializer
names (OnnxSaver, aimet_torch/onnx_utils.py:419; quantsim export
v1/quantsim.py:940-1044). This module produces that artifact from the
traced ConnectedGraph WITHOUT the `onnx` package (absent in this
environment): ModelProto is serialized by hand over the protobuf wire
format (a few varint/length-delimited primitives — onnx.proto3 field
numbers are stable public API).

Layout convention: the ONNX graph is standard NCHW / OIHW; 4-D tensors are
transposed at the boundary (inputs/outputs declared NCHW), conv kernels
HWIO->OIHW at export, and a folded pre-dense flatten becomes Flatten with
row-permuted Gemm weights (CHW vs HWC element order).

Naming contract (the interop point):
  * every node's output tensor is named after the producing op
    (``conv_0``, ``relu_1``...) — exactly the keys of
    ``sim.export_encodings()['activation_encodings']``;
  * initializers are named by param path — the keys of
    ``param_encodings``.

`interop/onnx_reader.py` parses + executes this artifact with jnp and is
used by the round-trip tests (and doubles as an ONNX on-ramp).
"""
from __future__ import annotations

import struct
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax import tree_util as jtu

from ..graph.connected_graph import ConnectedGraph, Op

# --------------------------------------------------------------------------
# protobuf wire primitives
# --------------------------------------------------------------------------


def _vint(n: int) -> bytes:
    out = b""
    n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _tag(field: int, wire: int) -> bytes:
    return _vint((field << 3) | wire)


def _int(field: int, v: int) -> bytes:
    return _tag(field, 0) + _vint(int(v))


def _msg(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _vint(len(payload)) + payload


def _str(field: int, s: str) -> bytes:
    return _msg(field, s.encode())


# onnx TensorProto.DataType
F32, I64, I8, I32, BOOL = 1, 7, 3, 6, 9
# AttributeProto.AttributeType
AT_FLOAT, AT_INT, AT_STRING, AT_TENSOR, AT_FLOATS, AT_INTS = 1, 2, 3, 4, 6, 7


def _tensor(name: str, arr: np.ndarray) -> bytes:
    arr = np.asarray(arr)
    if arr.dtype == np.float32:
        dt = F32
    elif arr.dtype == np.int64:
        dt = I64
    elif arr.dtype == np.int8:
        dt = I8
    elif arr.dtype == np.int32:
        dt = I32
    elif arr.dtype == np.bool_:
        dt = BOOL
    else:
        arr = arr.astype(np.float32)
        dt = F32
    out = b"".join(_int(1, d) for d in arr.shape)
    out += _int(2, dt)
    out += _str(8, name)
    out += _msg(9, arr.tobytes())          # raw_data (little-endian)
    return out


def _attr(name: str, value) -> bytes:
    out = _str(1, name)
    if isinstance(value, float):
        out += _tag(2, 5) + struct.pack("<f", value) + _int(20, AT_FLOAT)
    elif isinstance(value, bool) or isinstance(value, int):
        out += _int(3, int(value)) + _int(20, AT_INT)
    elif isinstance(value, str):
        out += _msg(4, value.encode()) + _int(20, AT_STRING)
    elif isinstance(value, (list, tuple)):
        if value and isinstance(value[0], float):
            out += b"".join(_tag(7, 5) + struct.pack("<f", v) for v in value)
            out += _int(20, AT_FLOATS)
        else:
            out += b"".join(_int(8, int(v)) for v in value)
            out += _int(20, AT_INTS)
    else:
        raise TypeError(f"attr {name}: {type(value)}")
    return out


def _node(op_type: str, inputs: Sequence[str], outputs: Sequence[str],
          name: str, attrs: Optional[Dict[str, Any]] = None) -> bytes:
    out = b"".join(_str(1, i) for i in inputs)
    out += b"".join(_str(2, o) for o in outputs)
    out += _str(3, name) + _str(4, op_type)
    for k, v in (attrs or {}).items():
        out += _msg(5, _attr(k, v))
    return out


def _value_info(name: str, shape: Sequence[int], elem_type: int = F32
                ) -> bytes:
    dims = b"".join(_msg(1, _int(1, d)) for d in shape)
    ttype = _int(1, elem_type) + _msg(2, dims)
    return _str(1, name) + _msg(2, _msg(1, ttype))


# --------------------------------------------------------------------------
# graph translation
# --------------------------------------------------------------------------


def _nchw(shape) -> Tuple[int, ...]:
    if len(shape) == 4:
        return (shape[0], shape[3], shape[1], shape[2])
    return tuple(shape)


class _Exporter:
    def __init__(self, graph: ConnectedGraph, params):
        self.graph = graph
        self.params = params
        self.leaves = jtu.tree_leaves(params)
        self.nodes: List[bytes] = []
        self.inits: List[bytes] = []
        self.vinfos: List[bytes] = []
        self.names: Dict[int, str] = {}     # product var id -> tensor name
        self.counter = 0

    # -- helpers ----------------------------------------------------------
    def _aux(self, base: str) -> str:
        self.counter += 1
        return f"{base}__aux{self.counter}"

    def _init(self, name: str, arr) -> str:
        self.inits.append(_tensor(name, np.asarray(arr)))
        return name

    def _in_name(self, prod) -> str:
        try:
            return self.names[id(prod.var)]
        except KeyError:
            raise NotImplementedError(
                f"onnx export: input tensor of {prod.name} has no producer "
                f"mapping (literal/const operands must come via "
                f"param_products)")

    def _param(self, op: Op, role: str) -> Tuple[str, np.ndarray]:
        pp = op.param_products[role]
        w = np.asarray(self.leaves[
            self.graph._param_leaf_index[pp.param_path]])
        return pp.param_path, w

    def _const_operand(self, op: Op, prod) -> Optional[np.ndarray]:
        """Constant value of a non-producer operand (traced literal /
        closure const), or None."""
        if prod.producer is not None or id(prod.var) in self.names:
            return None
        if prod.kind == "param":
            w = self.leaves[self.graph._param_leaf_index[prod.param_path]]
            return np.asarray(w)
        const_of = {id(v): c for v, c in zip(self.graph.jaxpr.constvars,
                                             self.graph.consts)}
        if id(prod.var) in const_of:
            return np.asarray(const_of[id(prod.var)])
        return None

    # -- per-op emitters --------------------------------------------------
    def emit(self, op: Op):
        t = op.type
        fn = getattr(self, f"_emit_{t}", None)
        if fn is None:
            raise NotImplementedError(
                f"onnx export: unsupported op type {t!r} ({op.name})")
        fn(op)
        self.names[id(op.output.var)] = op.name

    def _emit_conv(self, op: Op):
        x = self._in_name(op.inputs[0])
        kpath, w = self._param(op, "kernel")      # (kh, kw, ci_g, co)
        wname = self._init(kpath, np.transpose(w, (3, 2, 0, 1))
                           .astype(np.float32))
        ins = [x, wname]
        if "bias" in op.param_products:
            bpath, b = self._param(op, "bias")
            ins.append(self._init(bpath, b.astype(np.float32)))
        pads = op.attrs["padding"]
        attrs = {
            "strides": list(op.attrs["window_strides"]),
            "pads": [pads[0][0], pads[1][0], pads[0][1], pads[1][1]],
            "dilations": list(op.attrs.get("rhs_dilation", (1, 1))),
            "group": int(op.attrs.get("feature_group_count", 1)),
            "kernel_shape": [w.shape[0], w.shape[1]],
        }
        self.nodes.append(_node("Conv", ins, [op.name], op.name, attrs))

    def _emit_depthwise_conv(self, op: Op):
        x = self._in_name(op.inputs[0])
        kpath, w = self._param(op, "kernel")      # (kh, kw, 1, C)
        wname = self._init(kpath, np.transpose(w, (3, 2, 0, 1))
                           .astype(np.float32))
        ins = [x, wname]
        if "bias" in op.param_products:
            bpath, b = self._param(op, "bias")
            ins.append(self._init(bpath, b.astype(np.float32)))
        pads = op.attrs["padding"]
        attrs = {
            "strides": list(op.attrs["window_strides"]),
            "pads": [pads[0][0], pads[1][0], pads[0][1], pads[1][1]],
            "dilations": list(op.attrs.get("rhs_dilation", (1, 1))),
            "group": int(w.shape[3]),
            "kernel_shape": [w.shape[0], w.shape[1]],
        }
        self.nodes.append(_node("Conv", ins, [op.name], op.name, attrs))

    def _emit_batchnorm(self, op: Op):
        # exact per-channel affine (y = a*x + b) via the probed bn params
        from ..algorithms.bn_fold import bn_affine_params
        a, b = bn_affine_params(self.graph, self.params, op,
                                len(op.inputs[0].shape) - 1)
        C = int(np.asarray(a).size)
        shape = (1, C, 1, 1) if len(op.inputs[0].shape) == 4 else (C,)
        an = self._init(self._aux(op.name),
                        np.asarray(a, np.float32).reshape(shape))
        bn = self._init(self._aux(op.name),
                        np.asarray(b, np.float32).reshape(shape))
        mid = self._aux(op.name)
        x = self._in_name(op.inputs[0])
        self.nodes.append(_node("Mul", [x, an], [mid], mid))
        self.nodes.append(_node("Add", [mid, bn], [op.name], op.name))

    def _emit_relu(self, op: Op):
        self.nodes.append(_node(
            "Relu", [self._in_name(op.inputs[0])], [op.name], op.name))

    def _emit_sigmoid(self, op: Op):
        self.nodes.append(_node(
            "Sigmoid", [self._in_name(op.inputs[0])], [op.name], op.name))

    def _emit_tanh(self, op: Op):
        self.nodes.append(_node(
            "Tanh", [self._in_name(op.inputs[0])], [op.name], op.name))

    @staticmethod
    def _nhwc_axis(axis: int, nd: int) -> int:
        """Remap an axis on a 4-D tensor from the JAX-side NHWC layout to
        the exported NCHW layout (N0 H1 W2 C3 -> N0 C1 H2 W3). Non-4-D
        tensors are exported unpermuted (axis normalized only)."""
        axis = axis % nd
        if nd == 4:
            return {0: 0, 1: 2, 2: 3, 3: 1}[axis]
        return axis

    def _emit_softmax(self, op: Op):
        nd = len(op.output.shape)
        axis = self._nhwc_axis(op.attrs.get("axis", -1), nd)
        self.nodes.append(_node(
            "Softmax", [self._in_name(op.inputs[0])], [op.name], op.name,
            {"axis": int(axis)}))

    def _binary(self, op: Op, onnx_type: str):
        ins = []
        for prod in op.inputs:
            const = self._const_operand(op, prod)
            if const is None:
                ins.append(self._in_name(prod))
            else:
                if const.ndim == 1 and len(op.output.shape) == 4 \
                        and const.shape[0] == op.output.shape[3]:
                    const = const.reshape(1, -1, 1, 1)   # NHWC ch -> NCHW
                ins.append(self._init(self._aux(op.name),
                                      const.astype(np.float32)))
        self.nodes.append(_node(onnx_type, ins, [op.name], op.name))

    def _emit_add(self, op: Op):
        self._binary(op, "Add")

    def _emit_sub(self, op: Op):
        self._binary(op, "Sub")

    def _emit_mul(self, op: Op):
        self._binary(op, "Mul")

    def _emit_div(self, op: Op):
        self._binary(op, "Div")

    def _emit_min(self, op: Op):
        self._binary(op, "Min")

    def _emit_max(self, op: Op):
        self._binary(op, "Max")

    def _emit_clip(self, op: Op):
        # 'clip' groups min/max/clamp against literal bounds; the bounds
        # live as jaxpr Literals in the eqn invars
        from jax.extend.core import Literal
        e = op.eqns[0]
        prim = e.primitive.name
        lits = [float(np.asarray(v.val).reshape(()))
                for v in e.invars if isinstance(v, Literal)]
        lo, hi = -3.0e38, 3.0e38
        if prim == "min" and len(lits) == 1:
            hi = lits[0]
        elif prim == "max" and len(lits) == 1:
            lo = lits[0]
        elif prim in ("clamp", "clip") and len(lits) == 2:
            lo, hi = sorted(lits)
        else:
            raise NotImplementedError(
                f"onnx export: clip form {prim} with {len(lits)} literal "
                f"bounds ({op.name})")
        ins = [self._in_name(op.inputs[0]),
               self._init(self._aux(op.name), np.float32(lo)),
               self._init(self._aux(op.name), np.float32(hi))]
        self.nodes.append(_node("Clip", ins, [op.name], op.name))

    def _pool(self, op: Op, onnx_type: str):
        wd = op.attrs["window_dimensions"]
        ws = op.attrs["window_strides"]
        pads = op.attrs["padding"]
        attrs = {
            "kernel_shape": [wd[1], wd[2]],
            "strides": [ws[1], ws[2]],
            "pads": [pads[1][0], pads[2][0], pads[1][1], pads[2][1]],
        }
        if onnx_type == "AveragePool":
            attrs["count_include_pad"] = 1
        self.nodes.append(_node(
            onnx_type, [self._in_name(op.inputs[0])], [op.name], op.name,
            attrs))

    def _emit_maxpool(self, op: Op):
        self._pool(op, "MaxPool")

    def _emit_avgpool(self, op: Op):
        self._pool(op, "AveragePool")

    def _emit_mean(self, op: Op):
        axes = tuple(op.attrs.get("axes", ()))
        if axes == (1, 2) and len(op.inputs[0].shape) == 4:
            mid = self._aux(op.name)
            self.nodes.append(_node(
                "GlobalAveragePool", [self._in_name(op.inputs[0])],
                [mid], mid))
            self.nodes.append(_node("Flatten", [mid], [op.name], op.name,
                                    {"axis": 1}))
            return
        raise NotImplementedError(
            f"onnx export: mean over axes {axes} ({op.name})")

    def _emit_concat(self, op: Op):
        nd = len(op.output.shape)
        axis = self._nhwc_axis(op.attrs.get("dimension", -1), nd)
        self.nodes.append(_node(
            "Concat", [self._in_name(p) for p in op.inputs], [op.name],
            op.name, {"axis": int(axis)}))

    def _emit_linear(self, op: Op):
        kpath, w = self._param(op, "kernel")      # (K, N)
        x_prod = op.inputs[0]
        xn = self._in_name(x_prod)
        if len(x_prod.shape) == 4:
            # folded pre-dense flatten: emit Flatten (CHW order) and
            # permute W rows from JAX's HWC order to CHW
            B, H, W_, C = x_prod.shape
            wt = w.reshape(H, W_, C, -1).transpose(2, 0, 1, 3) \
                .reshape(C * H * W_, -1)
            mid = self._aux(op.name)
            self.nodes.append(_node("Flatten", [xn], [mid], mid,
                                    {"axis": 1}))
            xn = mid
            w = wt
        wname = self._init(kpath, np.asarray(w, np.float32))
        ins = [xn, wname]
        if "bias" in op.param_products:
            bpath, b = self._param(op, "bias")
            ins.append(self._init(bpath, np.asarray(b, np.float32)))
        self.nodes.append(_node("Gemm", ins, [op.name], op.name,
                                {"alpha": 1.0, "beta": 1.0, "transB": 0}))


def export_onnx(graph: ConnectedGraph, params, path: str, *,
                producer: str = "aimet_tpu", opset: int = 13,
                model_name: str = "aimet_tpu_model") -> Dict[str, str]:
    """Serialize the traced graph as an ONNX ModelProto (NCHW layout).

    Returns {our tensor/op name: onnx tensor name} (identity map — names
    ARE the encodings keys, the reference's op_to_io_tensor_map role).
    """
    ex = _Exporter(graph, params)

    # graph inputs (data args after the params pytree)
    in_infos = []
    for i, var in enumerate(graph.input_vars):
        name = f"model_input_{i}"
        ex.names[id(var)] = name
        shape = tuple(var.aval.shape)
        in_infos.append(_value_info(name, _nchw(shape)))

    for op in graph.ops:
        ex.emit(op)

    out_infos = []
    outs = [graph.resolve_var(v) for v in graph.jaxpr.outvars
            if not isinstance(v, jax.extend.core.Literal)]
    for ov in outs:
        name = ex.names.get(id(ov))
        if name is None:
            raise NotImplementedError("onnx export: unnamed graph output")
        out_infos.append(_value_info(name, _nchw(tuple(ov.aval.shape))))

    g = b"".join(_msg(1, n) for n in ex.nodes)
    g += _str(2, model_name)
    g += b"".join(_msg(5, t) for t in ex.inits)
    g += b"".join(_msg(11, vi) for vi in in_infos)
    g += b"".join(_msg(12, vi) for vi in out_infos)

    model = _int(1, 8)                     # ir_version
    model += _str(2, producer)
    model += _msg(7, g)
    model += _msg(8, _str(1, "") + _int(2, opset))   # opset_import

    with open(path, "wb") as f:
        f.write(model)
    return {n: n for n in
            [f"model_input_{i}" for i in range(len(in_infos))]
            + [op.name for op in graph.ops]}


def build_model_bytes(nodes, initializers, inputs, outputs, *,
                      producer: str = "aimet_tpu", opset: int = 13,
                      model_name: str = "handbuilt") -> bytes:
    """Assemble an ONNX ModelProto from explicit pieces — for constructing
    third-party-style graphs (transformer blocks, unfolded RNN stages)
    that exercise the on-ramp without the `onnx` package.

    nodes: [(op_type, inputs, outputs, name, attrs)] tuples;
    initializers: {name: np.ndarray}; inputs/outputs: [(name, shape)].
    """
    node_bytes = [_node(op, list(i), list(o), nm, at or None)
                  for op, i, o, nm, at in nodes]
    g = b"".join(_msg(1, n) for n in node_bytes)
    g += _str(2, model_name)
    g += b"".join(_msg(5, _tensor(n, np.ascontiguousarray(a)))
                  for n, a in initializers.items())
    g += b"".join(_msg(11, _value_info(n, s)) for n, s in inputs)
    g += b"".join(_msg(12, _value_info(n, s)) for n, s in outputs)
    model = _int(1, 8)
    model += _str(2, producer)
    model += _msg(7, g)
    model += _msg(8, _str(1, "") + _int(2, opset))
    return model


def export_quantsim_onnx(sim, params, path: str, prefix: str) -> str:
    """The reference's full export artifact (v1/quantsim.py:486 export):
    ``<prefix>.onnx`` + ``<prefix>.encodings`` whose activation keys are
    the ONNX node/tensor names and whose param keys are the initializer
    names — a QNN-style toolchain can ingest the pair directly."""
    import json
    import os

    onnx_path = os.path.join(path, f"{prefix}.onnx")
    export_onnx(sim.graph, params, onnx_path)
    with open(os.path.join(path, f"{prefix}.encodings"), "w") as f:
        json.dump(sim.export_encodings(), f, indent=2, sort_keys=True)
    return onnx_path
