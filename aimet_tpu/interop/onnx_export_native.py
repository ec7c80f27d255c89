"""Native-layout ONNX export: serialize an arbitrary traced JAX function
eqn-by-eqn (no NHWC->NCHW relayout, no op-level pattern grouping).

The ConnectedGraph exporter (onnx_export.py) produces image-toolchain
NCHW graphs for CNNs; this module is its universal sibling for
transformer/sequence graphs (VERDICT r4 next #8: export->reload
round-trip for the transformer block). It walks the closed jaxpr
directly:

  * call-like primitives (pjit/closed_call/remat/custom_jvp) are inlined
    recursively;
  * any eqn whose inputs are all compile-time constants is FOLDED by
    executing it (iota/lt/broadcast causal masks, rope tables, eps
    literals... become initializers);
  * dot_general is emitted generally as Transpose+Reshape around a
    batched MatMul (any batch/contract dims);
  * shape ops (reshape/transpose/broadcast_in_dim/squeeze/slice/concat)
    map 1:1 to Reshape/Transpose/Expand/Slice/Concat;
  * elementwise prims map to their ONNX twins.

Tensors keep the exact traced layout, so a consuming runtime reproduces
the JAX function bit-for-bit (modulo float accumulation order).
Reference role: aimet_onnx exports via torch.onnx.export
(TrainingExtensions/onnx/.../quantsim.py); here the traced jaxpr IS the
source of truth.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax import tree_util as jtu
from jax.extend.core import Literal

from .onnx_export import (_int, _msg, _node, _str, _tensor, _value_info,
                          F32, I64)

_CALL_PRIMS = {"jit", "pjit", "closed_call", "core_call", "remat",
               "checkpoint", "custom_jvp_call", "custom_vjp_call"}

_UNARY = {
    "neg": "Neg", "exp": "Exp", "log": "Log", "tanh": "Tanh",
    "sqrt": "Sqrt", "abs": "Abs", "floor": "Floor", "ceil": "Ceil",
    "round": "Round", "logistic": "Sigmoid", "erf": "Erf",
    "sign": "Sign", "stop_gradient": "Identity", "copy": "Identity",
}
_BINARY = {
    "add": "Add", "sub": "Sub", "mul": "Mul", "div": "Div",
    "max": "Max", "min": "Min", "pow": "Pow",
    "lt": "Less", "le": "LessOrEqual", "gt": "Greater",
    "ge": "GreaterOrEqual", "eq": "Equal", "and": "And", "or": "Or",
    "xor": "Xor",
}
_REDUCE = {"reduce_sum": "ReduceSum", "reduce_max": "ReduceMax",
           "reduce_min": "ReduceMin", "reduce_prod": "ReduceProd"}


class _Native:
    def __init__(self):
        self.nodes: List[bytes] = []
        self.inits: Dict[str, bytes] = {}
        self.env: Dict[int, Tuple[str, Any]] = {}   # id(var) -> (name, const)
        self.counter = 0

    def fresh(self, base="t") -> str:
        self.counter += 1
        return f"{base}_{self.counter}"

    # -- value plumbing ----------------------------------------------------
    def set_var(self, var, name: Optional[str], const=None):
        self.env[id(var)] = (name, const)

    def lookup(self, v):
        """var/Literal -> (name_or_None, const_or_None)."""
        if isinstance(v, Literal):
            return None, np.asarray(v.val)
        got = self.env.get(id(v))
        if got is None:
            raise NotImplementedError(f"onnx native export: unbound var {v}")
        return got

    def const_of(self, v):
        return self.lookup(v)[1]

    def name_of(self, v, hint="c") -> str:
        """Tensor name for an operand, materializing consts as inits."""
        name, const = self.lookup(v)
        if name is not None:
            return name
        arr = np.asarray(const)
        if arr.dtype in (np.float64,):
            arr = arr.astype(np.float32)
        if arr.dtype in (np.int64,):
            pass
        name = self.fresh(hint)
        self.inits[name] = _tensor(name, arr)
        return name

    def emit(self, op_type, ins, outs, attrs=None):
        nm = outs[0]
        self.nodes.append(_node(op_type, ins, outs, nm + "__n", attrs))

    def shape_init(self, shape) -> str:
        name = self.fresh("shape")
        self.inits[name] = _tensor(name, np.asarray(shape, np.int64))
        return name

    # -- eqn dispatch ------------------------------------------------------
    def walk(self, jaxpr, consts):
        for cv, cval in zip(jaxpr.constvars, consts):
            self.set_var(cv, None, np.asarray(cval))
        for eqn in jaxpr.eqns:
            self.eqn(eqn)

    def _inline(self, eqn):
        prim = eqn.primitive.name
        if prim in ("custom_jvp_call", "custom_vjp_call"):
            closed = eqn.params["call_jaxpr"]
            body, consts = closed.jaxpr, closed.consts
        else:
            closed = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            if hasattr(closed, "jaxpr"):
                body, consts = closed.jaxpr, closed.consts
            else:
                body, consts = closed, ()
        n_explicit = len(body.invars)
        ins = eqn.invars[len(eqn.invars) - n_explicit:]
        for bv, ov in zip(body.invars, ins):
            name, const = self.lookup(ov)
            self.set_var(bv, name, const)
        self.walk(body, consts)
        for ov, bv in zip(eqn.outvars, body.outvars):
            name, const = self.lookup(bv)
            self.set_var(ov, name, const)

    def _try_fold(self, eqn) -> bool:
        """If every input is a known constant, run the eqn and record the
        outputs as constants (masks, rope tables, iota chains...). iota
        has no inputs, so it always folds."""
        vals = []
        for v in eqn.invars:
            _, const = self.lookup(v) if not isinstance(v, Literal) \
                else (None, np.asarray(v.val))
            if const is None:
                return False
            vals.append(const)
        try:
            out = eqn.primitive.bind(
                *[jax.numpy.asarray(v) for v in vals], **eqn.params)
        except Exception:
            return False
        outs = out if eqn.primitive.multiple_results else [out]
        for ov, o in zip(eqn.outvars, outs):
            self.set_var(ov, None, np.asarray(o))
        return True

    def eqn(self, eqn):
        prim = eqn.primitive.name
        if prim in _CALL_PRIMS:
            self._inline(eqn)
            return
        if self._try_fold(eqn):
            return
        out = eqn.outvars[0]
        out_name = self.fresh(prim)
        self.set_var(out, out_name)
        p = eqn.params

        if prim in _UNARY:
            self.emit(_UNARY[prim], [self.name_of(eqn.invars[0])],
                      [out_name])
        elif prim == "square":
            x = self.name_of(eqn.invars[0])
            self.emit("Mul", [x, x], [out_name])
        elif prim == "rsqrt":
            mid = self.fresh("sqrt")
            self.emit("Sqrt", [self.name_of(eqn.invars[0])], [mid])
            self.emit("Reciprocal", [mid], [out_name])
        elif prim in _BINARY:
            self.emit(_BINARY[prim],
                      [self.name_of(v) for v in eqn.invars], [out_name])
        elif prim == "integer_pow":
            y = int(p["y"])
            x = self.name_of(eqn.invars[0])
            if y == 2:
                self.emit("Mul", [x, x], [out_name])
            elif y == -1:
                self.emit("Reciprocal", [x], [out_name])
            else:
                e = self.fresh("exp")
                self.inits[e] = _tensor(e, np.float32(y))
                self.emit("Pow", [x, e], [out_name])
        elif prim == "select_n":
            if len(eqn.invars) != 3:
                raise NotImplementedError("select_n with >2 cases")
            pred, on_false, on_true = eqn.invars
            # jax select_n picks cases[pred]: index 1 = true branch; ONNX
            # Where(cond, X, Y) yields X where cond — so X = on_true
            self.emit("Where", [self.name_of(pred),
                                self.name_of(on_true),
                                self.name_of(on_false)], [out_name])
        elif prim == "reshape":
            self.emit("Reshape", [self.name_of(eqn.invars[0]),
                                  self.shape_init(out.aval.shape)],
                      [out_name])
        elif prim == "squeeze":
            self.emit("Reshape", [self.name_of(eqn.invars[0]),
                                  self.shape_init(out.aval.shape)],
                      [out_name])
        elif prim == "expand_dims":
            self.emit("Reshape", [self.name_of(eqn.invars[0]),
                                  self.shape_init(out.aval.shape)],
                      [out_name])
        elif prim == "transpose":
            self.emit("Transpose", [self.name_of(eqn.invars[0])],
                      [out_name], {"perm": [int(d) for d in
                                            p["permutation"]]})
        elif prim == "broadcast_in_dim":
            in_aval = eqn.invars[0].aval
            tgt = out.aval.shape
            bdims = p["broadcast_dimensions"]
            interm = [1] * len(tgt)
            for src_d, dst_d in enumerate(bdims):
                interm[dst_d] = in_aval.shape[src_d]
            x = self.name_of(eqn.invars[0])
            if tuple(interm) != tuple(in_aval.shape):
                mid = self.fresh("rs")
                self.emit("Reshape", [x, self.shape_init(interm)], [mid])
                x = mid
            if tuple(interm) == tuple(tgt):
                self.emit("Identity", [x], [out_name])
            else:
                self.emit("Expand", [x, self.shape_init(tgt)], [out_name])
        elif prim == "concatenate":
            self.emit("Concat", [self.name_of(v) for v in eqn.invars],
                      [out_name], {"axis": int(p["dimension"])})
        elif prim == "slice":
            starts = [int(s) for s in p["start_indices"]]
            ends = [int(e) for e in p["limit_indices"]]
            strides = [int(s) for s in (p["strides"] or
                                        [1] * len(starts))]
            axes = list(range(len(starts)))
            self.emit("Slice", [self.name_of(eqn.invars[0]),
                                self.shape_init(starts),
                                self.shape_init(ends),
                                self.shape_init(axes),
                                self.shape_init(strides)], [out_name])
        elif prim == "rev":
            dims = [int(d) for d in p["dimensions"]]
            shape = eqn.invars[0].aval.shape
            starts = self.shape_init([shape[d] - 1 for d in dims])
            ends = self.shape_init([np.iinfo(np.int64).min + 1
                                    for _ in dims])
            axes = self.shape_init(dims)
            steps = self.shape_init([-1] * len(dims))
            self.emit("Slice", [self.name_of(eqn.invars[0]), starts, ends,
                                axes, steps], [out_name])
        elif prim == "convert_element_type":
            dt_map = {np.dtype(np.float32): 1, np.dtype(np.int64): 7,
                      np.dtype(np.int32): 6, np.dtype(np.bool_): 9,
                      np.dtype(np.int8): 3, np.dtype(np.float16): 10,
                      np.dtype(np.float64): 11,
                      np.dtype(jax.numpy.bfloat16): 16}
            to = dt_map.get(np.dtype(p["new_dtype"]))
            if to is None:
                raise NotImplementedError(
                    f"Cast to {p['new_dtype']} (use f32 params for export)")
            self.emit("Cast", [self.name_of(eqn.invars[0])], [out_name],
                      {"to": to})
        elif prim in _REDUCE:
            axes = [int(a) for a in p["axes"]]
            self.emit(_REDUCE[prim],
                      [self.name_of(eqn.invars[0]),
                       self.shape_init(axes)],
                      [out_name], {"keepdims": 0})
        elif prim == "argmax":
            axes = p["axes"]
            self.emit("ArgMax", [self.name_of(eqn.invars[0])], [out_name],
                      {"axis": int(axes[0]), "keepdims": 0})
        elif prim == "dot_general":
            self._dot_general(eqn, out_name)
        elif prim == "exp2":
            two = self.fresh("two")
            self.inits[two] = _tensor(two, np.float32(2.0))
            self.emit("Pow", [two, self.name_of(eqn.invars[0])],
                      [out_name])
        elif prim == "gather":
            self._gather(eqn, out_name)
        elif prim == "clamp":
            lo, x, hi = eqn.invars
            self.emit("Clip", [self.name_of(x), self.name_of(lo),
                               self.name_of(hi)], [out_name])
        else:
            raise NotImplementedError(
                f"onnx native export: primitive {prim!r}")

    def _dot_general(self, eqn, out_name):
        (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
        lhs, rhs = eqn.invars
        ls, rs = lhs.aval.shape, rhs.aval.shape
        lfree = [d for d in range(len(ls)) if d not in lc and d not in lb]
        rfree = [d for d in range(len(rs)) if d not in rc and d not in rb]
        bshape = [ls[d] for d in lb]
        m = int(np.prod([ls[d] for d in lfree], initial=1))
        k = int(np.prod([ls[d] for d in lc], initial=1))
        n = int(np.prod([rs[d] for d in rfree], initial=1))

        def prep(v, perm, newshape, hint):
            x = self.name_of(v, hint)
            if list(perm) != list(range(len(perm))):
                mid = self.fresh(hint + "_t")
                self.emit("Transpose", [x], [mid],
                          {"perm": [int(d) for d in perm]})
                x = mid
            mid = self.fresh(hint + "_r")
            self.emit("Reshape", [x, self.shape_init(newshape)], [mid])
            return mid

        ln = prep(lhs, list(lb) + lfree + list(lc), bshape + [m, k], "dg_l")
        rn = prep(rhs, list(rb) + list(rc) + rfree, bshape + [k, n], "dg_r")
        mm = self.fresh("dg_mm")
        self.emit("MatMul", [ln, rn], [mm])
        out_shape = bshape + [ls[d] for d in lfree] + [rs[d] for d in rfree]
        self.emit("Reshape", [mm, self.shape_init(out_shape)], [out_name])

    def _gather(self, eqn, out_name):
        """Axis-take form of lax.gather -> ONNX Gather(axis=d):
        jnp.take(x, idx, axis=d) traces to one collapsed slice dim d with
        full slice sizes elsewhere and idx shaped (..., 1); the output has
        the index batch dims sitting exactly where operand dim d was.
        Covers embedding lookups (d=0) and rope rotate-half gathers
        (d=last)."""
        p = eqn.params
        dnums = p["dimension_numbers"]
        operand, indices = eqn.invars
        oshape = operand.aval.shape
        ishape = indices.aval.shape
        ss = tuple(p["slice_sizes"])
        if (len(dnums.collapsed_slice_dims) == 1
                and tuple(dnums.start_index_map)
                == tuple(dnums.collapsed_slice_dims)
                and not getattr(dnums, "operand_batching_dims", ())
                and ishape and ishape[-1] == 1):
            d = dnums.collapsed_slice_dims[0]
            full_elsewhere = all(
                (s == 1 if i == d else s == oshape[i])
                for i, s in enumerate(ss))
            b = len(ishape) - 1
            out_rank = len(oshape) - 1 + b
            want_offsets = tuple(range(0, d)) + tuple(range(d + b, out_rank))
            if full_elsewhere and tuple(dnums.offset_dims) == want_offsets:
                idx = self.name_of(indices)
                mid = self.fresh("gix")
                self.emit("Reshape", [idx, self.shape_init(ishape[:-1])],
                          [mid])
                self.emit("Gather", [self.name_of(operand), mid],
                          [out_name], {"axis": int(d)})
                return
        raise NotImplementedError("gather form not supported for export")


def export_onnx_native(fn, params, example_args: Sequence[Any], path: str,
                       *, producer: str = "aimet_tpu", opset: int = 13,
                       model_name: str = "aimet_tpu_native") -> Dict[str, str]:
    """Export ``fn(params, *example_args)`` as an ONNX ModelProto in the
    traced (native) layout. Returns {param leaf path: initializer name}.
    """
    closed = jax.make_jaxpr(fn)(params, *example_args)
    jaxpr = closed.jaxpr

    ex = _Native()
    # invars: params leaves first (initializers), then data args (inputs)
    pleaves = jtu.tree_flatten_with_path(params)[0]
    n_p = len(pleaves)
    names = {}
    for (kp, leaf), var in zip(pleaves, jaxpr.invars[:n_p]):
        name = jtu.keystr(kp)
        arr = np.asarray(leaf)
        if arr.dtype == np.float64:
            arr = arr.astype(np.float32)
        ex.inits[name] = _tensor(name, arr)
        ex.set_var(var, name)
        names[name] = name
    in_infos = []
    for i, var in enumerate(jaxpr.invars[n_p:]):
        nm = f"model_input_{i}"
        ex.set_var(var, nm)
        dt_map = {np.dtype(np.float32): F32, np.dtype(np.int32): 6,
                  np.dtype(np.int64): I64}
        in_infos.append(_value_info(nm, tuple(var.aval.shape),
                                    dt_map.get(np.dtype(var.aval.dtype),
                                               F32)))

    ex.walk(jaxpr, closed.consts)

    out_infos = []
    out_names = []
    for ov in jaxpr.outvars:
        name, const = (None, np.asarray(ov.val)) if isinstance(ov, Literal) \
            else ex.lookup(ov)
        if name is None:
            name = ex.name_of(ov, "const_out")
            mid = ex.fresh("out")
            ex.emit("Identity", [name], [mid])
            name = mid
        out_names.append(name)
        out_infos.append(_value_info(name, tuple(ov.aval.shape)))

    g = b"".join(_msg(1, n) for n in ex.nodes)
    g += _str(2, model_name)
    g += b"".join(_msg(5, t) for t in ex.inits.values())
    g += b"".join(_msg(11, vi) for vi in in_infos)
    g += b"".join(_msg(12, vi) for vi in out_infos)
    model = _int(1, 8)
    model += _str(2, producer)
    model += _msg(7, g)
    model += _msg(8, _str(1, "") + _int(2, opset))
    with open(path, "wb") as f:
        f.write(model)
    return names
