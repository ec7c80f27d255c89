"""ConnectedGraph: an op/product IR built by tracing a JAX function's jaxpr.

TPU-native equivalent of the reference's torch.jit.trace-based ConnectedGraph
(aimet_torch/meta/connectedgraph.py:135-446) and the framework-agnostic IR
(aimet_common/connected_graph/{connectedgraph,operation,product}.py) — but
instead of parsing a TorchScript trace, we trace the jaxpr (free in JAX) and
reconstruct module-level ops by dataflow classification + peephole grouping:

  - every jaxpr var is classified *param-derived* (computed only from model
    parameters/constants) or *data-derived*;
  - weight-preprocessing eqns (producing param-derived values, e.g. BN's
    scale/rsqrt computation) are not graph ops;
  - bias-adds fold into their conv/dense producer; BatchNorm's elementwise
    expansion collapses into one ``batchnorm`` op; jax.nn.softmax's 5-eqn tail
    collapses into one ``softmax`` op; avg-pool's reduce_window+div pair
    collapses into ``avgpool``; ``custom_jvp_call`` is classified by its inner
    jaxpr (relu/sigmoid/tanh/...);
  - shape-only ops (reshape/transpose/broadcast/...) are pass-through and
    never receive quantizers.

Control flow (new in round 2, closing the reference's recurrent coverage —
qc_quantize_recurrent.py:122-880): ``lax.scan`` / ``lax.while_loop`` /
``lax.cond`` body jaxprs are recursively built into *inner ops* whose names
are prefixed by the enclosing op (``scan_0/linear_1``).  The quantsim
interpreter threads observer state through the loop carry so per-timestep
quantizers calibrate inside one fused XLA loop.  ``pjit`` / ``closed_call``
/ ``remat`` bodies are inlined transparently into the enclosing scope (they
have no loop semantics), and a ``custom_jvp/vjp`` whose body hides a
conv/dot is inlined as well (with the caveat that the custom derivative rule
is replaced by differentiation through the primal body).

The result is a graph whose ops correspond 1:1 with the reference's wrapped
modules, which is what the quantsim config system (supergroups, op_type
rules) pattern-matches against.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import tree_util as jtu
from jax.extend.core import Literal

# Primitives that never get quantizers and are transparent for pattern search.
PASSTHROUGH_PRIMS = {
    "reshape", "transpose", "broadcast_in_dim", "squeeze", "expand_dims",
    "slice", "dynamic_slice", "rev", "stop_gradient", "convert_element_type",
    "copy", "device_put", "pad",
}

# Elementwise primitives that may appear in BN-style affine chains.
ELEMENTWISE_PRIMS = {"add", "sub", "mul", "div", "max", "min"}

# Raw-primitive activations.
ACT_PRIMS = {"tanh": "tanh", "logistic": "sigmoid", "exp": "exp"}

# Call-like primitives whose bodies are inlined into the enclosing scope.
CALL_PRIMS = {"jit", "pjit", "closed_call", "core_call", "remat", "checkpoint"}

# Control-flow primitives whose bodies become nested sub-graphs.
LOOP_PRIMS = {"scan", "while", "cond"}

# Primitives that demand quantsim interception when hidden in a sub-jaxpr.
QUANTIZABLE_PRIMS = {"conv_general_dilated", "dot_general"}


@dataclasses.dataclass
class Product:
    """A tensor edge in the graph (jaxpr var)."""
    var: Any
    name: str
    shape: Tuple[int, ...]
    dtype: Any
    kind: str                      # 'input' | 'param' | 'activation'
    param_path: Optional[str] = None
    producer: Optional["Op"] = None
    consumers: List["Op"] = dataclasses.field(default_factory=list)
    is_model_output: bool = False


@dataclasses.dataclass
class Op:
    """A module-level operation (possibly grouping several jaxpr eqns)."""
    index: int
    type: str
    name: str
    eqns: List[Any]
    inputs: List[Product]                  # data inputs
    output: Product                        # primary data output
    param_products: Dict[str, Product] = dataclasses.field(default_factory=dict)
    attrs: Dict[str, Any] = dataclasses.field(default_factory=dict)
    scope: Optional[str] = None            # enclosing scan/while/cond op name

    @property
    def input_ops(self) -> List["Op"]:
        return [p.producer for p in self.inputs if p.producer is not None]

    @property
    def output_ops(self) -> List["Op"]:
        return list(self.output.consumers)

    def __repr__(self):
        return f"Op({self.name}: {self.type})"


def _flat_prims(jaxpr, out=None):
    """Recursively collect primitive names, descending into call-like eqns."""
    if out is None:
        out = []
    for e in jaxpr.eqns:
        descended = False
        for key in ("call_jaxpr", "jaxpr", "cond_jaxpr", "body_jaxpr"):
            ij = e.params.get(key) if hasattr(e, "params") else None
            if ij is not None:
                _flat_prims(ij.jaxpr if hasattr(ij, "jaxpr") else ij, out)
                descended = True
        if hasattr(e, "params") and "branches" in e.params:
            for b in e.params["branches"]:
                _flat_prims(b.jaxpr if hasattr(b, "jaxpr") else b, out)
            descended = True
        if not descended:
            out.append(e.primitive.name)
    return out


def _classify_custom_jvp(eqn) -> str:
    """Name the activation inside a custom_jvp_call by its inner jaxpr."""
    inner = eqn.params.get("call_jaxpr")
    if inner is None:
        return "custom_jvp"
    prims = _flat_prims(inner.jaxpr)
    pset = set(prims)
    if pset <= {"max", "broadcast_in_dim"}:
        return "relu"
    if "logistic" in pset and "mul" in pset:
        return "silu"
    if pset <= {"logistic"}:
        return "sigmoid"
    if "erf" in pset or "erfc" in pset:
        return "gelu"
    if "tanh" in pset and len(pset) == 1:
        return "tanh"
    if "tanh" in pset:
        return "gelu"  # tanh-approx gelu
    if pset <= {"abs", "add", "div", "mul", "sub"}:
        return "softsign"
    return "custom_jvp"


def _call_body(eqn):
    """(jaxpr, consts) of a call-like eqn's body, or None."""
    name = eqn.primitive.name
    if name in ("custom_jvp_call", "custom_vjp_call"):
        closed = eqn.params["call_jaxpr"]
        return closed.jaxpr, closed.consts
    if name in ("jit", "pjit", "closed_call", "core_call"):
        closed = eqn.params["jaxpr"]
        if hasattr(closed, "jaxpr"):
            return closed.jaxpr, closed.consts
        return closed, []
    if name in ("remat", "checkpoint"):
        return eqn.params["jaxpr"], []
    return None


class ConnectedGraph:
    """Graph IR over a traced function ``fn(params, *inputs)``.

    ``params`` is a pytree (argument 0 by convention); its leaves become
    ``Product``s of kind 'param' named by their tree path; remaining
    positional args' leaves become model inputs.
    """

    def __init__(self, fn, example_args, params_argnum: int = 0):
        self.fn = fn
        self.closed_jaxpr = jax.make_jaxpr(fn)(*example_args)
        self.jaxpr = self.closed_jaxpr.jaxpr
        self.consts = self.closed_jaxpr.consts

        # Map flattened invars to names via the example args' tree paths.
        flat_with_paths = []
        for argi, arg in enumerate(example_args):
            leaves = jtu.tree_flatten_with_path(arg)[0]
            for path, leaf in leaves:
                flat_with_paths.append((argi, jtu.keystr(path), leaf))
        assert len(flat_with_paths) == len(self.jaxpr.invars), (
            f"flattened args ({len(flat_with_paths)}) != jaxpr invars "
            f"({len(self.jaxpr.invars)})")

        self.products: Dict[int, Product] = {}
        self.param_var_paths: Dict[int, str] = {}
        self.input_vars: List[Any] = []
        self._param_leaf_index: Dict[str, int] = {}

        for (argi, path, leaf), var in zip(flat_with_paths, self.jaxpr.invars):
            if argi == params_argnum:
                kind, name = "param", path
                self.param_var_paths[id(var)] = path
                self._param_leaf_index[path] = len(self._param_leaf_index)
            else:
                kind, name = "input", f"input{argi}{path}"
                self.input_vars.append(var)
            self.products[id(var)] = Product(
                var=var, name=name, shape=tuple(var.aval.shape),
                dtype=var.aval.dtype, kind=kind,
                param_path=path if kind == "param" else None)

        self._build()

    # ------------------------------------------------------------------
    # Shared-state helpers (used across nested scopes)
    # ------------------------------------------------------------------
    def _is_param_only(self, v):
        return not hasattr(v, "aval") or isinstance(v, Literal) \
            or self._param_only.get(id(v), False)

    def _roots_of(self, v):
        if isinstance(v, Literal):
            return set()
        return self._param_roots.get(id(v), set())

    def resolve_var(self, v):
        """Follow pass-through aliases to the semantic var."""
        while id(v) in self.alias:
            v = self.alias[id(v)]
        return v

    def _get_product(self, v, kind_hint="activation"):
        v = self.resolve_var(v)
        if id(v) not in self.products:
            self.products[id(v)] = Product(
                var=v, name=f"act_{len(self.products)}",
                shape=tuple(v.aval.shape), dtype=v.aval.dtype,
                kind=kind_hint)
        return self.products[id(v)]

    def _direct_param_leaf(self, v):
        """If v is a (chain of) reshape/broadcast of a single param invar
        (possibly across a scan/while const or xs boundary), return that
        param Product, else None."""
        seen = 0
        while True:
            if id(v) in self.param_var_paths:
                return self.products[id(v)]
            if id(v) in self._invar_link:
                v = self._invar_link[id(v)]
                continue
            e = self._producer_eqn.get(id(v))
            if e is None or e.primitive.name not in PASSTHROUGH_PRIMS:
                return None
            v = e.invars[0]
            seen += 1
            if seen > 6:
                return None

    def _new_op(self, op_type, eqns, data_in_vars, out_var, counters,
                prefix, params=None, attrs=None):
        n = counters.get(op_type, 0)
        counters[op_type] = n + 1
        inputs = [self._get_product(v) for v in data_in_vars
                  if not isinstance(v, Literal)]
        out_p = self._get_product(out_var)
        op = Op(index=len(self.ops), type=op_type,
                name=f"{prefix}{op_type}_{n}",
                eqns=list(eqns), inputs=inputs, output=out_p,
                param_products=params or {}, attrs=attrs or {},
                scope=self._scope_stack[-1] if self._scope_stack else None)
        out_p.producer = op
        out_p.name = f"{op.name}.out"
        for p in inputs:
            p.consumers.append(op)
        self.ops.append(op)
        for sink in self._sink_stack:
            sink.append(op)
        return op

    # ------------------------------------------------------------------
    def _build(self):
        jaxpr = self.jaxpr
        self._param_only: Dict[int, bool] = {}
        self._param_roots: Dict[int, set] = {}
        self._producer_eqn: Dict[int, Any] = {}
        self._invar_link: Dict[int, Any] = {}  # body invar -> outer var
        self.alias: Dict[int, Any] = {}
        self.ops: List[Op] = []
        self._consumed: set = set()
        self._scope_stack: List[str] = []
        self._sink_stack: List[List[Op]] = []
        # id(eqn) -> {"kind": 'scan'|'while'|'cond'|'call', "inner_ops": [...]}
        self.subgraph_eqns: Dict[int, Dict[str, Any]] = {}
        # JAX caches traced sub-jaxprs: two call sites of e.g. jax.nn.silu
        # share ONE body jaxpr object.  Each body is classified/built once;
        # later sites reuse its inner ops, i.e. the sites SHARE quantizers —
        # the reference behaves identically when a module instance is
        # reused (its wrapper's quantizers see every call site).
        self._classified_bodies: set = set()
        self._built_bodies: Dict[int, List[Op]] = {}

        for var in jaxpr.invars:
            is_p = id(var) in self.param_var_paths
            self._param_only[id(var)] = is_p
            self._param_roots[id(var)] = (
                {self.param_var_paths[id(var)]} if is_p else set())
        for var in jaxpr.constvars:
            self._param_only[id(var)] = True
            self._param_roots[id(var)] = set()

        self._classify_scope(jaxpr)
        self._build_scope(jaxpr, prefix="", counters={})

        # mark model outputs
        out_ids = {id(self.resolve_var(v)) for v in jaxpr.outvars
                   if not isinstance(v, Literal)}
        for p in self.products.values():
            if id(p.var) in out_ids:
                p.is_model_output = True

    def _classify_eqn(self, eqn):
        all_param = all(self._is_param_only(v) for v in eqn.invars)
        roots = set()
        for v in eqn.invars:
            if self._is_param_only(v):
                roots |= self._roots_of(v)
        for ov in eqn.outvars:
            if isinstance(ov, Literal):
                continue
            self._param_only[id(ov)] = all_param
            self._param_roots[id(ov)] = roots

    def _classify_scope(self, jaxpr):
        """Classification prepass over one scope (recursing into bodies) —
        runs to completion before any building, because the peephole
        grouping (BN affine chains, bias folds) looks *ahead* at later
        eqns' operand classes."""
        for eqn in jaxpr.eqns:
            prim = eqn.primitive.name
            self._classify_eqn(eqn)
            if prim in LOOP_PRIMS:
                if all(self._is_param_only(v) for v in eqn.invars):
                    continue  # pure param-preprocessing loop: never built
                if prim == "scan":
                    closed = eqn.params["jaxpr"]
                    if not self._mark_classified(closed.jaxpr):
                        continue
                    nc = eqn.params["num_consts"]
                    nk = eqn.params["num_carry"]
                    for i, bv in enumerate(closed.jaxpr.invars):
                        self._seed_body_invar(bv, eqn.invars[i],
                                              as_data=nc <= i < nc + nk)
                    self._seed_constvars(closed.jaxpr)
                    self._classify_scope(closed.jaxpr)
                elif prim == "while":
                    bj = eqn.params["body_jaxpr"]
                    if not self._mark_classified(bj.jaxpr):
                        continue
                    cn = eqn.params["cond_nconsts"]
                    bn = eqn.params["body_nconsts"]
                    for i, bv in enumerate(bj.jaxpr.invars):
                        self._seed_body_invar(bv, eqn.invars[cn + i],
                                              as_data=(i >= bn))
                    self._seed_constvars(bj.jaxpr)
                    self._classify_scope(bj.jaxpr)
                else:  # cond
                    for closed in eqn.params["branches"]:
                        if not self._mark_classified(closed.jaxpr):
                            continue
                        for bv, ov in zip(closed.jaxpr.invars,
                                          eqn.invars[1:]):
                            self._seed_body_invar(bv, ov)
                        self._seed_constvars(closed.jaxpr)
                        self._classify_scope(closed.jaxpr)
                continue
            body_consts = _call_body(eqn)
            if body_consts is None:
                continue
            body, _ = body_consts
            if prim in ("custom_jvp_call", "custom_vjp_call") \
                    and not (set(_flat_prims(body)) & QUANTIZABLE_PRIMS):
                continue  # classified as an activation op, not inlined
            if self._mark_classified(body):
                for bv, ov in zip(body.invars, eqn.invars):
                    self._seed_body_invar(bv, ov)
                self._seed_constvars(body)
                self._classify_scope(body)
            for ov, bv in zip(eqn.outvars, body.outvars):
                if isinstance(ov, Literal):
                    continue
                if isinstance(bv, Literal):
                    self._param_only[id(ov)] = True
                    self._param_roots[id(ov)] = set()
                else:
                    self._param_only[id(ov)] = self._param_only.get(
                        id(bv), False)
                    self._param_roots[id(ov)] = self._roots_of(bv)

    def _seed_body_invar(self, body_var, outer_var, as_data=False):
        """Classify a sub-jaxpr invar from the outer operand feeding it."""
        if isinstance(outer_var, Literal):
            self._param_only[id(body_var)] = True
            self._param_roots[id(body_var)] = set()
            return
        self._invar_link[id(body_var)] = outer_var
        if as_data:
            self._param_only[id(body_var)] = False
            self._param_roots[id(body_var)] = set()
        else:
            self._param_only[id(body_var)] = self._param_only.get(
                id(outer_var), False)
            self._param_roots[id(body_var)] = self._roots_of(outer_var)

    def _seed_constvars(self, body):
        for cv in body.constvars:
            self._param_only[id(cv)] = True
            self._param_roots[id(cv)] = set()

    def _mark_classified(self, body) -> bool:
        """True if this body jaxpr still needs classification (first site)."""
        if id(body) in self._classified_bodies:
            return False
        self._classified_bodies.add(id(body))
        return True

    def _inline_call(self, eqn, prefix, counters):
        """Inline a call-like eqn's body into the current scope."""
        body, _consts = _call_body(eqn)
        existing = self._built_bodies.get(id(body))
        if existing is not None:
            # shared traced body (JAX jaxpr caching): reuse the first
            # site's inner ops — the call sites share quantizers, exactly
            # like the reference's reused-module wrappers
            self.subgraph_eqns[id(eqn)] = {"kind": "call",
                                           "inner_ops": existing}
            for sink in self._sink_stack:
                sink.extend(existing)
            for ov, bv in zip(eqn.outvars, body.outvars):
                if isinstance(bv, Literal):
                    self._param_only[id(ov)] = True
                    self._param_roots[id(ov)] = set()
                else:
                    self._param_only[id(ov)] = self._param_only.get(
                        id(bv), False)
                    self._param_roots[id(ov)] = self._roots_of(bv)
            return
        for bv, ov in zip(body.invars, eqn.invars):
            if isinstance(ov, Literal):
                self._param_only[id(bv)] = True
                self._param_roots[id(bv)] = set()
            else:
                # exact value correspondence: alias for product unification
                self.alias[id(bv)] = ov
                self._param_only[id(bv)] = self._param_only.get(id(ov), False)
                self._param_roots[id(bv)] = self._roots_of(ov)
        self._seed_constvars(body)
        inner_ops: List[Op] = []
        self._sink_stack.append(inner_ops)
        try:
            self._build_scope(body, prefix=prefix, counters=counters)
        finally:
            self._sink_stack.pop()
        # alias outer outvars to the body's outputs + refine classification
        for ov, bv in zip(eqn.outvars, body.outvars):
            if isinstance(bv, Literal):
                self._param_only[id(ov)] = True
                self._param_roots[id(ov)] = set()
            else:
                self.alias[id(ov)] = bv
                self._param_only[id(ov)] = self._param_only.get(id(bv), False)
                self._param_roots[id(ov)] = self._roots_of(bv)
        self.subgraph_eqns[id(eqn)] = {"kind": "call", "inner_ops": inner_ops}
        self._built_bodies[id(body)] = inner_ops

    def _build_subgraph(self, body, op_name, counters_key=None):
        """Recursively build ops for a control-flow body jaxpr.  A body
        already built at another call site is reused (shared quantizers —
        the reference's grouped recurrent quantizers across layers,
        qc_quantize_recurrent.py:191-204, behave the same way)."""
        existing = self._built_bodies.get(id(body))
        if existing is not None:
            for sink in self._sink_stack:
                sink.extend(existing)
            return existing
        inner_ops: List[Op] = []
        self._scope_stack.append(op_name)
        self._sink_stack.append(inner_ops)
        try:
            self._build_scope(body, prefix=op_name + "/", counters={})
        finally:
            self._sink_stack.pop()
            self._scope_stack.pop()
        self._built_bodies[id(body)] = inner_ops
        return inner_ops

    def _handle_scan(self, eqn, prefix, counters):
        closed = eqn.params["jaxpr"]
        body = closed.jaxpr
        nconsts = eqn.params["num_consts"]
        ncarry = eqn.params["num_carry"]
        n = counters.get("scan", 0)
        counters["scan"] = n + 1
        op_name = f"{prefix}scan_{n}"

        for i, bv in enumerate(body.invars):
            ov = eqn.invars[i]
            is_carry = nconsts <= i < nconsts + ncarry
            self._seed_body_invar(bv, ov, as_data=is_carry)
        self._seed_constvars(closed)

        inner_ops = self._build_subgraph(body, op_name)
        self.subgraph_eqns[id(eqn)] = {"kind": "scan", "inner_ops": inner_ops}

        data_ins = [v for v in eqn.invars
                    if not isinstance(v, Literal) and not self._is_param_only(v)]
        outvars = eqn.outvars
        primary = outvars[ncarry] if len(outvars) > ncarry else outvars[0]
        op = Op(index=len(self.ops), type="scan", name=op_name,
                eqns=[eqn],
                inputs=[self._get_product(v) for v in data_ins],
                output=self._get_product(primary),
                attrs={"num_consts": nconsts, "num_carry": ncarry,
                       "length": eqn.params["length"],
                       "reverse": eqn.params["reverse"]},
                scope=self._scope_stack[-1] if self._scope_stack else None)
        op.output.producer = op
        op.output.name = f"{op_name}.out"
        for p in op.inputs:
            p.consumers.append(op)
        self.ops.append(op)
        for sink in self._sink_stack:
            sink.append(op)

    def _handle_while(self, eqn, prefix, counters):
        cj = eqn.params["cond_jaxpr"]
        bj = eqn.params["body_jaxpr"]
        cn = eqn.params["cond_nconsts"]
        bn = eqn.params["body_nconsts"]
        if set(_flat_prims(cj.jaxpr)) & QUANTIZABLE_PRIMS:
            raise NotImplementedError(
                "quantsim: a lax.while_loop *condition* jaxpr contains "
                "conv/dot primitives — quantizer interception inside while "
                "conditions is not supported; move the compute into the body")
        n = counters.get("while", 0)
        counters["while"] = n + 1
        op_name = f"{prefix}while_{n}"

        body = bj.jaxpr
        for i, bv in enumerate(body.invars):
            # body invars = [body consts (bn), carry]; both map contiguously
            # onto eqn.invars starting after the cond consts
            self._seed_body_invar(bv, eqn.invars[cn + i], as_data=(i >= bn))
        self._seed_constvars(bj)

        inner_ops = self._build_subgraph(body, op_name)
        self.subgraph_eqns[id(eqn)] = {"kind": "while", "inner_ops": inner_ops}

        data_ins = [v for v in eqn.invars[cn + bn:]
                    if not isinstance(v, Literal) and not self._is_param_only(v)]
        primary = eqn.outvars[0]
        op = Op(index=len(self.ops), type="while", name=op_name, eqns=[eqn],
                inputs=[self._get_product(v) for v in data_ins],
                output=self._get_product(primary),
                attrs={"cond_nconsts": cn, "body_nconsts": bn},
                scope=self._scope_stack[-1] if self._scope_stack else None)
        op.output.producer = op
        op.output.name = f"{op_name}.out"
        for p in op.inputs:
            p.consumers.append(op)
        self.ops.append(op)
        for sink in self._sink_stack:
            sink.append(op)

    def _handle_cond(self, eqn, prefix, counters):
        branches = eqn.params["branches"]
        n = counters.get("cond", 0)
        counters["cond"] = n + 1
        op_name = f"{prefix}cond_{n}"

        inner_ops: List[Op] = []
        for bi, closed in enumerate(branches):
            body = closed.jaxpr
            for bv, ov in zip(body.invars, eqn.invars[1:]):
                self._seed_body_invar(bv, ov)
            self._seed_constvars(closed)
            inner_ops.extend(self._build_subgraph(body, f"{op_name}/b{bi}"))
        self.subgraph_eqns[id(eqn)] = {"kind": "cond", "inner_ops": inner_ops}

        data_ins = [v for v in eqn.invars[1:]
                    if not isinstance(v, Literal) and not self._is_param_only(v)]
        primary = eqn.outvars[0]
        op = Op(index=len(self.ops), type="cond", name=op_name, eqns=[eqn],
                inputs=[self._get_product(v) for v in data_ins],
                output=self._get_product(primary), attrs={},
                scope=self._scope_stack[-1] if self._scope_stack else None)
        op.output.producer = op
        op.output.name = f"{op_name}.out"
        for p in op.inputs:
            p.consumers.append(op)
        self.ops.append(op)
        for sink in self._sink_stack:
            sink.append(op)

    # ------------------------------------------------------------------
    def _build_scope(self, jaxpr, prefix: str, counters: Dict[str, int]):
        """Classify + build ops for one jaxpr scope (fused forward pass)."""
        eqn_list = list(jaxpr.eqns)
        for e in eqn_list:
            for ov in e.outvars:
                if not isinstance(ov, Literal):
                    self._producer_eqn[id(ov)] = e
        id_to_pos = {id(e): k for k, e in enumerate(eqn_list)}
        consumed = self._consumed
        resolve = self.resolve_var

        # Softmax prescan: group the 5-eqn jax.nn.softmax tail before the main
        # loop so its interior eqns never become standalone ops.
        softmax_groups: Dict[int, tuple] = {}
        for eqn in eqn_list:
            if eqn.primitive.name == "div":
                sm = self._match_softmax(eqn, self._producer_eqn, resolve)
                if sm is not None:
                    group_eqns, src_var = sm
                    softmax_groups[id(eqn)] = (group_eqns, src_var)
                    for ge in group_eqns:
                        if ge is not eqn:
                            consumed.add(id(ge))

        def new_op(op_type, eqns, data_in_vars, out_var, params=None, attrs=None):
            return self._new_op(op_type, eqns, data_in_vars, out_var,
                                counters, prefix, params, attrs)

        param_only = self._param_only
        direct_param_leaf = self._direct_param_leaf
        roots_of = self._roots_of

        for eqn in eqn_list:
            prim = eqn.primitive.name
            is_call = _call_body(eqn) is not None
            is_loop = prim in LOOP_PRIMS

            if id(eqn) in consumed:
                continue
            # skip param-preprocessing (incl. whole param-only sub-jaxprs)
            if eqn.outvars and all(
                    isinstance(ov, Literal) or param_only.get(id(ov), False)
                    for ov in eqn.outvars):
                continue

            if prim in PASSTHROUGH_PRIMS:
                self.alias[id(eqn.outvars[0])] = eqn.invars[0]
                continue

            if is_loop:
                if prim == "scan":
                    self._handle_scan(eqn, prefix, counters)
                elif prim == "while":
                    self._handle_while(eqn, prefix, counters)
                else:
                    self._handle_cond(eqn, prefix, counters)
                continue

            if is_call and prim not in ("custom_jvp_call", "custom_vjp_call"):
                self._inline_call(eqn, prefix, counters)
                continue

            if prim == "conv_general_dilated":
                kernel = eqn.invars[1]
                params = {}
                kp = direct_param_leaf(kernel)
                if kp is not None:
                    params["kernel"] = kp
                out_var = eqn.outvars[0]
                grouped = [eqn]
                # fold an immediately-following bias add
                nxt = self._single_consumer(out_var, eqn_list, id_to_pos, consumed)
                if nxt is not None and nxt.primitive.name == "add":
                    other = nxt.invars[1] if resolve(nxt.invars[0]) is out_var else nxt.invars[0]
                    bp = direct_param_leaf(resolve(other)) if not isinstance(other, Literal) else None
                    if bp is not None:
                        params["bias"] = bp
                        grouped.append(nxt)
                        consumed.add(id(nxt))
                        out_var = nxt.outvars[0]
                dn = eqn.params["dimension_numbers"]
                attrs = {"dimension_numbers": dn,
                         "window_strides": eqn.params["window_strides"],
                         "padding": eqn.params["padding"],
                         "feature_group_count": eqn.params.get("feature_group_count", 1),
                         "lhs_dilation": eqn.params.get("lhs_dilation"),
                         "rhs_dilation": eqn.params.get("rhs_dilation"),
                         "lhs_shape": tuple(eqn.invars[0].aval.shape)}
                lhs_dil = eqn.params.get("lhs_dilation")
                if lhs_dil is not None and any(d > 1 for d in lhs_dil):
                    op_type = "conv_transpose"
                elif eqn.params.get("feature_group_count", 1) > 1:
                    op_type = "depthwise_conv"
                else:
                    op_type = "conv"
                new_op(op_type, grouped, [eqn.invars[0]], out_var, params, attrs)
                continue

            if prim == "dot_general":
                lhs, rhs = eqn.invars
                kp = direct_param_leaf(resolve(rhs))
                params = {}
                data_ins = [lhs]
                if kp is not None and not param_only.get(id(resolve(lhs)), False):
                    params["kernel"] = kp
                    op_type = "linear"
                else:
                    op_type = "matmul"
                    data_ins = [lhs, rhs]
                out_var = eqn.outvars[0]
                grouped = [eqn]
                nxt = self._single_consumer(out_var, eqn_list, id_to_pos, consumed)
                if op_type == "linear" and nxt is not None and nxt.primitive.name == "add":
                    other = nxt.invars[1] if resolve(nxt.invars[0]) is out_var else nxt.invars[0]
                    if not isinstance(other, Literal):
                        bp = direct_param_leaf(resolve(other))
                        if bp is not None:
                            params["bias"] = bp
                            grouped.append(nxt)
                            consumed.add(id(nxt))
                            out_var = nxt.outvars[0]
                attrs = {"dimension_numbers": eqn.params["dimension_numbers"],
                         "lhs_shape": tuple(lhs.aval.shape) if hasattr(lhs, "aval") else None}
                new_op(op_type, grouped, data_ins, out_var, params, attrs)
                continue

            if prim in ELEMENTWISE_PRIMS:
                a, b = eqn.invars[0], eqn.invars[1]
                a_p = isinstance(a, Literal) or param_only.get(id(resolve(a)), False)
                b_p = isinstance(b, Literal) or param_only.get(id(resolve(b)), False)
                if a_p ^ b_p:
                    # mixed data/param elementwise: start an affine chain (BN)
                    grouped = [eqn]
                    roots = set()
                    for v in eqn.invars:
                        if not isinstance(v, Literal) and param_only.get(id(resolve(v)), False):
                            roots |= roots_of(resolve(v))
                    data_in = b if a_p else a
                    out_var = eqn.outvars[0]
                    while True:
                        nxt = self._single_consumer(out_var, eqn_list, id_to_pos, consumed)
                        if nxt is None or nxt.primitive.name not in ELEMENTWISE_PRIMS:
                            break
                        na, nb = nxt.invars[0], nxt.invars[1]
                        na_p = isinstance(na, Literal) or param_only.get(id(resolve(na)), False)
                        nb_p = isinstance(nb, Literal) or param_only.get(id(resolve(nb)), False)
                        if not (na_p ^ nb_p):
                            break
                        grouped.append(nxt)
                        consumed.add(id(nxt))
                        for v in nxt.invars:
                            if not isinstance(v, Literal) and param_only.get(id(resolve(v)), False):
                                roots |= roots_of(resolve(v))
                        out_var = nxt.outvars[0]
                    lit_operand = a if a_p else b
                    if len(grouped) >= 2 and roots:
                        op_type = "batchnorm"
                    elif prim == "max" and self._is_literal_zero(lit_operand, eqn):
                        op_type = "relu"
                    elif prim in ("min", "max") and isinstance(lit_operand, Literal) \
                            and not roots:
                        op_type = "clip"  # e.g. relu6's min(x, 6.0)
                    else:
                        op_type = "scale"
                    params = {f"p{i}": self.products[id(self.jaxpr.invars[self._find_invar(r)])]
                              for i, r in enumerate(sorted(roots))
                              if self._find_invar(r) is not None}
                    new_op(op_type, grouped, [data_in], out_var,
                           params, {"param_roots": sorted(roots)})
                    continue
                # data-data elementwise
                # softmax peephole (prescanned)
                if prim == "div" and id(eqn) in softmax_groups:
                    group_eqns, src_var = softmax_groups[id(eqn)]
                    new_op("softmax", group_eqns, [src_var], eqn.outvars[0])
                    continue
                op_type = {"add": "add", "sub": "sub", "mul": "mul",
                           "div": "div", "max": "max", "min": "min"}[prim]
                # max(x, 0.) / min+max with literals -> relu / clip
                if prim == "max" and (self._is_literal_zero(a, eqn) or self._is_literal_zero(b, eqn)):
                    op_type = "relu"
                data_ins = [v for v in (a, b) if not isinstance(v, Literal)]
                new_op(op_type, [eqn], data_ins, eqn.outvars[0])
                continue

            if prim in ("custom_jvp_call", "custom_vjp_call"):
                body, _ = _call_body(eqn)
                if set(_flat_prims(body)) & QUANTIZABLE_PRIMS:
                    # conv/dot hidden behind a custom derivative: inline so
                    # quantizers reach it (the custom rule is replaced by
                    # differentiation through the primal body)
                    self._inline_call(eqn, prefix, counters)
                    continue
                op_type = _classify_custom_jvp(eqn)
                new_op(op_type, [eqn], list(eqn.invars), eqn.outvars[0])
                continue

            if prim == "reduce_window_max":
                new_op("maxpool", [eqn], [eqn.invars[0]], eqn.outvars[0],
                       attrs=dict(eqn.params))
                continue

            if prim == "reduce_window_sum":
                grouped = [eqn]
                out_var = eqn.outvars[0]
                op_type = "window_sum"
                nxt = self._single_consumer(out_var, eqn_list, id_to_pos, consumed)
                if nxt is not None and nxt.primitive.name == "div":
                    grouped.append(nxt)
                    consumed.add(id(nxt))
                    out_var = nxt.outvars[0]
                    op_type = "avgpool"
                new_op(op_type, grouped, [eqn.invars[0]], out_var,
                       attrs=dict(eqn.params))
                continue

            if prim in ("reduce_sum", "reduce_max", "reduce_min"):
                # mean peephole: reduce_sum then div by scalar literal
                grouped = [eqn]
                out_var = eqn.outvars[0]
                op_type = prim
                nxt = self._single_consumer(out_var, eqn_list, id_to_pos, consumed)
                if prim == "reduce_sum" and nxt is not None and nxt.primitive.name == "div":
                    grouped.append(nxt)
                    consumed.add(id(nxt))
                    out_var = nxt.outvars[0]
                    op_type = "mean"
                new_op(op_type, grouped, [eqn.invars[0]], out_var,
                       attrs=dict(eqn.params))
                continue

            if prim in ACT_PRIMS:
                new_op(ACT_PRIMS[prim], [eqn], list(eqn.invars), eqn.outvars[0])
                continue

            if prim == "concatenate":
                new_op("concat", [eqn], list(eqn.invars), eqn.outvars[0],
                       attrs=dict(eqn.params))
                continue

            if prim == "gather":
                # param-table gather = embedding lookup
                operand = eqn.invars[0]
                kp = direct_param_leaf(resolve(operand))
                if kp is not None:
                    new_op("embedding", [eqn], [eqn.invars[1]], eqn.outvars[0],
                           {"kernel": kp})
                else:
                    new_op("gather", [eqn], list(eqn.invars), eqn.outvars[0])
                continue

            # generic math op
            new_op(prim, [eqn], [v for v in eqn.invars
                                 if not isinstance(v, Literal)],
                   eqn.outvars[0])

    # ------------------------------------------------------------------
    def _find_invar(self, path):
        for i, v in enumerate(self.jaxpr.invars):
            if self.param_var_paths.get(id(v)) == path:
                return i
        return None

    @staticmethod
    def _is_literal_zero(v, eqn):
        return isinstance(v, Literal) and getattr(v, "val", None) == 0

    def _single_consumer(self, var, eqn_list, id_to_pos, consumed):
        """The unique consuming eqn of ``var`` (ignoring consumed), or None."""
        found = None
        for e in eqn_list:
            if id(e) in consumed:
                continue
            for v in e.invars:
                if v is var:
                    if found is not None:
                        return None
                    found = e
        return found

    def _match_softmax(self, div_eqn, producer_eqn, resolve):
        """Match jax.nn.softmax's trailing pattern:
        exp(x - stop_grad(max(x))) / sum(exp(...)). Returns (eqns, input_var)."""
        num, den = div_eqn.invars
        num_e = producer_eqn.get(id(resolve(num)))
        if num_e is None or num_e.primitive.name != "exp":
            return None
        # denominator chain: broadcast_in_dim(reduce_sum(exp_out))
        d = resolve(den)
        de = producer_eqn.get(id(d))
        chain = []
        while de is not None and de.primitive.name in PASSTHROUGH_PRIMS:
            chain.append(de)
            d = resolve(de.invars[0])
            de = producer_eqn.get(id(d))
        if de is None or de.primitive.name != "reduce_sum":
            return None
        if resolve(de.invars[0]) is not resolve(num):
            return None
        group = [num_e, de] + chain + [div_eqn]
        # walk the numerator upstream: sub(x, stop_grad-stat)
        sub_e = producer_eqn.get(id(resolve(num_e.invars[0])))
        src = num_e.invars[0]
        if sub_e is not None and sub_e.primitive.name == "sub":
            x_var, stat = sub_e.invars
            stat_e = producer_eqn.get(id(resolve(stat)))
            stat_chain = []
            while stat_e is not None and stat_e.primitive.name in PASSTHROUGH_PRIMS:
                stat_chain.append(stat_e)
                stat_e = producer_eqn.get(id(resolve(stat_e.invars[0])))
            stat_tail = []
            while stat_e is not None and stat_e.primitive.name in ("max", "reduce_max"):
                stat_tail.append(stat_e)
                nxt = producer_eqn.get(id(resolve(stat_e.invars[-1])))
                stat_e = nxt
            if stat_tail:
                group = [sub_e] + stat_chain + stat_tail + group
                src = x_var
        return group, src

    # ------------------------------------------------------------------
    def get_op(self, name: str) -> Op:
        for op in self.ops:
            if op.name == name:
                return op
        raise KeyError(name)

    def ops_of_type(self, op_type: str) -> List[Op]:
        return [op for op in self.ops if op.type == op_type]

    def downstream_op(self, op: Op) -> Optional[Op]:
        """The unique consumer of op's output, or None."""
        cons = op.output.consumers
        return cons[0] if len(cons) == 1 else None

    def __repr__(self):
        lines = [f"ConnectedGraph({len(self.ops)} ops)"]
        for op in self.ops:
            ins = ", ".join(p.name for p in op.inputs)
            ps = ", ".join(f"{k}={p.param_path}" for k, p in op.param_products.items())
            lines.append(f"  {op.name}({ins}{'; ' + ps if ps else ''}) -> {op.output.name}")
        return "\n".join(lines)
