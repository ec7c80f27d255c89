"""QuantizationSimModel — the central quantsim API, TPU-native.

Functional re-design of the reference's wrapper-module quantsim
(aimet_torch/v1/quantsim.py:218-448, qc_quantize_op.py:198-745): instead of
mutating a module tree, we trace the model once into a ConnectedGraph
(jaxpr-based) and re-evaluate the jaxpr with fake-quant injected at
configured tensors.  The reference's ANALYSIS/ACTIVE wrapper modes become
pure functions:

  - ``compute_encodings(params, data)`` — runs the *observe* interpreter
    (jitted per batch) threading observer states as a pytree, then computes
    encodings host-side (compute_encodings flow: v1/quantsim.py:425-448).
  - ``quantized_fn(params, *args)`` — the *quantized* interpreter: params and
    configured activations pass through STE fake-quant; jittable and
    differentiable (static-grid QAT).
  - ``qat_fn()`` — range-learning variant: encoding (min, max) become a
    trainable pytree with the reference's analytic gradients
    (LearnedGridQuantWrapper: qc_quantize_op.py:947).

Because everything under ``jit`` is traced, the quantized function compiles
to the same XLA program as a hand-written fake-quant model — XLA fuses the
qdq elementwise chains into the surrounding matmuls/convs.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import tree_util as jtu
from jax.extend.core import Literal

from ..graph.connected_graph import ConnectedGraph, Op
from ..quantization.affine import AffineEncoding
from ..quantization.encoding_analyzer import EncodingAnalyzer
from ..quantization.grads import quantize_dequantize
from .config import QuantSimConfig


@dataclasses.dataclass(frozen=True)
class QuantizerSpec:
    """Static configuration of one quantizer (pytree-aux safe)."""
    name: str
    kind: str                   # 'act' | 'param' | 'input'
    bitwidth: int = 8
    symmetric: bool = False
    strict_symmetric: bool = False
    unsigned_symmetric: bool = False
    scheme: str = "sqnr"
    percentile: float = 100.0
    channel_axis: Optional[int] = None
    enabled: bool = True
    # QuantizationDataType parity (aimet_common/defs.py:309): 'float'
    # simulates FP16 round-trip (bitwidth >= 16, fp_quantization.py:48) or
    # FP8 fake-cast with a range-derived maxval (bitwidth 8, :127)
    data_type: str = "int"      # 'int' | 'float'
    # blockwise (v2 block_size quantizer / GroupedBlockQuantizeDequantize)
    block_size: Optional[int] = None
    block_axis: int = 0
    lpbq: bool = False              # LPBQ-compressed block scales
    lpbq_scale_bw: int = 4


def _eval_jaxpr_raw(jaxpr, consts, args):
    """Plain jaxpr evaluation (no interception) used for sub-jaxprs."""
    env = {}

    def read(v):
        return v.val if isinstance(v, Literal) else env[id(v)]

    for v, c in zip(jaxpr.constvars, consts):
        env[id(v)] = c
    for v, a in zip(jaxpr.invars, args):
        env[id(v)] = a
    for eqn in jaxpr.eqns:
        outs = _eval_eqn(eqn, [read(v) for v in eqn.invars])
        for ov, o in zip(eqn.outvars, outs):
            env[id(ov)] = o
    return [read(v) for v in jaxpr.outvars]


def _eval_eqn(eqn, invals):
    prim = eqn.primitive
    name = prim.name
    if name in ("custom_jvp_call", "custom_vjp_call"):
        closed = eqn.params["call_jaxpr"]
        return _eval_jaxpr_raw(closed.jaxpr, closed.consts, invals)
    if name in ("jit", "pjit", "closed_call", "core_call"):
        closed = eqn.params["jaxpr"]
        inner = closed.jaxpr if hasattr(closed, "jaxpr") else closed
        consts = closed.consts if hasattr(closed, "consts") else []
        return _eval_jaxpr_raw(inner, consts, invals)
    if name == "remat" or name == "checkpoint":
        inner = eqn.params["jaxpr"]
        return _eval_jaxpr_raw(inner, (), invals)
    out = prim.bind(*invals, **eqn.params)
    return list(out) if prim.multiple_results else [out]


def _broadcast_encoding(vals, x_ndim: int, channel_axis: Optional[int]):
    """Shape per-channel (C,) encoding params for broadcasting against x."""
    if channel_axis is None or jnp.ndim(vals) == 0:
        return vals
    shape = [1] * x_ndim
    shape[channel_axis] = -1
    return jnp.reshape(vals, shape)


class QuantizationSimModel:
    """Quantization simulation over an arbitrary JAX function.

    Args:
      fn: ``fn(params, *inputs) -> outputs`` (params = pytree, argument 0).
      example_args: ``(params, *example_inputs)`` used for tracing.
      config: :class:`QuantSimConfig` (defaults mirror the reference's
        default_config.json).
      quant_scheme: activation calibration scheme
        ('minmax' | 'sqnr' | 'percentile' | 'mse' | 'entropy') — the
        reference's QuantScheme enum (aimet_common/defs.py:50-66).
      param_quant_scheme: scheme for parameter encodings (default 'minmax',
        matching v2's MinMax default for params).
    """

    def __init__(self, fn, example_args, *, config: Optional[QuantSimConfig] = None,
                 quant_scheme: str = "sqnr", param_quant_scheme: str = "minmax",
                 default_output_bw: int = 8, default_param_bw: int = 8,
                 percentile: float = 100.0):
        self.fn = fn
        self.graph = ConnectedGraph(fn, example_args)
        self.config = config or QuantSimConfig.default()
        self.quant_scheme = quant_scheme
        self.param_quant_scheme = param_quant_scheme
        self.default_output_bw = default_output_bw
        self.default_param_bw = default_param_bw
        self.percentile = percentile

        # output tree structure (for unflattening interpreter results)
        out_shape = jax.eval_shape(fn, *example_args)
        self._out_tree = jtu.tree_structure(out_shape)

        self.quantizers: Dict[str, QuantizerSpec] = {}
        self._act_var_q: Dict[int, str] = {}     # id(var) -> quantizer name
        self._param_var_q: Dict[int, str] = {}
        self._input_var_q: Dict[int, str] = {}
        self._eqn_input_q: Dict[int, list] = {}  # id(eqn) -> [(argpos, name)]
        self._output_var_q: Dict[int, str] = {}
        self._encodings: Dict[str, AffineEncoding] = {}
        self._frozen: set = set()
        self._build_quantizers()
        self._collect_sub_names()

    # ------------------------------------------------------------------
    # Quantizer placement (QuantSimConfigurator equivalent)
    # ------------------------------------------------------------------
    def _supergroup_disabled_ops(self) -> set:
        """Ops whose output quantizer is disabled because they are interior
        to a supergroup (quantsim_config.py:74-110)."""
        disabled = set()
        claimed = set()
        for pattern in self.config.supergroups:
            for op in self.graph.ops:
                if op.type != pattern[0] or op.name in claimed:
                    continue
                seq = [op]
                cur = op
                ok = True
                for t in pattern[1:]:
                    cons = cur.output.consumers
                    if len(cons) != 1 or cons[0].type != t or cons[0].name in claimed:
                        ok = False
                        break
                    cur = cons[0]
                    seq.append(cur)
                if ok and len(seq) == len(pattern):
                    for o in seq[:-1]:
                        disabled.add(o.name)
                    claimed.update(o.name for o in seq)
        return disabled

    def _kernel_channel_axis(self, op: Op) -> Optional[int]:
        if op.type in ("conv", "depthwise_conv", "conv_transpose"):
            dn = op.attrs.get("dimension_numbers")
            if dn is not None:
                return dn.rhs_spec[0]
            return None
        if op.type == "linear":
            dn = op.attrs.get("dimension_numbers")
            kernel = op.param_products.get("kernel")
            if dn is None or kernel is None:
                return None
            (lhs_c, rhs_c), _ = dn
            free = [d for d in range(len(kernel.shape)) if d not in rhs_c]
            return free[-1] if free else None
        return None

    def _build_quantizers(self):
        cfg = self.config
        disabled = self._supergroup_disabled_ops()

        for op in self.graph.ops:
            ot_cfg = cfg.op_type.get(op.type)

            # --- output activation quantizer
            out_q = cfg.output_quantized
            if ot_cfg is not None and ot_cfg.is_output_quantized is not None:
                out_q = ot_cfg.is_output_quantized
            if op.type in cfg.never_quantized_types:
                out_q = False
            if op.name in disabled:
                out_q = False
            if not jnp.issubdtype(op.output.dtype, jnp.floating):
                out_q = False
            if out_q:
                sym = cfg.act_symmetric
                if ot_cfg is not None and ot_cfg.is_symmetric is not None:
                    sym = ot_cfg.is_symmetric
                spec = QuantizerSpec(
                    name=op.name, kind="act", bitwidth=self.default_output_bw,
                    symmetric=sym, strict_symmetric=cfg.strict_symmetric,
                    unsigned_symmetric=cfg.unsigned_symmetric,
                    scheme=self.quant_scheme, percentile=self.percentile)
                self.quantizers[op.name] = spec
                self._act_var_q[id(op.output.var)] = op.name

            # --- parameter quantizers
            for role, prod in op.param_products.items():
                if prod.param_path in self.quantizers:
                    continue
                is_q = cfg.param_quantized
                if role in cfg.param_overrides:
                    is_q = cfg.param_overrides[role]
                if ot_cfg is not None and role in ot_cfg.params_quantized:
                    is_q = ot_cfg.params_quantized[role]
                if role != "kernel" and role != "bias" and op.type == "batchnorm":
                    is_q = False
                if not is_q:
                    continue
                ch_axis = self._kernel_channel_axis(op) if (
                    cfg.per_channel and role == "kernel") else None
                spec = QuantizerSpec(
                    name=prod.param_path, kind="param",
                    bitwidth=self.default_param_bw,
                    symmetric=cfg.param_symmetric,
                    strict_symmetric=cfg.strict_symmetric,
                    unsigned_symmetric=cfg.unsigned_symmetric,
                    scheme=self.param_quant_scheme, channel_axis=ch_axis)
                self.quantizers[prod.param_path] = spec
                self._param_var_q[id(prod.var)] = prod.param_path

        # --- per-op input quantizers ("ops"/"op_type" is_input_quantized)
        for op in self.graph.ops:
            ot_cfg = cfg.op_type.get(op.type)
            in_q = cfg.input_quantized
            if ot_cfg is not None and ot_cfg.is_input_quantized is not None:
                in_q = ot_cfg.is_input_quantized
            if not in_q or not op.inputs:
                continue
            prod = op.inputs[0]
            if not jnp.issubdtype(prod.dtype, jnp.floating):
                continue
            name = f"{op.name}_input"
            self.quantizers[name] = QuantizerSpec(
                name=name, kind="act", bitwidth=self.default_output_bw,
                symmetric=cfg.act_symmetric,
                strict_symmetric=cfg.strict_symmetric,
                unsigned_symmetric=cfg.unsigned_symmetric,
                scheme=self.quant_scheme, percentile=self.percentile)
            target = prod.var
            for eqn in op.eqns:
                for pos, v in enumerate(eqn.invars):
                    if not isinstance(v, Literal) \
                            and self.graph.resolve_var(v) is target:
                        self._eqn_input_q.setdefault(id(eqn), []).append(
                            (pos, name))

        # --- model output quantizers (model_output is_output_quantized)
        if cfg.model_output_quantized:
            for i, var in enumerate(self.graph.jaxpr.outvars):
                if isinstance(var, Literal):
                    continue
                rvar = self.graph.resolve_var(var)
                if id(rvar) in self._act_var_q:
                    continue  # producing op already quantizes it
                if not jnp.issubdtype(rvar.aval.dtype, jnp.floating):
                    continue
                name = f"model_output_{i}"
                self.quantizers[name] = QuantizerSpec(
                    name=name, kind="act", bitwidth=self.default_output_bw,
                    symmetric=cfg.act_symmetric,
                    strict_symmetric=cfg.strict_symmetric,
                    unsigned_symmetric=cfg.unsigned_symmetric,
                    scheme=self.quant_scheme, percentile=self.percentile)
                self._output_var_q[id(rvar)] = name

        # --- model input quantizers
        if cfg.model_input_quantized:
            for i, var in enumerate(self.graph.input_vars):
                if not jnp.issubdtype(var.aval.dtype, jnp.floating):
                    continue
                name = f"model_input_{i}"
                self.quantizers[name] = QuantizerSpec(
                    name=name, kind="input", bitwidth=self.default_output_bw,
                    symmetric=cfg.act_symmetric,
                    strict_symmetric=cfg.strict_symmetric,
                    unsigned_symmetric=cfg.unsigned_symmetric,
                    scheme=self.quant_scheme, percentile=self.percentile)
                self._input_var_q[id(var)] = name

    # ------------------------------------------------------------------
    # Interpreter
    # ------------------------------------------------------------------
    def _flatten_args(self, params, args):
        flat = jtu.tree_leaves((params,) + tuple(args))
        assert len(flat) == len(self.graph.jaxpr.invars)
        return flat

    def _qdq(self, x, name, encodings, learn_range=False):
        out = self._qdq_impl(x, name, encodings, learn_range)
        flags = getattr(self, "_qdq_flags", None)
        if flags is not None and name in flags:
            # enable-flag sweep mode (quantized_fn_flagged): both branches
            # are computed and selected, so ONE compiled program serves
            # every enable/disable combination
            return jnp.where(flags[name], out, x)
        return out

    def _qdq_impl(self, x, name, encodings, learn_range=False):
        spec = self.quantizers[name]
        enc = encodings[name]
        if isinstance(enc, AffineEncoding):
            emin, emax = enc.min, enc.max
        else:
            emin, emax = enc
        if spec.data_type == "float":
            from ..quantization import float_sim
            if spec.bitwidth >= 16:
                return float_sim.fake_cast_fp16(x)
            # FP8: maxval derived from the calibrated range (per-channel
            # where the encoding is per-channel)
            maxval = jnp.maximum(jnp.abs(jnp.asarray(emin, jnp.float32)),
                                 jnp.abs(jnp.asarray(emax, jnp.float32)))
            maxval = jnp.maximum(maxval, 1e-8)
            return float_sim.quantize_to_fp8(
                x, maxval.reshape(-1) if jnp.ndim(maxval) else maxval,
                channel_axis=spec.channel_axis if jnp.ndim(maxval) else None)
        if spec.block_size is not None:
            # blockwise: encodings are stored in blocked-keepdims shape and
            # broadcast against the blocked weight view directly
            from ..quantization.blockwise import _to_blocks
            xb = _to_blocks(x, spec.block_size, spec.block_axis)
            out = quantize_dequantize(
                xb, emin, emax, bitwidth=spec.bitwidth,
                symmetric=spec.symmetric,
                strict_symmetric=spec.strict_symmetric,
                unsigned_symmetric=spec.unsigned_symmetric,
                learn_range=learn_range)
            return out.reshape(jnp.shape(x))
        emin = _broadcast_encoding(emin, jnp.ndim(x), spec.channel_axis)
        emax = _broadcast_encoding(emax, jnp.ndim(x), spec.channel_axis)
        return quantize_dequantize(
            x, emin, emax, bitwidth=spec.bitwidth, symmetric=spec.symmetric,
            strict_symmetric=spec.strict_symmetric,
            unsigned_symmetric=spec.unsigned_symmetric, learn_range=learn_range)

    def _collect_sub_names(self):
        """Per control-flow/call eqn: the activation/input quantizer names
        that live (transitively) inside its body — the set whose observer
        states must be threaded through the loop carry (the TPU-native form
        of the reference's per-timestep grouped quantizers,
        qc_quantize_recurrent.py:191-306)."""
        self._sub_act_names: Dict[int, list] = {}
        for eqn_id, info in self.graph.subgraph_eqns.items():
            names = []
            for op in info["inner_ops"]:
                spec = self.quantizers.get(op.name)
                if spec is not None and spec.kind == "act":
                    names.append(op.name)
                if f"{op.name}_input" in self.quantizers:
                    names.append(f"{op.name}_input")
            self._sub_act_names[eqn_id] = sorted(set(names))

    def _run_eqns(self, eqns, env, read, mode, obs_states, analyzers,
                  encodings, learn_range, capture=None, captured=None,
                  product_names=None):
        """Hooked evaluation of a sequence of eqns into ``env``."""
        for eqn in eqns:
            invals = [read(v) for v in eqn.invars]
            hooks = self._eqn_input_q.get(id(eqn))
            if hooks:
                for pos, qname in hooks:
                    if mode == "observe" and analyzers is not None \
                            and qname in analyzers:
                        obs_states[qname] = analyzers[qname].update(
                            obs_states[qname], invals[pos])
                    elif mode == "quantized" and encodings is not None \
                            and qname in encodings:
                        invals[pos] = self._qdq(invals[pos], qname, encodings,
                                                learn_range)
            sub = self.graph.subgraph_eqns.get(id(eqn))
            # descend for quantizer interception, and also (call-kind only)
            # when capturing: products created inside inlined bodies
            # (custom_jvp activations etc.) are invisible to the flat pass.
            if sub is not None and (
                    (mode != "fp" and self._sub_act_names.get(id(eqn)))
                    or (capture is not None and sub["kind"] == "call")):
                outs, obs_states = self._run_subgraph(
                    eqn, sub, invals, mode, obs_states, analyzers,
                    encodings, learn_range, capture=capture,
                    captured=captured, product_names=product_names)
            else:
                outs = _eval_eqn(eqn, invals)
            for ov, oval in zip(eqn.outvars, outs):
                qname = self._act_var_q.get(id(ov))
                if qname is not None:
                    if mode == "observe" and analyzers is not None \
                            and qname in analyzers:
                        obs_states[qname] = analyzers[qname].update(
                            obs_states[qname], oval)
                    elif mode == "quantized" and encodings is not None \
                            and qname in encodings:
                        oval = self._qdq(oval, qname, encodings, learn_range)
                env[id(ov)] = oval
                if capture is not None and product_names is not None:
                    nm = product_names.get(id(ov))
                    if nm in capture:
                        captured[nm] = oval
        return obs_states

    def _eval_jaxpr_hooked(self, jaxpr, consts, invals, mode, obs_states,
                           analyzers, encodings, learn_range, capture=None,
                           captured=None, product_names=None):
        """Evaluate a sub-jaxpr with quantizer interception (used for the
        bodies of scan/while/cond and inlined calls)."""
        env: Dict[int, Any] = {}

        def read(v):
            return v.val if isinstance(v, Literal) else env[id(v)]

        for v, c in zip(jaxpr.constvars, consts):
            env[id(v)] = c
        for v, a in zip(jaxpr.invars, invals):
            env[id(v)] = a
        self._run_eqns(jaxpr.eqns, env, read, mode, obs_states, analyzers,
                       encodings, learn_range, capture=capture,
                       captured=captured, product_names=product_names)
        return [read(v) for v in jaxpr.outvars]

    def _run_subgraph(self, eqn, sub, invals, mode, obs_states, analyzers,
                      encodings, learn_range, capture=None, captured=None,
                      product_names=None):
        """Execute a control-flow (or inlined-call) eqn with quantizer
        interception inside its body.

        For ``scan``/``while`` in observe mode the inner quantizers'
        observer states ride in the loop carry, so the whole calibration of
        a recurrent model compiles into ONE fused XLA loop (vs the
        reference's per-step Python dispatch,
        qc_quantize_recurrent.py:417-520).
        """
        kind = sub["kind"]
        names = self._sub_act_names.get(id(eqn), [])
        observing = mode == "observe" and analyzers is not None

        if kind == "call":
            closed = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            inner = closed.jaxpr if hasattr(closed, "jaxpr") else closed
            consts = closed.consts if hasattr(closed, "consts") else []
            outs = self._eval_jaxpr_hooked(
                inner, consts, invals, mode, obs_states, analyzers,
                encodings, learn_range, capture=capture, captured=captured,
                product_names=product_names)
            return outs, obs_states

        if kind == "scan":
            closed = eqn.params["jaxpr"]
            nc = eqn.params["num_consts"]
            nk = eqn.params["num_carry"]
            consts_v = invals[:nc]
            carry_v = tuple(invals[nc:nc + nk])
            xs_v = tuple(invals[nc + nk:])
            length = eqn.params["length"]
            reverse = eqn.params["reverse"]
            unroll = eqn.params.get("unroll", 1)

            if observing:
                def body(carry, xs):
                    inner_c, ob = carry
                    ob = dict(ob)
                    vals = list(consts_v) + list(inner_c) + list(xs)
                    outs = self._eval_jaxpr_hooked(
                        closed.jaxpr, closed.consts, vals, mode, ob,
                        analyzers, encodings, learn_range)
                    return (tuple(outs[:nk]), ob), tuple(outs[nk:])

                ob0 = {n: obs_states[n] for n in names if n in obs_states}
                (carry_o, ob1), ys = jax.lax.scan(
                    body, (carry_v, ob0), xs_v, length=length,
                    reverse=reverse, unroll=unroll)
                obs_states.update(ob1)
                return list(carry_o) + list(ys), obs_states

            def body(carry, xs):
                vals = list(consts_v) + list(carry) + list(xs)
                outs = self._eval_jaxpr_hooked(
                    closed.jaxpr, closed.consts, vals, mode, None,
                    None, encodings, learn_range)
                return tuple(outs[:nk]), tuple(outs[nk:])

            carry_o, ys = jax.lax.scan(body, carry_v, xs_v, length=length,
                                       reverse=reverse, unroll=unroll)
            return list(carry_o) + list(ys), obs_states

        if kind == "while":
            cj = eqn.params["cond_jaxpr"]
            bj = eqn.params["body_jaxpr"]
            cn = eqn.params["cond_nconsts"]
            bn = eqn.params["body_nconsts"]
            cconsts = invals[:cn]
            bconsts = invals[cn:cn + bn]
            init = tuple(invals[cn + bn:])

            if observing:
                def cond_fn(state):
                    c, _ob = state
                    return _eval_jaxpr_raw(
                        cj.jaxpr, cj.consts, list(cconsts) + list(c))[0]

                def body_fn(state):
                    c, ob = state
                    ob = dict(ob)
                    outs = self._eval_jaxpr_hooked(
                        bj.jaxpr, bj.consts, list(bconsts) + list(c), mode,
                        ob, analyzers, encodings, learn_range)
                    return tuple(outs), ob

                ob0 = {n: obs_states[n] for n in names if n in obs_states}
                carry_o, ob1 = jax.lax.while_loop(cond_fn, body_fn,
                                                  (init, ob0))
                obs_states.update(ob1)
                return list(carry_o), obs_states

            def cond_fn(c):
                return _eval_jaxpr_raw(
                    cj.jaxpr, cj.consts, list(cconsts) + list(c))[0]

            def body_fn(c):
                outs = self._eval_jaxpr_hooked(
                    bj.jaxpr, bj.consts, list(bconsts) + list(c), mode,
                    None, None, encodings, learn_range)
                return tuple(outs)

            carry_o = jax.lax.while_loop(cond_fn, body_fn, init)
            return list(carry_o), obs_states

        if kind == "cond":
            idx = invals[0]
            ops_v = tuple(invals[1:])
            branches = eqn.params["branches"]

            if observing:
                def mk(closed):
                    def f(state):
                        opv, ob = state
                        ob = dict(ob)
                        outs = self._eval_jaxpr_hooked(
                            closed.jaxpr, closed.consts, list(opv), mode,
                            ob, analyzers, encodings, learn_range)
                        return tuple(outs), ob
                    return f

                ob0 = {n: obs_states[n] for n in names if n in obs_states}
                outs, ob1 = jax.lax.switch(idx, [mk(b) for b in branches],
                                           (ops_v, ob0))
                obs_states.update(ob1)
                return list(outs), obs_states

            def mk(closed):
                def f(opv):
                    return tuple(self._eval_jaxpr_hooked(
                        closed.jaxpr, closed.consts, list(opv), mode,
                        None, None, encodings, learn_range))
                return f

            outs = jax.lax.switch(idx, [mk(b) for b in branches], ops_v)
            return list(outs), obs_states

        raise NotImplementedError(f"subgraph kind {kind!r}")

    def _run(self, params, args, mode: str, obs_states=None, analyzers=None,
             encodings=None, learn_range: bool = False,
             capture: Optional[set] = None, dynamic_params: bool = False):
        """Evaluate the traced jaxpr with quantization interception.

        mode: 'fp' (no quant), 'observe' (params fake-quantized w/ their
        encodings, activation observers updated), 'quantized' (full
        fake-quant forward).
        Returns (outputs_pytree, obs_states, captured).
        """
        jaxpr = self.graph.jaxpr
        flat = self._flatten_args(params, args)
        env: Dict[int, Any] = {}
        captured: Dict[str, Any] = {}
        product_names = {id(p.var): p.name for p in self.graph.products.values()}

        def read(v):
            return v.val if isinstance(v, Literal) else env[id(v)]

        def maybe_capture(var, val):
            if capture is not None:
                nm = product_names.get(id(var))
                if nm in capture:
                    captured[nm] = val

        for v, c in zip(jaxpr.constvars, self.graph.consts):
            env[id(v)] = c

        for var, val in zip(jaxpr.invars, flat):
            qname = self._param_var_q.get(id(var)) or self._input_var_q.get(id(var))
            if qname is not None:
                spec = self.quantizers[qname]
                if spec.kind == "param":
                    if dynamic_params and mode == "quantized" \
                            and qname in self.quantizers:
                        val = self._dynamic_param_qdq(val, spec)
                    elif mode in ("observe", "quantized") and encodings is not None \
                            and qname in encodings:
                        val = self._qdq(val, qname, encodings, learn_range)
                else:  # model input
                    if mode == "observe" and analyzers is not None \
                            and qname in analyzers:
                        obs_states[qname] = analyzers[qname].update(
                            obs_states[qname], val)
                    elif mode == "quantized" and encodings is not None \
                            and qname in encodings:
                        val = self._qdq(val, qname, encodings, learn_range)
            env[id(var)] = val
            maybe_capture(var, val)

        obs_states = self._run_eqns(
            jaxpr.eqns, env, read, mode, obs_states, analyzers, encodings,
            learn_range, capture=capture, captured=captured,
            product_names=product_names)

        outs = []
        for v in jaxpr.outvars:
            val = read(v)
            if not isinstance(v, Literal):
                qname = self._output_var_q.get(id(v)) \
                    or self._output_var_q.get(id(self.graph.resolve_var(v)))
                if qname is not None:
                    if mode == "observe" and analyzers is not None \
                            and qname in analyzers:
                        obs_states[qname] = analyzers[qname].update(
                            obs_states[qname], val)
                    elif mode == "quantized" and encodings is not None \
                            and qname in encodings:
                        val = self._qdq(val, qname, encodings, learn_range)
            outs.append(val)
        return jtu.tree_unflatten(self._out_tree, outs), obs_states, captured

    # ------------------------------------------------------------------
    # Public API
    # ------------------------------------------------------------------
    def fp_fn(self, params, *args):
        """Floating-point forward through the interpreter (sanity path)."""
        return self._run(params, args, "fp")[0]

    def compute_param_encodings(self, params, only=None):
        """Compute parameter encodings directly from the weights
        (StaticGridPerTensor/PerChannelQuantizer on params).

        ``only``: optional iterable of param names to (re)compute — avoids
        O(L^2) recomputation in per-layer sequential algorithms."""
        leaves = jtu.tree_leaves(params)
        only = set(only) if only is not None else None
        for name, spec in self.quantizers.items():
            if spec.kind != "param" or name in self._frozen \
                    or not spec.enabled:
                continue
            if only is not None and name not in only:
                continue
            idx = self.graph._param_leaf_index[name]
            w = jnp.asarray(leaves[idx])
            if spec.block_size is not None:
                if spec.lpbq:
                    from ..quantization.blockwise import \
                        grouped_block_quantize_dequantize
                    _, enc = grouped_block_quantize_dequantize(
                        w, spec.block_size, spec.block_axis,
                        spec.bitwidth, spec.lpbq_scale_bw)
                    self._encodings[name] = enc
                else:
                    from ..quantization.blockwise import blockwise_encoding
                    self._encodings[name] = blockwise_encoding(
                        w, spec.block_size, spec.block_axis,
                        bitwidth=spec.bitwidth, symmetric=spec.symmetric)
                continue
            analyzer = EncodingAnalyzer(spec.scheme, channel_axis=spec.channel_axis,
                                        percentile=spec.percentile)
            st = analyzer.update(analyzer.init_state(w.shape), w)
            self._encodings[name] = analyzer.compute(
                st, bitwidth=spec.bitwidth, symmetric=spec.symmetric,
                strict_symmetric=spec.strict_symmetric,
                unsigned_symmetric=spec.unsigned_symmetric)

    def compute_encodings(self, params, data_iter: Iterable, num_batches: Optional[int] = None):
        """Calibrate: observe activations over ``data_iter`` then compute all
        encodings (v1/quantsim.py:425-448 flow).

        ``data_iter`` yields model input args: either a tuple ``(x, ...)`` or
        a single array.
        """
        self.compute_param_encodings(params)

        analyzers = {}
        obs = {}
        for name, spec in self.quantizers.items():
            if spec.kind == "param" or not spec.enabled:
                continue  # disabled quantizers pay no observe cost
            analyzers[name] = EncodingAnalyzer(
                spec.scheme, channel_axis=None, percentile=spec.percentile)
            obs[name] = analyzers[name].init_state()

        @jax.jit
        def observe_step(obs, params, *batch):
            _, obs, _ = self._run(params, batch, "observe", obs_states=dict(obs),
                                  analyzers=analyzers, encodings=self._encodings)
            return obs

        count = 0
        for batch in data_iter:
            if not isinstance(batch, (tuple, list)):
                batch = (batch,)
            obs = observe_step(obs, params, *batch)
            count += 1
            if num_batches is not None and count >= num_batches:
                break
        if count == 0:
            raise RuntimeError("compute_encodings: data_iter yielded no batches")

        # kept for later bitwidth re-computation (AMP) and QuantAnalyzer
        self._analyzers = analyzers
        self._obs_states = obs
        self._calib_params = params

        for name, analyzer in analyzers.items():
            if name in self._frozen:
                continue
            spec = self.quantizers[name]
            self._encodings[name] = analyzer.compute(
                obs[name], bitwidth=spec.bitwidth, symmetric=spec.symmetric,
                strict_symmetric=spec.strict_symmetric,
                unsigned_symmetric=spec.unsigned_symmetric)
        return self._encodings

    def recompute_encoding(self, name: str, bitwidth: int) -> AffineEncoding:
        """Recompute one quantizer's encoding at a different bitwidth from the
        retained calibration statistics (no new data needed) — used by AMP."""
        spec = self.quantizers[name]
        if spec.kind == "param":
            leaves = jtu.tree_leaves(self._calib_params)
            w = jnp.asarray(leaves[self.graph._param_leaf_index[name]])
            analyzer = EncodingAnalyzer(spec.scheme, channel_axis=spec.channel_axis,
                                        percentile=spec.percentile)
            st = analyzer.update(analyzer.init_state(w.shape), w)
            return analyzer.compute(
                st, bitwidth=bitwidth, symmetric=spec.symmetric,
                strict_symmetric=spec.strict_symmetric,
                unsigned_symmetric=spec.unsigned_symmetric)
        analyzer = self._analyzers[name]
        return analyzer.compute(
            self._obs_states[name], bitwidth=bitwidth, symmetric=spec.symmetric,
            strict_symmetric=spec.strict_symmetric,
            unsigned_symmetric=spec.unsigned_symmetric)

    def set_bitwidth(self, name: str, bitwidth: int):
        """Change a quantizer's bitwidth in place (spec + encoding)."""
        spec = self.quantizers[name]
        if spec.bitwidth == bitwidth:
            return
        self._encodings[name] = self.recompute_encoding(name, bitwidth)
        self.quantizers[name] = dataclasses.replace(spec, bitwidth=bitwidth)

    def set_quantizer_data_type(self, name: str, data_type: str,
                                bitwidth: Optional[int] = None):
        """Switch a quantizer between 'int' and 'float' simulation
        (QuantizationDataType, aimet_common/defs.py:309). 'float' at
        bitwidth >= 16 simulates an FP16 round-trip; at bitwidth 8 an FP8
        fake-cast whose maxval derives from the calibrated range. The
        affine encoding is kept (recomputed when returning to 'int' at a
        new bitwidth) so dtype flips are cheap — the AMP inner loop."""
        if data_type not in ("int", "float"):
            raise ValueError(f"data_type must be 'int'|'float': {data_type}")
        spec = self.quantizers[name]
        bw = spec.bitwidth if bitwidth is None else bitwidth
        if spec.data_type == data_type and bw == spec.bitwidth:
            return
        needs_grid = (data_type == "int"
                      and (bw != spec.bitwidth or spec.data_type != "int"))
        self.quantizers[name] = dataclasses.replace(
            spec, data_type=data_type, bitwidth=bw)
        if needs_grid and name in self._encodings \
                and name not in self._frozen:
            can_recompute = (
                (spec.kind == "param" and hasattr(self, "_calib_params"))
                or (spec.kind != "param" and hasattr(self, "_analyzers")
                    and name in self._analyzers))
            if can_recompute:
                self._encodings[name] = self.recompute_encoding(name, bw)
            else:
                # pre-calibration: drop the stale-grid encoding rather
                # than fake-quantizing on the wrong grid; the next
                # compute_encodings() pass rebuilds it at the new bw
                del self._encodings[name]

    def set_param_blockwise(self, params, name: str, block_size: int,
                            axis: int = 0, bitwidth: int = 4,
                            symmetric: bool = True, lpbq: bool = False,
                            scale_bitwidth: int = 4):
        """Switch a param quantizer to blockwise (v2 ``block_size``
        semantics) or LPBQ (``GroupedBlockQuantizeDequantize``): one
        (min, max) per ``block_size`` slice along ``axis``; with
        ``lpbq=True`` the per-block scales are themselves quantized onto a
        per-group integer grid (aimet_onnx/lpbq_utils.py:46-133)."""
        spec = self.quantizers[name]
        assert spec.kind == "param", name
        self.quantizers[name] = dataclasses.replace(
            spec, block_size=block_size, block_axis=axis,
            bitwidth=bitwidth, symmetric=symmetric, channel_axis=None,
            lpbq=lpbq, lpbq_scale_bw=scale_bitwidth)
        leaves = jtu.tree_leaves(params)
        w = jnp.asarray(leaves[self.graph._param_leaf_index[name]])
        if lpbq:
            from ..quantization.blockwise import \
                grouped_block_quantize_dequantize
            _, enc = grouped_block_quantize_dequantize(
                w, block_size, axis, bitwidth, scale_bitwidth)
        else:
            from ..quantization.blockwise import blockwise_encoding
            enc = blockwise_encoding(w, block_size, axis, bitwidth,
                                     symmetric)
        self._encodings[name] = enc

    @property
    def encodings(self) -> Dict[str, AffineEncoding]:
        return self._encodings

    def set_encoding(self, name: str, encoding: AffineEncoding, freeze: bool = False):
        """Override one quantizer's encoding (set_and_freeze_param_encodings,
        v1/quantsim.py:1839)."""
        self._encodings[name] = encoding
        if freeze:
            self._frozen.add(name)

    def quantized_fn(self, params, *args):
        """The fake-quantized forward (ACTIVE mode). Jittable/differentiable;
        encodings are constants (STE gradients for params)."""
        if not self._encodings:
            raise RuntimeError("call compute_encodings first")
        return self._run(params, args, "quantized", encodings=self._encodings)[0]

    def quantized_fn_subset(self, params, *args, enabled=None, disabled=None):
        """Quantized forward with only a subset of quantizers active —
        QuantAnalyzer/AMP enable-disable sweeps (quant_analyzer.py:63)."""
        enc = dict(self._encodings)
        if enabled is not None:
            enc = {k: v for k, v in enc.items() if k in set(enabled)}
        if disabled is not None:
            for k in disabled:
                enc.pop(k, None)
        return self._run(params, args, "quantized", encodings=enc)[0]

    def quantized_fn_flagged(self):
        """One COMPILED forward for all enable/disable sweeps: returns
        ``(apply_fn, names)`` where ``apply_fn(params, flags, *args)``
        applies quantizer i only where ``flags[i]`` is True (flags: bool
        (len(names),) array, traced — so QuantAnalyzer/AMP sensitivity
        loops over hundreds of quantizers reuse a single jit compilation
        instead of re-tracing the interpreter per quantizer)."""
        if not self._encodings:
            raise RuntimeError("call compute_encodings first")
        names = sorted(n for n in self._encodings if n in self.quantizers)

        def apply_fn(params, flags, *args):
            self._qdq_flags = {n: flags[i] for i, n in enumerate(names)}
            try:
                out = self._run(params, args, "quantized",
                                encodings=self._encodings)[0]
            finally:
                self._qdq_flags = None
            return out

        return apply_fn, names

    def set_percentile_value(self, name: str, percentile: float):
        """Per-quantizer percentile control (set_percentile_value,
        v1/quantsim.py:478 / tensor_quantizer.py:386): only meaningful for
        'percentile'-scheme quantizers; recomputes the encoding from the
        retained calibration histogram when available."""
        spec = self.quantizers[name]
        if spec.scheme != "percentile":
            raise ValueError(
                f"set_percentile_value: quantizer {name!r} uses scheme "
                f"{spec.scheme!r}, not 'percentile'")
        if not 50.0 <= percentile <= 100.0:
            raise ValueError(f"percentile must be in [50, 100]: {percentile}")
        self.quantizers[name] = dataclasses.replace(
            spec, percentile=percentile)
        if hasattr(self, "_analyzers") and name in self._analyzers:
            spec = self.quantizers[name]
            analyzer = EncodingAnalyzer(
                spec.scheme, channel_axis=None, percentile=percentile)
            # percentile reads the same histogram state; only the clip
            # fraction changes
            self._analyzers[name] = analyzer
            if name not in self._frozen:
                self._encodings[name] = analyzer.compute(
                    self._obs_states[name], bitwidth=spec.bitwidth,
                    symmetric=spec.symmetric,
                    strict_symmetric=spec.strict_symmetric,
                    unsigned_symmetric=spec.unsigned_symmetric)

    def _dynamic_param_qdq(self, w, spec):
        """Recompute the param encoding from the live weights inside the
        traced graph (min-max scheme, jit-friendly) and fake-quant —
        StaticGridQuantWrapper's per-step training behavior
        (qc_quantize_op.py:771-777)."""
        from ..quantization.affine import gate_min_max, reduce_min_max
        if spec.data_type == "float":
            from ..quantization import float_sim
            if spec.bitwidth >= 16:
                return float_sim.fake_cast_fp16(w)
            mv = float_sim.init_fp8_maxval_minmax(w, spec.channel_axis)
            return float_sim.quantize_to_fp8(w, mv, spec.channel_axis)
        if spec.block_size is not None:
            from ..quantization.blockwise import _to_blocks
            wb = _to_blocks(w, spec.block_size, spec.block_axis)
            mn = jnp.min(wb, axis=spec.block_axis + 1, keepdims=True)
            mx = jnp.max(wb, axis=spec.block_axis + 1, keepdims=True)
            mn, mx = gate_min_max(mn, mx)
            out = quantize_dequantize(
                wb, mn, mx, bitwidth=spec.bitwidth,
                symmetric=spec.symmetric,
                strict_symmetric=spec.strict_symmetric,
                unsigned_symmetric=spec.unsigned_symmetric)
            return out.reshape(jnp.shape(w))
        mn, mx = reduce_min_max(w, channel_axis=spec.channel_axis)
        mn, mx = gate_min_max(mn, mx)
        emin = _broadcast_encoding(mn, jnp.ndim(w), spec.channel_axis)
        emax = _broadcast_encoding(mx, jnp.ndim(w), spec.channel_axis)
        return quantize_dequantize(
            w, emin, emax, bitwidth=spec.bitwidth, symmetric=spec.symmetric,
            strict_symmetric=spec.strict_symmetric,
            unsigned_symmetric=spec.unsigned_symmetric)

    def static_grid_qat_fn(self):
        """Static-grid QAT forward: param encodings recomputed from the live
        weights every step (min-max), activation encodings fixed. Use for
        weight-training QAT where AdaRound-style frozen grids are not
        desired."""
        if not self._encodings:
            raise RuntimeError("call compute_encodings first")

        def apply_fn(params, *args):
            return self._run(params, args, "quantized",
                             encodings=self._encodings,
                             dynamic_params=True)[0]

        return apply_fn

    def qat_fn(self):
        """Range-learning QAT: returns ``(apply_fn, encoding_params)`` where
        ``apply_fn(params, enc_params, *args)`` produces analytic gradients
        for each encoding's (min, max) (LearnedGridQuantWrapper equivalent)."""
        if not self._encodings:
            raise RuntimeError("call compute_encodings first")
        enc_params = {name: (enc.min, enc.max)
                      for name, enc in self._encodings.items()}

        def apply_fn(params, enc_params, *args):
            return self._run(params, args, "quantized", encodings=enc_params,
                             learn_range=True)[0]

        return apply_fn, enc_params

    def update_encodings_from_qat(self, enc_params):
        """Fold trained (min, max) back into stored encodings."""
        from ..quantization.affine import compute_encoding_from_min_max
        for name, (mn, mx) in enc_params.items():
            spec = self.quantizers[name]
            self._encodings[name] = compute_encoding_from_min_max(
                mn, mx, spec.bitwidth, spec.symmetric, spec.strict_symmetric,
                spec.unsigned_symmetric)

    def collect_activations(self, params, args, product_names: Sequence[str],
                            mode: str = "fp"):
        """Grab intermediate tensors by product name (ActivationSampler
        equivalent — adaround/activation_sampler.py:175)."""
        enc = self._encodings if mode == "quantized" else None
        _, _, captured = self._run(params, args, mode, encodings=enc,
                                   capture=set(product_names))
        return captured

    # ------------------------------------------------------------------
    def export_encodings_v1(self) -> Dict[str, Any]:
        """AIMET '1.0.0' encodings format (experimental/v2/quantsim/
        export_utils.py): flat lists with vectorized scale/offset."""
        def entry(name):
            enc = self._encodings[name]
            spec = self.quantizers[name]
            deltas = np.asarray(enc.delta).reshape(-1).tolist()
            offsets = [int(o) for o in np.asarray(enc.offset).reshape(-1)]
            enc_type = "PER_TENSOR" if len(deltas) == 1 else (
                "PER_BLOCK" if spec.block_size is not None else "PER_CHANNEL")
            if spec.data_type == "float":
                return {"name": name, "dtype": "FLOAT", "bw": spec.bitwidth}
            return {
                "name": name,
                "dtype": "INT",
                "enc_type": enc_type,
                "bw": spec.bitwidth,
                "is_sym": bool(spec.symmetric),
                "scale": deltas,
                "offset": offsets,
            }

        act, param = [], []
        for name, spec in self.quantizers.items():
            if name not in self._encodings:
                continue
            (param if spec.kind == "param" else act).append(entry(name))
        return {"version": "1.0.0",
                "activation_encodings": act,
                "param_encodings": param}

    def export_encodings(self) -> Dict[str, Any]:
        """AIMET '0.6.1' encodings JSON dict
        (_export_encodings_to_files, v1/quantsim.py:940-1044)."""
        def enc_entries(name):
            enc = self._encodings[name]
            spec = self.quantizers[name]
            mins = np.asarray(enc.min).reshape(-1)
            maxs = np.asarray(enc.max).reshape(-1)
            if spec.data_type == "float":
                if spec.bitwidth >= 16:
                    # FP16 entries carry no grid (v1/quantsim.py fp16 export)
                    return [{"bitwidth": spec.bitwidth, "dtype": "float"}]
                # FP8: min/max preserved so the maxval survives a round-trip
                return [{
                    "bitwidth": spec.bitwidth, "dtype": "float",
                    "min": float(mins[i]), "max": float(maxs[i]),
                } for i in range(mins.size)]
            deltas = np.asarray(enc.delta).reshape(-1)
            offsets = np.asarray(enc.offset).reshape(-1)
            return [{
                "bitwidth": spec.bitwidth,
                "dtype": "int",
                "is_symmetric": str(spec.symmetric),
                "min": float(mins[i]), "max": float(maxs[i]),
                "scale": float(deltas[i]), "offset": int(offsets[i]),
            } for i in range(mins.size)]

        act, param = {}, {}
        for name, spec in self.quantizers.items():
            if name not in self._encodings:
                continue
            (param if spec.kind == "param" else act)[name] = enc_entries(name)
        return {"version": "0.6.1",
                "activation_encodings": act,
                "param_encodings": param}

    def export(self, path: str, prefix: str):
        with open(f"{path}/{prefix}.encodings", "w") as f:
            json.dump(self.export_encodings(), f, indent=2, sort_keys=True)

    def export_safetensors(self, path: str, prefix: str, params,
                           quantized: bool = False) -> str:
        """Write model weights as a .safetensors file keyed by param path
        (reference parity: v1/quantsim.py:660 safetensors weight export).

        quantized=True additionally stores, for every param with a
        symmetric encoding, the true INT codes (``<path>.int``) and the
        per-channel scale (``<path>.scale``) alongside the float weights —
        the serving-deployment artifact.
        """
        from safetensors.numpy import save_file

        from ..quantization.affine import quantize_to_int

        flat = jtu.tree_leaves_with_path(params)
        tensors = {}
        for kp, leaf in flat:
            key = jtu.keystr(kp)
            tensors[key] = np.asarray(leaf)
            if not quantized or key not in self._encodings:
                continue
            spec = self.quantizers.get(key)
            if spec is None or not spec.symmetric or spec.bitwidth > 8:
                continue
            enc = self._encodings[key]
            wj = jnp.asarray(leaf)
            lim = 2 ** (spec.bitwidth - 1) - 1
            if spec.block_size is not None:
                from ..quantization.blockwise import _to_blocks
                wb = _to_blocks(wj, spec.block_size, spec.block_axis)
                q = quantize_to_int(wb, enc, signed=True,
                                    dtype=jnp.int32).reshape(wj.shape)
            else:
                q = quantize_to_int(wj, enc, channel_axis=spec.channel_axis,
                                    signed=True, dtype=jnp.int32)
            tensors[key + ".int"] = np.asarray(
                jnp.clip(q, -lim, lim), np.int8)
            tensors[key + ".scale"] = np.asarray(
                jnp.reshape(jnp.asarray(enc.delta), (-1,)), np.float32)
        out = f"{path}/{prefix}.safetensors"
        save_file(tensors, out)
        return out

    def export_stablehlo(self, path: str, prefix: str, params, *example_inputs):
        """Lower the quantized forward to StableHLO text — the TPU-native
        analogue of the reference's ONNX export (OnnxSaver,
        onnx_utils.py:419): a deployable compiler-IR artifact with the
        fake-quant ops embedded."""
        lowered = jax.jit(self.quantized_fn).lower(params, *example_inputs)
        text = lowered.as_text()
        out = f"{path}/{prefix}.stablehlo.mlir"
        with open(out, "w") as f:
            f.write(text)
        return out

    def load_encodings(self, encodings_dict: Dict[str, Any]):
        """Restore encodings from an exported dict (load_encodings,
        v1/quantsim.py:1696)."""
        from ..quantization.affine import compute_encoding_from_min_max
        merged = {}
        merged.update(encodings_dict.get("activation_encodings", {}))
        merged.update(encodings_dict.get("param_encodings", {}))
        for name, entries in merged.items():
            if name not in self.quantizers:
                continue
            spec = self.quantizers[name]
            if entries and all(
                    str(e.get("dtype", "int")).lower() == "float"
                    for e in entries):
                bw = int(entries[0].get("bitwidth", 16))
                self.quantizers[name] = dataclasses.replace(
                    spec, data_type="float", bitwidth=bw)
                spec = self.quantizers[name]
                if not all("min" in e and "max" in e for e in entries):
                    # FP16: no grid to restore; a placeholder encoding keeps
                    # the quantizer active in the quantized forward
                    self._encodings[name] = compute_encoding_from_min_max(
                        jnp.float32(-1.0), jnp.float32(1.0), 8,
                        spec.symmetric, spec.strict_symmetric,
                        spec.unsigned_symmetric)
                    continue
                mins = jnp.asarray([e["min"] for e in entries], jnp.float32)
                maxs = jnp.asarray([e["max"] for e in entries], jnp.float32)
                if len(entries) == 1:
                    mins, maxs = mins[0], maxs[0]
                self._encodings[name] = compute_encoding_from_min_max(
                    mins, maxs, 8, spec.symmetric, spec.strict_symmetric,
                    spec.unsigned_symmetric)
                continue
            if all("scale" in e and "offset" in e for e in entries):
                # exact reconstruction from the stored grid
                deltas = jnp.asarray([e["scale"] for e in entries], jnp.float32)
                offsets = jnp.asarray([float(e["offset"]) for e in entries],
                                      jnp.float32)
                mins = jnp.asarray([e["min"] for e in entries], jnp.float32)
                maxs = jnp.asarray([e["max"] for e in entries], jnp.float32)
                if len(entries) == 1:
                    deltas, offsets = deltas[0], offsets[0]
                    mins, maxs = mins[0], maxs[0]
                self._encodings[name] = AffineEncoding(
                    min=mins, max=maxs, delta=deltas, offset=offsets,
                    bitwidth=spec.bitwidth, symmetric=spec.symmetric,
                    strict_symmetric=spec.strict_symmetric,
                    unsigned_symmetric=spec.unsigned_symmetric)
                continue
            mins = jnp.asarray([e["min"] for e in entries], jnp.float32)
            maxs = jnp.asarray([e["max"] for e in entries], jnp.float32)
            if len(entries) == 1:
                mins, maxs = mins[0], maxs[0]
            self._encodings[name] = compute_encoding_from_min_max(
                mins, maxs, spec.bitwidth, spec.symmetric,
                spec.strict_symmetric, spec.unsigned_symmetric)

    def set_quantizer_enabled(self, name: str, enabled: bool):
        """Toggle a quantizer without removing it (QcQuantizeWrapper
        .enabled semantics): disabled quantizers skip BOTH the observe pass
        during (re)calibration and qdq in the quantized forward; their
        encoding is parked and restored on re-enable."""
        spec = self.quantizers[name]
        if spec.enabled == enabled:
            return
        self.quantizers[name] = dataclasses.replace(spec, enabled=enabled)
        parked = getattr(self, "_parked_encodings", None)
        if parked is None:
            parked = self._parked_encodings = {}
        if not enabled and name in self._encodings:
            parked[name] = self._encodings.pop(name)
        elif enabled and name in parked:
            self._encodings[name] = parked.pop(name)

    def disable_quantizer(self, name: str):
        """exclude_layers_from_quantization equivalent (v1/quantsim.py:731)."""
        spec = self.quantizers.pop(name, None)
        if spec is None:
            return
        self._encodings.pop(name, None)
        for d in (self._act_var_q, self._param_var_q, self._input_var_q,
                  self._output_var_q):
            for k in [k for k, v in d.items() if v == name]:
                del d[k]
        for eqn_id in list(self._eqn_input_q):
            self._eqn_input_q[eqn_id] = [
                (p, n) for p, n in self._eqn_input_q[eqn_id] if n != name]
            if not self._eqn_input_q[eqn_id]:
                del self._eqn_input_q[eqn_id]
