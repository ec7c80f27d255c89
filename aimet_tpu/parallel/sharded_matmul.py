"""Tensor-parallel quantized matmuls over a device mesh.

The serving-scale design from BASELINE config 5: INT8/INT4 weights sharded
across the `tp` axis, activations replicated (column-parallel) or sharded
(row-parallel), with the dequant fused before the collective so the psum
runs on bf16 partials:

  column-parallel: W (K, N/tp) per device -> local matmul, outputs sharded
  row-parallel:    W (K/tp, N) per device, x sharded on K -> local matmul
                   + psum over tp

Uses shard_map so the collectives are explicit; the local op is the fused
dequant-matmul kernel on TPU (XLA fallback elsewhere).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.int_matmul import matmul_w8, matmul_w8_xla


def _local_mm(x, w_q, w_scale):
    if jax.default_backend() == "tpu":
        return matmul_w8(x, w_q, w_scale)
    return matmul_w8_xla(x, w_q, w_scale)


def column_parallel_w8(mesh: Mesh, axis: str = "tp"):
    """Returns fn(x, w_q, w_scale) with w sharded on its output dim.
    x replicated (M, K); w_q (K, N) sharded N/tp; out (M, N) sharded."""

    def local(x, w_q, w_scale):
        return _local_mm(x, w_q, w_scale)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(None, axis), P(axis)),
        out_specs=P(None, axis))


def row_parallel_w8(mesh: Mesh, axis: str = "tp"):
    """Returns fn(x, w_q, w_scale) with w sharded on its input dim.
    x (M, K) sharded on K; w_q (K, N) sharded K/tp; out replicated via psum.
    The dequant (per-out-channel scale) commutes with the sum, so partials
    are scaled locally and psum'd in bf16/f32."""

    def local(x, w_q, w_scale):
        part = _local_mm(x, w_q, w_scale)
        return jax.lax.psum(part, axis)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis), P(axis, None), P()),
        out_specs=P())


def tp_quantized_mlp(mesh: Mesh, axis: str = "tp"):
    """Megatron-style 2-matmul MLP: column-parallel up (+act), row-parallel
    down with a single psum at the end."""

    def local(x, w_up_q, s_up, w_down_q, s_down):
        h = _local_mm(x, w_up_q, s_up)
        h = jax.nn.gelu(h)
        part = _local_mm(h, w_down_q, s_down)
        return jax.lax.psum(part, axis)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(None, axis), P(axis), P(axis, None), P()),
        out_specs=P())
