"""Tensor-parallel quantized matmul + static-grid QAT tests (8-dev mesh)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aimet_tpu.models.cnn import TinyMLP, init_model
from aimet_tpu.ops.int_matmul import matmul_w8_xla, quantize_weight_per_channel
from aimet_tpu.parallel.mesh import make_mesh
from aimet_tpu.parallel.sharded_matmul import (
    column_parallel_w8,
    row_parallel_w8,
    tp_quantized_mlp,
)
from aimet_tpu.quantsim.qsim import QuantizationSimModel


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(dp=1, tp=8)


class TestTensorParallel:
    def test_column_parallel_matches_local(self, mesh, rng):
        x = jnp.asarray(rng.randn(16, 64).astype(np.float32))
        w = jnp.asarray(rng.randn(64, 128).astype(np.float32) * 0.1)
        wq, s = quantize_weight_per_channel(w)
        ref = matmul_w8_xla(x, wq, s)
        fn = jax.jit(column_parallel_w8(mesh))
        out = fn(x, wq, s)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_row_parallel_psum_matches_local(self, mesh, rng):
        x = jnp.asarray(rng.randn(16, 64).astype(np.float32))
        w = jnp.asarray(rng.randn(64, 128).astype(np.float32) * 0.1)
        wq, s = quantize_weight_per_channel(w)
        ref = matmul_w8_xla(x, wq, s)
        fn = jax.jit(row_parallel_w8(mesh))
        out = fn(x, wq, s)
        # psum over int8 partials of *independent* K-shards: the activation
        # row-quant happens per shard, so allow quantization-level tolerance
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0.05, atol=0.05)

    def test_tp_mlp(self, mesh, rng):
        x = jnp.asarray(rng.randn(8, 64).astype(np.float32))
        w_up = jnp.asarray(rng.randn(64, 256).astype(np.float32) * 0.1)
        w_dn = jnp.asarray(rng.randn(256, 64).astype(np.float32) * 0.1)
        uq, us = quantize_weight_per_channel(w_up)
        dq, ds = quantize_weight_per_channel(w_dn)
        fn = jax.jit(tp_quantized_mlp(mesh))
        out = fn(x, uq, us, dq, ds)
        ref = matmul_w8_xla(jax.nn.gelu(matmul_w8_xla(x, uq, us)), dq, ds)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0.05, atol=0.05)


class TestStaticGridQat:
    def test_dynamic_param_encodings_track_weights(self, rng):
        model = TinyMLP(features=16)
        v, x = init_model(model, (8, 16))
        fn = lambda p, x: model.apply(p, x)
        sim = QuantizationSimModel(fn, (v, x), quant_scheme="minmax",
                                   default_param_bw=4)
        sim.compute_encodings(v, iter([x]))
        qat = sim.static_grid_qat_fn()

        out1 = qat(v, x)
        # scale all weights 10x: fixed encodings would saturate; dynamic
        # encodings rescale, keeping relative error stable
        import jax.tree_util as jtu
        v10 = jtu.tree_map(lambda l: l * 10 if l.ndim == 2 else l, v)
        ref10 = model.apply(v10, x)
        out_fixed = sim.quantized_fn(v10, x)
        out_dyn = qat(v10, x)
        # activations also saturate under fixed act encodings; compare the
        # param-quant error in isolation by disabling act encodings
        act_names = [n for n, s in sim.quantizers.items() if s.kind != "param"]
        out_dyn_w = sim._run(v10, (x,), "quantized",
                             encodings={k: e for k, e in sim.encodings.items()
                                        if k not in act_names},
                             dynamic_params=True)[0]
        err_dyn = float(jnp.mean(jnp.abs(out_dyn_w - ref10)))
        rel = err_dyn / (float(jnp.mean(jnp.abs(ref10))) + 1e-9)
        assert rel < 0.2  # dynamic grids track the rescaled weights

        def loss(params):
            return jnp.sum(qat(params, x) ** 2)
        g = jax.grad(loss)(v)
        gnorm = sum(float(jnp.sum(jnp.abs(l))) for l in jtu.tree_leaves(g))
        assert np.isfinite(gnorm) and gnorm > 0
