"""Model zoo smoke tests + multi-device sharding tests (8-dev CPU mesh)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aimet_tpu.models.mobilenet_v2 import MobileNetV2
from aimet_tpu.models.resnet import ResNet18
from aimet_tpu.models.transformer import (
    Transformer,
    TransformerConfig,
    init_kv_caches,
)


class TestModels:
    def test_mobilenet_v2_tiny_input(self):
        model = MobileNetV2(num_classes=10, width_mult=0.25)
        x = jnp.ones((1, 32, 32, 3))
        v = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(v, x)
        assert out.shape == (1, 10)

    def test_resnet18_tiny_input(self):
        model = ResNet18(num_classes=10, num_filters=8)
        x = jnp.ones((1, 32, 32, 3))
        v = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(v, x)
        assert out.shape == (1, 10)

    def test_transformer_prefill(self):
        cfg = TransformerConfig.tiny()
        model = Transformer(cfg)
        tokens = jnp.zeros((2, 8), jnp.int32)
        v = model.init(jax.random.PRNGKey(0), tokens)
        logits = model.apply(v, tokens)
        assert logits.shape == (2, 8, cfg.vocab_size)

    def test_transformer_decode_matches_prefill(self):
        cfg = TransformerConfig.tiny()
        model = Transformer(cfg)
        rng = np.random.RandomState(0)
        tokens = jnp.asarray(rng.randint(0, cfg.vocab_size, (1, 6)), jnp.int32)
        v = model.init(jax.random.PRNGKey(0), tokens)
        full = model.apply(v, tokens)

        caches = init_kv_caches(cfg, 1, 8)
        outs = []
        for t in range(6):
            logits, caches = model.apply(v, tokens[:, t:t + 1], caches, t)
            outs.append(logits[:, 0])
        step = jnp.stack(outs, axis=1)
        np.testing.assert_allclose(np.asarray(step), np.asarray(full),
                                   rtol=2e-2, atol=2e-3)

    def test_quantsim_on_mobilenet_slice(self, rng):
        """Quantsim over a real CNN with depthwise convs + relu6 clips."""
        from aimet_tpu.quantsim.qsim import QuantizationSimModel
        model = MobileNetV2(num_classes=10, width_mult=0.25)
        x = jnp.ones((1, 32, 32, 3))
        v = model.init(jax.random.PRNGKey(0), x)
        fn = lambda v, x: model.apply(v, x)
        sim = QuantizationSimModel(fn, (v, x), quant_scheme="minmax")
        batches = [jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
                   for _ in range(2)]
        sim.compute_encodings(v, iter(batches))
        out = sim.quantized_fn(v, batches[0])
        ref = model.apply(v, batches[0])
        err = float(jnp.mean(jnp.abs(out - ref)))
        assert np.isfinite(err) and err < 1.0


class TestSharding:
    def test_eight_devices_available(self):
        assert len(jax.devices()) == 8

    def test_dryrun_multichip(self):
        import __graft_entry__
        __graft_entry__.dryrun_multichip(8)

    def test_entry_compiles(self):
        import __graft_entry__
        fn, args = __graft_entry__.entry()
        out = jax.jit(fn)(*args)
        assert np.isfinite(np.asarray(out)).all()
