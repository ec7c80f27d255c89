"""DeepLab-v3 and DeepSpeech2 model families (BASELINE rows 3, 5, 6)."""
import jax
import jax.numpy as jnp
import numpy as np

from aimet_tpu.models.deeplab import DeepLabV3Tiny
from aimet_tpu.models.detection import SSDLite, decode_boxes, make_anchors
from aimet_tpu.models.deepspeech import (
    deepspeech2_apply, init_deepspeech2, quantize_deepspeech2)
from aimet_tpu.quantsim.qsim import QuantizationSimModel


def _sqnr_db(ref, test):
    err = jnp.mean((ref - test) ** 2)
    sig = jnp.mean(ref ** 2)
    return float(10 * jnp.log10(sig / jnp.maximum(err, 1e-20)))


class TestDeepLab:
    def test_shapes_and_quantsim(self, rng):
        model = DeepLabV3Tiny()
        x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
        v = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(v, x)
        assert out.shape == (2, 32, 32, 8)

        fn = lambda p, x: model.apply(p, x)
        sim = QuantizationSimModel(fn, (v, x), quant_scheme="minmax",
                                   default_param_bw=8, default_output_bw=8)
        batches = [jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
                   for _ in range(2)]
        sim.compute_encodings(v, iter(batches))
        q = sim.quantized_fn(v, x)
        assert q.shape == out.shape
        # INT8 per-pixel logits stay close to FP (DFQ-table model family,
        # README.md:124-127)
        assert _sqnr_db(out, q) > 15.0
        # the graph saw the atrous convs
        conv_ops = [op for op in sim.graph.ops if "conv" in op.type.lower()]
        assert len(conv_ops) >= 10

    def test_aspp_is_dilated(self):
        # atrous branches must see a wider receptive field than a dense 3x3:
        # a centered impulse must reach offset +rate pixels after ASPP convs
        model = DeepLabV3Tiny()
        x = jnp.zeros((1, 33, 33, 3)).at[0, 16, 16, :].set(1.0)
        v = model.init(jax.random.PRNGKey(1), x)
        out = model.apply(v, x)
        assert bool(jnp.all(jnp.isfinite(out)))


class TestDeepSpeech2:
    def _setup(self, rng):
        params = init_deepspeech2(jax.random.PRNGKey(0), n_mels=16,
                                  conv_channels=4, hidden=16, num_layers=2,
                                  vocab=12)
        xs = [jnp.asarray(rng.randn(2, 20, 16).astype(np.float32) * 0.5)
              for _ in range(3)]
        return params, xs

    def test_fp_forward_shapes(self, rng):
        params, xs = self._setup(rng)
        out = deepspeech2_apply(params, xs[0])
        assert out.shape == (2, 10, 12)          # time /2, vocab
        # log-probs normalize
        np.testing.assert_allclose(
            np.asarray(jnp.exp(out).sum(-1)), 1.0, rtol=1e-4)

    def test_recurrent_quantsim_int8(self, rng):
        params, xs = self._setup(rng)
        qapply, quantizers = quantize_deepspeech2(params, xs[:2])
        assert len(quantizers) == 2              # one pair per bi-LSTM layer
        for rq_f, rq_b in quantizers:
            assert {"input", "hidden", "cell"} <= set(rq_f.encodings)
            assert {"input", "hidden", "cell"} <= set(rq_b.encodings)
        ref = deepspeech2_apply(params, xs[2])
        q = qapply(params, xs[2])
        assert q.shape == ref.shape
        # INT8 per-timestep quantization tracks FP (recurrent-QAT family,
        # README.md:176-196: WER delta +0.3 at INT8)
        assert _sqnr_db(ref, q) > 15.0


def test_deepspeech_odd_mels(rng):
    """n_mels not divisible by 4 must still produce matching LSTM widths
    (SAME-padded stride-2 convs give ceil(ceil(F/2)/2) bins)."""
    params = init_deepspeech2(jax.random.PRNGKey(1), n_mels=30,
                              conv_channels=4, hidden=8, num_layers=1,
                              vocab=5)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 12, 30),
                    jnp.float32)
    out = deepspeech2_apply(params, x)
    assert out.shape == (1, 6, 5)


class TestSSDLiteDetection:
    """ADAS object-detection family (BASELINE row 4: AdaRound W8A8,
    reference README.md:133-151)."""

    def _setup(self, rng, size=32):
        model = SSDLite(num_classes=4, anchors_per_cell=2, width=8)
        x = jnp.asarray(rng.randn(2, size, size, 3).astype(np.float32))
        v = model.init(jax.random.PRNGKey(0), x)
        return model, v, x

    def test_shapes_and_anchor_count(self, rng):
        model, v, x = self._setup(rng)
        cls, box = model.apply(v, x)
        anchors = make_anchors(32, anchors_per_cell=2)
        assert cls.shape == (2, anchors.shape[0], 4)
        assert box.shape == (2, anchors.shape[0], 4)
        decoded = decode_boxes(box, anchors)
        assert decoded.shape == box.shape
        assert bool(jnp.all(jnp.isfinite(decoded)))

    def test_adaround_w8a8_beats_nearest(self, rng):
        from aimet_tpu.algorithms.adaround import (
            AdaroundParameters, apply_adaround)
        model, v, x = self._setup(rng)
        fn = lambda p, x: model.apply(p, x)
        sim = QuantizationSimModel(fn, (v, x), quant_scheme="minmax",
                                   default_param_bw=8, default_output_bw=8)
        batches = [jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
                   for _ in range(2)]
        sim.compute_encodings(v, iter(batches))
        ref_cls, ref_box = model.apply(v, x)

        q_cls, q_box = sim.quantized_fn(v, x)
        assert _sqnr_db(ref_cls, q_cls) > 15.0

        ada = AdaroundParameters(num_batches=2, num_iterations=60)
        new_params = apply_adaround(sim, v, batches, ada)
        a_cls, a_box = sim.quantized_fn(new_params, x)
        err_nearest = float(jnp.mean((q_box - ref_box) ** 2)
                            + jnp.mean((q_cls - ref_cls) ** 2))
        err_ada = float(jnp.mean((a_box - ref_box) ** 2)
                        + jnp.mean((a_cls - ref_cls) ** 2))
        # the W8A8 AdaRound recipe must not regress vs nearest rounding
        # (deterministic seeded run: require it to actually not be worse)
        assert err_ada <= err_nearest
