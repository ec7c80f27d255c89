"""Serving path tests: INT8 KV cache, quantized transformer inference,
continuous batching."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aimet_tpu.models.transformer import Transformer, TransformerConfig
from aimet_tpu.ops.kv_cache import (
    append_kv,
    dequantize_kv,
    init_quantized_kv_cache,
    prefill_kv,
)
from aimet_tpu.serving.batcher import ContinuousBatcher
from aimet_tpu.serving.quantized_llm import (
    QuantizedLLM,
    quantize_transformer_weights,
    quantized_forward,
)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = TransformerConfig.tiny(vocab_size=64)
    model = Transformer(cfg)
    tokens = jnp.zeros((1, 8), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), tokens)
    return cfg, model, variables


class TestKvCache:
    def test_prefill_roundtrip(self, rng):
        cache = init_quantized_kv_cache(2, 16, 4, 8)
        k = jnp.asarray(rng.randn(2, 6, 4, 8).astype(np.float32))
        v = jnp.asarray(rng.randn(2, 6, 4, 8).astype(np.float32))
        cache = prefill_kv(cache, k, v)
        kd, vd = dequantize_kv(cache)
        # int8 per-head: relative error bounded by scale/2
        err = np.abs(np.asarray(kd[:, :6]) - np.asarray(k)).max()
        assert err <= float(cache.k_scale.max()) / 2 + 1e-6
        assert np.all(np.asarray(kd[:, 6:]) == 0)

    def test_append_scalar_and_vector_index(self, rng):
        cache = init_quantized_kv_cache(2, 16, 4, 8)
        k0 = jnp.asarray(rng.randn(2, 4, 4, 8).astype(np.float32))
        cache = prefill_kv(cache, k0, k0)
        k1 = jnp.asarray(rng.randn(2, 1, 4, 8).astype(np.float32))
        c_scalar = append_kv(cache, k1, k1, 4)
        c_vector = append_kv(cache, k1, k1, jnp.asarray([4, 4]))
        np.testing.assert_array_equal(np.asarray(c_scalar.k),
                                      np.asarray(c_vector.k))
        # per-slot different positions
        c_mixed = append_kv(cache, k1, k1, jnp.asarray([4, 7]))
        assert np.any(np.asarray(c_mixed.k[1, 7]) != 0)
        assert np.all(np.asarray(c_mixed.k[1, 4]) == 0)


class TestQuantizedLLM:
    def test_w8_logits_close_to_fp(self, tiny_model, rng):
        cfg, model, variables = tiny_model
        tokens = jnp.asarray(rng.randint(0, 64, (2, 8)), jnp.int32)
        fp = model.apply(variables, tokens)
        qw = quantize_transformer_weights(variables, cfg, "w8")
        q_logits, _ = quantized_forward(qw, cfg, tokens, mode="w8")
        # top-1 agreement on most positions
        agree = np.mean(np.asarray(jnp.argmax(fp, -1) == jnp.argmax(q_logits, -1)))
        assert agree > 0.8

    def test_w4_runs(self, tiny_model, rng):
        cfg, model, variables = tiny_model
        tokens = jnp.asarray(rng.randint(0, 64, (1, 8)), jnp.int32)
        qw = quantize_transformer_weights(variables, cfg, "w4")
        logits, _ = quantized_forward(qw, cfg, tokens, mode="w4")
        assert np.isfinite(np.asarray(logits)).all()

    def test_generate_matches_incremental_fp_path(self, tiny_model, rng):
        cfg, model, variables = tiny_model
        llm = QuantizedLLM(variables, cfg, mode="w8", max_len=32)
        tokens = jnp.asarray(rng.randint(0, 64, (2, 5)), jnp.int32)
        out = llm.generate(tokens, 6)
        assert out.shape == (2, 11)
        # decode-with-cache consistency: rerun full prefill on the generated
        # prefix; its argmax continuation should match the cached decode
        # (full recompute uses fp K/V while the cached path quantizes the
        # cache to INT8, so argmax can differ on near-ties: require the
        # chosen token's full-context logit to be within a small margin of
        # the max instead of exact agreement)
        qw = llm.qw
        full_logits, _ = quantized_forward(qw, cfg, out[:, :-1], mode="w8")
        last = np.asarray(full_logits[:, -1])
        chosen = np.asarray(out[:, -1])
        for b in range(last.shape[0]):
            assert last[b, chosen[b]] >= last[b].max() - 0.25


class TestContinuousBatching:
    def test_batcher_completes_requests(self, tiny_model, rng):
        cfg, model, variables = tiny_model
        llm = QuantizedLLM(variables, cfg, mode="w8", max_len=32)
        batcher = ContinuousBatcher(llm, num_slots=2)
        reqs = [batcher.submit(list(rng.randint(0, 64, 4)), max_new_tokens=5)
                for _ in range(4)]  # more requests than slots
        steps = batcher.run_until_done(max_steps=200)
        assert all(r.done for r in reqs)
        assert all(len(r.generated) == 5 for r in reqs)
        assert steps < 200

    @pytest.mark.parametrize("use_native", [False, True])
    def test_chunked_decode_matches_per_step(self, tiny_model, rng,
                                             use_native):
        """Multi-step scheduling (step_chunk > 1): identical generated
        tokens to per-step decode, slots still recycled across requests."""
        cfg, model, variables = tiny_model
        llm = QuantizedLLM(variables, cfg, mode="w8", max_len=32)
        prompts = [list(rng.randint(0, 64, int(n))) for n in (4, 6, 3, 5)]
        lens = (5, 3, 7, 4)

        def run(chunk):
            b = ContinuousBatcher(llm, num_slots=2, use_native=use_native,
                                  step_chunk=chunk)
            reqs = [b.submit(p, max_new_tokens=n)
                    for p, n in zip(prompts, lens)]
            b.run_until_done(max_steps=200)
            return reqs

        base = run(1)
        chunked = run(4)
        assert all(r.done for r in chunked)
        for rb, rc in zip(base, chunked):
            assert rb.generated == rc.generated, (rb.generated, rc.generated)

    @pytest.mark.parametrize("use_native", [False, True])
    def test_pipelined_matches_per_step(self, tiny_model, rng, use_native):
        """run_pipelined (speculative chunk dispatch, device-side carry):
        per-request tokens identical to the per-step engine — scheduling
        may differ (admissions land one chunk later) but each request's
        greedy chain depends only on its own prompt and cache rows."""
        cfg, model, variables = tiny_model
        llm = QuantizedLLM(variables, cfg, mode="w8", max_len=32)
        prompts = [list(rng.randint(0, 64, int(n))) for n in (4, 6, 3, 5, 4)]
        lens = (5, 3, 7, 4, 6)

        b0 = ContinuousBatcher(llm, num_slots=2, use_native=use_native,
                               step_chunk=1)
        base = [b0.submit(p, max_new_tokens=n)
                for p, n in zip(prompts, lens)]
        b0.run_until_done(max_steps=200)

        b1 = ContinuousBatcher(llm, num_slots=2, use_native=use_native,
                               step_chunk=4)
        piped = [b1.submit(p, max_new_tokens=n)
                 for p, n in zip(prompts, lens)]
        steps = b1.run_pipelined(max_steps=200)
        assert all(r.done for r in piped) and steps < 200
        for rb, rc in zip(base, piped):
            assert rb.generated == rc.generated, (rb.generated, rc.generated)

    def test_batcher_matches_unbatched_generation(self, tiny_model, rng):
        cfg, model, variables = tiny_model
        llm = QuantizedLLM(variables, cfg, mode="w8", max_len=32)
        prompt = list(rng.randint(0, 64, 5))
        solo = llm.generate(jnp.asarray([prompt], jnp.int32), 4)
        expected = np.asarray(solo[0, 5:])

        batcher = ContinuousBatcher(llm, num_slots=3)
        r1 = batcher.submit(prompt, max_new_tokens=4)
        r2 = batcher.submit(list(rng.randint(0, 64, 3)), max_new_tokens=6)
        batcher.run_until_done(max_steps=100)
        np.testing.assert_array_equal(np.asarray(r1.generated), expected)
        assert len(r2.generated) == 6


class TestShardedServing:
    def test_tp_dp_generation_matches_single_device(self, tiny_model, rng):
        from aimet_tpu.parallel.mesh import make_mesh
        from aimet_tpu.serving.multihost import ShardedQuantizedLLM

        cfg, model, variables = tiny_model
        solo = QuantizedLLM(variables, cfg, mode="w8", max_len=32)
        prompts = jnp.asarray(rng.randint(0, 64, (4, 6)), jnp.int32)
        ref = solo.generate(prompts, 5)

        mesh = make_mesh(dp=4, tp=2)
        sharded = ShardedQuantizedLLM(solo.qw, cfg, mesh, mode="w8",
                                      max_len=32)
        out = sharded.generate(prompts, 5)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


class TestNativeScheduler:
    def test_native_matches_python_batcher(self, tiny_model, rng):
        """The C++ scheduler must schedule/terminate exactly like the
        Python reference implementation."""
        from aimet_tpu import native
        if not native.available():
            import pytest
            pytest.skip("native lib unavailable")
        cfg, model, variables = tiny_model
        llm = QuantizedLLM(variables, cfg, mode="w8", max_len=32)
        prompts = [list(rng.randint(0, 64, n)) for n in (4, 3, 5, 2, 4)]

        def run(use_native):
            b = ContinuousBatcher(llm, num_slots=2, use_native=use_native)
            reqs = [b.submit(p, max_new_tokens=m)
                    for p, m in zip(prompts, (5, 3, 6, 4, 2))]
            steps = b.run_until_done(max_steps=200)
            assert all(r.done for r in reqs)
            return [r.generated for r in reqs], steps

        gen_py, steps_py = run(False)
        gen_nat, steps_nat = run(True)
        assert gen_nat == gen_py
        assert steps_nat == steps_py

    def test_native_eos_termination(self, tiny_model, rng):
        from aimet_tpu import native
        if not native.available():
            import pytest
            pytest.skip("native lib unavailable")
        cfg, model, variables = tiny_model
        llm = QuantizedLLM(variables, cfg, mode="w8", max_len=32)
        b = ContinuousBatcher(llm, num_slots=2, use_native=True)
        # eos = whatever greedy emits first -> request ends after 1 token
        probe = ContinuousBatcher(llm, num_slots=1, use_native=False)
        pr = probe.submit([1, 2, 3], max_new_tokens=1)
        probe.run_until_done()
        eos = pr.generated[0]
        r = b.submit([1, 2, 3], max_new_tokens=10, eos_id=eos)
        b.run_until_done(max_steps=50)
        assert r.done and r.generated[-1] == eos and len(r.generated) == 1


def test_w4a8_serving_mode(rng):
    """W4A8 serving: packed-INT4 weights + dynamic INT8 activations —
    compute-bound phases (prefill) ride the int8 MXU fusedq path."""
    from aimet_tpu.models.transformer import Transformer, TransformerConfig
    from aimet_tpu.ops.kv_cache import init_quantized_kv_cache
    from aimet_tpu.serving.quantized_llm import (quantize_transformer_weights,
                                                 quantized_forward)
    cfg = TransformerConfig.tiny(vocab_size=64)
    m = Transformer(cfg)
    tok = jnp.asarray(rng.randint(0, 64, (2, 8)), jnp.int32)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    qw = quantize_transformer_weights(v, cfg, "w4a8")

    # parity on the cache-free path (the established metric: top-1
    # agreement; random-weight tiny models have near-tie logits)
    fp = m.apply(v, tok)
    logits, _ = quantized_forward(qw, cfg, tok, mode="w4a8")
    agree = np.mean(np.asarray(jnp.argmax(fp, -1)
                               == jnp.argmax(logits, -1)))
    assert agree > 0.7, agree

    # full serving path: prefill into the INT8 KV cache, then one decode
    caches = [init_quantized_kv_cache(2, 32, cfg.n_kv_heads, cfg.head_dim)
              for _ in range(cfg.n_layers)]
    _, caches = quantized_forward(qw, cfg, tok, caches, 0, prefill=True,
                                  mode="w4a8")
    logits2, _ = quantized_forward(qw, cfg, tok[:, -1:], caches, 8,
                                   prefill=False, mode="w4a8")
    assert logits2.shape == (2, 1, 64)
    assert np.isfinite(np.asarray(logits2)).all()


class TestVocabPadding:
    def test_padded_lm_head_logits_sliced_and_argmax_safe(self, rng):
        """pad_vocab_for_decode: logits come back at exactly vocab_size
        and generation never emits a padded index, whatever the sign of
        the true logits."""
        from aimet_tpu.serving.quantized_llm import (pad_vocab_for_decode,
                                                     random_quantized_weights)
        from aimet_tpu.models.transformer import TransformerConfig
        from aimet_tpu.ops.kv_cache import init_quantized_kv_cache

        cfg = TransformerConfig.tiny(vocab_size=100)   # not block-aligned
        qw = random_quantized_weights(cfg, mode="w4", seed=0)
        assert qw["lm_head"][0].shape[1] % 4096 == 0   # padded
        caches = [init_quantized_kv_cache(2, 16, cfg.n_kv_heads,
                                          cfg.head_dim)
                  for _ in range(cfg.n_layers)]
        toks = jnp.asarray(rng.randint(0, 100, (2, 4)), jnp.int32)
        logits, caches = quantized_forward(qw, cfg, toks, caches, 0,
                                           prefill=True, mode="w4")
        assert logits.shape == (2, 4, 100)
        # force all-true-negative logits: argmax must still be < vocab
        nxt = jnp.argmax(logits[:, -1] - 1e6, axis=-1)
        assert int(jnp.max(nxt)) < 100

    def test_pad_noop_when_aligned(self):
        from aimet_tpu.serving.quantized_llm import pad_vocab_for_decode
        wq = jnp.zeros((8, 4096), jnp.int8)
        s = jnp.ones((4096,), jnp.float32)
        w2, s2 = pad_vocab_for_decode((wq, s))
        assert w2 is wq and s2 is s
