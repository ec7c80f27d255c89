"""AMP, AutoQuant, QuantAnalyzer orchestration tests."""
import jax.numpy as jnp
import numpy as np
import pytest

from aimet_tpu.algorithms.amp import Candidate, choose_mixed_precision, find_quantizer_groups
from aimet_tpu.algorithms.auto_quant import AutoQuant
from aimet_tpu.algorithms.quant_analyzer import QuantAnalyzer
from aimet_tpu.models.cnn import TinyMLP, init_model
from aimet_tpu.quantsim.qsim import QuantizationSimModel


@pytest.fixture
def setup(rng):
    model = TinyMLP(features=16)
    v, x = init_model(model, (8, 16))
    fn = lambda p, x: model.apply(p, x)
    batches = [jnp.asarray(rng.randn(8, 16).astype(np.float32)) for _ in range(3)]
    sim = QuantizationSimModel(fn, (v, x), quant_scheme="minmax",
                               default_param_bw=8, default_output_bw=8)
    sim.compute_encodings(v, iter(batches))
    ref = model.apply(v, batches[0])

    def eval_fn(forward):
        out = forward(batches[0])
        return -float(jnp.mean((out - ref) ** 2))  # higher = better

    return model, fn, sim, v, batches, eval_fn, ref


class TestAmp:
    def test_find_groups(self, setup):
        """Cross-op merge (quantizer_groups.py:62-337): a layer's weight
        quantizer is grouped with the activation quantizer FEEDING it, so a
        candidate flips the whole MAC-input pair together."""
        _, _, sim, *_ = setup
        groups = find_quantizer_groups(sim)
        names = {g.name for g in groups}
        assert "linear_2" in names and "relu_0" in names
        # relu_0 feeds linear_1: its group carries linear_1's weight
        relu0 = next(g for g in groups if g.name == "relu_0")
        assert any("kernel" in p for p in relu0.param_quantizers)
        # every param quantizer lands in exactly one group
        all_params = [p for g in groups for p in g.param_quantizers]
        assert len(all_params) == len(set(all_params))
        n_param_q = sum(1 for s in sim.quantizers.values()
                        if s.kind == "param")
        assert len(all_params) == n_param_q

    def test_set_bitwidth_recomputes(self, setup):
        _, _, sim, v, batches, eval_fn, ref = setup
        name = next(n for n, s in sim.quantizers.items() if s.kind == "param")
        d8 = float(jnp.max(sim.encodings[name].delta))
        sim.set_bitwidth(name, 4)
        assert sim.quantizers[name].bitwidth == 4
        d4 = float(jnp.max(sim.encodings[name].delta))
        assert d4 > d8 * 8  # 4-bit delta ~16x coarser

    def test_greedy_amp(self, setup):
        _, _, sim, v, batches, eval_fn, ref = setup
        cands = [Candidate(8, 8), Candidate(8, 4)]
        result = choose_mixed_precision(sim, v, cands, eval_fn,
                                        allowed_accuracy_drop=1e-3)
        assert result.baseline_accuracy >= result.final_accuracy - 1e-9
        assert result.pareto_front[0][0] == 1.0
        # every flipped group respected the accuracy budget
        assert result.baseline_accuracy - result.final_accuracy <= 1e-3 + 1e-9
        # some assignment exists for every group
        assert set(result.group_bitwidths) == {g.name for g in
                                               find_quantizer_groups(sim)}

    def test_amp_with_huge_budget_flips_everything(self, setup):
        _, _, sim, v, batches, eval_fn, ref = setup
        cands = [Candidate(8, 8), Candidate(4, 4)]
        result = choose_mixed_precision(sim, v, cands, eval_fn,
                                        allowed_accuracy_drop=1e9)
        flipped = [c for c in result.group_bitwidths.values()
                   if c == Candidate(4, 4)]
        assert len(flipped) == len(result.group_bitwidths)


class TestQuantAnalyzer:
    def test_analyze_and_report(self, setup, tmp_path):
        _, _, sim, v, batches, eval_fn, _ = setup
        qa = QuantAnalyzer(sim, v, eval_fn)
        res = qa.analyze(mse_batches=batches[:1])
        assert res.fp_accuracy >= res.quantized_accuracy - 1e-9
        assert res.fp_accuracy == pytest.approx(0.0)  # eval vs itself
        assert len(res.per_quantizer_sensitivity) == len(sim.encodings)
        assert res.per_layer_mse  # populated
        assert all(np.isfinite(list(res.per_layer_mse.values())))
        out = tmp_path / "report.html"
        QuantAnalyzer.export_html(res, str(out))
        text = out.read_text()
        assert "Quantization analysis" in text and "linear_2" in text


class TestAutoQuant:
    def test_pipeline_runs_and_improves(self, rng):
        from aimet_tpu.models.cnn import TinyCNN
        model = TinyCNN()
        v, x = init_model(model, (4, 8, 8, 1))
        fn = lambda p, x: model.apply(p, x)
        batches = [jnp.asarray(rng.randn(4, 8, 8, 1).astype(np.float32))
                   for _ in range(2)]
        ref = model.apply(v, batches[0])

        def eval_fn(forward):
            return -float(jnp.mean((forward(batches[0]) - ref) ** 2))

        from aimet_tpu.algorithms.adaround import AdaroundParameters
        aq = AutoQuant(fn, (v, x), v, batches, eval_fn,
                       quant_scheme="minmax", default_param_bw=4,
                       adaround_params=AdaroundParameters(
                           num_batches=2, num_iterations=60))
        result = aq.optimize(allowed_accuracy_drop=0.0)
        assert result.best_stage in ("quantsim", "cle", "adaround")
        stages = [s.name for s in result.history]
        assert stages[0] == "fp32"
        assert result.accuracy >= result.history[1].accuracy - 1e-9
        assert "AutoQuant stages" in result.diagnostics()

    def test_early_exit_when_target_met(self, setup):
        model, fn, sim, v, batches, eval_fn, ref = setup
        aq = AutoQuant(fn, (v, batches[0]), v, batches, eval_fn,
                       quant_scheme="minmax", default_param_bw=8)
        # INT8 on this tiny model is nearly exact: generous drop target =>
        # stop right after stage 1
        result = aq.optimize(allowed_accuracy_drop=1.0)
        assert result.best_stage == "quantsim"
        assert [s.name for s in result.history] == ["fp32", "quantsim"]


class TestAutoQuantWithAmp:
    def test_amp_stage_runs_when_target_unmet(self, rng):
        from aimet_tpu.algorithms.auto_quant import AutoQuantWithAutoMixedPrecision
        from aimet_tpu.algorithms.adaround import AdaroundParameters
        from aimet_tpu.algorithms.amp import Candidate
        model = TinyMLP(features=16)
        v, x = init_model(model, (8, 16))
        fn = lambda p, x: model.apply(p, x)
        batches = [jnp.asarray(rng.randn(8, 16).astype(np.float32))
                   for _ in range(2)]
        ref = model.apply(v, batches[0])

        def eval_fn(forward):
            return -float(jnp.mean((forward(batches[0]) - ref) ** 2))

        aq = AutoQuantWithAutoMixedPrecision(
            fn, (v, x), v, batches, eval_fn, quant_scheme="minmax",
            default_param_bw=4, default_output_bw=4,
            adaround_params=AdaroundParameters(num_batches=2, num_iterations=40),
            amp_candidates=[Candidate(16, 16), Candidate(4, 4)])
        result = aq.optimize(allowed_accuracy_drop=1e-6)
        stages = [s.name for s in result.history]
        assert "amp" in stages
        # amp stage starts from 16-bit baseline: accuracy should be best
        assert result.accuracy >= max(s.accuracy for s in result.history[1:-1])


class TestConvertOpReduction:
    def test_reduce_convert_ops(self, setup):
        from aimet_tpu.algorithms.amp import (
            ConvertOpResult, reduce_convert_ops)
        _, _, sim, v, batches, eval_fn, ref = setup
        cands = [Candidate(16, 8), Candidate(8, 8)]
        result = choose_mixed_precision(sim, v, cands, eval_fn,
                                        allowed_accuracy_drop=10.0)
        # huge budget -> everything flips to act_bw=8; force a mixed
        # boundary by pinning one group back at 16 bits
        mixed = dict(result.group_bitwidths)
        some = next(n for n, c in mixed.items()
                    if any(g.name == n and g.act_quantizers
                           for g in find_quantizer_groups(sim)))
        mixed[some] = Candidate(16, 8)
        result.group_bitwidths = mixed
        out = reduce_convert_ops(sim, result, cands, alpha=1.0)
        assert isinstance(out, ConvertOpResult)
        # reduction never increases convert-op count
        assert out.converts_after <= out.converts_before
        assert 0.0 < out.cost_ratio <= 2.0
        # with a generous alpha the graph should end boundary-free
        assert out.converts_after == 0

    def test_zero_boundaries_noop(self, setup):
        from aimet_tpu.algorithms.amp import reduce_convert_ops
        _, _, sim, v, batches, eval_fn, ref = setup
        cands = [Candidate(8, 8), Candidate(8, 4)]
        result = choose_mixed_precision(sim, v, cands, eval_fn,
                                        allowed_accuracy_drop=1e-3)
        # act bw uniform (8) in both candidates -> no convert ops at all
        out = reduce_convert_ops(sim, result, cands)
        assert out.converts_before == 0 and out.converts_after == 0
        assert out.assignment == result.group_bitwidths


class TestAutoQuantCacheAndDiagnostics:
    """VERDICT r1 #8: resumable AutoQuant via utils.cache + HTML report
    (reference cache at adaround_weight.py:596; bokeh diagnostics at
    v1/auto_quant.py:1278)."""

    def _build(self, rng, eval_counter, cache_dir):
        from aimet_tpu.algorithms.adaround import AdaroundParameters
        from aimet_tpu.models.cnn import TinyCNN
        model = TinyCNN()
        v, x = init_model(model, (4, 8, 8, 1))
        fn = lambda p, x: model.apply(p, x)
        batches = [jnp.asarray(
            np.random.RandomState(7).randn(4, 8, 8, 1).astype(np.float32))]
        ref = model.apply(v, batches[0])

        def eval_fn(forward):
            eval_counter.append(1)
            return -float(jnp.mean((forward(batches[0]) - ref) ** 2))

        return AutoQuant(fn, (v, x), v, batches, eval_fn,
                         quant_scheme="minmax", default_param_bw=4,
                         adaround_params=AdaroundParameters(
                             num_batches=1, num_iterations=40),
                         cache_dir=cache_dir)

    def test_resume_skips_completed_stages(self, rng, tmp_path):
        calls1 = []
        aq1 = self._build(rng, calls1, str(tmp_path))
        r1 = aq1.optimize(allowed_accuracy_drop=0.0)

        # a fresh run with the same cache dir must not re-run the fp32 /
        # quantsim / cle evals (reference Cache.mark memoization): only the
        # final uncached adaround eval executes again
        calls2 = []
        aq2 = self._build(rng, calls2, str(tmp_path))
        r2 = aq2.optimize(allowed_accuracy_drop=0.0)
        assert len(calls2) < len(calls1)
        assert sum(1 for f in tmp_path.iterdir()
                   if f.name.startswith("autoquant.")) >= 3
        # identical numbers out of the cache
        assert [s.accuracy for s in r2.history][:3] == \
            [s.accuracy for s in r1.history][:3]
        # adaround per-layer weights were cached too
        assert any(".ada." in f.name for f in tmp_path.iterdir())

    def test_html_diagnostics(self, rng, tmp_path):
        calls = []
        aq = self._build(rng, calls, None)
        result = aq.optimize(allowed_accuracy_drop=1.0)
        out = result.export_diagnostics(str(tmp_path / "aq.html"))
        html = open(out).read()
        assert "AutoQuant diagnostics" in html
        assert result.best_stage in html
        for s in result.history:
            assert s.name in html
