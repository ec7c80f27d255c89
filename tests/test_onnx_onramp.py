"""ONNX on-ramp breadth (VERDICT r3 missing #3): transformer blocks,
unfolded ResNet stages, and LSTM ride the ONNX ingestion path.

Graphs are hand-assembled ModelProto bytes (build_model_bytes) in
third-party style (NCHW convs, 3-D MatMul transformers, ONNX LSTM) — NOT
our own exporter's output — and executed by onnx_reader.load_onnx.
Oracles are torch CPU ops (exact ONNX operator semantics) or replicated
jnp math. Reference entry point being mirrored:
aimet_onnx/quantsim.py:487-524 (InferenceSession over arbitrary graphs).
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from aimet_tpu.interop.onnx_export import build_model_bytes
from aimet_tpu.interop.onnx_reader import load_onnx


def _write(tmp_path, nodes, inits, inputs, outputs):
    path = str(tmp_path / "m.onnx")
    with open(path, "wb") as f:
        f.write(build_model_bytes(nodes, inits, inputs, outputs))
    return path


class TestTransformerBlock:
    def _build(self, tmp_path, rng, B=2, T=8, D=32, H=4):
        hd = D // H
        w = lambda *s: rng.randn(*s).astype(np.float32) * 0.1
        inits = {
            "ln1_g": np.ones(D, np.float32), "ln1_b": w(D),
            "ln2_g": np.ones(D, np.float32), "ln2_b": w(D),
            "wqkv": w(D, 3 * D), "wo": w(D, D),
            "w1": w(D, 4 * D), "w2": w(4 * D, D),
            "shape_heads": np.asarray([B, T, H, hd], np.int64),
            "shape_flat": np.asarray([B, T, D], np.int64),
            "scale": np.asarray(1.0 / np.sqrt(hd), np.float32),
        }
        n = []
        n.append(("LayerNormalization", ["x", "ln1_g", "ln1_b"], ["ln1"],
                  "ln1", {"axis": -1}))
        n.append(("MatMul", ["ln1", "wqkv"], ["qkv"], "qkv", {}))
        n.append(("Split", ["qkv"], ["q", "k", "v"], "split",
                  {"axis": -1, "split": [D, D, D]}))
        for t in ("q", "k", "v"):
            n.append(("Reshape", [t, "shape_heads"], [t + "r"], t + "r", {}))
            n.append(("Transpose", [t + "r"], [t + "t"], t + "t",
                      {"perm": [0, 2, 1, 3]}))
        n.append(("Transpose", ["kt"], ["ktt"], "ktt",
                  {"perm": [0, 1, 3, 2]}))
        n.append(("MatMul", ["qt", "ktt"], ["scores0"], "scores0", {}))
        n.append(("Mul", ["scores0", "scale"], ["scores"], "scores", {}))
        n.append(("Softmax", ["scores"], ["probs"], "probs", {"axis": -1}))
        n.append(("MatMul", ["probs", "vt"], ["ctx0"], "ctx0", {}))
        n.append(("Transpose", ["ctx0"], ["ctx1"], "ctx1",
                  {"perm": [0, 2, 1, 3]}))
        n.append(("Reshape", ["ctx1", "shape_flat"], ["ctx"], "ctx", {}))
        n.append(("MatMul", ["ctx", "wo"], ["attn"], "attn", {}))
        n.append(("Add", ["x", "attn"], ["res1"], "res1", {}))
        n.append(("LayerNormalization", ["res1", "ln2_g", "ln2_b"], ["ln2"],
                  "ln2", {"axis": -1}))
        n.append(("MatMul", ["ln2", "w1"], ["ff1"], "ff1", {}))
        n.append(("Gelu", ["ff1"], ["ff1g"], "ff1g", {}))
        n.append(("MatMul", ["ff1g", "w2"], ["ff2"], "ff2", {}))
        n.append(("Add", ["res1", "ff2"], ["y"], "y", {}))
        path = _write(tmp_path, n, inits, [("x", (B, T, D))],
                      [("y", (B, T, D))])
        return path, inits, (B, T, D, H)

    def _torch_oracle(self, inits, x, H):
        xt = torch.from_numpy(x)
        D = x.shape[-1]
        hd = D // H
        t = {k: torch.from_numpy(np.asarray(v)) for k, v in inits.items()}
        ln1 = F.layer_norm(xt, (D,), t["ln1_g"], t["ln1_b"])
        qkv = ln1 @ t["wqkv"]
        q, k, v = qkv.split(D, dim=-1)
        B, T = x.shape[:2]
        sh = lambda z: z.reshape(B, T, H, hd).permute(0, 2, 1, 3)
        q, k, v = sh(q), sh(k), sh(v)
        probs = torch.softmax((q @ k.transpose(-1, -2)) / np.sqrt(hd), -1)
        ctx = (probs @ v).permute(0, 2, 1, 3).reshape(B, T, D)
        res1 = xt + ctx @ t["wo"]
        ln2 = F.layer_norm(res1, (D,), t["ln2_g"], t["ln2_b"])
        y = res1 + F.gelu(ln2 @ t["w1"]) @ t["w2"]
        return y.numpy()

    def test_transformer_block_executes(self, tmp_path, rng):
        path, inits, (B, T, D, H) = self._build(tmp_path, rng)
        fn, params = load_onnx(path)
        x = rng.randn(B, T, D).astype(np.float32)
        got = np.asarray(jax.jit(fn)(params, jnp.asarray(x)))
        want = self._torch_oracle(inits, x, H)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_quantsim_over_onnx_transformer(self, tmp_path, rng):
        """The reference's aimet_onnx flow: quantsim over an ingested
        transformer graph — calibrate, quantize, export encodings."""
        from aimet_tpu.quantsim.qsim import QuantizationSimModel

        path, inits, (B, T, D, H) = self._build(tmp_path, rng)
        fn, params = load_onnx(path)
        x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
        sim = QuantizationSimModel(fn, (params, x), quant_scheme="minmax")
        batches = [jnp.asarray(rng.randn(B, T, D).astype(np.float32))
                   for _ in range(2)]
        sim.compute_encodings(params, iter(batches))
        yq = np.asarray(sim.quantized_fn(params, x))
        yf = np.asarray(fn(params, x))
        assert yq.shape == yf.shape
        # INT8 sim output tracks the float output
        err = np.mean((yq - yf) ** 2) / max(np.mean(yf ** 2), 1e-9)
        assert err < 0.05
        enc = sim.export_encodings()
        assert enc["activation_encodings"]


class TestResNetStage:
    def _build(self, tmp_path, rng, C=8):
        w = lambda *s: (rng.randn(*s) * 0.2).astype(np.float32)
        inits = {
            "w1": w(C, C, 3, 3), "w2": w(C, C, 3, 3),
            "g1": np.abs(w(C)) + 0.5, "b1": w(C),
            "m1": w(C), "v1": np.abs(w(C)) + 0.5,
            "g2": np.abs(w(C)) + 0.5, "b2": w(C),
            "m2": w(C), "v2": np.abs(w(C)) + 0.5,
            "pads": np.asarray([0, 0, 1, 1, 0, 0, 1, 1], np.int64),
        }
        n = [
            ("Pad", ["x", "pads"], ["xp"], "xp", {"mode": "constant"}),
            ("Conv", ["xp", "w1"], ["c1"], "c1",
             {"kernel_shape": [3, 3], "strides": [1, 1],
              "pads": [0, 0, 0, 0]}),
            ("BatchNormalization", ["c1", "g1", "b1", "m1", "v1"], ["bn1"],
             "bn1", {"epsilon": 1e-5}),
            ("Relu", ["bn1"], ["r1"], "r1", {}),
            ("Conv", ["r1", "w2"], ["c2"], "c2",
             {"kernel_shape": [3, 3], "strides": [1, 1],
              "pads": [1, 1, 1, 1]}),
            ("BatchNormalization", ["c2", "g2", "b2", "m2", "v2"], ["bn2"],
             "bn2", {"epsilon": 1e-5}),
            ("Add", ["bn2", "x"], ["sum"], "sum", {}),
            ("Relu", ["sum"], ["r2"], "r2", {}),
            ("MaxPool", ["r2"], ["y"], "y",
             {"kernel_shape": [2, 2], "strides": [2, 2]}),
        ]
        return _write(tmp_path, n, inits, [("x", (2, C, 8, 8))],
                      [("y", (2, C, 4, 4))]), inits

    def _torch_oracle(self, inits, x):
        t = {k: torch.from_numpy(np.asarray(v)) for k, v in inits.items()}
        xt = torch.from_numpy(x)
        xp = F.pad(xt, (1, 1, 1, 1))
        c1 = F.conv2d(xp, t["w1"])
        bn1 = F.batch_norm(c1, t["m1"], t["v1"], t["g1"], t["b1"], False,
                           0.0, 1e-5)
        r1 = F.relu(bn1)
        c2 = F.conv2d(r1, t["w2"], padding=1)
        bn2 = F.batch_norm(c2, t["m2"], t["v2"], t["g2"], t["b2"], False,
                           0.0, 1e-5)
        return F.max_pool2d(F.relu(bn2 + xt), 2).numpy()

    def test_resnet_stage_executes(self, tmp_path, rng):
        path, inits = self._build(tmp_path, rng)
        fn, params = load_onnx(path)
        x = rng.randn(2, 8, 8, 8).astype(np.float32)
        got = np.asarray(jax.jit(fn)(params, jnp.asarray(x)))
        want = self._torch_oracle(inits, x)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_quantsim_over_onnx_resnet_stage(self, tmp_path, rng):
        from aimet_tpu.quantsim.qsim import QuantizationSimModel

        path, _ = self._build(tmp_path, rng)
        fn, params = load_onnx(path)
        x = jnp.asarray(rng.randn(2, 8, 8, 8).astype(np.float32))
        sim = QuantizationSimModel(fn, (params, x), quant_scheme="minmax")
        sim.compute_encodings(
            params, iter([jnp.asarray(rng.randn(2, 8, 8, 8)
                                      .astype(np.float32))]))
        yq = np.asarray(sim.quantized_fn(params, x))
        yf = np.asarray(fn(params, x))
        err = np.mean((yq - yf) ** 2) / max(np.mean(yf ** 2), 1e-9)
        assert err < 0.05


class TestLSTM:
    @pytest.mark.parametrize("bidirectional", [False, True])
    def test_lstm_matches_torch(self, tmp_path, rng, bidirectional):
        """ONNX LSTM (iofc gates) vs torch.nn.LSTM (ifgo gates) — chunk
        reorder [i,o,f,g] maps between them."""
        I, Hd, T, B = 6, 5, 7, 3
        D = 2 if bidirectional else 1
        lstm = torch.nn.LSTM(I, Hd, bidirectional=bidirectional)
        lstm.eval()

        def reorder(w):  # torch i,f,g,o -> onnx i,o,f,c(g)
            i, f, g, o = w.detach().numpy().reshape(4, Hd, -1)
            return np.concatenate([i, o, f, g], 0)

        W = [reorder(lstm.weight_ih_l0)]
        R = [reorder(lstm.weight_hh_l0)]
        Bx = [np.concatenate([reorder(lstm.bias_ih_l0).ravel(),
                              reorder(lstm.bias_hh_l0).ravel()])]
        if bidirectional:
            W.append(reorder(lstm.weight_ih_l0_reverse))
            R.append(reorder(lstm.weight_hh_l0_reverse))
            Bx.append(np.concatenate(
                [reorder(lstm.bias_ih_l0_reverse).ravel(),
                 reorder(lstm.bias_hh_l0_reverse).ravel()]))
        inits = {"W": np.stack(W).astype(np.float32),
                 "R": np.stack(R).astype(np.float32),
                 "B": np.stack(Bx).astype(np.float32)}
        nodes = [("LSTM", ["x", "W", "R", "B"], ["Y", "Y_h", "Y_c"], "lstm",
                  {"hidden_size": Hd,
                   "direction": "bidirectional" if bidirectional
                   else "forward"})]
        path = _write(tmp_path, nodes, inits, [("x", (T, B, I))],
                      [("Y", (T, D, B, Hd)), ("Y_h", (D, B, Hd)),
                       ("Y_c", (D, B, Hd))])
        fn, params = load_onnx(path)
        x = rng.randn(T, B, I).astype(np.float32)
        Y, Yh, Yc = fn(params, jnp.asarray(x))
        with torch.no_grad():
            yt, (ht, ct) = lstm(torch.from_numpy(x))
        # torch Y is (T, B, D*H) with dirs concatenated on features
        want = yt.numpy().reshape(T, B, D, Hd).transpose(0, 2, 1, 3)
        np.testing.assert_allclose(np.asarray(Y), want, rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(Yh), ht.numpy(), rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(Yc), ct.numpy(), rtol=1e-4,
                                   atol=1e-5)


class TestNewOpsUnit:
    def test_slice_squeeze_unsqueeze_reducemean(self, tmp_path, rng):
        inits = {
            "starts": np.asarray([1, 0], np.int64),
            "ends": np.asarray([3, 2147483647], np.int64),
            "axes": np.asarray([1, 2], np.int64),
            "sq_ax": np.asarray([0], np.int64),
        }
        nodes = [
            ("Slice", ["x", "starts", "ends", "axes"], ["s"], "s", {}),
            ("ReduceMean", ["s"], ["rm"], "rm",
             {"axes": [2], "keepdims": 1}),
            ("Unsqueeze", ["rm", "sq_ax"], ["u"], "u", {}),
            ("Squeeze", ["u", "sq_ax"], ["y"], "y", {}),
        ]
        path = _write(tmp_path, nodes, inits, [("x", (2, 4, 5))],
                      [("y", (2, 2, 1))])
        fn, params = load_onnx(path)
        x = rng.randn(2, 4, 5).astype(np.float32)
        got = np.asarray(fn(params, jnp.asarray(x)))
        want = x[:, 1:3, :].mean(2, keepdims=True)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_negative_slice_and_steps(self, tmp_path, rng):
        inits = {
            "starts": np.asarray([-1], np.int64),
            "ends": np.asarray([-2147483648], np.int64),
            "axes": np.asarray([0], np.int64),
            "steps": np.asarray([-1], np.int64),
        }
        nodes = [("Slice", ["x", "starts", "ends", "axes", "steps"], ["y"],
                  "y", {})]
        path = _write(tmp_path, nodes, inits, [("x", (5, 3))],
                      [("y", (5, 3))])
        fn, params = load_onnx(path)
        x = rng.randn(5, 3).astype(np.float32)
        got = np.asarray(fn(params, jnp.asarray(x)))
        np.testing.assert_allclose(got, x[::-1])

    def test_erf_cast_gather_pow(self, tmp_path, rng):
        inits = {"idx": np.asarray([2, 0], np.int64),
                 "two": np.asarray(2.0, np.float32)}
        nodes = [
            ("Erf", ["x"], ["e"], "e", {}),
            ("Pow", ["e", "two"], ["p"], "p", {}),
            ("Gather", ["p", "idx"], ["g"], "g", {"axis": 1}),
            ("Cast", ["g"], ["y"], "y", {"to": 1}),
        ]
        path = _write(tmp_path, nodes, inits, [("x", (2, 4))],
                      [("y", (2, 2))])
        fn, params = load_onnx(path)
        x = rng.randn(2, 4).astype(np.float32)
        got = np.asarray(fn(params, jnp.asarray(x)))
        import scipy.special as sp
        want = (sp.erf(x) ** 2)[:, [2, 0]]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestReviewRegressions:
    def test_unsqueeze_multi_axis_output_rank(self, tmp_path, rng):
        """ONNX Unsqueeze axes index the OUTPUT shape: axes=[0, 4] on a
        (2,3,4) tensor -> (1,2,3,4,1)."""
        inits = {"ax": np.asarray([0, 4], np.int64),
                 "axneg": np.asarray([0, -1], np.int64)}
        nodes = [("Unsqueeze", ["x", "ax"], ["y1"], "y1", {}),
                 ("Unsqueeze", ["x", "axneg"], ["y2"], "y2", {})]
        path = _write(tmp_path, nodes, inits, [("x", (2, 3, 4))],
                      [("y1", (1, 2, 3, 4, 1)), ("y2", (1, 2, 3, 4, 1))])
        fn, params = load_onnx(path)
        x = rng.randn(2, 3, 4).astype(np.float32)
        y1, y2 = fn(params, jnp.asarray(x))
        assert y1.shape == (1, 2, 3, 4, 1)
        assert y2.shape == (1, 2, 3, 4, 1)
        np.testing.assert_allclose(np.asarray(y1)[0, ..., 0], x)

    def test_lstm_reverse_direction(self, tmp_path, rng):
        """direction='reverse' must process the sequence backwards
        (torch oracle: run torch on the reversed input)."""
        I, Hd, T, B = 4, 3, 5, 2
        lstm = torch.nn.LSTM(I, Hd)
        lstm.eval()

        def reorder(w):
            i, f, g, o = w.detach().numpy().reshape(4, Hd, -1)
            return np.concatenate([i, o, f, g], 0)

        inits = {
            "W": reorder(lstm.weight_ih_l0)[None].astype(np.float32),
            "R": reorder(lstm.weight_hh_l0)[None].astype(np.float32),
            "B": np.concatenate([reorder(lstm.bias_ih_l0).ravel(),
                                 reorder(lstm.bias_hh_l0).ravel()]
                                )[None].astype(np.float32),
        }
        nodes = [("LSTM", ["x", "W", "R", "B"], ["Y", "Yh", "Yc"], "lstm",
                  {"hidden_size": Hd, "direction": "reverse"})]
        path = _write(tmp_path, nodes, inits, [("x", (T, B, I))],
                      [("Y", (T, 1, B, Hd)), ("Yh", (1, B, Hd)),
                       ("Yc", (1, B, Hd))])
        fn, params = load_onnx(path)
        x = rng.randn(T, B, I).astype(np.float32)
        Y, Yh, Yc = fn(params, jnp.asarray(x))
        with torch.no_grad():
            yt, (ht, ct) = lstm(torch.from_numpy(x[::-1].copy()))
        want_Y = yt.numpy()[::-1]          # reverse: outputs re-reversed
        np.testing.assert_allclose(np.asarray(Y)[:, 0], want_Y, rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(Yh)[0], ht.numpy()[0],
                                   rtol=1e-4, atol=1e-5)

    def test_lstm_unsupported_features_raise(self, tmp_path, rng):
        inits = {"W": np.zeros((1, 12, 4), np.float32),
                 "R": np.zeros((1, 12, 3), np.float32)}
        nodes = [("LSTM", ["x", "W", "R"], ["Y"], "lstm",
                  {"hidden_size": 3, "direction": "bidirectional"})]
        path = _write(tmp_path, nodes, inits, [("x", (2, 1, 4))],
                      [("Y", (2, 2, 1, 3))])
        fn, params = load_onnx(path)
        with pytest.raises(ValueError):
            fn(params, jnp.zeros((2, 1, 4), jnp.float32))


class TestMoreOps:
    def test_shape_expand_where_reduce_resize(self, tmp_path, rng):
        inits = {
            "target": np.asarray([2, 3, 4], np.int64),
            "zero": np.asarray(0.0, np.float32),
            "sizes": np.asarray([2, 3, 8, 8], np.int64),
        }
        nodes = [
            ("Expand", ["x", "target"], ["e"], "e", {}),
            ("Equal", ["e", "zero"], ["eq"], "eq", {}),
            ("Where", ["eq", "zero", "e"], ["wh"], "wh", {}),
            ("ReduceSum", ["wh"], ["rs"], "rs",
             {"axes": [2], "keepdims": 0}),
        ]
        path = _write(tmp_path, nodes, inits, [("x", (1, 3, 4))],
                      [("rs", (2, 3))])
        fn, params = load_onnx(path)
        x = rng.randn(1, 3, 4).astype(np.float32)
        got = np.asarray(fn(params, jnp.asarray(x)))
        want = np.broadcast_to(x, (2, 3, 4)).sum(2)
        np.testing.assert_allclose(got, want, rtol=1e-5)

        nodes = [("Resize", ["x", "", "", "sizes"], ["y"], "y",
                  {"mode": "nearest"})]
        path = _write(tmp_path, nodes, {"sizes": inits["sizes"]},
                      [("x", (2, 3, 4, 4))], [("y", (2, 3, 8, 8))])
        fn, params = load_onnx(path)
        x4 = rng.randn(2, 3, 4, 4).astype(np.float32)
        got = np.asarray(fn(params, jnp.asarray(x4)))
        want = torch.nn.functional.interpolate(
            torch.from_numpy(x4), scale_factor=2, mode="nearest").numpy()
        np.testing.assert_allclose(got, want, rtol=1e-6)
