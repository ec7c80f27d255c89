"""ONNX on-ramp round-5 breadth (VERDICT r4 next #8): ConvTranspose,
InstanceNormalization, GRU, ArgMax/ArgMin, TopK and the elementwise tail,
each validated against torch CPU oracles (exact ONNX operator semantics)
or replicated numpy math. Same hand-assembled-ModelProto methodology as
test_onnx_onramp.py; reference entry point mirrored:
aimet_onnx/quantsim.py:487-524 (InferenceSession over arbitrary graphs).
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from aimet_tpu.interop.onnx_export import build_model_bytes
from aimet_tpu.interop.onnx_reader import load_onnx


def _run(tmp_path, nodes, inits, inputs, outputs, *args):
    path = str(tmp_path / "m.onnx")
    with open(path, "wb") as f:
        f.write(build_model_bytes(nodes, inits, inputs, outputs))
    fn, params = load_onnx(path)
    return fn(params, *args)


class TestConvTranspose:
    @pytest.mark.parametrize("stride,pad,opad,groups", [
        (1, 0, 0, 1), (2, 1, 1, 1), (2, 0, 0, 2), (3, 2, 1, 1)])
    def test_vs_torch(self, tmp_path, rng, stride, pad, opad, groups):
        ci, co, k = 4, 6, 3
        x = rng.randn(2, ci, 7, 7).astype(np.float32)
        w = rng.randn(ci, co // groups, k, k).astype(np.float32) * 0.3
        b = rng.randn(co).astype(np.float32)
        attrs = {"strides": [stride, stride],
                 "pads": [pad, pad, pad, pad],
                 "output_padding": [opad, opad], "group": groups}
        got = _run(tmp_path,
                   [("ConvTranspose", ["x", "w", "b"], ["y"], "ct", attrs)],
                   {"w": w, "b": b}, [("x", x.shape)], [("y", (0,))], x)
        ref = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                                 torch.from_numpy(b), stride=stride,
                                 padding=pad, output_padding=opad,
                                 groups=groups).numpy()
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)

    def test_dilated(self, tmp_path, rng):
        x = rng.randn(1, 3, 5, 5).astype(np.float32)
        w = rng.randn(3, 4, 3, 3).astype(np.float32) * 0.3
        attrs = {"strides": [2, 2], "dilations": [2, 2],
                 "pads": [1, 1, 1, 1]}
        got = _run(tmp_path,
                   [("ConvTranspose", ["x", "w"], ["y"], "ct", attrs)],
                   {"w": w}, [("x", x.shape)], [("y", (0,))], x)
        ref = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                                 stride=2, padding=1, dilation=2).numpy()
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)


class TestInstanceNorm:
    def test_vs_torch(self, tmp_path, rng):
        x = rng.randn(2, 3, 5, 6).astype(np.float32)
        g = rng.rand(3).astype(np.float32) + 0.5
        b = rng.randn(3).astype(np.float32)
        got = _run(tmp_path,
                   [("InstanceNormalization", ["x", "g", "b"], ["y"], "in",
                     {"epsilon": 1e-5})],
                   {"g": g, "b": b}, [("x", x.shape)], [("y", (0,))], x)
        ref = F.instance_norm(torch.from_numpy(x),
                              weight=torch.from_numpy(g),
                              bias=torch.from_numpy(b), eps=1e-5).numpy()
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


class TestGRU:
    def _onnx_weights_from_torch(self, gru, d=0, rev=False):
        """torch gate order is r|z|n; ONNX is z|r|h. torch's 'n' gate math
        equals ONNX linear_before_reset=1."""
        sfx = "_reverse" if rev else ""
        wih = getattr(gru, f"weight_ih_l0{sfx}").detach().numpy()
        whh = getattr(gru, f"weight_hh_l0{sfx}").detach().numpy()
        bih = getattr(gru, f"bias_ih_l0{sfx}").detach().numpy()
        bhh = getattr(gru, f"bias_hh_l0{sfx}").detach().numpy()
        H = whh.shape[1]
        perm = np.r_[H:2 * H, 0:H, 2 * H:3 * H]          # r|z|n -> z|r|h
        return wih[perm], whh[perm], np.concatenate([bih[perm], bhh[perm]])

    @pytest.mark.parametrize("bidir", [False, True])
    def test_vs_torch_lbr1(self, tmp_path, rng, bidir):
        T, B, I, H = 5, 3, 4, 6
        torch.manual_seed(0)
        gru = torch.nn.GRU(I, H, bidirectional=bidir)
        x = rng.randn(T, B, I).astype(np.float32)
        dirs = []
        dirs.append(self._onnx_weights_from_torch(gru))
        if bidir:
            dirs.append(self._onnx_weights_from_torch(gru, rev=True))
        W = np.stack([d[0] for d in dirs])
        R = np.stack([d[1] for d in dirs])
        Bb = np.stack([d[2] for d in dirs])
        got = _run(tmp_path,
                   [("GRU", ["x", "W", "R", "B"], ["Y", "Yh"], "gru",
                     {"hidden_size": H, "linear_before_reset": 1,
                      "direction": "bidirectional" if bidir else "forward"})],
                   {"W": W, "R": R, "B": Bb},
                   [("x", x.shape)], [("Y", (0,)), ("Yh", (0,))], x)
        Y, Yh = (np.asarray(v) for v in got)
        with torch.no_grad():
            yt, ht = gru(torch.from_numpy(x))
        nd = 2 if bidir else 1
        # ONNX Y is (T, D, B, H); torch is (T, B, D*H)
        yt_onnx = yt.numpy().reshape(T, B, nd, H).transpose(0, 2, 1, 3)
        np.testing.assert_allclose(Y, yt_onnx, atol=2e-5)
        np.testing.assert_allclose(Yh, ht.numpy(), atol=2e-5)

    def test_lbr0_numpy_oracle(self, tmp_path, rng):
        T, B, I, H = 4, 2, 3, 5
        W = rng.randn(1, 3 * H, I).astype(np.float32) * 0.5
        R = rng.randn(1, 3 * H, H).astype(np.float32) * 0.5
        Bb = rng.randn(1, 6 * H).astype(np.float32) * 0.1
        x = rng.randn(T, B, I).astype(np.float32)
        got = _run(tmp_path,
                   [("GRU", ["x", "W", "R", "B"], ["Y", "Yh"], "gru",
                     {"hidden_size": H})],
                   {"W": W, "R": R, "B": Bb},
                   [("x", x.shape)], [("Y", (0,)), ("Yh", (0,))], x)
        Y = np.asarray(got[0])

        def sig(v):
            return 1.0 / (1.0 + np.exp(-v))

        wz, wr, wh = W[0][:H], W[0][H:2 * H], W[0][2 * H:]
        rz, rr, rh = R[0][:H], R[0][H:2 * H], R[0][2 * H:]
        wbz, wbr, wbh = Bb[0][:H], Bb[0][H:2 * H], Bb[0][2 * H:3 * H]
        rbz, rbr, rbh = (Bb[0][3 * H:4 * H], Bb[0][4 * H:5 * H],
                         Bb[0][5 * H:])
        h = np.zeros((B, H), np.float32)
        ys = []
        for tt in range(T):
            xt = x[tt]
            z = sig(xt @ wz.T + h @ rz.T + wbz + rbz)
            r = sig(xt @ wr.T + h @ rr.T + wbr + rbr)
            hh = np.tanh(xt @ wh.T + (r * h) @ rh.T + rbh + wbh)
            h = (1 - z) * hh + z * h
            ys.append(h.copy())
        np.testing.assert_allclose(Y[:, 0], np.stack(ys), atol=2e-5)


class TestIndexOps:
    def test_argmax_argmin_topk(self, tmp_path, rng):
        x = rng.randn(3, 7, 5).astype(np.float32)
        nodes = [("ArgMax", ["x"], ["am"], "am", {"axis": 1}),
                 ("ArgMin", ["x"], ["an"], "an",
                  {"axis": -1, "keepdims": 0}),
                 ("TopK", ["x", "k"], ["tv", "ti"], "tk", {"axis": 1})]
        out = _run(tmp_path, nodes, {"k": np.asarray([3], np.int64)},
                   [("x", x.shape)],
                   [("am", (0,)), ("an", (0,)), ("tv", (0,)), ("ti", (0,))],
                   x)
        am, an, tv, ti = (np.asarray(v) for v in out)
        np.testing.assert_array_equal(am, x.argmax(1, keepdims=True))
        np.testing.assert_array_equal(an, x.argmin(-1))
        rv, ri = torch.topk(torch.from_numpy(x), 3, dim=1)
        np.testing.assert_allclose(tv, rv.numpy(), atol=1e-6)
        np.testing.assert_array_equal(ti, ri.numpy())


class TestElementwiseTail:
    def test_vs_torch(self, tmp_path, rng):
        x = rng.randn(4, 9).astype(np.float32)
        s = np.asarray([0.3], np.float32)
        nodes = [
            ("LeakyRelu", ["x"], ["lr"], "lr", {"alpha": 0.1}),
            ("Elu", ["x"], ["el"], "el", {"alpha": 1.0}),
            ("PRelu", ["x", "slope"], ["pr"], "pr", {}),
            ("HardSigmoid", ["x"], ["hs"], "hs",
             {"alpha": 1.0 / 6.0, "beta": 0.5}),
            ("HardSwish", ["x"], ["hw"], "hw", {}),
            ("Softplus", ["x"], ["sp"], "sp", {}),
            ("Abs", ["x"], ["ab"], "ab", {}),
            ("Reciprocal", ["ab2"], ["rc"], "rc", {}),
            ("Add", ["ab", "one"], ["ab2"], "ab2", {}),
        ]
        # reorder: ab2 must come before rc; the reader executes in order
        nodes = nodes[:7] + [nodes[8], nodes[7]]
        inits = {"slope": s, "one": np.asarray([1.0], np.float32)}
        outs = ["lr", "el", "pr", "hs", "hw", "sp", "ab", "rc"]
        got = _run(tmp_path, nodes, inits, [("x", x.shape)],
                   [(o, (0,)) for o in outs], x)
        xt = torch.from_numpy(x)
        refs = [F.leaky_relu(xt, 0.1), F.elu(xt, 1.0),
                F.prelu(xt, torch.from_numpy(s)),
                F.hardsigmoid(xt), F.hardswish(xt), F.softplus(xt),
                xt.abs(), 1.0 / (xt.abs() + 1.0)]
        for g, r, name in zip(got, refs, outs):
            np.testing.assert_allclose(np.asarray(g), r.numpy(),
                                       atol=2e-6, err_msg=name)
