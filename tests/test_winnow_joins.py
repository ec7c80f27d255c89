"""Winnow mask-join connectivity (VERDICT r1 #7): Add/Split/Concat mask
propagation across residual blocks, gather fallback at blocked seeds, and
the 50%-MAC spatial-SVD + channel-pruning pipeline on ResNet-18
(BASELINE row 7; reference winnow/mask.py:123-436 connectivity classes)."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aimet_tpu.compression.winnow import plan_winnow, winnow_model
from aimet_tpu.graph.connected_graph import ConnectedGraph
from aimet_tpu.models.cnn import init_model


class ResidualNet(nn.Module):
    """conv0 -> [block: conv1-bn-relu-conv2 + identity] -> relu -> conv3."""

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(12, (3, 3), padding="SAME", name="conv0")(x)
        y = nn.Conv(12, (3, 3), padding="SAME", name="conv1")(x)
        y = nn.BatchNorm(use_running_average=True, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(12, (3, 3), padding="SAME", name="conv2")(y)
        x = nn.relu(x + y)
        return nn.Conv(8, (3, 3), padding="SAME", name="conv3")(x)


def _graph(model, shape):
    v, x = init_model(model, shape)
    fn = lambda v, x: model.apply(v, x)
    return ConnectedGraph(fn, (v, x)), fn, v, x


def test_residual_add_join_propagates_both_branches():
    """Pruning conv3's input crosses the residual add: BOTH branch writers
    (conv0 via identity, conv2) shrink — AddInternalConnectivity."""
    g, fn, v, x = _graph(ResidualNet(), (2, 8, 8, 3))
    conv_names = [op.name for op in g.ops if op.type == "conv"]
    assert len(conv_names) == 4
    c0, c1, c2, c3 = conv_names

    remove = [1, 4, 9]
    reduced, reps = winnow_model(g, v, {c3: remove})
    plan = reduced.plan
    assert not plan.fallbacks

    # conv3 slices input kernel; conv0 and conv2 slice output kernels; the
    # identity branch also feeds conv1, which must slice its input kernel
    sliced = {n: {(role, ax) for role, ax, _ in s}
              for n, s in plan.layer_slices.items()}
    assert c3 in sliced and c2 in sliced and c0 in sliced and c1 in sliced
    # bn on the pruned trunk? bn1 is on the branch AFTER conv1 (separate
    # space) so it must NOT be rebuilt as affine for this seed
    want = fn(v, x)
    got = reduced(v, x)
    # pruned channels change values; shapes and finiteness must hold, and
    # the untouched output channel count is preserved
    assert np.asarray(got).shape == np.asarray(want).shape
    assert np.isfinite(np.asarray(got)).all()


def test_residual_internal_space_with_bn():
    """Pruning conv2's input (the block-internal space) slices conv1's
    output and rebuilds bn1 with sliced affine params."""
    g, fn, v, x = _graph(ResidualNet(), (2, 8, 8, 3))
    conv_names = [op.name for op in g.ops if op.type == "conv"]
    c0, c1, c2, c3 = conv_names

    reduced, reps = winnow_model(g, v, {c2: [0, 3, 7, 11]})
    plan = reduced.plan
    assert not plan.fallbacks
    assert c1 in plan.layer_slices      # writer of the internal space
    assert any(n.startswith("batchnorm") for n in plan.rebuilt_ops), \
        plan.rebuilt_ops
    bn_name = next(n for n, k in plan.rebuilt_ops.items() if k == "affine")
    axis, keep = plan.affine_ops[bn_name]
    assert keep.size == 8               # 12 - 4 removed
    out = reduced(v, x)
    assert np.asarray(out).shape == (2, 8, 8, 8)
    assert np.isfinite(np.asarray(out)).all()

    # exactness: an equivalent dense model with zeroed removed channels is
    # NOT equal (channels genuinely removed) — instead verify against a
    # manual reconstruction: removed channels of conv1's output only feed
    # conv2; removing them and slicing bn leaves other channels identical
    want = fn(v, x)
    # output channels of the final conv should differ only through conv2's
    # pruned input contribution — sanity: correlation stays high
    w_f = np.asarray(want).ravel()
    g_f = np.asarray(out).ravel()
    corr = np.corrcoef(w_f, g_f)[0, 1]
    assert corr > 0.5


def test_winnow_exact_when_channels_dead():
    """If the removed channels are exactly dead (zero weights into them and
    out of them), the reduced model is numerically identical — the
    winnow-correctness invariant the reference tests via mask asserts."""
    g, fn, v, x = _graph(ResidualNet(), (2, 8, 8, 3))
    conv_names = [op.name for op in g.ops if op.type == "conv"]
    c0, c1, c2, c3 = conv_names
    remove = [2, 5]

    # kill the block-internal channels: conv1 produces them as exact zeros
    # (zero kernel + zero bias + zero bn shift) so conv2 sees zeros
    p = jax.tree_util.tree_map(lambda a: np.array(a), v)
    p["params"]["conv1"]["kernel"][..., remove] = 0.0
    p["params"]["conv1"]["bias"][remove] = 0.0
    p["params"]["bn1"]["scale"][remove] = 0.0
    p["params"]["bn1"]["bias"][remove] = 0.0
    p["batch_stats"]["bn1"]["mean"][remove] = 0.0
    p["batch_stats"]["bn1"]["var"][remove] = 1.0
    p = jax.tree_util.tree_map(jnp.asarray, p)

    reduced, _ = winnow_model(g, p, {c2: remove})
    assert not reduced.plan.fallbacks
    np.testing.assert_allclose(np.asarray(reduced(p, x)),
                               np.asarray(fn(p, x)), rtol=2e-5, atol=1e-5)


class ConcatNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        a = nn.Conv(6, (3, 3), padding="SAME", name="conv_a")(x)
        b = nn.Conv(10, (3, 3), padding="SAME", name="conv_b")(x)
        y = jnp.concatenate([a, b], axis=-1)
        y = nn.relu(y)
        return nn.Conv(4, (3, 3), padding="SAME", name="conv_out")(y)


def test_concat_segment_mapping():
    """Removals on the concat output map back into the right segments
    (ConcatInternalConnectivity backward)."""
    g, fn, v, x = _graph(ConcatNet(), (2, 8, 8, 3))
    convs = {op.name: op for op in g.ops if op.type == "conv"}
    names = list(convs)
    out_name = names[-1]

    # remove channels 4,5 (segment a: conv_a outs 4,5) and 8 (segment b:
    # conv_b out 2)
    reduced, reps = winnow_model(g, v, {out_name: [4, 5, 8]})
    plan = reduced.plan
    assert not plan.fallbacks
    a_name, b_name = names[0], names[1]
    a_keep = dict(((r, a), k) for r, a, k in plan.layer_slices[a_name])
    b_keep = dict(((r, a), k) for r, a, k in plan.layer_slices[b_name])
    a_out = next(k for (r, _a), k in a_keep.items() if r == "kernel")
    b_out = next(k for (r, _a), k in b_keep.items() if r == "kernel")
    assert set(range(6)) - set(a_out.tolist()) == {4, 5}
    assert set(range(10)) - set(b_out.tolist()) == {2}
    out = reduced(v, x)
    assert np.asarray(out).shape == (2, 8, 8, 4)


def test_resnet18_50pct_mac_pipeline():
    """BASELINE row 7 in miniature: spatial-SVD + channel-pruning pipeline
    on ResNet-18 to beyond 50% MAC, with channel pruning crossing residual
    trunks (compress.py:50 two-stage flow). Reconstruction quality gated by
    output correlation with the uncompressed model."""
    from aimet_tpu.compression.compressor import ModelCompressor
    from aimet_tpu.compression.cost import layer_cost, model_cost
    from aimet_tpu.models.resnet import ResNet18

    m = ResNet18(num_classes=4, num_filters=8)
    v, _ = init_model(m, (2, 32, 32, 3))
    fn = lambda v, x: m.apply(v, x)
    xs = jnp.asarray(np.random.RandomState(0)
                     .randn(2, 32, 32, 3).astype(np.float32))

    # stage 1: channel pruning; conv_3/conv_9/conv_14/conv_19 read residual
    # trunks (cross-Add propagation), conv_4 a block-internal space
    cp_ratios = {"conv_3": 0.5, "conv_4": 0.5, "conv_9": 0.5,
                 "conv_14": 0.5, "conv_19": 0.5}
    model1, stats1 = ModelCompressor.compress_model(
        fn, (v, xs), v, "channel_pruning", manual_ratios=cp_ratios)
    out1 = model1(v, xs)
    assert np.isfinite(np.asarray(out1)).all()

    # measured MAC on the re-traced pruned graph (not the cost model)
    fn2 = lambda v, x: model1(v, x)
    g2 = ConnectedGraph(fn2, (v, xs))
    mac1 = model_cost(g2).mac
    assert mac1 / stats1.original_cost.mac < 0.65

    # stage 2: spatial SVD on the remaining heavy convs of the pruned model
    costs = sorted(((layer_cost(op).mac, op.name)
                    for op in g2.ops if op.type == "conv"), reverse=True)
    svd_ratios = {n: 0.5 for _, n in costs[:8]}
    model2, stats2 = ModelCompressor.compress_model(
        fn2, (v, xs), v, "spatial_svd", manual_ratios=svd_ratios)

    overall = stats2.compressed_cost.mac / stats1.original_cost.mac
    assert overall <= 0.55, overall   # >= 50% MAC reduction (row 7 target)

    out2 = np.asarray(model2(v, xs))
    assert out2.shape == (2, 4) and np.isfinite(out2).all()
    corr = np.corrcoef(np.asarray(fn(v, xs)).ravel(), out2.ravel())[0, 1]
    assert corr > 0.85, corr          # reconstruction quality


class BlockedNet(nn.Module):
    """Softmax on the trunk blocks upstream propagation -> gather."""

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(8, (3, 3), padding="SAME")(x)
        x = jax.nn.softmax(x, axis=-1)
        return nn.Conv(4, (3, 3), padding="SAME")(x)


def test_blocked_seed_falls_back_to_gather():
    g, fn, v, x = _graph(BlockedNet(), (2, 8, 8, 3))
    convs = [op.name for op in g.ops if op.type == "conv"]
    reduced, reps = winnow_model(g, v, {convs[-1]: [0, 7]})
    plan = reduced.plan
    assert convs[-1] in plan.fallbacks
    assert convs[-1] in plan.gathers
    # upstream conv untouched
    assert convs[0] not in plan.layer_slices
    out = reduced(v, x)
    assert np.asarray(out).shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


class ConcatSharedSegmentNet(nn.Module):
    """One consumer reads the concat OUTPUT, another reads a SEGMENT
    directly — the two seeds' channel spaces meet at the segment but speak
    different coordinate frames (round-2 advisor medium finding)."""

    @nn.compact
    def __call__(self, x):
        a = nn.Conv(8, (3, 3), padding="SAME", name="conv_a")(x)
        b = nn.Conv(8, (3, 3), padding="SAME", name="conv_b")(x)
        y = jnp.concatenate([a, b], axis=-1)
        out1 = nn.Conv(4, (3, 3), padding="SAME", name="conv_cat")(y)
        out2 = nn.Conv(4, (3, 3), padding="SAME", name="conv_seg")(b)
        return out1 + out2


def _conv_by_weight_shape(g, in_ch, out_ch):
    for op in g.ops:
        if op.type == "conv":
            shp = op.param_products["kernel"].shape
            if shp[2] == in_ch and shp[3] == out_ch:
                yield op.name


def test_concat_frame_merge_same_physical_channel():
    """Seeds {concat-consumer: [8], segment-consumer: [0]} name the SAME
    physical channel (segment b channel 0). The plan must slice conv_b once
    and keep every frame consistent (previously: crashed with an lhs/rhs
    feature-dim mismatch from raw index-set union across frames)."""
    g, fn, v, x = _graph(ConcatSharedSegmentNet(), (2, 8, 8, 3))
    cat_name = next(_conv_by_weight_shape(g, 16, 4))
    seg_name = [n for n in _conv_by_weight_shape(g, 8, 4)][-1]
    b_name = [n for n in _conv_by_weight_shape(g, 3, 8)][1]
    a_name = [n for n in _conv_by_weight_shape(g, 3, 8)][0]

    reduced, _ = winnow_model(g, v, {cat_name: [8], seg_name: [0]})
    plan = reduced.plan
    assert not plan.fallbacks, plan.fallbacks
    # conv_b loses output channel 0; conv_a untouched
    b_slices = dict(((r, ax), k) for r, ax, k in plan.layer_slices[b_name])
    b_out = next(k for (r, ax), k in b_slices.items()
                 if r == "kernel" and ax == 3)
    assert set(range(8)) - set(b_out.tolist()) == {0}
    assert a_name not in plan.layer_slices
    out = reduced(v, x)
    assert np.asarray(out).shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_concat_frame_merge_different_channels_closes_fixpoint():
    """Seeds naming DIFFERENT physical channels of the shared segment: the
    fixpoint must close — conv_b loses both, and BOTH consumers' kernels
    slice both (each translated into its own frame)."""
    g, fn, v, x = _graph(ConcatSharedSegmentNet(), (2, 8, 8, 3))
    cat_name = next(_conv_by_weight_shape(g, 16, 4))
    seg_name = [n for n in _conv_by_weight_shape(g, 8, 4)][-1]
    b_name = [n for n in _conv_by_weight_shape(g, 3, 8)][1]

    # concat ch 9 == b ch 1; seg ch 0 == b ch 0
    reduced, _ = winnow_model(g, v, {cat_name: [9], seg_name: [0]})
    plan = reduced.plan
    assert not plan.fallbacks, plan.fallbacks
    from functools import reduce as _reduce
    b_out_slices = [k for r, ax, k in plan.layer_slices[b_name]
                    if r == "kernel" and ax == 3]
    b_out = _reduce(np.intersect1d, b_out_slices)
    assert set(range(8)) - set(b_out.tolist()) == {0, 1}
    # concat consumer drops concat channels 8 and 9 (b channels 0 and 1)
    cat_slices = [k for r, ax, k in plan.layer_slices[cat_name]
                  if r == "kernel" and ax == 2]
    cat_keep = _reduce(np.intersect1d, cat_slices)
    assert set(range(16)) - set(cat_keep.tolist()) == {8, 9}
    seg_slices = [k for r, ax, k in plan.layer_slices[seg_name]
                  if r == "kernel" and ax == 2]
    seg_keep = _reduce(np.intersect1d, seg_slices)
    assert set(range(8)) - set(seg_keep.tolist()) == {0, 1}
    out = reduced(v, x)
    assert np.asarray(out).shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_out_of_range_mask_raises():
    """Out-of-range removal indices raise instead of being silently
    dropped (round-2 advisor low finding)."""
    g, fn, v, x = _graph(ConcatNet(), (2, 8, 8, 3))
    convs = [op.name for op in g.ops if op.type == "conv"]
    with pytest.raises(ValueError, match="out of range"):
        plan_winnow(g, {convs[-1]: [16]})
