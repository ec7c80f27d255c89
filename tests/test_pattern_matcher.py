"""Generic (branching) sub-graph pattern matching — §2.2 graph-searcher
parity (reference graph_searcher.py / graph_pattern_matcher.py)."""
import flax.linen as nn
import jax.numpy as jnp
import numpy as np
import pytest

from aimet_tpu.graph.connected_graph import ConnectedGraph
from aimet_tpu.graph.pattern_matcher import (SubgraphPattern, find_pattern,
                                             match_chain)
from aimet_tpu.models.cnn import init_model


class ResidualNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(8, (3, 3), padding="SAME")(x)
        y = nn.Conv(8, (3, 3), padding="SAME")(x)
        y = nn.BatchNorm(use_running_average=True)(y)
        y = nn.relu(y)
        y = nn.Conv(8, (3, 3), padding="SAME")(y)
        x = nn.relu(x + y)
        y2 = nn.Conv(8, (3, 3), padding="SAME")(x)
        y2 = nn.BatchNorm(use_running_average=True)(y2)
        y2 = nn.relu(y2)
        y2 = nn.Conv(8, (3, 3), padding="SAME")(y2)
        return nn.relu(x + y2)


@pytest.fixture
def graph():
    m = ResidualNet()
    v, x = init_model(m, (1, 8, 8, 3))
    return ConnectedGraph(lambda v, x: m.apply(v, x), (v, x))


def test_branching_residual_pattern(graph):
    """conv->bn->relu->conv->add where the add's OTHER input is the
    entry conv's input — a pattern no linear-chain matcher can express."""
    pat = SubgraphPattern(
        nodes={"c1": "conv", "bn": "batchnorm", "act": "relu",
               "c2": "conv", "join": "add"},
        edges=[("c1", "bn"), ("bn", "act"), ("act", "c2"), ("c2", "join")])
    matches = find_pattern(graph, pat)
    assert len(matches) == 2          # both residual blocks
    for m in matches:
        # the join must really consume c2's output
        assert any(p.producer is m["c2"] for p in m["join"].inputs)
        assert m["bn"].type == "batchnorm"


def test_chain_convenience_and_claiming(graph):
    chains = match_chain(graph, ["conv", "batchnorm", "relu"])
    assert len(chains) == 2
    # non-overlap: each op claimed once
    ids = [id(op) for c in chains for op in c]
    assert len(ids) == len(set(ids))

    overlapping = match_chain(graph, ["conv", "batchnorm"],
                              allow_overlap=True)
    assert len(overlapping) >= 2


def test_multi_consumer_split_pattern(graph):
    """A conv whose output feeds BOTH a conv branch and an add (the
    residual trunk shape)."""
    pat = SubgraphPattern(
        nodes={"trunk": ("conv", "relu"), "branch": "conv", "join": "add"},
        edges=[("trunk", "branch"), ("trunk", "join")])
    matches = find_pattern(graph, pat, allow_overlap=True)
    assert len(matches) >= 2
    for m in matches:
        assert any(p.producer is m["trunk"] for p in m["join"].inputs)
        assert any(p.producer is m["trunk"] for p in m["branch"].inputs)


def test_no_match_is_empty(graph):
    pat = SubgraphPattern(nodes={"a": "softmax", "b": "conv"},
                          edges=[("a", "b")])
    assert find_pattern(graph, pat) == []
