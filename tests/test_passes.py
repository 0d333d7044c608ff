"""Fusion/fold pass tests: graph-before vs graph-after numerical equivalence
on random weights (SURVEY.md §4 item 2)."""

import copy

import numpy as np
import pytest

from feathercnn_tpu import Engine, EngineConfig
from feathercnn_tpu.models.builder import GraphBuilder
from feathercnn_tpu.passes import optimize


def _run_both(graph, x, **cfg):
    opt = Engine(graph, EngineConfig(**cfg), optimize_graph=True)
    raw = Engine(graph, EngineConfig(**cfg), optimize_graph=False)
    return opt(x), raw(x), opt


def test_conv_bn_scale_relu_folds_to_one_node(rng):
    b = GraphBuilder("t", seed=3)
    x = b.input("data", (2, 8, 8, 3))
    y = b.conv("conv", x, 8, 3, pad=1, bias=True)
    y = b.bn_scale("bnsc", y)
    y = b.relu("relu", y)
    g = b.finish([y])

    xv = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    out_opt, out_raw, eng = _run_both(g, xv)
    assert len(eng.graph.nodes) == 1
    node = eng.graph.nodes[0]
    assert node.op == "Convolution"
    assert node.attrs["activation"] == "relu"
    np.testing.assert_allclose(np.asarray(out_opt), np.asarray(out_raw),
                               rtol=1e-4, atol=1e-5)


def test_bn_fold_into_biasless_conv_creates_bias(rng):
    b = GraphBuilder("t", seed=4)
    x = b.input("data", (1, 6, 6, 4))
    y = b.conv("conv", x, 6, 1, bias=False)
    y = b.batchnorm("bn", y)
    g = b.finish([y])
    xv = rng.normal(size=(1, 6, 6, 4)).astype(np.float32)
    out_opt, out_raw, eng = _run_both(g, xv)
    assert [n.op for n in eng.graph.nodes] == ["Convolution"]
    assert eng.graph.nodes[0].attrs["bias_term"] is True
    np.testing.assert_allclose(np.asarray(out_opt), np.asarray(out_raw),
                               rtol=1e-4, atol=1e-5)


def test_bn_fold_into_fc(rng):
    b = GraphBuilder("t", seed=5)
    x = b.input("data", (3, 10))
    b.graph.inputs["data"] = b.graph.inputs["data"]
    y = b.fc("fc", x, 7)
    y = b.batchnorm("bn", y)
    y = b.relu("relu", y)
    g = b.finish([y])
    xv = rng.normal(size=(3, 10)).astype(np.float32)
    out_opt, out_raw, eng = _run_both(g, xv)
    assert [n.op for n in eng.graph.nodes] == ["InnerProduct"]
    np.testing.assert_allclose(np.asarray(out_opt), np.asarray(out_raw),
                               rtol=1e-4, atol=1e-5)


def test_standalone_bn_becomes_scale(rng):
    """BN after Eltwise can't fold into a conv — canonicalizes to Scale."""
    b = GraphBuilder("t", seed=6)
    x = b.input("data", (1, 4, 4, 3))
    y1 = b.conv("c1", x, 3, 1)
    y2 = b.conv("c2", x, 3, 1)
    s = b.eltwise("add", [y1, y2])
    y = b.batchnorm("bn", s)
    g = b.finish([y])
    xv = rng.normal(size=(1, 4, 4, 3)).astype(np.float32)
    out_opt, out_raw, eng = _run_both(g, xv)
    ops = [n.op for n in eng.graph.nodes]
    assert "BatchNorm" not in ops
    assert "Scale" in ops
    np.testing.assert_allclose(np.asarray(out_opt), np.asarray(out_raw),
                               rtol=1e-4, atol=1e-5)


def test_relu_not_fused_when_conv_output_is_multiconsumer(rng):
    """Conv feeding both a ReLU and a shortcut must NOT fuse the ReLU."""
    b = GraphBuilder("t", seed=7)
    x = b.input("data", (1, 4, 4, 3))
    y = b.conv("conv", x, 3, 1)
    r = b.relu("relu", y)
    s = b.eltwise("add", [y, r])
    g = b.finish([s])
    xv = rng.normal(size=(1, 4, 4, 3)).astype(np.float32)
    out_opt, out_raw, eng = _run_both(g, xv)
    ops = [n.op for n in eng.graph.nodes]
    assert ops.count("ReLU") == 1
    np.testing.assert_allclose(np.asarray(out_opt), np.asarray(out_raw),
                               rtol=1e-5, atol=1e-6)


def test_dropout_and_dce(rng):
    b = GraphBuilder("t", seed=8)
    x = b.input("data", (1, 4, 4, 3))
    y = b.conv("conv", x, 3, 1)
    d = b.dropout("drop", y)
    dead = b.conv("dead", d, 5, 1)  # unused
    g = b.finish([d])
    g2 = copy.deepcopy(g)
    optimize(g2)
    names = [n.name for n in g2.nodes]
    assert "drop" not in names and "dead" not in names
    assert "dead/w" not in g2.params


def test_eltwise_relu_fusion(rng):
    b = GraphBuilder("t", seed=9)
    x = b.input("data", (1, 4, 4, 3))
    y1 = b.conv("c1", x, 3, 1)
    y2 = b.conv("c2", x, 3, 1)
    s = b.eltwise("add", [y1, y2])
    r = b.relu("relu", s)
    g = b.finish([r])
    xv = rng.normal(size=(1, 4, 4, 3)).astype(np.float32)
    out_opt, out_raw, eng = _run_both(g, xv)
    elt = [n for n in eng.graph.nodes if n.op == "Eltwise"][0]
    assert elt.attrs["activation"] == "relu"
    np.testing.assert_allclose(np.asarray(out_opt), np.asarray(out_raw),
                               rtol=1e-5, atol=1e-6)


def test_space_to_depth_stem_exact(rng):
    """7x7 s2 stem -> s2d + 4x4 s1 must be numerically identical."""
    from feathercnn_tpu.models.builder import GraphBuilder
    b = GraphBuilder("stem", seed=15)
    x = b.input("data", (1, 32, 32, 3))
    y = b.conv("conv1", x, 16, 7, stride=2, pad=3, relu=True)
    g = b.finish([y])
    xv = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    ref = np.asarray(Engine(g)(xv))
    eng = Engine(g, EngineConfig(s2d_stem=True))
    assert any(n.op == "SpaceToDepth" for n in eng.graph.nodes)
    out = np.asarray(eng(xv))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_fold_scale_chain(rng):
    """Back-to-back Scales collapse into one (DenseNet's post-Concat
    BN->Scale pair): exact to f32 rounding, second node's name and
    activation survive, chains of three collapse too."""
    from feathercnn_tpu.models.builder import GraphBuilder
    from feathercnn_tpu.passes import optimize

    def build():
        b = GraphBuilder("sc", seed=13)
        x = b.input("data", (2, 8, 8, 6))
        y = b.conv("c1", x, 8, 3, pad=1)
        z = b.conv("c2", y, 8, 1)
        y = b.concat("cat", [y, z])      # blocks folding into the conv
        y = b.bn_scale("bn1", y)         # BatchNorm + Scale pair
        y = b.relu("r1", y)
        y = b.conv("c3", y, 8, 1)
        y = b.pool("gap", y, 0, mode="AVE", global_pooling=True)
        y = b.fc("fc", y, 4)
        return b.finish([y])

    xv = rng.normal(size=(2, 8, 8, 6)).astype(np.float32)
    g_ref = build()
    ref = np.asarray(Engine(g_ref, EngineConfig(
        fold_scale_chains=False))(xv))
    g = build()
    eng = Engine(g)                      # default: fold on
    scales = [n for n in eng.graph.nodes if n.op == "Scale"]
    assert len(scales) == 1, [n.name for n in scales]
    assert scales[0].attrs.get("activation") == "relu"  # fused ReLU kept
    out = np.asarray(eng(xv))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=1e-6)


def test_derive_nested_pools(rng):
    """Sibling non-overlapping AVE pools collapse to one read: the
    coarser bins re-point at the finest bin's grid (average of equal-
    size block averages == the average; exact to f32 rounding).
    Non-divisible kernels and MAX pools must be left alone."""
    def build():
        b = GraphBuilder("np_", seed=7)
        x = b.input("data", (2, 12, 12, 6))
        y = b.conv("c1", x, 8, 3, pad=1)
        p1 = b.pool("bin1", y, 12, 12, mode="AVE")   # global as kernel
        p2 = b.pool("bin2", y, 6, 6, mode="AVE")
        p3 = b.pool("bin3", y, 2, 2, mode="AVE")     # base (smallest)
        p5 = b.pool("bin5", y, 5, 5, mode="AVE")     # 5 % 2 != 0: keep
        m = b.pool("mx", y, 2, 2)                    # MAX: keep
        cat = b.concat("cat", [
            b.interp("i1", p1, height=12, width=12),
            b.interp("i2", p2, height=12, width=12),
            b.interp("i3", p3, height=12, width=12),
            b.interp("i5", p5, height=12, width=12),
            b.interp("im", m, height=12, width=12)])
        return b.finish([cat])

    xv = rng.normal(size=(2, 12, 12, 6)).astype(np.float32)
    g_ref = build()
    ref = np.asarray(Engine(g_ref, EngineConfig())(xv))
    g = build()
    eng = Engine(g, EngineConfig(nested_pools=True))
    pools = {n.name: n for n in eng.graph.nodes if n.op == "Pooling"}
    assert pools["bin1"].inputs[0] == "bin3"
    assert pools["bin1"].attrs["kernel_size"] == 6
    assert pools["bin2"].inputs[0] == "bin3"
    assert pools["bin2"].attrs["kernel_size"] == 3
    assert pools["bin3"].inputs[0] == "c1"
    assert pools["bin5"].inputs[0] == "c1"   # non-divisible untouched
    assert pools["mx"].inputs[0] == "c1"     # MAX untouched
    out = np.asarray(eng(xv))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=1e-6)
