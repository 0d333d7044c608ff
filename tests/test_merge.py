"""Horizontal (sibling-conv) fusion: passes.merge_sibling_convs.

Merged graphs must be numerically identical to the unmerged graph (fp)
and keep int8 edges alive through the merged conv + Slice (w8a8).
"""

import numpy as np

from feathercnn_tpu import Engine, EngineConfig
from feathercnn_tpu.models import googlenet, resnet50
from feathercnn_tpu.models.builder import GraphBuilder
from feathercnn_tpu.passes import merge_sibling_convs, optimize
from feathercnn_tpu.quant import calibrate


def _cosine(a, b):
    a, b = a.ravel(), b.ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def _proj_block(seed=7, batch=2):
    """ResNet-style projection block: branch1 (1x1 s2, no relu) and
    branch2a (1x1 s2, relu) read the same input — a mergeable pair with
    MIXED activations (act_segments path).  branch1's 128 channels keep
    the slice boundary lane-aligned (the merge pass requires it)."""
    b = GraphBuilder("proj", seed)
    x = b.input("data", (batch, 8, 8, 16))
    b1 = b.conv("branch1", x, 128, 1, stride=2)
    y = b.conv("branch2a", x, 8, 1, stride=2, relu=True)
    y = b.conv("branch2b", y, 8, 3, pad=1, relu=True)
    y = b.conv("branch2c", y, 128, 1)
    s = b.eltwise("res", [b1, y])
    s = b.relu("res_relu", s)
    out = b.conv("head", s, 16, 1, relu=True)
    return b.finish([out])


def _inception_reduces(seed=9, batch=2):
    """Three same-geometry 1x1 siblings with identical activation; channel
    counts chosen so a lane-aligned merge order exists."""
    b = GraphBuilder("incep", seed)
    x = b.input("data", (batch, 8, 8, 24))
    c1 = b.conv("b1", x, 128, 1, relu=True)
    c3 = b.conv("b3r", x, 128, 1, relu=True)
    c3 = b.conv("b3", c3, 16, 3, pad=1, relu=True)
    c5 = b.conv("b5r", x, 16, 1, relu=True)
    c5 = b.conv("b5", c5, 16, 5, pad=2, relu=True)
    out = b.concat("cat", [c1, c3, c5])
    return b.finish([out])


def test_merge_fp_exact(rng):
    x = rng.normal(size=(2, 8, 8, 16)).astype(np.float32)
    ref = np.asarray(Engine(_proj_block(),
                            EngineConfig(merge_siblings=False))(x))
    eng = Engine(_proj_block(), EngineConfig(merge_siblings=True))
    merged = [n for n in eng.graph.nodes if "+" in n.name]
    assert any(n.op == "Convolution" for n in merged)
    assert any(n.op == "Slice" for n in eng.graph.nodes)
    mconv = next(n for n in merged if n.op == "Convolution")
    # mixed relu/none -> per-channel segments, no scalar activation
    assert mconv.attrs.get("act_segments") is not None
    assert mconv.attrs.get("activation") is None
    out = np.asarray(eng(x))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_merge_same_activation_trio(rng):
    x = rng.normal(size=(2, 8, 8, 24)).astype(np.float32)
    ref = np.asarray(Engine(_inception_reduces(),
                            EngineConfig(merge_siblings=False))(x))
    eng = Engine(_inception_reduces(), EngineConfig(merge_siblings=True))
    mconv = next(n for n in eng.graph.nodes
                 if n.op == "Convolution" and "+" in n.name)
    # identical activations merge into one scalar epilogue act
    assert mconv.attrs.get("activation") == "relu"
    assert mconv.attrs["num_output"] == 128 + 128 + 16
    out = np.asarray(eng(x))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_merge_counts_in_zoo():
    g = resnet50(batch=1, with_softmax=False)
    optimize(g)  # merge_siblings defaults on
    merges = [n for n in g.nodes if n.op == "Convolution" and "+" in n.name]
    # one projection-block merge per stage
    assert len(merges) == 4
    g = googlenet(batch=1, with_softmax=False)
    optimize(g)
    merges = [n for n in g.nodes if n.op == "Convolution" and "+" in n.name]
    # fp mode: only the inception modules with a lane-aligned sibling
    # order merge (3b, 4c fully; 4e, 5a, 5b as pairs)
    assert len(merges) == 5


def test_merge_int8_edges(rng):
    """w8a8: the merged conv emits int8, the Slice is passthrough, and the
    sibling value scales are unified."""
    g = _proj_block()
    x = rng.normal(size=(2, 8, 8, 16)).astype(np.float32)
    ref = np.asarray(Engine(g, EngineConfig(merge_siblings=False))(x))
    calibrate(g, [x], method="max")
    eng = Engine(g, EngineConfig(backend="pallas", quant="w8a8",
                                 interpret=True, merge_siblings=True,
                                 algo_overrides=(("*", "xla"),)))
    qm = eng.graph.meta["quant"]
    mconv = next(n for n in eng.graph.nodes
                 if n.op == "Convolution" and "+" in n.name)
    slc = next(n for n in eng.graph.nodes if n.op == "Slice")
    assert qm[mconv.name].get("emit_int8") is True
    assert qm[slc.name].get("passthrough_int8") is True
    vs = eng.graph.meta["value_scales"]
    # fuse_activation renamed branch2a's relu output onto the conv output
    assert vs["branch1"] == vs["branch2a"]
    out = np.asarray(eng(x))
    assert _cosine(ref, out) > 0.995
    # int8 round-trip + shared branch scale: near-tie channels may flip
    agree = (ref.argmax(-1) == out.argmax(-1)).mean()
    assert agree > 0.9


def test_merge_skips_concat_consumers_under_quant(rng):
    """With calibrated scales present, a sibling whose output feeds Concat
    is excluded (its agreed scale would cascade); the other two still
    merge."""
    g = _inception_reduces()
    x = rng.normal(size=(2, 8, 8, 24)).astype(np.float32)
    calibrate(g, [x], method="max")
    eng = Engine(g, EngineConfig(backend="pallas", quant="w8a8",
                                 interpret=True,
                                 algo_overrides=(("*", "xla"),)))
    mconvs = [n for n in eng.graph.nodes
              if n.op == "Convolution" and "+" in n.name]
    assert len(mconvs) == 1
    assert mconvs[0].attrs["num_output"] == 128 + 16  # b3r + b5r, not b1
    ref = np.asarray(Engine(_inception_reduces(),
                            EngineConfig(merge_siblings=False))(x))
    out = np.asarray(eng(x))
    assert _cosine(ref, out) > 0.995


def _fire(seed=11, batch=2, cin=24, s=8, e1=16, e3=16):
    """SqueezeNet fire module: expand1x1 + expand3x3 read the squeeze
    output; their outputs feed one channel Concat."""
    b = GraphBuilder("fire", seed)
    x = b.input("data", (batch, 8, 8, cin))
    sq = b.conv("squeeze", x, s, 1, relu=True)
    a = b.conv("expand1", sq, e1, 1, relu=True)
    c = b.conv("expand3", sq, e3, 3, pad=1, relu=True)
    cat = b.concat("cat", [a, c])
    out = b.conv("head", cat, 16, 1, relu=True)
    return b.finish([out])


def test_merge_concat_fire_fp_exact(rng):
    """expand1x1 promotes to a zero-padded 3x3 and merges with expand3x3;
    the Concat disappears; numerics are exact."""
    from feathercnn_tpu.passes import merge_concat_siblings
    x = rng.normal(size=(2, 8, 8, 24)).astype(np.float32)
    ref = np.asarray(Engine(_fire(), EngineConfig(merge_concats=False,
                                                  merge_siblings=False))(x))
    eng = Engine(_fire(), EngineConfig(merge_concats=True))
    assert not any(n.op == "Concat" for n in eng.graph.nodes)
    mconv = next(n for n in eng.graph.nodes
                 if n.op == "Convolution" and "+" in n.name)
    assert (mconv.attrs["kernel_h"], mconv.attrs["pad_h"]) == (3, 1)
    assert mconv.attrs["num_output"] == 32
    assert mconv.attrs.get("activation") == "relu"
    out = np.asarray(eng(x))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_merge_concat_geometry_gates(rng):
    """Odd promotions are gated: k5 exceeds max_kernel (default 3) -> no
    merge; stride-2 pairs with compatible pads do merge exactly."""
    from feathercnn_tpu.passes import merge_concat_siblings

    b = GraphBuilder("g5", 3)
    x = b.input("data", (1, 9, 9, 8))
    a = b.conv("a", x, 4, 1, relu=True)
    c = b.conv("c", x, 4, 5, pad=2, relu=True)
    cat = b.concat("cat", [a, c])
    g = b.finish([cat])
    assert merge_concat_siblings(g) == 0

    b = GraphBuilder("s2", 4)
    x = b.input("data", (1, 9, 9, 8))
    a = b.conv("a", x, 4, 1, stride=2, relu=True)
    c = b.conv("c", x, 4, 3, stride=2, pad=1, relu=True)
    cat = b.concat("cat", [a, c])
    out = b.conv("head", cat, 8, 1)
    g = b.finish([out])
    xv = rng.normal(size=(1, 9, 9, 8)).astype(np.float32)
    ref = np.asarray(Engine(g, EngineConfig(merge_concats=False,
                                            merge_siblings=False))(xv))
    eng = Engine(g, EngineConfig(merge_concats=True))
    assert not any(n.op == "Concat" for n in eng.graph.nodes)
    np.testing.assert_allclose(np.asarray(eng(xv)), ref,
                               rtol=1e-5, atol=1e-5)


def test_merge_concat_int8(rng):
    """w8a8 fire module: merged conv takes the concat's calibrated output
    scale; accuracy holds vs the unmerged fp oracle."""
    g = _fire()
    x = rng.normal(size=(2, 8, 8, 24)).astype(np.float32)
    ref = np.asarray(Engine(_fire(), EngineConfig(merge_concats=False,
                                                  merge_siblings=False))(x))
    calibrate(g, [x], method="max")
    eng = Engine(g, EngineConfig(backend="pallas", quant="w8a8",
                                 interpret=True, merge_concats=True,
                                 algo_overrides=(("*", "xla"),)))
    assert not any(n.op == "Concat" for n in eng.graph.nodes)
    out = np.asarray(eng(x))
    assert _cosine(ref, out) > 0.995


def test_merge_concat_counts_squeezenet():
    """Opt-in (default OFF — measured -8% paired on v5e int8, the
    promoted-1x1 FLOPs cost more than the saved reads; see config.py)."""
    from feathercnn_tpu.models import squeezenet_v11
    g = squeezenet_v11(batch=1, with_softmax=False)
    optimize(g, merge_concats=True)
    merges = [n for n in g.nodes if n.op == "Convolution" and "+" in n.name]
    assert len(merges) == 8          # all 8 fire modules
    assert not any(n.op == "Concat" for n in g.nodes)
