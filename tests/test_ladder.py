"""Concat-ladder -> in-place-buffer rewrite (passes_ladder.py,
EngineConfig.concat_dus)."""

import numpy as np
import pytest

from feathercnn_tpu import Engine, EngineConfig
from feathercnn_tpu.ir import Graph, Node, TensorSpec
from feathercnn_tpu.models.builder import GraphBuilder
from feathercnn_tpu.passes_ladder import dus_concat_ladders


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _toy_ladder(batch=2, size=8, base_c=16, k=8, layers=4, seed=0):
    """DenseNet-shaped toy: base conv, then `layers` of
    (1x1 conv on the running concat) -> Concat(prev, y_i)."""
    b = GraphBuilder("ladder", seed)
    x = b.input("data", (batch, size, size, 3))
    x = b.conv("stem", x, base_c, 3, pad=1)
    x = b.relu("stem_relu", x)
    for i in range(layers):
        y = b.conv(f"l{i}", x, k, 1)
        y = b.relu(f"l{i}_relu", y)
        x = b.concat(f"cat{i}", [x, y])
    # DenseNet transition shape: a standalone pre-activation Scale
    # (can't fold back into a Concat) then a 1x1 conv — the conv accepts
    # int8, so the Scale requant-marks and the whole chain int8-marks
    x = b.bn_scale("post", x)
    x = b.conv("trans", x, base_c, 1)
    x = b.pool("gap", x, 0, mode="AVE", global_pooling=True)
    x = b.fc("fc", x, 10)
    return b.finish([x])


def test_ladder_rewrite_counts():
    g = _toy_ladder()
    eng = Engine(g, EngineConfig(concat_dus=True))
    ops = [n.op for n in eng.graph.nodes]
    assert "Concat" not in ops
    assert ops.count("LadderInit") == 1
    assert ops.count("LadderAppend") == 3
    # every ladder value is read by a conv -> one view per step
    assert ops.count("LadderView") == 4


def test_ladder_fp32_exact(rng):
    """Same VALUES either way — tolerance only covers XLA fusing the
    sliced-buffer reads differently (last-ULP reassociation)."""
    x = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    a = np.asarray(Engine(_toy_ladder(), EngineConfig(concat_dus=False))(x))
    b = np.asarray(Engine(_toy_ladder(), EngineConfig(concat_dus=True))(x))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6)


def test_ladder_short_chain_kept():
    """Chains below min_len stay plain Concats."""
    g = _toy_ladder(layers=2)
    n = dus_concat_ladders(g)
    assert n == 0
    assert any(nd.op == "Concat" for nd in g.nodes)


def test_ladder_int8_marks_and_numerics(rng):
    """w8a8: the chain unifies on the LAST concat's scale; outputs stay
    close to the plain-concat engine (one-grid-step effects only)."""
    from feathercnn_tpu.quant import calibrate
    x = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)

    outs = {}
    for flag in (False, True):
        g = _toy_ladder()
        calibrate(g, [x], method="max", config=EngineConfig())
        eng = Engine(g, EngineConfig(quant="w8a8", concat_dus=flag))
        if flag:
            ops = [n.op for n in eng.graph.nodes]
            assert "LadderAppend" in ops and "Concat" not in ops
            q = eng.graph.meta["quant"]
            lads = {k: v for k, v in q.items() if v.get("ladder_int8")}
            assert len(lads) == 4
            scales = {v["y_scale"] for v in lads.values()}
            assert len(scales) == 1          # single buffer grid
        outs[flag] = np.asarray(eng(x)).ravel()
    a, b = outs[False], outs[True]
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos > 0.999, cos


def test_ladder_mixed_quant_chain_kept(rng):
    """A chain whose concats are NOT all int8-marked must stay plain
    Concat (mixed grids can't share one buffer)."""
    g = _toy_ladder()
    from feathercnn_tpu.quant import calibrate
    x = np.random.default_rng(0).normal(size=(2, 8, 8, 3)).astype(
        np.float32)
    calibrate(g, [x], method="max", config=EngineConfig())
    # optimize+quantize (the Engine pipeline), then corrupt one concat's
    # mark to simulate a mixed chain
    from feathercnn_tpu.passes import optimize
    from feathercnn_tpu.quant.rewrite import quantize_graph
    optimize(g)
    quantize_graph(g, "w8a8")
    qm = g.meta["quant"]
    victim = next(k for k in qm if k.startswith("cat1"))
    del qm[victim]
    n = dus_concat_ladders(g)
    assert n == 0


def test_ladder_densenet_w8a8_cosine(rng):
    """ADVICE r3: real DenseNet chains MIX concat_int8 and
    passthrough_int8 members; passthrough members' parts arrive on the
    member's shared edge grid (its y_scale), not at the parts' own
    calibrated scales — the ladder bookkeeping must record the actual
    arrival grid or early-chain values rescale wrongly (0.878 -> 0.692
    cosine vs fp32 pre-fix).  Gate vs the fp32 oracle: the ladder
    quantizes each part ONCE onto the final grid, so it must be at least
    as accurate as the plain-concat w8a8 engine (which compounds a
    rescale-round per chain concat — measured 0.9998 vs 0.852 here)."""
    from feathercnn_tpu.quant import calibrate
    from feathercnn_tpu.models import MODEL_BUILDERS
    x = rng.normal(size=(1, 224, 224, 3)).astype(np.float32)
    fp = np.asarray(Engine(
        MODEL_BUILDERS["densenet121"](batch=1, with_softmax=False))(x)
    ).ravel()

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)
                              + 1e-12))

    outs = {}
    for flag in (False, True):
        g = MODEL_BUILDERS["densenet121"](batch=1, with_softmax=False)
        calibrate(g, [x], method="max", config=EngineConfig())
        eng = Engine(g, EngineConfig(quant="w8a8", concat_dus=flag))
        if flag:
            assert any(n.op == "LadderAppend" for n in eng.graph.nodes)
        outs[flag] = np.asarray(eng(x)).ravel()
    c_plain, c_ladder = cos(fp, outs[False]), cos(fp, outs[True])
    assert c_ladder >= c_plain - 0.01, (c_plain, c_ladder)
    assert c_ladder > 0.99, c_ladder
    # top-1 match, modulo near-ties (random-weight logits sit ~2% apart
    # at the top; int8 grid hops legitimately reorder those)
    am_f, am_l = int(np.argmax(fp)), int(np.argmax(outs[True]))
    assert am_l == am_f or fp[am_l] >= fp[am_f] - 0.05 * abs(fp[am_f]), \
        (am_f, am_l, fp[am_f], fp[am_l])


def test_ladder_densenet_whole_model_fp32(rng):
    """Whole DenseNet-121 (the real ladder shape: 6/12/24/16-layer
    blocks) matches with the rewrite on, fp32 CPU (tolerance covers XLA
    fusion reassociation only)."""
    from feathercnn_tpu.models import MODEL_BUILDERS
    x = rng.normal(size=(1, 224, 224, 3)).astype(np.float32)
    g1 = MODEL_BUILDERS["densenet121"](batch=1, with_softmax=False)
    g2 = MODEL_BUILDERS["densenet121"](batch=1, with_softmax=False)
    a = np.asarray(Engine(g1, EngineConfig(concat_dus=False))(x))
    e2 = Engine(g2, EngineConfig(concat_dus=True))
    assert sum(n.op == "LadderAppend" for n in e2.graph.nodes) \
        == (6 - 1) + (12 - 1) + (24 - 1) + (16 - 1)
    b = np.asarray(e2(x))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
