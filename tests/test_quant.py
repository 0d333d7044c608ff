"""Quantization tests: scheme round-trip, calibration, int8-edge pass,
end-to-end accuracy vs the FP oracle (SURVEY.md §4 item 4)."""

import numpy as np
import pytest

from feathercnn_tpu import Engine, EngineConfig
from feathercnn_tpu.models import squeezenet_v11
from feathercnn_tpu.models.builder import GraphBuilder
from feathercnn_tpu.quant import calibrate, quantize_weight_per_channel


def _cosine(a, b):
    a, b = a.ravel(), b.ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def test_weight_quant_roundtrip(rng):
    w = rng.normal(size=(3, 3, 16, 32)).astype(np.float32)
    q, s = quantize_weight_per_channel(w)
    assert q.dtype == np.int8 and s.shape == (32,)
    deq = q.astype(np.float32) * s
    rel = np.abs(deq - w).max() / np.abs(w).max()
    assert rel < 1e-2  # 8-bit per-channel: <=1/254 of channel max


def _mini_convnet(seed=21):
    b = GraphBuilder("mini", seed)
    x = b.input("data", (2, 16, 16, 8))
    y = b.conv("c1", x, 16, 3, pad=1, relu=True)
    y = b.conv("c2", y, 32, 3, pad=1, relu=True)
    y = b.conv("c3", y, 32, 1, relu=True)
    y = b.pool("gap", y, 0, mode="AVE", global_pooling=True)
    y = b.fc("fc", y, 10)
    return b.finish([y])


@pytest.mark.parametrize("quant", ["w8", "w8a8"])
def test_quant_e2e_accuracy(quant, rng):
    g = _mini_convnet()
    x = rng.normal(size=(2, 16, 16, 8)).astype(np.float32)
    ref = np.asarray(Engine(g)(x))
    if quant == "w8a8":
        calibrate(g, [rng.normal(size=(2, 16, 16, 8)).astype(np.float32)
                      for _ in range(3)], method="percentile")
    eng = Engine(g, EngineConfig(backend="pallas", quant=quant,
                                 interpret=True))
    out = np.asarray(eng(x))
    assert _cosine(ref, out) > 0.998
    assert (ref.argmax(-1) == out.argmax(-1)).all()


def test_int8_edges_marked_and_correct(rng):
    g = _mini_convnet()
    x = rng.normal(size=(2, 16, 16, 8)).astype(np.float32)
    ref = np.asarray(Engine(g)(x))
    calibrate(g, [x], method="max")
    eng = Engine(g, EngineConfig(backend="pallas", quant="w8a8",
                                 interpret=True))
    qm = eng.graph.meta["quant"]
    # c1 -> c2 -> c3 chain: c1 and c2 feed exactly one quantized conv each
    assert qm["c1"].get("emit_int8") is True
    assert qm["c2"].get("emit_int8") is True
    # c3 feeds pooling (not quantized): stays float out
    assert not qm["c3"].get("emit_int8")
    out = np.asarray(eng(x))
    assert _cosine(ref, out) > 0.998


def test_calibration_methods(rng):
    g = _mini_convnet()
    data = [rng.normal(size=(2, 16, 16, 8)).astype(np.float32)]
    for method in ("max", "percentile", "mse"):
        scales = calibrate(g, data, method=method)
        assert scales and all(s > 0 for s in scales.values())
    # percentile clips below max
    smax = calibrate(g, data, method="max")
    spct = calibrate(g, data, method="percentile", percentile=90.0)
    assert spct["c2"] < smax["c2"]


def test_w8_without_calibration_runs(rng):
    """Weight-only mode must work with no act scales at all."""
    g = _mini_convnet()
    eng = Engine(g, EngineConfig(backend="pallas", quant="w8",
                                 interpret=True))
    out = eng(rng.normal(size=(2, 16, 16, 8)).astype(np.float32))
    assert np.asarray(out).shape == (2, 10)


def test_int8_edge_through_maxpool_and_concat(rng):
    """Scale-transparent ops (MAX pool, Concat) carry int8 edges: the
    stem conv emits int8, pooling/concat run on int8, consumers read it
    (quant/rewrite.py reverse-topo pass)."""
    b = GraphBuilder("stemmy", seed=9)
    x = b.input("data", (2, 16, 16, 8))
    y = b.conv("stem", x, 16, 3, pad=1, relu=True)
    y = b.pool("pool1", y, 2, 2, mode="MAX")
    l = b.conv("left", y, 8, 1, relu=True)
    r = b.conv("right", y, 8, 1, relu=True)
    m = b.concat("cat", [l, r])
    y = b.conv("head", m, 16, 3, pad=1, relu=True)
    y = b.pool("gap", y, 0, mode="AVE", global_pooling=True)
    y = b.fc("fc", y, 10)
    g = b.finish([y])

    x_val = rng.normal(size=(2, 16, 16, 8)).astype(np.float32)
    ref = np.asarray(Engine(g)(x_val))
    calibrate(g, [x_val], method="max")
    eng = Engine(g, EngineConfig(backend="pallas", quant="w8a8",
                                 interpret=True))
    qm = eng.graph.meta["quant"]
    assert qm["stem"].get("emit_int8") is True
    assert qm["pool1"].get("passthrough_int8") is True
    assert qm["cat"].get("passthrough_int8") is True
    assert qm["left"].get("emit_int8") is True
    assert qm["right"].get("emit_int8") is True
    # concat inputs requantize to the concat output scale
    assert qm["left"]["y_scale"] == qm["cat"]["y_scale"]
    out = np.asarray(eng(x_val))
    assert _cosine(ref, out) > 0.997


def test_int8_edge_concat_mixed_branch_demoted(rng):
    """A Concat where one branch's producer ALSO feeds a float-only
    consumer must not go int8 (mixing raw int8 with floats would corrupt
    silently) — the fixpoint demotes the concat and accuracy holds."""
    b = GraphBuilder("mixcat", seed=13)
    x = b.input("data", (2, 16, 16, 8))
    y = b.conv("stem", x, 16, 3, pad=1, relu=True)
    l = b.conv("left", y, 8, 1, relu=True)
    r = b.conv("right", y, 8, 1, relu=True)
    # `left` also feeds an AVE pool (never int8) -> left stays float
    side = b.pool("side_gap", l, 0, mode="AVE", global_pooling=True)
    m = b.concat("cat", [l, r])
    h = b.conv("head", m, 16, 3, pad=1, relu=True)
    h = b.pool("gap", h, 0, mode="AVE", global_pooling=True)
    out = b.concat("joined", [side, h])
    out = b.fc("fc", out, 10)
    g = b.finish([out])

    xv = rng.normal(size=(2, 16, 16, 8)).astype(np.float32)
    ref = np.asarray(Engine(g)(xv))
    calibrate(g, [xv], method="max")
    eng = Engine(g, EngineConfig(backend="pallas", quant="w8a8",
                                 interpret=True))
    qm = eng.graph.meta["quant"]
    assert not qm.get("cat", {}).get("passthrough_int8")
    assert not qm.get("left", {}).get("emit_int8")
    # the requantizing-concat fallback still rides int8 (left arrives
    # float and is quantized in the fused concat; right arrives int8)
    assert qm.get("cat", {}).get("concat_int8")
    assert qm.get("right", {}).get("emit_int8")
    out_q = np.asarray(eng(xv))
    assert _cosine(ref, out_q) > 0.997


def test_int8_edge_stops_before_depthwise(rng):
    """With int8_grouped off, depthwise convs never take the int8 path,
    so a pointwise conv feeding one must NOT emit int8 (regression: the
    XLA fallback used to cast dequantized weights to x.dtype=int8,
    zeroing them).  With it on (the measured default), the edges go int8
    and numerics hold on both the VPU-kernel and XLA paths."""
    b = GraphBuilder("mbn", seed=23)
    x = b.input("data", (2, 16, 16, 8))
    y = b.conv("pw1", x, 16, 1, relu=True)
    y = b.dwconv("dw1", y, 3, pad=1, relu=True)
    y = b.conv("pw2", y, 32, 1, relu=True)
    y = b.dwconv("dw2", y, 3, stride=2, pad=1, relu=True)
    y = b.conv("pw3", y, 32, 1, relu=True)
    y = b.pool("gap", y, 0, mode="AVE", global_pooling=True)
    y = b.fc("fc", y, 10)
    g = b.finish([y])

    xv = rng.normal(size=(2, 16, 16, 8)).astype(np.float32)
    ref = np.asarray(Engine(g)(xv))
    calibrate(g, [xv], method="max")
    for algo in (None, "xla"):
        cfg = EngineConfig(backend="pallas", quant="w8a8", interpret=True,
                           int8_grouped=False,
                           algo_overrides=((("*", algo),) if algo else ()))
        eng = Engine(g, cfg)
        qm = eng.graph.meta["quant"]
        assert not qm["pw1"].get("emit_int8")
        assert not qm["pw2"].get("emit_int8")
        out = np.asarray(eng(xv))
        assert _cosine(ref, out) > 0.997, f"algo={algo}"
    for algo in (None, "xla"):
        cfg = EngineConfig(backend="pallas", quant="w8a8", interpret=True,
                           algo_overrides=((("*", algo),) if algo else ()))
        eng = Engine(g, cfg)
        qm = eng.graph.meta["quant"]
        assert qm["pw1"].get("emit_int8")
        out = np.asarray(eng(xv))
        assert _cosine(ref, out) > 0.997, f"int8_grouped algo={algo}"


def test_int8_edges_through_dense_block(rng):
    """DenseNet-style concat chain: every dense-layer conv output and the
    running concat should carry int8 edges when all consumers quantize."""
    b = GraphBuilder("dense", seed=29)
    x = b.input("data", (2, 8, 8, 16))
    y = b.conv("l1", x, 16, 3, pad=1, relu=True)
    c1 = b.concat("cat1", [x, y])
    y = b.conv("l2", c1, 16, 3, pad=1, relu=True)
    c2 = b.concat("cat2", [c1, y])
    y = b.conv("head", c2, 8, 1, relu=True)
    y = b.pool("gap", y, 0, mode="AVE", global_pooling=True)
    y = b.fc("fc", y, 10)
    g = b.finish([y])

    xv = rng.normal(size=(2, 8, 8, 16)).astype(np.float32)
    ref = np.asarray(Engine(g)(xv))
    calibrate(g, [xv], method="max")
    eng = Engine(g, EngineConfig(backend="pallas", quant="w8a8",
                                 interpret=True,
                                 algo_overrides=(("*", "xla"),)))
    qm = eng.graph.meta["quant"]
    # the passthrough's single-scale requirement fails across the chain
    # (cat1 feeds l2 at one scale and cat2 at another); the requantizing
    # fallback keeps every concat edge int8
    for cat in ("cat1", "cat2"):
        info = qm.get(cat, {})
        assert info.get("passthrough_int8") or info.get("concat_int8"), cat
    assert qm["l1"].get("emit_int8") and qm["l2"].get("emit_int8")
    out = np.asarray(eng(xv))
    assert _cosine(ref, out) > 0.997


def test_int8_edges_preactivation_dense_block(rng):
    """Real DenseNet-121 ordering: Conv -> Concat -> BN -> ReLU -> Conv.
    The standalone BN canonicalizes to a Scale; requant_int8 + concat_int8
    keep the whole chain on int8 edges."""
    b = GraphBuilder("predense", seed=31)
    x = b.input("data", (2, 8, 8, 16))
    y = b.conv("l1", x, 16, 3, pad=1, bias=False)
    c1 = b.concat("cat1", [x, y])
    z = b.batchnorm("bn1", c1)
    z = b.relu("relu1", z)
    y = b.conv("l2", z, 16, 3, pad=1, bias=False)
    c2 = b.concat("cat2", [c1, y])
    z = b.batchnorm("bn2", c2)
    z = b.relu("relu2", z)
    y = b.conv("head", z, 8, 1)
    y = b.pool("gap", y, 0, mode="AVE", global_pooling=True)
    y = b.fc("fc", y, 10)
    g = b.finish([y])

    xv = rng.normal(size=(2, 8, 8, 16)).astype(np.float32)
    ref = np.asarray(Engine(g)(xv))
    calibrate(g, [xv], method="max")
    eng = Engine(g, EngineConfig(backend="pallas", quant="w8a8",
                                 interpret=True,
                                 algo_overrides=(("*", "xla"),)))
    qm = eng.graph.meta["quant"]
    # unfused BNs canonicalized to Scale nodes named bn1/bn2
    assert qm.get("bn1", {}).get("requant_int8")
    assert qm.get("bn2", {}).get("requant_int8")
    for cat in ("cat1", "cat2"):
        info = qm.get(cat, {})
        assert info.get("passthrough_int8") or info.get("concat_int8"), cat
    out = np.asarray(eng(xv))
    assert _cosine(ref, out) > 0.995


def test_int8_grouped_conv_opt_in(rng):
    """EngineConfig.int8_grouped: a cardinality (grouped) conv takes int8
    edges; numerics stay close to the fp oracle."""
    b = GraphBuilder("gconv", seed=37)
    x = b.input("data", (2, 8, 8, 32))
    y = b.conv("pre", x, 32, 1, relu=True)
    y = b.conv("grp", y, 32, 3, pad=1, group=4, relu=True)
    y = b.conv("post", y, 16, 1, relu=True)
    y = b.pool("gap", y, 0, mode="AVE", global_pooling=True)
    y = b.fc("fc", y, 10)
    g = b.finish([y])
    xv = rng.normal(size=(2, 8, 8, 32)).astype(np.float32)
    ref = np.asarray(Engine(g)(xv))
    calibrate(g, [xv], method="max")
    base = EngineConfig(backend="pallas", quant="w8a8", interpret=True,
                        algo_overrides=(("*", "xla"),))
    eng_off = Engine(g, base.replace(int8_grouped=False))
    assert not eng_off.graph.meta["quant"]["pre"].get("emit_int8")
    eng_on = Engine(g, base)  # int8_grouped defaults on
    qm = eng_on.graph.meta["quant"]
    assert qm["pre"].get("emit_int8") and qm["grp"].get("emit_int8")
    for eng in (eng_off, eng_on):
        out = np.asarray(eng(xv))
        assert _cosine(ref, out) > 0.997


def test_int8_edges_through_lrn(rng):
    """LRN (AlexNet/GoogLeNet norm) rides int8 edges via requant_int8:
    the stem conv emits int8, LRN runs dequant->norm->requant."""
    b = GraphBuilder("lrnnet", seed=41)
    x = b.input("data", (2, 16, 16, 8))
    y = b.conv("stem", x, 16, 3, pad=1, relu=True)
    y = b.lrn("norm1", y)
    y = b.conv("mid", y, 16, 3, pad=1, relu=True)
    y = b.pool("gap", y, 0, mode="AVE", global_pooling=True)
    y = b.fc("fc", y, 10)
    g = b.finish([y])
    xv = rng.normal(size=(2, 16, 16, 8)).astype(np.float32)
    ref = np.asarray(Engine(g)(xv))
    calibrate(g, [xv], method="max")
    eng = Engine(g, EngineConfig(backend="pallas", quant="w8a8",
                                 interpret=True,
                                 algo_overrides=(("*", "xla"),)))
    qm = eng.graph.meta["quant"]
    assert qm["stem"].get("emit_int8")
    assert qm.get("norm1", {}).get("requant_int8")
    out = np.asarray(eng(xv))
    assert _cosine(ref, out) > 0.997


def test_int8_edges_through_ave_pool(rng):
    """Windowed AVE pooling requantizes (quant/rewrite.py):
    avg(s*q) = s*avg(q), so the ShuffleNet-shortcut /
    DenseNet-transition pattern conv -> AVE pool -> conv keeps 1-byte
    edges on both sides.  GLOBAL pools stay float (1x1 outputs, SE-gate
    accuracy); MAX stays passthrough."""
    b = GraphBuilder("avenet", seed=43)
    x = b.input("data", (2, 16, 16, 8))
    y = b.conv("stem", x, 16, 3, pad=1, relu=True)
    y = b.pool("tpool", y, 3, 2, mode="AVE")
    y = b.conv("mid", y, 16, 1, relu=True)
    y = b.pool("gap", y, 0, mode="AVE", global_pooling=True)
    y = b.fc("fc", y, 10)
    g = b.finish([y])
    xv = rng.normal(size=(2, 16, 16, 8)).astype(np.float32)
    ref = np.asarray(Engine(g)(xv))
    calibrate(g, [xv], method="max")
    eng = Engine(g, EngineConfig(backend="pallas", quant="w8a8",
                                 interpret=True,
                                 algo_overrides=(("*", "xla"),)))
    qm = eng.graph.meta["quant"]
    assert qm["stem"].get("emit_int8")
    assert qm.get("tpool", {}).get("requant_int8")
    assert not qm.get("gap", {}).get("requant_int8")
    out = np.asarray(eng(xv))
    assert _cosine(ref, out) > 0.997
    # requant edges off -> pools unmarked, conv input edge stays float
    g2 = b.finish([y])
    g2.meta.update({k: g.meta[k] for k in ("act_scales", "value_scales")})
    eng2 = Engine(g2, EngineConfig(backend="pallas", quant="w8a8",
                                   interpret=True, int8_requant_ops=False,
                                   algo_overrides=(("*", "xla"),)))
    qm2 = eng2.graph.meta["quant"]
    assert not qm2.get("tpool", {}).get("requant_int8")


def test_requant_pool_float_producer(rng):
    """ADVICE r3 (high): a requant_int8-marked AVE pool whose producer is
    demoted to FLOAT emission (here by a sibling depthwise consumer under
    int8_grouped=False) must not apply x_scale to real-valued averages —
    the requant guard keys on the runtime dtype like Scale/LRN do."""
    b = GraphBuilder("poolfloat", seed=47)
    x = b.input("data", (2, 16, 16, 8))
    y = b.conv("stem", x, 16, 3, pad=1, relu=True)
    # sibling consumer that rejects int8 edges when int8_grouped=False:
    # demotes stem to float emission while the pool stays marked
    z = b.dwconv("dw", y, 3, pad=1, relu=True)
    z = b.pool("gapz", z, 0, mode="AVE", global_pooling=True)
    p = b.pool("tpool", y, 3, 2, mode="AVE")
    p = b.conv("mid", p, 16, 1, relu=True)
    p = b.pool("gapp", p, 0, mode="AVE", global_pooling=True)
    y = b.concat("cat", [z, p])
    y = b.fc("fc", y, 10)
    g = b.finish([y])
    xv = rng.normal(size=(2, 16, 16, 8)).astype(np.float32)
    ref = np.asarray(Engine(g)(xv))
    calibrate(g, [xv], method="max")
    eng = Engine(g, EngineConfig(backend="pallas", quant="w8a8",
                                 interpret=True, int8_grouped=False,
                                 algo_overrides=(("*", "xla"),)))
    qm = eng.graph.meta["quant"]
    assert not qm["stem"].get("emit_int8")          # demoted by dw
    assert qm.get("tpool", {}).get("requant_int8")  # ...but pool marked
    out = np.asarray(eng(xv))
    assert _cosine(ref, out) > 0.997


def test_quant_overrides_per_layer(rng):
    """EngineConfig.quant_overrides (VERDICT r3 task 4): per-layer
    quant-mode flips without giving up int8 elsewhere.  "fp" removes a
    layer from every int8-edge role — its input edge goes float (the
    producer is demoted when it was the only int8 consumer) and it never
    emits int8; "fp_act" keeps only the input float."""
    def build():
        b = GraphBuilder("qov", seed=31)
        x = b.input("data", (2, 16, 16, 8))
        y = b.conv("stem", x, 16, 3, pad=1, relu=True)
        y = b.conv("g1", y, 16, 1, group=4, relu=True)
        y = b.conv("mid", y, 16, 1, relu=True)
        y = b.pool("gap", y, 0, mode="AVE", global_pooling=True)
        y = b.fc("fc", y, 10)
        return b.finish([y])

    g = build()
    xv = rng.normal(size=(2, 16, 16, 8)).astype(np.float32)
    ref = np.asarray(Engine(g)(xv))
    calibrate(g, [xv], method="max")
    base = EngineConfig(backend="pallas", quant="w8a8", interpret=True,
                        algo_overrides=(("*", "xla"),))

    # default: g1 takes and emits int8 (int8_grouped on)
    eng0 = Engine(g, base)
    qm0 = eng0.graph.meta["quant"]
    assert qm0["g1"].get("x_scale") is not None
    assert qm0["stem"].get("emit_int8")

    # "fp": g1 fully float — stem demoted (g1 was its only consumer),
    # g1 does not emit, mid's input edge therefore float too
    eng1 = Engine(g, base.replace(quant_overrides=(("g1", "fp"),)))
    qm1 = eng1.graph.meta["quant"]
    assert qm1["g1"].get("x_scale") is None
    assert qm1["g1"].get("input_scale") is not None
    assert not qm1["stem"].get("emit_int8")
    assert not qm1["g1"].get("emit_int8")
    out1 = np.asarray(eng1(xv))
    assert _cosine(ref, out1) > 0.997

    # "fp_act": input float but g1 still emits int8 into mid
    eng2 = Engine(g, base.replace(quant_overrides=(("g1", "fp_act"),)))
    qm2 = eng2.graph.meta["quant"]
    assert qm2["g1"].get("x_scale") is None
    assert qm2["g1"].get("emit_int8")
    out2 = np.asarray(eng2(xv))
    assert _cosine(ref, out2) > 0.997

    # JSON round trip keeps the mapping form
    cfg = EngineConfig.from_json(
        '{"quant_overrides": {"g1": "fp"}, "quant": "w8a8"}')
    assert dict(cfg.quant_overrides) == {"g1": "fp"}
    assert "quant_overrides" in cfg.to_json()


def test_baked_config_overrides(rng):
    """graph.meta['config_overrides'] supplies measured per-model config
    defaults; explicit user settings win."""
    from feathercnn_tpu.models import googlenet
    g = googlenet(batch=1, with_softmax=False)
    assert g.meta["config_overrides"] == {"merge_siblings": False}
    eng = Engine(g, EngineConfig())
    assert eng.config.merge_siblings is False       # baked applies
    # a field the bake doesn't name keeps the user/default value
    assert eng.config.int8_grouped is True
    # an explicit NON-default user value always wins over a bake
    g2 = googlenet(batch=1, with_softmax=False)
    g2.meta["config_overrides"] = {"int8_grouped": False,
                                   "merge_siblings": False}
    eng = Engine(g2, EngineConfig(merge_siblings=False))
    assert eng.config.int8_grouped is False         # baked applies
    assert eng.config.merge_siblings is False


def test_xla_backend_quant_dequantizes(rng):
    """The 'xla' oracle backend must dequantize int8 weights (w_scale) —
    regression: it used to raw-cast the int8 lattice into the conv."""
    g = _mini_convnet()
    x = rng.normal(size=(2, 16, 16, 8)).astype(np.float32)
    ref = np.asarray(Engine(g)(x))
    for quant in ("w8", "w8a8"):
        if quant == "w8a8":
            calibrate(g, [x], method="max")
        out = np.asarray(Engine(g, EngineConfig(quant=quant))(x))
        assert _cosine(ref, out) > 0.997, quant


def test_stem_auto_fp_activation(rng):
    """Convs reading a graph input with C_in<=8 keep float activations
    (measured: int8 stems are slower AND first-layer fp is standard
    accuracy practice); the recorded input_scale still enables int8
    serving transfer, and the stem still EMITS int8 for downstream."""
    g = _mini_convnet()   # input (2,16,16,8): c1 is an auto-fp stem
    x = rng.normal(size=(2, 16, 16, 8)).astype(np.float32)
    ref = np.asarray(Engine(g)(x))
    calibrate(g, [x], method="max")
    eng = Engine(g, EngineConfig(backend="pallas", quant="w8a8",
                                 interpret=True,
                                 algo_overrides=(("*", "xla"),)))
    qm = eng.graph.meta["quant"]
    assert "x_scale" not in qm["c1"] and "input_scale" in qm["c1"]
    assert qm["c1"].get("emit_int8") is True   # downstream edge kept
    assert "x_scale" in qm["c2"]               # mid-graph conv unaffected
    out = np.asarray(eng(x))
    assert _cosine(ref, out) > 0.998
    # int8-transferred input dequantizes via input_scale
    xq = np.clip(np.round(x / qm["c1"]["input_scale"]), -127,
                 127).astype(np.int8)
    out_q = np.asarray(eng(xq))
    assert _cosine(ref, out_q) > 0.997


def test_int8_input_into_fp_act_1x1_stem(rng):
    """Regression (code review): an int8-transferred input into an
    fp-act 1x1 stem must dequantize via input_scale on EVERY algo path
    (the gemm1x1/implicit/fc branches used to consume raw lattice
    values at scale 1.0)."""
    b = GraphBuilder("stem1x1", seed=43)
    x = b.input("data", (2, 8, 8, 4))
    y = b.conv("stem", x, 16, 1, relu=True)   # 1x1, C_in=4 -> fp_auto
    y = b.conv("mid", y, 16, 3, pad=1, relu=True)
    y = b.pool("gap", y, 0, mode="AVE", global_pooling=True)
    y = b.fc("fc", y, 10)
    g = b.finish([y])
    xv = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    ref = np.asarray(Engine(g)(xv))
    calibrate(g, [xv], method="max")
    for algo in (None, "xla", "gemm1x1", "dot1x1"):
        eng = Engine(g, EngineConfig(
            backend="pallas", quant="w8a8", interpret=True,
            algo_overrides=((("*", algo),) if algo else ())))
        qm = eng.graph.meta["quant"]
        assert "input_scale" in qm["stem"]
        xq = np.clip(np.round(xv / qm["stem"]["input_scale"]), -127,
                     127).astype(np.int8)
        out = np.asarray(eng(xq))
        assert _cosine(ref, out) > 0.99, f"algo={algo}"
    # the xla ORACLE backend must dequantize via input_scale too
    out = np.asarray(Engine(g, EngineConfig(quant="w8a8"))(xq))
    assert _cosine(ref, out) > 0.99


def test_crop_invalid_geometry_raises(rng):
    """Crop with offset+ref beyond the input raises instead of silently
    clamping to a shifted window."""
    from feathercnn_tpu.models.builder import GraphBuilder as GB
    b = GB("badcrop", seed=1)
    x = b.input("data", (1, 10, 10, 4))
    up = b.conv("c", x, 4, 3)                  # -> 8x8
    out = b.crop("crop", x, up, axes=(1, 2), offsets=(5, 5))  # 5+8>10
    g = b.finish([out])
    import pytest as _pytest
    with _pytest.raises(ValueError, match="crop offset"):
        Engine(g)(np.zeros((1, 10, 10, 4), np.float32))


def test_int8_edge_through_shuffle_channel(rng):
    """ShuffleChannel is a pure channel permutation, so int8 edges ride
    through it between grouped convs (the ShuffleNet gconv->shuffle->
    dwconv pattern; quant/rewrite.py transparent set)."""
    b = GraphBuilder("shuffly", seed=7)
    x = b.input("data", (2, 8, 8, 8))
    y = b.conv("stem", x, 16, 3, pad=1, relu=True)
    y = b.conv("g1", y, 16, 1, group=4, relu=True)
    y = b.shuffle_channel("shuf", y, 4)
    y = b.conv("g2", y, 16, 1, group=4, relu=True)
    y = b.pool("gap", y, 0, mode="AVE", global_pooling=True)
    y = b.fc("fc", y, 10)
    g = b.finish([y])

    xv = rng.normal(size=(2, 8, 8, 8)).astype(np.float32)
    ref = np.asarray(Engine(g)(xv))
    calibrate(g, [xv], method="max")
    eng = Engine(g, EngineConfig(backend="pallas", quant="w8a8",
                                 interpret=True))
    qm = eng.graph.meta["quant"]
    assert qm["g1"].get("emit_int8") is True
    assert qm["shuf"].get("passthrough_int8") is True
    out = np.asarray(eng(xv))
    assert _cosine(ref, out) > 0.997


def test_int8_axpy_residual_edges(rng):
    """Axpy (SE gate*x + y) takes int8 on its big operands: the residual
    trunk stays int8 through SE blocks while the gate path (global pool
    -> 1x1s -> sigmoid) stays float."""
    b = GraphBuilder("se_mini", seed=21)
    x = b.input("data", (2, 8, 8, 8))
    x = b.conv("stem", x, 16, 3, pad=1, relu=True)

    def se_block(name, x):
        y = b.conv(name + "_a", x, 16, 1, relu=True)
        y = b.conv(name + "_b", y, 16, 3, pad=1)
        s = b.pool(name + "_gp", y, 0, mode="AVE", global_pooling=True)
        s = b.conv(name + "_down", s, 4, 1, relu=True)
        s = b.conv(name + "_up", s, 16, 1)
        s = b.sigmoid(name + "_prob", s)
        out = b.axpy(name + "_axpy", s, y, x)
        return b.relu(name + "_relu", out)

    x = se_block("blk1", x)
    x = se_block("blk2", x)
    # head conv: the int8 chain ends at a conv consumer (as at stage
    # boundaries in SE-ResNet); a pool-terminated tail stays float by
    # design (the output edge must be int8-accepted)
    x = b.conv("head", x, 16, 1, relu=True)
    x = b.pool("gap", x, 0, mode="AVE", global_pooling=True)
    x = b.fc("fc", x, 10)
    g = b.finish([x])

    xv = rng.normal(size=(2, 8, 8, 8)).astype(np.float32)
    ref = np.asarray(Engine(g)(xv))
    calibrate(g, [xv], method="max")
    eng = Engine(g, EngineConfig(backend="pallas", quant="w8a8",
                                 interpret=True))
    qm = eng.graph.meta["quant"]
    assert qm["blk1_axpy"].get("axpy_int8") is True
    # the shortcut edge (stem output) is consumed by blk1_a (int8 conv)
    # and blk1_axpy (int8 y) -> the stem emits int8
    assert qm["stem"].get("emit_int8") is True
    out = np.asarray(eng(xv))
    assert _cosine(ref, out) > 0.997
    # flag off: no axpy marking, still correct
    eng2 = Engine(g, EngineConfig(backend="pallas", quant="w8a8",
                                  interpret=True, int8_axpy=False))
    assert not eng2.graph.meta["quant"].get("blk1_axpy")
    out2 = np.asarray(eng2(xv))
    assert _cosine(ref, out2) > 0.997
