"""Quantization accuracy gate on a TRAINED model (SURVEY.md §4 item 4,
BASELINE.json:5: top-1 within 0.5% of FP32).

No ImageNet weights are reachable in this environment, so the gate runs
on a small convnet *trained here* (JAX/optax, synthetic 3-class image
task, deterministic seeds) — trained weight/activation distributions are
the thing random-weight proxies miss (per-channel spread, dead units,
calibration clipping)."""

import numpy as np
import pytest

from feathercnn_tpu import Engine, EngineConfig
from feathercnn_tpu.models.builder import GraphBuilder
from feathercnn_tpu.quant import calibrate

C_IN, HW, N_CLASS = 3, 16, 4


def _dataset(n, seed):
    """Class = stripe orientation x frequency (GAP-friendly: texture,
    not position), 16x16x3 with random phase and noise."""
    rng = np.random.default_rng(seed)
    ys = rng.integers(0, N_CLASS, size=n)
    yy, xx = np.mgrid[0:HW, 0:HW].astype(np.float32)
    imgs = np.empty((n, HW, HW, C_IN), np.float32)
    spec = [(yy, 1.0), (xx, 1.0), (yy, 2.0), (xx, 2.0)]
    for i, y in enumerate(ys):
        axis, freq = spec[y]
        phase = rng.uniform(0, 2 * np.pi)
        stripe = np.sin(axis * freq + phase)
        img = np.stack([stripe * (1 + 0.3 * c) for c in range(C_IN)], -1)
        imgs[i] = img + rng.normal(0, 0.3, size=img.shape)
    return imgs, ys


def _train(steps=300, seed=0):
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(seed)

    def init(shape, fan_in):
        return jnp.asarray(rng.normal(0, np.sqrt(2.0 / fan_in),
                                      size=shape).astype(np.float32))

    params = {
        "w1": init((3, 3, C_IN, 16), 27), "b1": jnp.zeros((16,)),
        "w2": init((3, 3, 16, 32), 144), "b2": jnp.zeros((32,)),
        "w3": init((32, N_CLASS), 32), "b3": jnp.zeros((N_CLASS,)),
    }

    def forward(p, x):
        y = jax.lax.conv_general_dilated(
            x, p["w1"], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b1"]
        y = jnp.maximum(y, 0)
        y = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max,
                                  (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        y = jax.lax.conv_general_dilated(
            y, p["w2"], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b2"]
        y = jnp.maximum(y, 0)
        y = y.mean(axis=(1, 2))
        return y @ p["w3"] + p["b3"]

    def loss(p, x, y):
        logits = forward(p, x)
        return -jnp.mean(jax.nn.log_softmax(logits)[
            jnp.arange(x.shape[0]), y])

    xtr, ytr = _dataset(2048, seed=1)
    xtr_j, ytr_j = jnp.asarray(xtr), jnp.asarray(ytr)
    grad = jax.jit(jax.grad(loss))
    lr = 0.05
    for s in range(steps):
        i = (s * 128) % 2048
        g = grad(params, xtr_j[i:i + 128], ytr_j[i:i + 128])
        params = jax.tree_util.tree_map(lambda p, gv: p - lr * gv,
                                        params, g)
    return {k: np.asarray(v) for k, v in params.items()}


def _build_graph(p, batch):
    b = GraphBuilder("gatecnn", seed=0)
    x = b.input("data", (batch, HW, HW, C_IN))
    x = b.conv("c1", x, 16, 3, pad=1, relu=True)
    x = b.pool("p1", x, 2, 2, mode="MAX", )
    x = b.conv("c2", x, 32, 3, pad=1, relu=True)
    x = b.pool("gap", x, 0, mode="AVE", global_pooling=True)
    x = b.fc("fc", x, N_CLASS)
    g = b.finish([x])
    g.params["c1/w"], g.params["c1/b"] = p["w1"], p["b1"]
    g.params["c2/w"], g.params["c2/b"] = p["w2"], p["b2"]
    g.params["fc/w"], g.params["fc/b"] = p["w3"], p["b3"]
    return g


def test_int8_top1_within_half_percent():
    params = _train()
    xval, yval = _dataset(1024, seed=2)
    g = _build_graph(params, batch=1024)

    fp = Engine(g)
    logits = np.asarray(fp(xval))
    top1_fp = float((logits.argmax(-1) == yval).mean())
    assert top1_fp > 0.9, f"training failed ({top1_fp:.3f})"

    xcal, _ = _dataset(256, seed=3)
    for method in ("max", "percentile"):
        calibrate(g, [xcal], method=method)
        q = Engine(g, EngineConfig(backend="pallas", quant="w8a8",
                                   interpret=True))
        top1_q = float((np.asarray(q(xval)).argmax(-1) == yval).mean())
        drop = top1_fp - top1_q
        assert drop <= 0.005 + 1e-9, \
            f"{method}: top-1 drop {drop*100:.2f}% > 0.5%"


def test_weight_only_top1_no_drop():
    params = _train(steps=200)
    xval, yval = _dataset(512, seed=4)
    g = _build_graph(params, batch=512)
    fp = Engine(g)
    top1_fp = float((np.asarray(fp(xval)).argmax(-1) == yval).mean())
    q = Engine(g, EngineConfig(backend="pallas", quant="w8",
                               interpret=True))
    top1_q = float((np.asarray(q(xval)).argmax(-1) == yval).mean())
    assert top1_fp - top1_q <= 0.005 + 1e-9


def _train_dense(steps=300, seed=5):
    """DenseNet-style: conv -> concat -> affine+relu -> conv -> concat ->
    affine+relu -> GAP -> fc.  Exercises the requantizing-concat and
    int8-Scale edges (quant/rewrite concat_int8 / requant_int8) on trained
    distributions."""
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(seed)

    def init(shape, fan_in):
        return jnp.asarray(rng.normal(0, np.sqrt(2.0 / fan_in),
                                      size=shape).astype(np.float32))

    params = {
        "w1": init((3, 3, C_IN, 16), 27),
        "g1": jnp.ones((C_IN + 16,)), "b1": jnp.zeros((C_IN + 16,)),
        "w2": init((3, 3, C_IN + 16, 16), 171),
        "g2": jnp.ones((C_IN + 32,)), "b2": jnp.zeros((C_IN + 32,)),
        "wh": init((1, 1, C_IN + 32, 16), C_IN + 32),
        "w3": init((16, N_CLASS), 16), "b3": jnp.zeros((N_CLASS,)),
    }

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def forward(p, x):
        c1 = jnp.concatenate([x, conv(x, p["w1"])], -1)
        z = jnp.maximum(c1 * p["g1"] + p["b1"], 0)
        c2 = jnp.concatenate([c1, conv(z, p["w2"])], -1)
        z = jnp.maximum(c2 * p["g2"] + p["b2"], 0)
        h = jnp.maximum(jax.lax.conv_general_dilated(
            z, p["wh"], (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")), 0)
        return h.mean(axis=(1, 2)) @ p["w3"] + p["b3"]

    def loss(p, x, y):
        logits = forward(p, x)
        return -jnp.mean(jax.nn.log_softmax(logits)[
            jnp.arange(x.shape[0]), y])

    xtr, ytr = _dataset(2048, seed=6)
    xtr_j, ytr_j = jnp.asarray(xtr), jnp.asarray(ytr)
    grad = jax.jit(jax.grad(loss))
    for s in range(steps):
        i = (s * 128) % 2048
        g = grad(params, xtr_j[i:i + 128], ytr_j[i:i + 128])
        params = jax.tree_util.tree_map(lambda p, gv: p - 0.05 * gv,
                                        params, g)
    return {k: np.asarray(v) for k, v in params.items()}


def test_int8_dense_block_top1_gate():
    """Concat/Scale int8 edges (the DenseNet path) hold the 0.5% top-1
    gate on a trained model."""
    p = _train_dense()
    xval, yval = _dataset(1024, seed=7)
    b = GraphBuilder("gatedense", seed=0)
    x = b.input("data", (1024, HW, HW, C_IN))
    y = b.conv("l1", x, 16, 3, pad=1, bias=False)
    c1 = b.concat("cat1", [x, y])
    z = b.scale("s1", c1, bias=True)
    z = b.relu("r1", z)
    y = b.conv("l2", z, 16, 3, pad=1, bias=False)
    c2 = b.concat("cat2", [c1, y])
    z = b.scale("s2", c2, bias=True)
    z = b.relu("r2", z)
    z = b.conv("head", z, 16, 1, bias=False, relu=True)
    z = b.pool("gap", z, 0, mode="AVE", global_pooling=True)
    z = b.fc("fc", z, N_CLASS)
    g = b.finish([z])
    g.params.update({"l1/w": p["w1"], "s1/gamma": p["g1"],
                     "s1/beta": p["b1"], "l2/w": p["w2"],
                     "s2/gamma": p["g2"], "s2/beta": p["b2"],
                     "head/w": p["wh"],
                     "fc/w": p["w3"], "fc/b": p["b3"]})

    fp = Engine(g)
    top1_fp = float((np.asarray(fp(xval)).argmax(-1) == yval).mean())
    assert top1_fp > 0.9, f"training failed ({top1_fp:.3f})"

    xcal, _ = _dataset(256, seed=8)
    calibrate(g, [xcal], method="max")
    q = Engine(g, EngineConfig(backend="pallas", quant="w8a8",
                               interpret=True,
                               algo_overrides=(("*", "xla"),)))
    qm = q.graph.meta["quant"]
    assert qm.get("s1", {}).get("requant_int8")
    assert any(qm.get(c, {}).get("concat_int8")
               or qm.get(c, {}).get("passthrough_int8")
               for c in ("cat1", "cat2"))
    top1_q = float((np.asarray(q(xval)).argmax(-1) == yval).mean())
    drop = top1_fp - top1_q
    assert drop <= 0.005 + 1e-9, f"top-1 drop {drop*100:.2f}% > 0.5%"


def _train_dwsep(steps=300, seed=9):
    """MobileNet-style depthwise-separable block — gates the int8_grouped
    default (depthwise int8 edges) on trained distributions."""
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(seed)

    def init(shape, fan_in):
        return jnp.asarray(rng.normal(0, np.sqrt(2.0 / fan_in),
                                      size=shape).astype(np.float32))

    params = {
        "w1": init((3, 3, C_IN, 16), 27), "b1": jnp.zeros((16,)),
        "wd": init((3, 3, 1, 16), 9), "bd": jnp.zeros((16,)),
        "wp": init((1, 1, 16, 32), 16), "bp": jnp.zeros((32,)),
        "w3": init((32, N_CLASS), 32), "b3": jnp.zeros((N_CLASS,)),
    }

    def forward(p, x):
        y = jax.lax.conv_general_dilated(
            x, p["w1"], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b1"]
        y = jnp.maximum(y, 0)
        y = jax.lax.conv_general_dilated(
            y, p["wd"], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=16) + p["bd"]
        y = jnp.maximum(y, 0)
        y = jax.lax.conv_general_dilated(
            y, p["wp"], (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["bp"]
        y = jnp.maximum(y, 0)
        return y.mean(axis=(1, 2)) @ p["w3"] + p["b3"]

    def loss(p, x, y):
        logits = forward(p, x)
        return -jnp.mean(jax.nn.log_softmax(logits)[
            jnp.arange(x.shape[0]), y])

    xtr, ytr = _dataset(2048, seed=10)
    xtr_j, ytr_j = jnp.asarray(xtr), jnp.asarray(ytr)
    grad = jax.jit(jax.grad(loss))
    for s in range(steps):
        i = (s * 128) % 2048
        g = grad(params, xtr_j[i:i + 128], ytr_j[i:i + 128])
        params = jax.tree_util.tree_map(lambda p, gv: p - 0.05 * gv,
                                        params, g)
    return {k: np.asarray(v) for k, v in params.items()}


def test_int8_depthwise_top1_gate():
    """int8_grouped (default on): depthwise int8 edges hold the 0.5%
    top-1 gate on a trained dw-separable model, on both the XLA and
    VPU-kernel depthwise paths."""
    p = _train_dwsep()
    xval, yval = _dataset(1024, seed=11)
    b = GraphBuilder("gatedw", seed=0)
    x = b.input("data", (1024, HW, HW, C_IN))
    x = b.conv("c1", x, 16, 3, pad=1, relu=True)
    x = b.dwconv("dw", x, 3, pad=1, relu=True)
    x = b.conv("pw", x, 32, 1, relu=True)
    x = b.pool("gap", x, 0, mode="AVE", global_pooling=True)
    x = b.fc("fc", x, N_CLASS)
    g = b.finish([x])
    g.params.update({"c1/w": p["w1"], "c1/b": p["b1"],
                     "dw/w": p["wd"], "dw/b": p["bd"],
                     "pw/w": p["wp"], "pw/b": p["bp"],
                     "fc/w": p["w3"], "fc/b": p["b3"]})

    fp = Engine(g)
    top1_fp = float((np.asarray(fp(xval)).argmax(-1) == yval).mean())
    assert top1_fp > 0.9, f"training failed ({top1_fp:.3f})"

    xcal, _ = _dataset(256, seed=12)
    calibrate(g, [xcal], method="max")
    for algo in (None, "xla"):
        q = Engine(g, EngineConfig(
            backend="pallas", quant="w8a8", interpret=True,
            algo_overrides=((("*", algo),) if algo else ())))
        assert q.graph.meta["quant"]["c1"].get("emit_int8")
        top1_q = float((np.asarray(q(xval)).argmax(-1) == yval).mean())
        drop = top1_fp - top1_q
        assert drop <= 0.005 + 1e-9, \
            f"algo={algo}: top-1 drop {drop*100:.2f}% > 0.5%"


def _train_se(steps=300, seed=13):
    """SE-block net (conv -> [1x1, 3x3, SE gate, axpy, relu] -> head) —
    gates the int8_axpy default on trained distributions."""
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(seed)

    def init(shape, fan_in):
        return jnp.asarray(rng.normal(0, np.sqrt(2.0 / fan_in),
                                      size=shape).astype(np.float32))

    params = {
        "w1": init((3, 3, C_IN, 16), 27), "b1": jnp.zeros((16,)),
        "wa": init((1, 1, 16, 16), 16), "ba": jnp.zeros((16,)),
        "wb": init((3, 3, 16, 16), 144), "bb": jnp.zeros((16,)),
        "wd": init((1, 1, 16, 4), 16), "bd": jnp.zeros((4,)),
        "wu": init((1, 1, 4, 16), 4), "bu": jnp.zeros((16,)),
        "wh": init((1, 1, 16, 16), 16), "bh": jnp.zeros((16,)),
        "w3": init((16, N_CLASS), 16), "b3": jnp.zeros((N_CLASS,)),
    }

    def conv(x, w, pad=0):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def forward(p, x):
        x = jnp.maximum(conv(x, p["w1"], 1) + p["b1"], 0)
        y = jnp.maximum(conv(x, p["wa"]) + p["ba"], 0)
        y = conv(y, p["wb"], 1) + p["bb"]
        s = y.mean(axis=(1, 2), keepdims=True)
        s = jnp.maximum(conv(s, p["wd"]) + p["bd"], 0)
        s = jax.nn.sigmoid(conv(s, p["wu"]) + p["bu"])
        z = jnp.maximum(s * y + x, 0)
        z = jnp.maximum(conv(z, p["wh"]) + p["bh"], 0)
        return z.mean(axis=(1, 2)) @ p["w3"] + p["b3"]

    def loss(p, x, y):
        logits = forward(p, x)
        return -jnp.mean(jax.nn.log_softmax(logits)[
            jnp.arange(x.shape[0]), y])

    xtr, ytr = _dataset(2048, seed=14)
    xtr_j, ytr_j = jnp.asarray(xtr), jnp.asarray(ytr)
    grad = jax.jit(jax.grad(loss))
    for s in range(steps):
        i = (s * 128) % 2048
        g = grad(params, xtr_j[i:i + 128], ytr_j[i:i + 128])
        params = jax.tree_util.tree_map(lambda p, gv: p - 0.05 * gv,
                                        params, g)
    return {k: np.asarray(v) for k, v in params.items()}


def test_int8_axpy_top1_gate():
    """int8_axpy (default on): SE residual int8 edges hold the 0.5%
    top-1 gate on a trained SE-block model."""
    p = _train_se()
    xval, yval = _dataset(1024, seed=15)
    b = GraphBuilder("gatese", seed=0)
    x = b.input("data", (1024, HW, HW, C_IN))
    x = b.conv("c1", x, 16, 3, pad=1, relu=True)
    y = b.conv("a", x, 16, 1, relu=True)
    y = b.conv("bb", y, 16, 3, pad=1)
    s = b.pool("gp", y, 0, mode="AVE", global_pooling=True)
    s = b.conv("down", s, 4, 1, relu=True)
    s = b.conv("up", s, 16, 1)
    s = b.sigmoid("prob", s)
    z = b.axpy("axpy", s, y, x)
    z = b.relu("axpy_relu", z)
    z = b.conv("head", z, 16, 1, relu=True)
    z = b.pool("gap", z, 0, mode="AVE", global_pooling=True)
    z = b.fc("fc", z, N_CLASS)
    g = b.finish([z])
    g.params.update({"c1/w": p["w1"], "c1/b": p["b1"],
                     "a/w": p["wa"], "a/b": p["ba"],
                     "bb/w": p["wb"], "bb/b": p["bb"],
                     "down/w": p["wd"], "down/b": p["bd"],
                     "up/w": p["wu"], "up/b": p["bu"],
                     "head/w": p["wh"], "head/b": p["bh"],
                     "fc/w": p["w3"], "fc/b": p["b3"]})

    fp = Engine(g)
    top1_fp = float((np.asarray(fp(xval)).argmax(-1) == yval).mean())
    assert top1_fp > 0.9, f"training failed ({top1_fp:.3f})"

    xcal, _ = _dataset(256, seed=16)
    calibrate(g, [xcal], method="max")
    q = Engine(g, EngineConfig(backend="pallas", quant="w8a8",
                               interpret=True,
                               algo_overrides=(("*", "xla"),)))
    assert q.graph.meta["quant"].get("axpy", {}).get("axpy_int8")
    top1_q = float((np.asarray(q(xval)).argmax(-1) == yval).mean())
    drop = top1_fp - top1_q
    assert drop <= 0.005 + 1e-9, f"top-1 drop {drop*100:.2f}% > 0.5%"
