"""Tests for observability + autotune plumbing."""

import json

import numpy as np
import pytest

from feathercnn_tpu import Engine, EngineConfig
from feathercnn_tpu.models.builder import GraphBuilder


def _net():
    b = GraphBuilder("t", seed=9)
    x = b.input("data", (1, 8, 8, 4))
    y = b.conv("c1", x, 8, 3, pad=1, relu=True)
    y = b.conv("c2", y, 8, 1, relu=True)
    return b.finish([y])


def test_layer_timings_runs(rng):
    from feathercnn_tpu.utils.profiling import layer_timings
    eng = Engine(_net())
    x = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    t = layer_timings(eng, x, iters=2)
    assert set(t) == {n.name for n in eng.graph.nodes}
    assert all(v >= 0 for v in t.values())


def test_baked_algo_overrides_applied(rng):
    g = _net()
    g.meta["algo_overrides"] = {"c1": "winograd"}
    eng = Engine(g, EngineConfig(backend="pallas"))
    assert eng.config.algo_for("c1") == "winograd"
    # config-specified overrides win over baked ones
    eng2 = Engine(g, EngineConfig(backend="pallas",
                                  algo_overrides=(("c1", "xla"),)))
    assert eng2.config.algo_for("c1") == "xla"
    # and the outputs agree regardless of algo
    x = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    # winograd's f32 transform round-trip legitimately differs from the
    # direct conv by ~1e-5 abs on unit-normal inputs
    np.testing.assert_allclose(np.asarray(eng(x)), np.asarray(eng2(x)),
                               rtol=5e-4, atol=5e-5)


def test_roofline_static_table():
    from bench.roofline import layer_table
    eng = Engine(_net())
    rows = layer_table(eng.graph, None)
    assert {r["layer"] for r in rows} == {"c1", "c2"}
    c1 = next(r for r in rows if r["layer"] == "c1")
    # 2*N*OH*OW*Co*KH*KW*C = 2*1*8*8*8*3*3*4
    assert abs(c1["gflops"] - 2 * 64 * 8 * 9 * 4 / 1e9) < 1e-12
    assert c1["roofline_tflops"] > 0


def test_top1_agreement_fp_vs_int8(rng):
    """Proxy for the 0.5% top-1 gate (BASELINE.json:5) without ImageNet:
    fp vs full-int8 top-1 agreement on random inputs must be >= 95%."""
    from feathercnn_tpu.quant import calibrate
    from feathercnn_tpu.models import squeezenet_v11

    g = squeezenet_v11()
    cal = [rng.normal(size=(1, 227, 227, 3)).astype(np.float32)
           for _ in range(2)]
    calibrate(g, cal, method="percentile")
    fp = Engine(g)
    q = Engine(g, EngineConfig(backend="pallas", quant="w8a8",
                               interpret=True))
    agree = 0
    n = 8
    for i in range(n):
        x = rng.normal(size=(1, 227, 227, 3)).astype(np.float32)
        agree += int(np.asarray(fp(x)).argmax()
                     == np.asarray(q(x)).argmax())
    assert agree / n >= 0.95, f"top-1 agreement {agree}/{n}"


def test_ftpu_roundtrip_chain_regions(tmp_path, rng):
    """Autotuned region decisions persist through the .ftpu artifact and
    re-apply on load (restart-without-retune, SURVEY.md §5)."""
    from feathercnn_tpu import Engine, EngineConfig
    from feathercnn_tpu.model_format import load_ftpu, save_ftpu
    from feathercnn_tpu.models.builder import GraphBuilder

    b = GraphBuilder("rt", seed=3)
    x = b.input("data", (2, 8, 8, 32))
    x = b.conv("conv_in", x, 32, 1, relu=True)
    a = b.conv("c1", x, 8, 1, relu=True)
    c2 = b.conv("c2", a, 8, 3, pad=1, relu=True)
    c3 = b.conv("c3", c2, 32, 1)
    s = b.eltwise("add", [x, c3])
    x = b.relu("relu", s)
    x = b.conv("conv_out", x, 32, 1, relu=True)
    g = b.finish([x])
    g.meta["chain_regions"] = {"8x8x32x8": True}

    path = str(tmp_path / "m.ftpu")
    save_ftpu(g, path)
    g2 = load_ftpu(path)
    assert g2.meta["chain_regions"] == {"8x8x32x8": True}
    eng = Engine(g2, EngineConfig(fuse_blocks=True, interpret=True))
    assert any(n.op == "FusedBottleneck" for n in eng.graph.nodes)


def test_diff_blobs_cli(tmp_path, rng):
    """tools/diff_blobs.py: per-layer A/B diff finds where two configs
    diverge; exit code gates on the final output cosine."""
    import os
    import subprocess
    import sys

    from feathercnn_tpu.model_format import save_ftpu

    b = GraphBuilder("difft", seed=3)
    x = b.input("data", (2, 8, 8, 3))
    y = b.conv("c1", x, 8, 3, pad=1, relu=True)
    y = b.conv("c2", y, 8, 1, relu=True)
    y = b.pool("gap", y, 0, mode="AVE", global_pooling=True)
    y = b.fc("fc", y, 4)
    g = b.finish([y])
    path = str(tmp_path / "m.ftpu")
    save_ftpu(g, path)

    root = os.path.join(os.path.dirname(__file__), "..")
    env = {**os.environ, "PALLAS_AXON_POOL_IPS": "",
           "JAX_PLATFORMS": "cpu"}
    # identical configs -> exit 0, cosine 1.0 everywhere
    r = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "diff_blobs.py"),
         "--ftpu", path, "--a", "quant=none", "--b", "quant=none",
         "--cpu"], capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "first divergence: none" in r.stdout
    # fp vs int8 at an absurd threshold -> nonzero exit + flagged layer
    r = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "diff_blobs.py"),
         "--ftpu", path, "--a", "quant=none",
         "--b", "quant=w8a8,backend=pallas,interpret=true",
         "--threshold", "0.9999999", "--cpu"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 1, r.stdout + r.stderr
    assert "DIVERGES" in r.stdout


def test_summary(rng):
    """Engine.summary / utils.summary: totals match the known ResNet-50
    numbers (25.5M params, ~7.7 GFLOPs at 224) and per-layer rows carry
    fused shapes."""
    from feathercnn_tpu.models import resnet50
    eng = Engine(resnet50(batch=1, with_softmax=False))
    s = eng.summary()
    assert "TOTAL:" in s and "conv1" in s
    total = s.splitlines()[-1]
    params = float(total.split("M params")[0].split(":")[1])
    gflops = float(total.split(",")[1].strip().split(" ")[0])
    assert 25.0 < params < 26.0, total
    assert 7.0 < gflops < 8.5, total
    short = eng.summary(top=5)
    assert len(short.splitlines()) == 5 + 2  # header + 5 rows + total


def test_tune_flags_numerics_gate(rng, monkeypatch):
    """ADVICE r3: tune_flags must not bake a grid-moving flag flip
    (concat_dus at minimum) on speed alone — the flipped engine's
    cosine vs the fp32 oracle gates the decision.  Force every flip to
    'win' on time by stubbing slope_time, corrupt the concat_dus
    variant's outputs, and assert the gate rejects it while honest
    variants still land."""
    import feathercnn_tpu
    import tools.autotune as at

    b = GraphBuilder("gate", seed=11)
    x = b.input("data", (1, 8, 8, 4))
    y = b.conv("stem", x, 8, 3, pad=1, relu=True)
    for i in range(3):
        z = b.conv(f"l{i}", y, 8, 1, relu=True)
        y = b.concat(f"cat{i}", [y, z])
    y = b.pool("gap", y, 0, mode="AVE", global_pooling=True)
    y = b.fc("fc", y, 10)
    g = b.finish([y])
    from feathercnn_tpu.quant import calibrate
    xv = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    calibrate(g, [xv], method="max", config=EngineConfig())

    def fake_slope(loop, params, xd, iters=20):
        return 1.0

    monkeypatch.setattr("feathercnn_tpu.utils.timing.slope_time",
                        fake_slope)

    # honest numerics: with every flip "winning" on time (negative
    # threshold), concat_dus passes the gate and lands
    ov = at.tune_flags(g, "float32", "w8a8", rounds=1, iters=1,
                       threshold=-0.5, interpret=True)
    assert ov.get("concat_dus") is True, ov

    # corrupted numerics: a concat_dus engine whose outputs are garbage
    # must be rejected by the gate even though it "wins" on time
    real_engine = feathercnn_tpu.Engine

    class BrokenLadderEngine(real_engine):
        def __call__(self, x):
            out = super().__call__(x)
            if self.config.concat_dus:
                import jax.numpy as jnp
                out = out + jnp.linspace(0.0, 100.0, out.size).reshape(
                    out.shape).astype(out.dtype)
            return out

    monkeypatch.setattr(feathercnn_tpu, "Engine", BrokenLadderEngine)
    ov2 = at.tune_flags(g, "float32", "w8a8", rounds=1, iters=1,
                        threshold=-0.5, interpret=True)
    assert "concat_dus" not in ov2, ov2
