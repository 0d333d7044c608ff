"""Region-fusion tests: FusedBottleneck and FusedChain (interpret mode)
match the per-layer oracle, fp and full-int8 (SURVEY.md §4 items 1-2)."""

import numpy as np
import pytest

from feathercnn_tpu import Engine, EngineConfig
from feathercnn_tpu.models.builder import GraphBuilder
from feathercnn_tpu.quant import calibrate


def _cosine(a, b):
    a, b = np.asarray(a, np.float32).ravel(), np.asarray(b, np.float32).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def _mini_resnet(batch=2, hw=8, C=64, Cm=16, nblocks=3, seed=3):
    """Entry conv -> nblocks identity bottlenecks -> exit conv.  The
    default region policy is measurement-driven OFF (BASELINE.md); tests
    opt in via the chain_regions wildcard."""
    b = GraphBuilder("mini_res", seed=seed)
    x = b.input("data", (batch, hw, hw, C))
    x = b.conv("conv_in", x, C, 1, relu=True)
    for i in range(nblocks):
        a = b.conv(f"blk{i}_c1", x, Cm, 1, relu=True)
        c2 = b.conv(f"blk{i}_c2", a, Cm, 3, pad=1, relu=True)
        c3 = b.conv(f"blk{i}_c3", c2, C, 1)
        s = b.eltwise(f"blk{i}_add", [x, c3])
        x = b.relu(f"blk{i}_relu", s)
    x = b.conv("conv_out", x, C, 1, relu=True)
    g = b.finish([x])
    g.meta["chain_regions"] = {"*": True}
    return g


def test_fuse_blocks_fp_equivalence(rng):
    g = _mini_resnet()
    x = rng.normal(size=(2, 8, 8, 64)).astype(np.float32)
    ref = np.asarray(Engine(g)(x))
    eng = Engine(g, EngineConfig(fuse_blocks=True, interpret=True))
    ops = [n.op for n in eng.graph.nodes]
    assert ops.count("FusedBottleneck") == 3
    out = np.asarray(eng(x))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_fuse_chains_fp_equivalence(rng):
    g = _mini_resnet()
    x = rng.normal(size=(2, 8, 8, 64)).astype(np.float32)
    ref = np.asarray(Engine(g)(x))
    eng = Engine(g, EngineConfig(fuse_chains=True, interpret=True))
    ops = [n.op for n in eng.graph.nodes]
    assert ops.count("FusedChain") == 1 and "FusedBottleneck" not in ops
    chain = next(n for n in eng.graph.nodes if n.op == "FusedChain")
    assert chain.attrs["nb"] == 3
    out = np.asarray(eng(x))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_fuse_chains_int8_equivalence(rng):
    g = _mini_resnet()
    x = rng.normal(size=(2, 8, 8, 64)).astype(np.float32)
    ref = np.asarray(Engine(g)(x))
    calibrate(g, [x], method="max")
    per_layer = np.asarray(Engine(g, EngineConfig(
        backend="pallas", quant="w8a8", interpret=True))(x))
    eng = Engine(g, EngineConfig(backend="pallas", quant="w8a8",
                                 fuse_chains=True, interpret=True))
    ops = [n.op for n in eng.graph.nodes]
    assert ops.count("FusedChain") == 1
    chain = next(n for n in eng.graph.nodes if n.op == "FusedChain")
    assert chain.attrs["quant"] and len(chain.attrs["sx"]) == 3
    out = np.asarray(eng(x))
    # fused chain vs per-layer int8: same math modulo the int8 eltwise
    # rescale-add ordering; both must track the fp oracle closely
    assert _cosine(out, per_layer) > 0.999
    assert _cosine(out, ref) > 0.995


def test_fuse_chains_int8_float_out(rng):
    """Chain whose consumer is NOT quantized (global AVE pool): the last
    block dequantizes to float in its epilogue (s_out=None path)."""
    b = GraphBuilder("mini_res_fp_out", seed=7)
    x = b.input("data", (2, 8, 8, 64))
    x = b.conv("conv_in", x, 64, 1, relu=True)
    for i in range(2):
        a = b.conv(f"blk{i}_c1", x, 16, 1, relu=True)
        c2 = b.conv(f"blk{i}_c2", a, 16, 3, pad=1, relu=True)
        c3 = b.conv(f"blk{i}_c3", c2, 64, 1)
        s = b.eltwise(f"blk{i}_add", [x, c3])
        x = b.relu(f"blk{i}_relu", s)
    x = b.pool("gap", x, 0, mode="AVE", global_pooling=True)
    x = b.fc("fc", x, 10)
    g = b.finish([x])
    g.meta["chain_regions"] = {"*": True}

    xv = rng.normal(size=(2, 8, 8, 64)).astype(np.float32)
    ref = np.asarray(Engine(g)(xv))
    calibrate(g, [xv], method="max")
    eng = Engine(g, EngineConfig(backend="pallas", quant="w8a8",
                                 fuse_chains=True, interpret=True))
    chain = next(n for n in eng.graph.nodes if n.op == "FusedChain")
    assert chain.attrs["s_out"] is None
    out = np.asarray(eng(xv))
    assert _cosine(ref, out) > 0.998


def test_fuse_chains_breaks_on_shape_change(rng):
    """Blocks with different (C, Cm) must not merge into one chain."""
    b = GraphBuilder("mixed", seed=5)
    x = b.input("data", (2, 8, 8, 32))
    x = b.conv("conv_in", x, 32, 1, relu=True)
    for i, (C, Cm) in enumerate([(32, 8), (32, 8)]):
        a = b.conv(f"b{i}_c1", x, Cm, 1, relu=True)
        c2 = b.conv(f"b{i}_c2", a, Cm, 3, pad=1, relu=True)
        c3 = b.conv(f"b{i}_c3", c2, C, 1)
        s = b.eltwise(f"b{i}_add", [x, c3])
        x = b.relu(f"b{i}_relu", s)
    # projection to a different width, then one more block (not chainable
    # with the first two)
    x = b.conv("proj", x, 64, 1, relu=True)
    a = b.conv("b2_c1", x, 16, 1, relu=True)
    c2 = b.conv("b2_c2", a, 16, 3, pad=1, relu=True)
    c3 = b.conv("b2_c3", c2, 64, 1)
    s = b.eltwise("b2_add", [x, c3])
    x = b.relu("b2_relu", s)
    x = b.conv("conv_out", x, 64, 1, relu=True)
    g = b.finish([x])
    g.meta["chain_regions"] = {"*": True}

    xv = rng.normal(size=(2, 8, 8, 32)).astype(np.float32)
    ref = np.asarray(Engine(g)(xv))
    eng = Engine(g, EngineConfig(fuse_chains=True, interpret=True))
    ops = [n.op for n in eng.graph.nodes]
    # first two blocks chain; the third stays a single FusedBottleneck
    assert ops.count("FusedChain") == 1
    assert ops.count("FusedBottleneck") == 1
    out = np.asarray(eng(xv))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_resnet50_chain_fusion_default_off():
    """The default region policy is OFF — measured in context, XLA's
    per-layer int8 path beats the pallas chain at every ResNet-50
    signature on this backend (BASELINE.md).  fuse_chains=True without
    a chain_regions table must therefore leave the graph per-layer."""
    from feathercnn_tpu.models import MODEL_BUILDERS
    g = MODEL_BUILDERS["resnet50"](batch=1, with_softmax=False)
    eng = Engine(g, EngineConfig(fuse_chains=True, interpret=True,
                                 compute_dtype="bfloat16"))
    assert not [n for n in eng.graph.nodes
                if n.op in ("FusedChain", "FusedBottleneck")]


def test_region_override_forces_fusion():
    """graph.meta['chain_regions'] (region autotune) overrides the
    default policy per signature."""
    from feathercnn_tpu.models import MODEL_BUILDERS
    g = MODEL_BUILDERS["resnet50"](batch=1, with_softmax=False)
    g.meta["chain_regions"] = {"14x14x1024x256": True,
                               "56x56x256x64": False}
    eng = Engine(g, EngineConfig(fuse_chains=True, interpret=True,
                                 compute_dtype="bfloat16"))
    chains = [n for n in eng.graph.nodes if n.op == "FusedChain"]
    shapes = {eng.graph.specs[n.inputs[0]].shape[1] for n in chains}
    assert shapes == {14}


def test_resnet50_chain_fusion_counts_int8(rng):
    """Full-int8 ResNet-50 with an autotuned region table: every stage
    admitted by the table chains completely (row slabs fit 56x56; int8
    weights fit whole stages in VMEM)."""
    from feathercnn_tpu.models import MODEL_BUILDERS
    from feathercnn_tpu.quant import calibrate
    g = MODEL_BUILDERS["resnet50"](batch=1, with_softmax=False)
    g.meta["chain_regions"] = {"*": True}
    calibrate(g, [rng.normal(size=(1, 224, 224, 3)).astype(np.float32)],
              method="max")
    eng = Engine(g, EngineConfig(backend="pallas", quant="w8a8",
                                 fuse_chains=True, interpret=True))
    chains = [n for n in eng.graph.nodes if n.op == "FusedChain"]
    singles = [n for n in eng.graph.nodes if n.op == "FusedBottleneck"]
    assert sorted(n.attrs["nb"] for n in chains) == [2, 2, 3, 5]
    assert not singles
    assert all(n.attrs["quant"] for n in chains)


def test_chain_row_slabs_exact(rng):
    """Force a tiny VMEM budget so the kernel takes the row-slab path
    (halo handling) and compare against the generous-budget result."""
    import jax.numpy as jnp
    from feathercnn_tpu.kernels.fused_chain import chain_plan, fused_chain
    N, H, W, C, Cm, nb = 2, 8, 8, 32, 16, 2
    x = rng.normal(size=(N, H, W, C)).astype(np.float32)
    w1 = rng.normal(size=(nb, C, Cm)).astype(np.float32) * 0.1
    w2 = rng.normal(size=(nb, 9 * Cm, Cm)).astype(np.float32) * 0.1
    w3 = rng.normal(size=(nb, Cm, C)).astype(np.float32) * 0.1
    b1 = rng.normal(size=(nb, Cm)).astype(np.float32)
    b2 = rng.normal(size=(nb, Cm)).astype(np.float32)
    b3 = rng.normal(size=(nb, C)).astype(np.float32)
    # find a budget that forces row slabs (R < H) but stays feasible
    small = None
    for budget in (512, 256, 192, 128, 96, 64):
        plan = chain_plan(N, H, W, C, Cm, nb, 4, 4, budget=budget * 1024)
        if plan is not None and plan[1] < H:
            small = budget * 1024
            break
    assert small is not None, "no slab-forcing budget found"
    ref = np.asarray(fused_chain(jnp.asarray(x), w1, b1, w2, b2, w3, b3,
                                 interpret=True))
    out = np.asarray(fused_chain(jnp.asarray(x), w1, b1, w2, b2, w3, b3,
                                 interpret=True, vmem_budget=small))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)
