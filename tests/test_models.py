"""Model-level integration tests (SURVEY.md §4 item 3): every BASELINE
config builds, optimizes, and runs; fused output matches the unfused oracle."""

import numpy as np
import pytest

from feathercnn_tpu import Engine, EngineConfig
from feathercnn_tpu.models import MODEL_BUILDERS

EXPECTED_OUT = {
    "squeezenet_v11": (1, 1, 1, 1000),
    "mobilenet_v1": (1, 1000),
    "mobilenet_v2": (1, 1000),
    "shufflenet_v1": (1, 1000),
    "se_resnet50": (1, 1000),
    "inception_v3": (1, 1000),
    "vgg16": (1, 1000),
    "resnet50": (1, 1000),
    "googlenet": (1, 1000),
    "densenet121": (1, 1000),
    "resnext50": (1, 1000),
    "alexnet": (1, 1000),
}

# vgg16 is slow on the CPU test backend; covered by test_vgg_like_small and
# the TPU bench instead.
FAST_MODELS = ["squeezenet_v11", "mobilenet_v1", "mobilenet_v2",
               "shufflenet_v1", "resnet50", "se_resnet50", "googlenet",
               "inception_v3", "densenet121", "resnext50", "alexnet"]


@pytest.mark.parametrize("name", FAST_MODELS)
def test_model_forward_and_fusion_equivalence(name, rng):
    g = MODEL_BUILDERS[name]()
    eng = Engine(g)
    spec = next(iter(g.inputs.values()))
    x = rng.normal(size=spec.shape).astype(np.float32)
    out = np.asarray(eng(x))
    assert out.shape == EXPECTED_OUT[name]
    # softmax output: valid distribution
    np.testing.assert_allclose(out.sum(), 1.0, rtol=1e-4)
    assert (out >= 0).all()

    raw = np.asarray(Engine(g, optimize_graph=False)(x))
    np.testing.assert_allclose(out, raw, rtol=1e-3, atol=1e-5)


def test_vgg_like_small(rng):
    """VGG-16 structure at reduced spatial size (fast CPU proxy)."""
    from feathercnn_tpu.models.builder import GraphBuilder
    b = GraphBuilder("mini_vgg", seed=11)
    x = b.input("data", (2, 32, 32, 3))
    for stage, ch in [(1, 16), (2, 32)]:
        for i in (1, 2):
            x = b.conv(f"conv{stage}_{i}", x, ch, 3, pad=1, relu=True)
        x = b.pool(f"pool{stage}", x, 2, 2)
    x = b.fc("fc", x, 10, relu=True)
    x = b.softmax("prob", x)
    g = b.finish([x])
    xv = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    out = np.asarray(Engine(g)(xv))
    raw = np.asarray(Engine(g, optimize_graph=False)(xv))
    assert out.shape == (2, 10)
    np.testing.assert_allclose(out, raw, rtol=1e-4, atol=1e-6)


def test_extract_intermediate(rng):
    g = MODEL_BUILDERS["squeezenet_v11"]()
    eng = Engine(g)
    x = rng.normal(size=(1, 227, 227, 3)).astype(np.float32)
    outs = eng.extract(x, ["conv1"])
    assert outs["conv1"].shape == eng.blob_shape("conv1")
    # fused epilogue: extracted conv1 activation is post-ReLU
    assert float(np.asarray(outs["conv1"]).min()) >= 0.0


def test_batch_dimension(rng):
    g = MODEL_BUILDERS["squeezenet_v11"](batch=4)
    eng = Engine(g)
    x = rng.normal(size=(4, 227, 227, 3)).astype(np.float32)
    out = np.asarray(eng(x))
    assert out.shape == (4, 1, 1, 1000)
    np.testing.assert_allclose(out.sum(axis=-1), np.ones((4, 1, 1)),
                               rtol=1e-4)


@pytest.mark.parametrize("name,blocks", [("resnet101", 33),
                                         ("resnet152", 50)])
def test_deep_resnet_structure(name, blocks, rng):
    """ResNet-101/152 builders: Caffe naming, right block counts, and a
    forward pass at reduced depth cost (structure check; full-res
    forward is covered by resnet50)."""
    from feathercnn_tpu.models import MODEL_BUILDERS
    g = MODEL_BUILDERS[name](batch=1, with_softmax=False)
    eltwise = [n for n in g.nodes if n.op == "Eltwise"]
    assert len(eltwise) == blocks
    assert any(n.name == "res4b1_branch2a" for n in g.nodes)
    from feathercnn_tpu.ir import infer_shapes
    infer_shapes(g)
    assert g.specs["fc1000"].shape == (1, 1000)


def test_deeplab_largefov_shapes_and_small_forward(rng):
    """DeepLab-LargeFOV: output stride 8 + Interp zoom x8 returns the
    input's spatial size (321 -> 41 -> 321); a small-size forward runs
    the dilated-conv + Interp path end to end."""
    from feathercnn_tpu.models import deeplab_largefov
    g = deeplab_largefov(batch=1, size=321)
    assert g.specs["prob"].shape == (1, 321, 321, 21)
    g = deeplab_largefov(batch=1, size=65, seed=3)
    assert g.specs["prob"].shape == (1, 65, 65, 21)
    from feathercnn_tpu import Engine
    x = rng.normal(size=(1, 65, 65, 3)).astype(np.float32)
    y = np.asarray(Engine(g)(x))
    assert y.shape == (1, 65, 65, 21)
    np.testing.assert_allclose(y.sum(-1), 1.0, rtol=1e-4)


def test_pspnet_shapes_and_small_forward(rng):
    """PSPNet-50: stride-8 dilated backbone + pyramid pooling; Interp
    returns the input's spatial size; a small forward runs the
    AVE-bin + Interp + Concat composition end to end."""
    from feathercnn_tpu.models import pspnet50
    g = pspnet50(batch=1, size=473)
    assert g.specs["prob"].shape == (1, 473, 473, 150)
    # pyramid bins at feature 60: 1x1 / 2x2 / 3x3 / 6x6
    for bin_ in (1, 2, 3, 6):
        assert g.specs[f"pool{bin_}x{bin_}"].shape[1:3] == (bin_, bin_)
    assert g.specs["ppm_concat"].shape[-1] == 2048 + 4 * 512
    from feathercnn_tpu import Engine
    g = pspnet50(batch=1, size=89, num_classes=5, seed=2)
    x = rng.normal(size=(1, 89, 89, 3)).astype(np.float32)
    y = np.asarray(Engine(g)(x))
    assert y.shape == (1, 89, 89, 5)
    np.testing.assert_allclose(y.sum(-1), 1.0, rtol=1e-4)


def test_fcn_family_shapes():
    """FCN-32s/16s/8s: the pad-100 / skip-crop / final-crop geometry
    returns exactly the input's spatial size for any input (shape-only —
    the 224-size forwards are TPU territory)."""
    from feathercnn_tpu.models import fcn8s, fcn16s, fcn32s
    for fn in (fcn32s, fcn16s, fcn8s):
        for size in (224, 320):
            g = fn(batch=1, size=size, num_classes=21)
            assert g.specs["prob"].shape == (1, size, size, 21), fn
