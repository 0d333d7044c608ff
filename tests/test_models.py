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
    "shufflenet_v2": (1, 1000),
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
               "shufflenet_v1", "shufflenet_v2", "resnet50", "se_resnet50", "googlenet",
               "inception_v3", "densenet121", "resnext50", "alexnet"]


@pytest.mark.parametrize("name", FAST_MODELS)
def test_model_forward_and_fusion_equivalence(name):
    g = MODEL_BUILDERS[name]()
    eng = Engine(g)
    spec = next(iter(g.inputs.values()))
    # per-model deterministic input (NOT the session rng: suite-order
    # changes would shift the draw, and SE-ResNet's 16 multiplicative
    # sigmoid gates make the fused-vs-raw f32 delta draw-sensitive)
    import zlib
    seed = zlib.crc32(name.encode())     # stable across processes
    x = np.random.default_rng(seed).normal(
        size=spec.shape).astype(np.float32)
    out = np.asarray(eng(x))
    assert out.shape == EXPECTED_OUT[name]
    # softmax output: valid distribution
    np.testing.assert_allclose(out.sum(), 1.0, rtol=1e-4)
    assert (out >= 0).all()

    raw = np.asarray(Engine(g, optimize_graph=False)(x))
    np.testing.assert_allclose(out, raw, rtol=1e-3,
                               atol=1e-4 if name == "se_resnet50"
                               else 1e-5)


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


def test_faster_rcnn_structure_and_mini_forward(rng):
    """Faster R-CNN VGG16 zoo: deploy shapes (38x50 feature at 600x800,
    300 ROIs, 21-class head); then a tiny builder-level two-stage net
    runs the Proposal -> ROIPooling -> FC pipeline end to end."""
    from feathercnn_tpu.models import faster_rcnn_vgg16
    g = faster_rcnn_vgg16()
    assert g.specs["conv5_3"].shape == (1, 38, 50, 512)
    assert g.specs["proposal"].shape == (300, 5)
    assert g.specs["roi_pool5"].shape == (300, 7, 7, 512)
    assert g.specs["cls_prob"].shape == (300, 21)
    assert g.specs["bbox_pred"].shape == (300, 84)

    from feathercnn_tpu.models.builder import GraphBuilder
    b = GraphBuilder("mini_frcnn", seed=5)
    data = b.input("data", (1, 64, 48, 3))
    im_info = b.input("im_info", (1, 3))
    x = b.conv("c1", data, 8, 3, stride=2, pad=1, relu=True)
    x = b.pool("p1", x, 2, 2)
    x = b.conv("c2", x, 16, 3, pad=1, relu=True)     # stride 8 feature
    rpn = b.conv("rpn", x, 16, 3, pad=1, relu=True)
    cls = b.conv("rpn_cls", rpn, 18, 1)
    box = b.conv("rpn_box", rpn, 36, 1)
    from feathercnn_tpu.models.zoo import _rpn_softmax
    prob = _rpn_softmax(b, cls, "cls_sm")
    rois = b.proposal("rois", prob, box, im_info, feat_stride=8,
                      pre_nms_top_n=64, post_nms_top_n=16, min_size=4)
    pooled = b.roi_pooling("pool", x, rois, 3, 3, 1.0 / 8)
    y = b.fc("fc", pooled, 8, relu=True)
    out = b.fc("score", y, 4)
    out = b.softmax("probs", out)
    g = b.finish([out, rois])

    xv = rng.normal(size=(1, 64, 48, 3)).astype(np.float32)
    info = np.asarray([[64.0, 48.0, 1.0]], np.float32)
    res = Engine(g).run({"data": xv, "im_info": info})
    probs = np.asarray(res["probs"])
    rois_v = np.asarray(res["rois"])
    assert probs.shape == (16, 4)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)
    assert rois_v.shape == (16, 5)
    # rois lie inside the image (clip); batch_idx is 0 for real rows,
    # -1 for NMS-shortfall padding rows (the sentinel decode drops)
    assert np.isin(rois_v[:, 0], [0.0, -1.0]).all()
    assert (rois_v[:, 0] == 0).any()
    assert (rois_v[:, 1] >= 0).all() and (rois_v[:, 3] <= 47).all()
    assert (rois_v[:, 2] >= 0).all() and (rois_v[:, 4] <= 63).all()


def test_two_stage_batch4_matches_batch1(rng):
    """Batched two-stage path (VERDICT r2 item 4): the CI-sized Faster
    R-CNN zoo model at batch 4 matches four batch-1 runs per image —
    same seed gives identical weights, and the batched ROI head gathers
    from the right image via the rois batch_idx column."""
    from feathercnn_tpu.models import faster_rcnn_vgg16
    kw = dict(size=(96, 128), pre_nms_top_n=200, post_nms_top_n=32)
    g4 = faster_rcnn_vgg16(batch=4, **kw)
    post_n = 32
    assert g4.specs["proposal"].shape == (4 * post_n, 5)
    assert g4.specs["cls_prob"].shape == (4 * post_n, 21)
    x = rng.normal(size=(4, 96, 128, 3)).astype(np.float32)
    info = np.asarray([[96.0, 128.0, 1.0]] * 4, np.float32)
    res4 = Engine(g4).run({"data": x, "im_info": info},
                          extract=["cls_prob", "proposal"])
    cls4 = np.asarray(res4["cls_prob"])
    rois4 = np.asarray(res4["proposal"])
    eng1 = Engine(faster_rcnn_vgg16(batch=1, **kw))
    for b in range(4):
        r1 = eng1.run({"data": x[b:b + 1], "im_info": info[b:b + 1]},
                      extract=["cls_prob", "proposal"])
        rois1 = np.asarray(r1["proposal"])
        blk = rois4[b * post_n:(b + 1) * post_n]
        real = rois1[:, 0] == 0
        np.testing.assert_array_equal(blk[real, 0], float(b))
        np.testing.assert_allclose(blk[:, 1:], rois1[:, 1:],
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(
            cls4[b * post_n:(b + 1) * post_n][real],
            np.asarray(r1["cls_prob"])[real], rtol=1e-3, atol=1e-4)


def test_rfcn_structure_and_mini_forward(rng):
    """R-FCN ResNet-101 zoo: a-trous stage-5 keeps stride 16 (38x50 at
    600x800), PSROIPooling + vote shapes; then a tiny builder-level
    R-FCN runs Proposal -> PSROIPooling -> vote end to end."""
    from feathercnn_tpu.models import rfcn_resnet101
    g = rfcn_resnet101()
    assert g.specs["res5c"].shape == (1, 38, 50, 2048)
    assert g.specs["psroipooled_cls_rois"].shape == (300, 7, 7, 21)
    assert g.specs["cls_prob"].shape == (300, 1, 1, 21)
    assert g.specs["ave_bbox_pred_rois"].shape == (300, 1, 1, 8)

    from feathercnn_tpu.models.builder import GraphBuilder
    from feathercnn_tpu.ir import infer_shapes
    b = GraphBuilder("mini_rfcn", seed=6)
    data = b.input("data", (1, 64, 48, 3))
    im_info = b.input("im_info", (1, 3))
    x = b.conv("c1", data, 8, 3, stride=2, pad=1, relu=True)
    x = b.pool("p1", x, 2, 2)
    x = b.conv("c2", x, 16, 3, pad=1, relu=True)     # stride 8
    rpn = b.conv("rpn", x, 16, 3, pad=1, relu=True)
    cls = b.conv("rpn_cls", rpn, 18, 1)
    box = b.conv("rpn_box", rpn, 36, 1)
    from feathercnn_tpu.models.zoo import _rpn_softmax
    prob = _rpn_softmax(b, cls, "sm")
    rois = b.proposal("rois", prob, box, im_info, feat_stride=8,
                      pre_nms_top_n=64, post_nms_top_n=8, min_size=4)
    k, cdim = 3, 5
    score_map = b.conv("score_map", x, k * k * cdim, 1)
    ps = b.psroi_pooling("ps", score_map, rois, cdim, k, 1.0 / 8)
    v = b.pool("vote", ps, 0, mode="AVE", global_pooling=True)
    v = b.softmax("probs", v)
    g = b.finish([v, rois])

    xv = rng.normal(size=(1, 64, 48, 3)).astype(np.float32)
    info = np.asarray([[64.0, 48.0, 1.0]], np.float32)
    res = Engine(g).run({"data": xv, "im_info": info})
    probs = np.asarray(res["probs"])
    assert probs.shape == (8, 1, 1, 5)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)


def test_classic_variants_structure(rng):
    """VGG-19 / DenseNet-169/201 / SqueezeNet-v1.0 parameter variants:
    block counts and output shapes; a v1.0 forward runs (the 7x7 stem +
    late-pool fire layout differs structurally from v1.1)."""
    from feathercnn_tpu.models import MODEL_BUILDERS
    g = MODEL_BUILDERS["vgg19"](batch=1, with_softmax=False)
    assert sum(1 for n in g.nodes if n.op == "Convolution") == 16
    g = MODEL_BUILDERS["densenet169"](batch=1, with_softmax=False)
    assert sum(1 for n in g.nodes if n.op == "Concat") == 6 + 12 + 32 + 32
    g = MODEL_BUILDERS["densenet201"](batch=1, with_softmax=False)
    assert sum(1 for n in g.nodes if n.op == "Concat") == 6 + 12 + 48 + 32
    assert g.specs[g.outputs[0]].shape == (1, 1000)

    g = MODEL_BUILDERS["squeezenet_v10"]()
    x = rng.normal(size=(1, 224, 224, 3)).astype(np.float32)
    out = np.asarray(Engine(g)(x))
    assert out.shape == (1, 1, 1, 1000)
    np.testing.assert_allclose(out.sum(), 1.0, rtol=1e-4)
