"""Converter tests: protobuf wire codec round-trip, prototxt parsing, and
a full synthetic Caffe model converted and checked against a torch NCHW
reference (independent of our NHWC engine — catches layout-transform bugs).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from feathercnn_tpu import Engine
from feathercnn_tpu.model_format import load_ftpu, save_ftpu
from tools import caffe_pb
from tools.convert_caffe import Converter, convert
from tools.prototxt import parse_prototxt


def test_wire_roundtrip():
    blob = {"shape": {"dim": [2, 3]},
            "data": np.arange(6, dtype=np.float32)}
    enc = caffe_pb.encode(blob, caffe_pb.BLOB_PROTO)
    dec = caffe_pb.decode(enc, caffe_pb.BLOB_PROTO)
    assert dec["shape"]["dim"] == [2, 3]
    np.testing.assert_array_equal(dec["data"], blob["data"])


def test_prototxt_parser():
    txt = '''
    name: "tiny"  # comment
    input: "data"
    input_dim: 1 input_dim: 3 input_dim: 8 input_dim: 8
    layer {
      name: "conv1" type: "Convolution"
      bottom: "data" top: "conv1"
      convolution_param { num_output: 4 kernel_size: 3 pad: 1 stride: 1 }
    }
    layer { name: "relu1" type: "ReLU" bottom: "conv1" top: "conv1" }
    '''
    d = parse_prototxt(txt)
    assert d["name"] == "tiny"
    assert d["input_dim"] == [1, 3, 8, 8]
    assert len(d["layer"]) == 2
    assert d["layer"][0]["convolution_param"]["num_output"] == 4


def _make_caffe_net(rng):
    """A synthetic Caffe net dict (new-style) with weights, exercising
    conv/in-place ReLU/pool-ceil/BN/Scale/FC/softmax."""
    C1, C2, FC = 5, 8, 4

    def blob(arr):
        arr = np.asarray(arr, np.float32)
        return {"shape": {"dim": list(arr.shape)},
                "data": arr.ravel()}

    w1 = rng.normal(size=(C1, 3, 3, 3)).astype(np.float32)
    b1 = rng.normal(size=(C1,)).astype(np.float32)
    w2 = rng.normal(size=(C2, C1, 1, 1)).astype(np.float32)
    bn_mean = rng.normal(size=(C2,)).astype(np.float32)
    bn_var = np.abs(rng.normal(1, 0.1, size=(C2,))).astype(np.float32)
    sc_g = rng.normal(1, 0.2, size=(C2,)).astype(np.float32)
    sc_b = rng.normal(size=(C2,)).astype(np.float32)
    wf = rng.normal(size=(FC, C2 * 4 * 4)).astype(np.float32)
    bf = rng.normal(size=(FC,)).astype(np.float32)

    layers = [
        {"name": "conv1", "type": "Convolution", "bottom": ["data"],
         "top": ["conv1"],
         "convolution_param": {"num_output": C1, "kernel_size": [3],
                               "pad": [1], "stride": [2]},
         "blobs": [blob(w1), blob(b1)]},
        {"name": "relu1", "type": "ReLU", "bottom": ["conv1"],
         "top": ["conv1"]},  # in-place
        {"name": "pool1", "type": "Pooling", "bottom": ["conv1"],
         "top": ["pool1"],
         "pooling_param": {"pool": 0, "kernel_size": 3, "stride": 2}},
        {"name": "conv2", "type": "Convolution", "bottom": ["pool1"],
         "top": ["conv2"],
         "convolution_param": {"num_output": C2, "kernel_size": [1],
                               "bias_term": False},
         "blobs": [blob(w2)]},
        {"name": "bn2", "type": "BatchNorm", "bottom": ["conv2"],
         "top": ["conv2"],  # in-place
         "batch_norm_param": {"eps": 1e-5},
         "blobs": [blob(bn_mean * 2.0), blob(bn_var * 2.0),
                   blob(np.asarray([2.0]))]},  # scale_factor = 2
        {"name": "scale2", "type": "Scale", "bottom": ["conv2"],
         "top": ["conv2"], "scale_param": {"bias_term": True},
         "blobs": [blob(sc_g), blob(sc_b)]},
        {"name": "relu2", "type": "ReLU", "bottom": ["conv2"],
         "top": ["conv2"]},
        {"name": "fc", "type": "InnerProduct", "bottom": ["conv2"],
         "top": ["fc"], "inner_product_param": {"num_output": FC},
         "blobs": [blob(wf), blob(bf)]},
        {"name": "prob", "type": "Softmax", "bottom": ["fc"],
         "top": ["prob"]},
    ]
    net = {"name": "synth", "input": ["data"],
           "input_dim": [1, 3, 16, 16], "layer": layers}
    arrays = dict(w1=w1, b1=b1, w2=w2, bn_mean=bn_mean, bn_var=bn_var,
                  sc_g=sc_g, sc_b=sc_b, wf=wf, bf=bf)
    return net, arrays


def _torch_reference(arrays, x_nchw):
    import torch
    import torch.nn.functional as F
    t = {k: torch.from_numpy(v) for k, v in arrays.items()}
    x = torch.from_numpy(x_nchw)
    y = F.conv2d(x, t["w1"], t["b1"], stride=2, padding=1)
    y = F.relu(y)
    # caffe ceil-mode pooling
    y = F.max_pool2d(y, 3, stride=2, ceil_mode=True)
    y = F.conv2d(y, t["w2"])
    y = (y - t["bn_mean"].view(1, -1, 1, 1)) / torch.sqrt(
        t["bn_var"].view(1, -1, 1, 1) + 1e-5)
    y = y * t["sc_g"].view(1, -1, 1, 1) + t["sc_b"].view(1, -1, 1, 1)
    y = F.relu(y)
    y = y.flatten(1) @ t["wf"].T + t["bf"]
    return torch.softmax(y, dim=-1).numpy()


def test_synthetic_caffemodel_matches_torch(rng, tmp_path):
    net, arrays = _make_caffe_net(rng)
    # Serialize to real binary protobuf and re-parse (codec under test).
    raw = caffe_pb.encode(net, caffe_pb.NET_PARAMETER)
    parsed = caffe_pb.parse_net(raw)
    g = Converter(parsed, parsed).convert()

    x_nchw = rng.normal(size=(1, 3, 16, 16)).astype(np.float32)
    x_nhwc = np.transpose(x_nchw, (0, 2, 3, 1))
    out = np.asarray(Engine(g)(x_nhwc)).reshape(1, -1)
    ref = _torch_reference(arrays, x_nchw)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-5)

    # .ftpu round trip preserves everything.
    path = str(tmp_path / "synth.ftpu")
    save_ftpu(g, path)
    g2 = load_ftpu(path)
    out2 = np.asarray(Engine(g2)(x_nhwc)).reshape(1, -1)
    np.testing.assert_allclose(out2, ref, rtol=1e-3, atol=1e-5)


def test_v1_layer_normalization(rng):
    """Old-style (V1) caffemodels: enum types, `layers` field."""
    w = rng.normal(size=(2, 3, 1, 1)).astype(np.float32)
    v1_layer = {"name": "conv1", "type": 4,  # CONVOLUTION
                "bottom": ["data"], "top": ["conv1"],
                "convolution_param": {"num_output": 2, "kernel_size": [1]},
                "blobs": [{"shape": {"dim": [2, 3, 1, 1]},
                           "data": w.ravel()}]}
    net = {"name": "old", "input": ["data"], "input_dim": [1, 3, 4, 4],
           "layers": [v1_layer]}
    raw = caffe_pb.encode(net, caffe_pb.NET_PARAMETER)
    parsed = caffe_pb.parse_net(raw)
    assert parsed["layer"][0]["type"] == "Convolution"
    g = Converter(parsed, parsed).convert()
    x = rng.normal(size=(1, 4, 4, 3)).astype(np.float32)
    out = np.asarray(Engine(g)(x))
    ref = x @ w.reshape(2, 3).T
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_interp_conversion_matches_torch(rng):
    """DeepLab-style Interp (zoom_factor, negative pad on the wire)
    through the binary round trip, vs torch align-corners bilinear."""
    import torch.nn.functional as F
    import torch

    layers = [
        {"name": "up", "type": "Interp", "bottom": ["data"],
         "top": ["up"],
         "interp_param": {"zoom_factor": 4, "pad_beg": -1 + 2 ** 64,
                          "pad_end": -1 + 2 ** 64}},
    ]
    net = {"name": "interpmini", "input": ["data"],
           "input_dim": [1, 3, 10, 10], "layer": layers}
    raw = caffe_pb.encode(net, caffe_pb.NET_PARAMETER)
    parsed = caffe_pb.parse_net(raw)
    g = Converter(parsed, parsed).convert()

    x_nchw = rng.normal(size=(1, 3, 10, 10)).astype(np.float32)
    out = np.asarray(Engine(g)(np.transpose(x_nchw, (0, 2, 3, 1))))
    # pads crop 10 -> 8, zoom 4 -> (8-1)*4+1 = 29
    ref = F.interpolate(torch.from_numpy(x_nchw[:, :, 1:9, 1:9]),
                        size=(29, 29), mode="bilinear", align_corners=True)
    np.testing.assert_allclose(out, np.transpose(ref.numpy(), (0, 2, 3, 1)),
                               rtol=1e-5, atol=1e-5)


def test_deconv_crop_conversion_matches_torch(rng):
    """FCN-style Deconvolution (grouped, Caffe (Cin,Cout/g,KH,KW) blob)
    + Crop converted and checked against torch conv_transpose2d."""
    import torch.nn.functional as F
    import torch

    CIN, COUT, G, K, S, P = 6, 6, 2, 4, 2, 1

    def blob(arr):
        arr = np.asarray(arr, np.float32)
        return {"shape": {"dim": list(arr.shape)},
                "data": arr.ravel()}

    wd = rng.normal(size=(CIN, COUT // G, K, K)).astype(np.float32)
    bd = rng.normal(size=(COUT,)).astype(np.float32)
    layers = [
        {"name": "up", "type": "Deconvolution", "bottom": ["data"],
         "top": ["up"],
         "convolution_param": {"num_output": COUT, "kernel_size": [K],
                               "stride": [S], "pad": [P], "group": G},
         "blobs": [blob(wd), blob(bd)]},
        # crop H,W back to the input's size (Caffe axis=2)
        {"name": "crop", "type": "Crop", "bottom": ["up", "data"],
         "top": ["crop"], "crop_param": {"axis": 2, "offset": [1]}},
    ]
    net = {"name": "fcnmini", "input": ["data"],
           "input_dim": [1, CIN, 8, 8], "layer": layers}
    raw = caffe_pb.encode(net, caffe_pb.NET_PARAMETER)
    parsed = caffe_pb.parse_net(raw)
    g = Converter(parsed, parsed).convert()

    x_nchw = rng.normal(size=(1, CIN, 8, 8)).astype(np.float32)
    out = np.asarray(Engine(g)(np.transpose(x_nchw, (0, 2, 3, 1))))
    up = F.conv_transpose2d(torch.from_numpy(x_nchw),
                            torch.from_numpy(wd), torch.from_numpy(bd),
                            stride=S, padding=P, groups=G)
    ref = up[:, :, 1:9, 1:9].numpy()
    np.testing.assert_allclose(out, np.transpose(ref, (0, 2, 3, 1)),
                               rtol=1e-4, atol=1e-5)


def test_shufflechannel_threshold_conversion(rng):
    """ShuffleChannel (caffe-ShuffleNet fork) and Threshold layers parse
    from prototxt and execute with the fork's semantics."""
    txt = '''
    name: "shuf"
    input: "data"
    input_dim: 1 input_dim: 6 input_dim: 4 input_dim: 4
    layer {
      name: "shuffle" type: "ShuffleChannel"
      bottom: "data" top: "shuffle"
      shuffle_channel_param { group: 3 }
    }
    layer {
      name: "thr" type: "Threshold"
      bottom: "shuffle" top: "thr"
      threshold_param { threshold: 0.1 }
    }
    '''
    g = Converter(parse_prototxt(txt)).convert()
    assert [n.op for n in g.nodes] == ["ShuffleChannel", "Threshold"]
    assert g.nodes[0].attrs["group"] == 3
    x = rng.normal(size=(1, 4, 4, 6)).astype(np.float32)
    y = np.asarray(Engine(g)(x))
    c, grp = 6, 3
    perm = np.empty(c, np.int64)
    for i in range(grp):
        for j in range(c // grp):
            perm[j * grp + i] = i * (c // grp) + j
    np.testing.assert_array_equal(y, (x[..., perm] > 0.1)
                                  .astype(np.float32))


def test_negative_axis_canonicalizes_vs_bottom_rank(rng):
    """Caffe canonicalizes negative axes against the BOTTOM blob's rank:
    Tile/Reduction axis=-1 after an InnerProduct (rank-2 blob) means
    axis 1, not axis 3 (round-1 ADVICE: the converter hardcoded +4)."""
    FC = 4

    def blob(arr):
        arr = np.asarray(arr, np.float32)
        return {"shape": {"dim": list(arr.shape)}, "data": arr.ravel()}

    wf = rng.normal(size=(FC, 12)).astype(np.float32)
    deploy = {
        "name": "negax", "input": ["data"], "input_dim": [1, 3, 2, 2],
        "layer": [
            {"name": "fc", "type": "InnerProduct", "bottom": ["data"],
             "top": ["fc"],
             "inner_product_param": {"num_output": FC,
                                     "bias_term": False},
             "blobs": [blob(wf)]},
            {"name": "tile", "type": "Tile", "bottom": ["fc"],
             "top": ["tile"], "tile_param": {"axis": -1, "tiles": 2}},
            {"name": "red", "type": "Reduction", "bottom": ["tile"],
             "top": ["red"],
             "reduction_param": {"operation": 1, "axis": -1}},
        ]}
    g = Converter(deploy).convert()
    tile_node = next(n for n in g.nodes if n.op == "Tile")
    assert tile_node.attrs["axis"] == 1          # rank-2 bottom: -1 -> 1
    red_node = next(n for n in g.nodes if n.op == "Reduction")
    assert red_node.attrs["axis"] == 1

    x_nhwc = rng.normal(size=(1, 2, 2, 3)).astype(np.float32)
    x_nchw = np.transpose(x_nhwc, (0, 3, 1, 2))
    ref_fc = x_nchw.reshape(1, -1) @ wf.T        # (1, FC)
    ref_tile = np.tile(ref_fc, (1, 2))           # (1, 2*FC)
    out = Engine(g).run({"data": x_nhwc}, extract=["tile"])
    np.testing.assert_allclose(np.asarray(out["tile"]), ref_tile,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["red"]),
                               ref_tile.sum(axis=1), rtol=1e-4, atol=1e-5)
