"""Converter wire-format hardening (VERDICT round 1 item 4).

The round-1 converter tests synthesized .caffemodel bytes with the
repo's OWN encoder (tools/caffe_pb.py) — a wire-format misunderstanding
would round-trip invisibly.  These tests remove that blind spot:

1. Fixtures encoded by **google.protobuf** (a genuinely independent
   implementation) from tools/caffe_ref.proto — compiled with protoc at
   test time — are decoded by our codec and converted end-to-end
   against the torch oracle.  proto2 encodes non-[packed] repeated
   scalars UNPACKED, a wire layout our own encoder never produces.
2. Our encoder's output is parsed back by google.protobuf (independent
   decoder), closing the loop in the other direction.
3. Hand-crafted raw wire bytes (no encoder at all) cover the spec's
   edge cases: multi-byte varints, 10-byte negative-int32 varints,
   packed AND unpacked repeated fields, unknown fields of every wire
   type, and field-order permutations.
"""

import os
import shutil
import struct
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from feathercnn_tpu import Engine
from tools import caffe_pb
from tools.convert_caffe import Converter, _i32

from test_converter import _make_caffe_net, _torch_reference

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def ref_pb2(tmp_path_factory):
    """Compile tools/caffe_ref.proto with protoc and import the module
    (independent wire implementation)."""
    if shutil.which("protoc") is None:
        pytest.skip("protoc not available")
    out = str(tmp_path_factory.mktemp("pb"))
    proto = os.path.join(ROOT, "tools", "caffe_ref.proto")
    subprocess.run(["protoc", f"--python_out={out}",
                    f"--proto_path={os.path.dirname(proto)}", proto],
                   check=True)
    sys.path.insert(0, out)
    try:
        import caffe_ref_pb2 as mod
    finally:
        sys.path.remove(out)
    return mod


def _jsonable(o):
    if isinstance(o, dict):
        return {k: _jsonable(v) for k, v in o.items()}
    if isinstance(o, np.ndarray):
        if np.issubdtype(o.dtype, np.floating):
            return [float(x) for x in o.ravel()]
        return [int(x) for x in o.ravel()]
    if isinstance(o, (list, tuple)):
        return [_jsonable(v) for v in o]
    if isinstance(o, np.floating):
        return float(o)
    if isinstance(o, np.integer):
        return int(o)
    return o


def _encode_independent(net_dict, ref_pb2) -> bytes:
    from google.protobuf import json_format
    msg = json_format.ParseDict(_jsonable(net_dict),
                                ref_pb2.NetParameter())
    return msg.SerializeToString()


def test_independent_encoder_to_our_decoder(rng, ref_pb2):
    """google.protobuf-encoded .caffemodel -> our codec -> converter ->
    engine matches the torch NCHW oracle.  Exercises the UNPACKED
    repeated-uint32 layout (kernel_size/pad/stride) that proto2 emits
    and our own encoder never does."""
    net, arrays = _make_caffe_net(rng)
    raw = _encode_independent(net, ref_pb2)
    # sanity: the independent bytes differ from our encoder's bytes
    assert raw != caffe_pb.encode(net, caffe_pb.NET_PARAMETER)
    parsed = caffe_pb.parse_net(raw)
    g = Converter(parsed, parsed).convert()
    x_nchw = rng.normal(size=(1, 3, 16, 16)).astype(np.float32)
    out = np.asarray(Engine(g)(np.transpose(x_nchw, (0, 2, 3, 1))))
    ref = _torch_reference(arrays, x_nchw)
    np.testing.assert_allclose(out.reshape(1, -1), ref,
                               rtol=1e-3, atol=1e-5)


def test_our_encoder_to_independent_decoder(rng, ref_pb2):
    """Our encoder's bytes parse correctly under google.protobuf — the
    other half of the loop (the encoder is what every other converter
    test relies on)."""
    net, arrays = _make_caffe_net(rng)
    raw = caffe_pb.encode(net, caffe_pb.NET_PARAMETER)
    msg = ref_pb2.NetParameter.FromString(raw)
    assert msg.name == "synth"
    assert [l.name for l in msg.layer] == [
        l["name"] for l in net["layer"]]
    conv1 = msg.layer[0]
    assert list(conv1.convolution_param.kernel_size) == [3]
    assert list(conv1.convolution_param.stride) == [2]
    np.testing.assert_allclose(
        np.asarray(conv1.blobs[0].data, np.float32),
        arrays["w1"].ravel(), rtol=0, atol=0)
    assert list(conv1.blobs[0].shape.dim) == list(arrays["w1"].shape)


def test_v1_layers_independent_encoding(rng, ref_pb2):
    """V1 (old-style) caffemodel encoded by google.protobuf: enum layer
    types in the `layers` field normalize to new-style names."""
    w = rng.normal(size=(2, 3, 1, 1)).astype(np.float32)
    net = {"name": "old", "input": ["data"], "input_dim": [1, 3, 4, 4],
           "layers": [{"name": "conv1", "type": 4,  # CONVOLUTION
                       "bottom": ["data"], "top": ["conv1"],
                       "convolution_param": {"num_output": 2,
                                             "kernel_size": [1]},
                       "blobs": [{"shape": {"dim": [2, 3, 1, 1]},
                                  "data": w.ravel()}]}]}
    raw = _encode_independent(net, ref_pb2)
    parsed = caffe_pb.parse_net(raw)
    assert parsed["layer"][0]["type"] == "Convolution"
    g = Converter(parsed, parsed).convert()
    x = rng.normal(size=(1, 4, 4, 3)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(Engine(g)(x)),
                               x @ w.reshape(2, 3).T,
                               rtol=1e-5, atol=1e-6)


# ----------------------------------------------------------------------
# Hand-crafted wire bytes: no encoder at all, straight from the spec.
# ----------------------------------------------------------------------

def _vint(v: int) -> bytes:
    if v < 0:
        v += 1 << 64          # proto2 negative int: 64-bit two's compl.
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(fnum: int, wtype: int) -> bytes:
    return _vint(fnum << 3 | wtype)


def _ld(fnum: int, payload: bytes) -> bytes:
    return _tag(fnum, 2) + _vint(len(payload)) + payload


def test_hand_crafted_unknown_fields_and_order():
    """Unknown fields of every wire type are skipped; field order on
    the wire is arbitrary (layer before name); multi-byte tag varints
    (field 100 -> 2-byte tag) and multi-byte lengths decode."""
    conv_param = (_tag(1, 0) + _vint(4)            # num_output = 4
                  + _tag(4, 0) + _vint(3))         # kernel_size unpacked
    # 40 floats -> 160-byte payload: length needs 2 varint bytes
    data = np.arange(40, dtype="<f4").tobytes()
    blob = (_ld(7, _ld(1, _vint(4) + _vint(10)))   # shape.dim packed
            + _ld(5, data))                        # data packed floats
    layer = (
        _tag(999, 0) + _vint(7)                    # unknown varint
        + _ld(3, b"data")                          # bottom
        + _tag(998, 1) + struct.pack("<d", 1.5)    # unknown fixed64
        + _ld(4, b"conv1")                         # top
        + _ld(997, b"junkpayload")                 # unknown len-delim
        + _ld(2, b"Convolution")                   # type
        + _tag(996, 5) + struct.pack("<f", 2.5)    # unknown fixed32
        + _ld(1, b"conv1")                         # name LAST
        + _ld(106, conv_param)
        + _ld(7, blob))
    net = (_ld(100, layer)                         # layer BEFORE name
           + _ld(1, b"weird")
           + _ld(3, b"data")
           + _tag(4, 0) + _vint(1) + _tag(4, 0) + _vint(3)
           + _tag(4, 0) + _vint(8) + _tag(4, 0) + _vint(8))
    parsed = caffe_pb.parse_net(net)
    assert parsed["name"] == "weird"
    assert parsed["input_dim"] == [1, 3, 8, 8]
    (layer,) = parsed["layer"]
    assert layer["name"] == "conv1"
    assert layer["type"] == "Convolution"
    assert layer["convolution_param"]["kernel_size"] == [3]
    np.testing.assert_array_equal(layer["blobs"][0]["shape"]["dim"],
                                  [4, 10])
    np.testing.assert_allclose(layer["blobs"][0]["data"],
                               np.arange(40, dtype=np.float32))


def test_hand_crafted_negative_int32_varint():
    """proto2 encodes a negative int32 as a 10-byte two's-complement
    varint; the decoder surfaces the raw uint and the converter's _i32
    canonicalizes it back."""
    concat = _tag(2, 0) + _vint(-1)                # axis = -1
    assert len(_vint(-1)) == 10                    # the spec's encoding
    layer = (_ld(1, b"cat") + _ld(2, b"Concat")
             + _ld(3, b"a") + _ld(3, b"b") + _ld(4, b"cat")
             + _ld(104, concat))
    net = _ld(100, layer)
    parsed = caffe_pb.parse_net(net)
    ax = parsed["layer"][0]["concat_param"]["axis"]
    assert ax == (1 << 64) - 1                     # raw wire value
    assert _i32(ax) == -1                          # canonicalized


def test_hand_crafted_unpacked_floats_and_legacy_blob():
    """Pre-2014 caffemodels carry BlobProto.data as UNPACKED repeated
    floats (one fixed32 per element) and the deprecated num/channels/
    height/width shape; both decode."""
    vals = [1.5, -2.25, 3.0]
    blob = (_tag(1, 0) + _vint(1) + _tag(2, 0) + _vint(3)   # num/channels
            + _tag(3, 0) + _vint(1) + _tag(4, 0) + _vint(1)  # h/w
            + b"".join(_tag(5, 5) + struct.pack("<f", v) for v in vals))
    dec = caffe_pb.decode(blob, caffe_pb.BLOB_PROTO)
    np.testing.assert_allclose(dec["data"], vals)
    assert (dec["num"], dec["channels"], dec["height"], dec["width"]) \
        == (1, 3, 1, 1)


def test_hand_crafted_packed_vs_unpacked_varint_mix():
    """A repeated uint32 field may arrive packed, unpacked, or BOTH in
    one message (the spec allows mixed encodings; decoders must
    concatenate)."""
    conv = (_tag(3, 0) + _vint(1)                  # pad unpacked: [1]
            + _ld(3, _vint(2) + _vint(3))          # pad packed: [2, 3]
            + _tag(1, 0) + _vint(8))
    dec = caffe_pb.decode(conv, caffe_pb.CONVOLUTION_PARAM)
    assert dec["pad"] == [1, 2, 3]
    assert dec["num_output"] == 8
