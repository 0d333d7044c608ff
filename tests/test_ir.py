"""IR structural tests: shape inference, validation, topo sort."""

import numpy as np
import pytest

from feathercnn_tpu.ir import (Graph, Node, TensorSpec, conv_out_dim,
                               infer_shapes, topo_sort)


def test_conv_out_dim_floor_vs_ceil():
    # Caffe: conv uses floor, pooling uses ceil.
    assert conv_out_dim(227, 3, 2, 0) == 113
    assert conv_out_dim(113, 3, 2, 0, ceil_mode=True) == 56
    assert conv_out_dim(28, 3, 1, 1, ceil_mode=True) == 28
    # ceil-mode clip: last window must start inside the padded region
    assert conv_out_dim(5, 3, 2, 1, ceil_mode=True) == 3


def test_infer_shapes_conv_pool_fc():
    g = Graph(
        name="t", inputs={"x": TensorSpec((2, 8, 8, 3))}, outputs=["fc"],
        nodes=[
            Node("c", "Convolution", ["x"], ["c"],
                 {"num_output": 16, "kernel_size": 3, "stride": 1, "pad": 1,
                  "bias_term": False}, ["w"]),
            Node("p", "Pooling", ["c"], ["p"],
                 {"pool": "MAX", "kernel_size": 2, "stride": 2}),
            Node("fc", "InnerProduct", ["p"], ["fc"],
                 {"num_output": 10, "bias_term": False}, ["wf"]),
        ],
        params={"w": np.zeros((3, 3, 3, 16), np.float32),
                "wf": np.zeros((16 * 16, 10), np.float32)},
    )
    infer_shapes(g)
    assert g.specs["c"].shape == (2, 8, 8, 16)
    assert g.specs["p"].shape == (2, 4, 4, 16)
    assert g.specs["fc"].shape == (2, 10)
    g.validate()


def test_validate_rejects_undefined_input():
    g = Graph("t", {"x": TensorSpec((1, 4, 4, 1))}, ["y"],
              [Node("n", "ReLU", ["nope"], ["y"])])
    with pytest.raises(ValueError, match="undefined"):
        g.validate()


def test_validate_rejects_redefinition():
    g = Graph("t", {"x": TensorSpec((1, 4, 4, 1))}, ["x2"],
              [Node("a", "ReLU", ["x"], ["x2"]),
               Node("b", "ReLU", ["x"], ["x2"])])
    with pytest.raises(ValueError, match="redefines"):
        g.validate()


def test_topo_sort_reorders():
    g = Graph("t", {"x": TensorSpec((1, 4, 4, 1))}, ["z"],
              [Node("b", "ReLU", ["y"], ["z"]),
               Node("a", "ReLU", ["x"], ["y"])])
    topo_sort(g)
    assert [n.name for n in g.nodes] == ["a", "b"]
    g.validate()


def test_concat_slice_shapes():
    g = Graph("t", {"x": TensorSpec((1, 4, 4, 6))}, ["c"],
              [Node("s", "Slice", ["x"], ["s0", "s1"],
                    {"axis": -1, "slice_points": [2]}),
               Node("c", "Concat", ["s1", "s0"], ["c"], {"axis": -1})])
    infer_shapes(g)
    assert g.specs["s0"].shape == (1, 4, 4, 2)
    assert g.specs["s1"].shape == (1, 4, 4, 4)
    assert g.specs["c"].shape == (1, 4, 4, 6)


def test_engine_config_json_roundtrip(tmp_path):
    from feathercnn_tpu import EngineConfig
    from feathercnn_tpu.parallel import ShardingConfig
    cfg = EngineConfig(compute_dtype="bfloat16", backend="pallas",
                       quant="w8a8",
                       algo_overrides=(("conv1", "implicit"),),
                       sharding=ShardingConfig(mesh_shape=(2, 4)))
    s = cfg.to_json()
    back = EngineConfig.from_json(s)
    assert back == cfg
    p = tmp_path / "cfg.json"
    p.write_text(s)
    assert EngineConfig.from_json(str(p)) == cfg
    assert EngineConfig.from_json({"quant": "w8"}).quant == "w8"
