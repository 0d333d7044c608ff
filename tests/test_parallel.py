"""Distributed tests without a cluster (SURVEY.md §4 item 5): 8 virtual
CPU devices via --xla_force_host_platform_device_count (conftest.py).
SPMD invariance: every sharded path must match the single-device result.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from feathercnn_tpu import Engine, EngineConfig
from feathercnn_tpu.parallel import ShardingConfig, build_mesh
from feathercnn_tpu.parallel.spatial import spatial_conv2d
from feathercnn_tpu.parallel.tp import (column_parallel_conv,
                                        row_parallel_conv, tp_conv_pair)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def mesh():
    return build_mesh(ShardingConfig(mesh_shape=(2, 4)))


def _ref_conv(x, w, b=None, stride=1, pad=0):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    return y if b is None else y + b


def test_column_parallel_conv(mesh, rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 16, 32)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(32,)).astype(np.float32))
    y = column_parallel_conv(mesh, "model", x, w, b, pad=1,
                             gather_output=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(
        _ref_conv(x, w, b, pad=1)), rtol=1e-5, atol=1e-5)


def test_column_then_row_parallel(mesh, rng):
    """Megatron pair: activations stay channel-sharded between the convs,
    one psum at the end."""
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(1, 1, 16, 32)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(size=(32,)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(3, 3, 32, 24)).astype(np.float32))
    b2 = jnp.asarray(rng.normal(size=(24,)).astype(np.float32))

    y = tp_conv_pair(mesh, "model", x, w1, b1, w2, b2, pad2=1)
    ref = _ref_conv(jnp.maximum(_ref_conv(x, w1, b1), 0), w2, b2, pad=1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_row_parallel_scatter(mesh, rng):
    """psum_scatter keeps the output channel-sharded for the next layer."""
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(1, 1, 32, 16)).astype(np.float32))
    y_sharded = row_parallel_conv(mesh, "model", x, w, scatter_output=True)
    ref = _ref_conv(x, w)
    np.testing.assert_allclose(np.asarray(y_sharded), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_spatial_halo_conv(mesh, rng):
    """H-sharded conv with ppermute halo exchange == unsharded conv."""
    x = jnp.asarray(rng.normal(size=(1, 16, 12, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 8)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    y = spatial_conv2d(mesh, "model", x, w, b, pad=1, activation="relu")
    ref = jnp.maximum(_ref_conv(x, w, b, pad=1), 0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_spatial_conv_5x5(mesh, rng):
    x = jnp.asarray(rng.normal(size=(1, 16, 8, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(5, 5, 4, 4)).astype(np.float32))
    y = spatial_conv2d(mesh, "model", x, w, pad=2)
    ref = _ref_conv(x, w, pad=2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_spatial_conv_stride2(mesh, rng):
    """Strided explicit spatial sharding (VERDICT r2 item 9): per-shard
    phase alignment for the three canonical downsample shapes — 3x3 s2
    pad1 (ResNet transition), 1x1 s2 (projection shortcut, bottom halo
    clamps to 0 and the extra valid row is cropped), 7x7 s2 pad3 (stem,
    halo wider than one phase)."""
    for kh, pad in ((3, 1), (1, 0), (7, 3)):
        x = jnp.asarray(rng.normal(size=(1, 16, 8, 4)).astype(np.float32))
        w = jnp.asarray(
            rng.normal(size=(kh, kh, 4, 4)).astype(np.float32))
        y = spatial_conv2d(mesh, "model", x, w, stride=2, pad=pad)
        ref = _ref_conv(x, w, stride=2, pad=pad)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"k={kh} pad={pad}")


def test_engine_dp_tp_sharding(mesh, rng):
    """Whole-engine run on a (2,4) mesh matches single-device (the
    declarative GSPMD path of parallel/mesh.py)."""
    from feathercnn_tpu.models.builder import GraphBuilder
    b = GraphBuilder("net", seed=5)
    x = b.input("data", (4, 8, 8, 8))
    y = b.conv("c1", x, 32, 3, pad=1, relu=True)
    y = b.conv("c2", y, 64, 1, relu=True)
    y = b.pool("gap", y, 0, mode="AVE", global_pooling=True)
    y = b.fc("fc", y, 8)
    g = b.finish([y])

    xv = rng.normal(size=(4, 8, 8, 8)).astype(np.float32)
    ref = np.asarray(Engine(g)(xv))
    eng = Engine(g, EngineConfig(sharding=ShardingConfig(mesh_shape=(2, 4))))
    out = np.asarray(eng(xv))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_batch_sharding_layout(mesh, rng):
    """DP: input batch is actually placed sharded across the data axis."""
    from feathercnn_tpu.parallel import input_shardings
    from feathercnn_tpu.models.builder import GraphBuilder
    b = GraphBuilder("n", seed=6)
    x = b.input("data", (8, 4, 4, 4))
    y = b.conv("c", x, 8, 1)
    g = b.finish([y])
    cfg = ShardingConfig(mesh_shape=(2, 4))
    shards = input_shardings(g, mesh, cfg)
    arr = jax.device_put(np.zeros((8, 4, 4, 4), np.float32),
                         shards["data"])
    assert len(arr.addressable_shards) == 8
    assert arr.addressable_shards[0].data.shape == (4, 4, 4, 4)


def test_allgather_matmul_overlapped(mesh, rng):
    """Ring-pipelined allgather-matmul == gather-then-matmul."""
    from feathercnn_tpu.parallel.overlap import allgather_matmul
    x = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    y = allgather_matmul(mesh, "model", x, w, b, activation="relu")
    ref = jnp.maximum(x @ w + b, 0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_allgather_matmul_w_sharded_out(mesh, rng):
    """The Megatron column-parallel ring form (w sharded on OUT, bias
    sharded, y returned N-sharded) == gather-then-matmul."""
    from feathercnn_tpu.parallel.overlap import allgather_matmul
    x = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    y = allgather_matmul(mesh, "model", x, w, b, activation="relu",
                         w_sharded_out=True)
    ref = jnp.maximum(x @ w + b, 0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_engine_ring_overlap_fc(mesh, rng):
    """ShardingConfig.ring_overlap routes TP FCs through the ring
    collective matmul inside the engine (VERDICT r2 item 7): mesh
    result == single-device result on a conv->FC->FC net."""
    from feathercnn_tpu.models.builder import GraphBuilder
    b = GraphBuilder("net", seed=9)
    x = b.input("data", (4, 4, 4, 8))
    y = b.conv("c1", x, 16, 3, pad=1, relu=True)
    y = b.fc("fc1", y, 32, relu=True)
    y = b.fc("fc2", y, 8)
    g = b.finish([y])
    xv = rng.normal(size=(4, 4, 4, 8)).astype(np.float32)
    ref = np.asarray(Engine(g)(xv))
    eng = Engine(g, EngineConfig(sharding=ShardingConfig(
        mesh_shape=(2, 4), ring_overlap=True)))
    np.testing.assert_allclose(np.asarray(eng(xv)), ref,
                               rtol=1e-4, atol=1e-5)


def test_engine_ring_overlap_pointwise_conv(mesh, rng):
    """ring_overlap also routes TP 1x1 convs through the ring collective
    matmul (VERDICT r3 task 8: a pointwise conv IS the FC GEMM
    reshaped): DP x TP mesh result == single-device result on a
    bottleneck-style net whose 1x1 convs qualify (C and Cout divisible
    by the model axis) and whose 3x3 conv takes the GSPMD path."""
    from feathercnn_tpu.models.builder import GraphBuilder
    b = GraphBuilder("net", seed=11)
    x = b.input("data", (4, 4, 4, 8))
    y = b.conv("c1", x, 16, 3, pad=1, relu=True)
    y = b.conv("pw1", y, 32, 1, relu=True)     # ring-eligible
    y = b.conv("c2", y, 32, 3, pad=1, relu=True)
    y = b.conv("pw2", y, 16, 1)                # ring-eligible, no act
    y = b.pool("gap", y, 0, mode="AVE", global_pooling=True)
    y = b.fc("fc", y, 8)
    g = b.finish([y])
    xv = rng.normal(size=(4, 4, 4, 8)).astype(np.float32)
    ref = np.asarray(Engine(g)(xv))
    eng = Engine(g, EngineConfig(sharding=ShardingConfig(
        mesh_shape=(2, 4), ring_overlap=True)))
    np.testing.assert_allclose(np.asarray(eng(xv)), ref,
                               rtol=1e-4, atol=1e-5)
    # TP-only mesh (no DP): batch_axis=None branch
    eng2 = Engine(g, EngineConfig(sharding=ShardingConfig(
        mesh_shape=(1, 8), ring_overlap=True)))
    np.testing.assert_allclose(np.asarray(eng2(xv)), ref,
                               rtol=1e-4, atol=1e-5)


def test_matmul_reducescatter_ring(mesh, rng):
    """Ring reduce-scatter matmul == full matmul, output N-sharded."""
    from feathercnn_tpu.parallel.overlap import matmul_reducescatter
    x = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(32, 24)).astype(np.float32))
    y = matmul_reducescatter(mesh, "model", x, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x @ w),
                               rtol=1e-5, atol=1e-5)


# ----------------------------------------------------------------------
# Pipeline parallelism (parallel/pipeline.py)
# ----------------------------------------------------------------------

def test_pipeline_partition_balance():
    from feathercnn_tpu.models import MODEL_BUILDERS
    from feathercnn_tpu.parallel.pipeline import partition_stages
    from feathercnn_tpu.ir import infer_shapes
    from feathercnn_tpu.passes import optimize
    g = MODEL_BUILDERS["resnet50"](batch=1, with_softmax=False)
    optimize(g)
    infer_shapes(g)
    stages = partition_stages(g, 4)
    assert len(stages) == 4
    assert sum(len(s.nodes) for s in stages) == len(g.nodes)
    # every stage gets real work and the cut edges are narrow
    for s in stages:
        assert s.nodes
        assert len(s.live_in) <= 3


def test_pipeline_engine_matches_single_device(rng):
    from feathercnn_tpu.models import MODEL_BUILDERS
    from feathercnn_tpu.parallel.pipeline import PipelineEngine
    g = MODEL_BUILDERS["squeezenet_v11"]()
    x = rng.normal(size=(4, 227, 227, 3)).astype(np.float32)
    ref = np.asarray(Engine(g)(x))
    pipe = PipelineEngine(g, num_stages=4)
    out = np.asarray(pipe(x))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
    # micro-batched run must agree too (pipeline fill/drain path)
    out2 = np.asarray(pipe(x, micro_batches=2))
    np.testing.assert_allclose(out2, ref, rtol=1e-4, atol=1e-5)


def test_pipeline_stage_params_are_disjoint(rng):
    from feathercnn_tpu.parallel.pipeline import PipelineEngine
    from feathercnn_tpu.models import MODEL_BUILDERS
    g = MODEL_BUILDERS["mobilenet_v1"]()
    pipe = PipelineEngine(g, num_stages=3)
    names = [set(p.keys()) for p in pipe._stage_params]
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            assert not (names[i] & names[j])


def test_pipeline_engine_int8(rng):
    """Pipeline stages carry the quantized graph (int8 edges included)
    and match the single-device quantized engine."""
    from feathercnn_tpu.models import MODEL_BUILDERS
    from feathercnn_tpu.parallel.pipeline import PipelineEngine
    from feathercnn_tpu.quant import calibrate
    g = MODEL_BUILDERS["squeezenet_v11"]()
    x = rng.normal(size=(2, 227, 227, 3)).astype(np.float32)
    calibrate(g, [x], method="max")
    cfg = EngineConfig(backend="pallas", quant="w8a8", interpret=True)
    ref = np.asarray(Engine(g, cfg)(x))
    pipe = PipelineEngine(g, cfg, num_stages=3)
    out = np.asarray(pipe(x, micro_batches=2))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_engine_dp_tp_sharding_int8(mesh, rng):
    """Full-int8 engine under the (2,4) GSPMD mesh: int8 edges and
    requant epilogues execute sharded and match the single-device
    quantized engine."""
    from feathercnn_tpu.models.builder import GraphBuilder
    from feathercnn_tpu.quant import calibrate
    b = GraphBuilder("qnet", seed=15)
    x = b.input("data", (8, 8, 8, 8))
    y = b.conv("c1", x, 32, 3, pad=1, relu=True)
    y = b.conv("c2", y, 64, 1, relu=True)
    y = b.conv("c3", y, 32, 1, relu=True)
    y = b.pool("gap", y, 0, mode="AVE", global_pooling=True)
    y = b.fc("fc", y, 8)
    g = b.finish([y])

    xv = rng.normal(size=(8, 8, 8, 8)).astype(np.float32)
    calibrate(g, [xv], method="max")
    qcfg = EngineConfig(backend="pallas", quant="w8a8", interpret=True,
                        algo_overrides=(("*", "xla"),))
    ref = np.asarray(Engine(g, qcfg)(xv))
    eng = Engine(g, qcfg.replace(
        sharding=ShardingConfig(mesh_shape=(2, 4))))
    assert eng.graph.meta["quant"]["c1"].get("emit_int8")
    out = np.asarray(eng(xv))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_engine_mesh_shuffle_axpy(mesh, rng):
    """ShuffleChannel (reshape/transpose permutation) and Axpy (SE gate
    broadcast) under the (2,4) GSPMD mesh match single-device — incl.
    the w8a8 int8-edge paths (passthrough through shuffle, axpy_int8)."""
    from feathercnn_tpu.models.builder import GraphBuilder
    from feathercnn_tpu.quant import calibrate

    b = GraphBuilder("meshy", seed=9)
    x = b.input("data", (8, 8, 8, 8))
    x = b.conv("stem", x, 16, 3, pad=1, relu=True)
    # grouped conv -> shuffle -> grouped conv (the ShuffleNet pattern)
    y = b.conv("g1", x, 16, 1, group=4, relu=True)
    y = b.shuffle_channel("shuf", y, 4)
    y = b.conv("g2", y, 16, 1, group=4)
    # SE tail + axpy residual
    s = b.pool("gp", y, 0, mode="AVE", global_pooling=True)
    s = b.conv("down", s, 4, 1, relu=True)
    s = b.conv("up", s, 16, 1)
    s = b.sigmoid("prob", s)
    z = b.axpy("axpy", s, y, x)
    z = b.relu("axpy_relu", z)
    z = b.conv("head", z, 16, 1, relu=True)
    z = b.pool("gap", z, 0, mode="AVE", global_pooling=True)
    z = b.fc("fc", z, 8)
    g = b.finish([z])

    xv = rng.normal(size=(8, 8, 8, 8)).astype(np.float32)
    ref = np.asarray(Engine(g)(xv))
    eng = Engine(g, EngineConfig(sharding=ShardingConfig(mesh_shape=(2, 4))))
    np.testing.assert_allclose(np.asarray(eng(xv)), ref, rtol=1e-4,
                               atol=1e-5)

    # int8 path under the mesh == int8 path single-device (bitwise-free
    # comparison: cosine against the fp reference for both)
    calibrate(g, [xv], method="max")
    q_cfg = dict(backend="pallas", quant="w8a8", interpret=True)
    q_single = np.asarray(Engine(g, EngineConfig(**q_cfg))(xv))
    q_mesh = np.asarray(Engine(g, EngineConfig(
        sharding=ShardingConfig(mesh_shape=(2, 4)), **q_cfg))(xv))
    np.testing.assert_allclose(q_mesh, q_single, rtol=1e-4, atol=1e-5)


def test_engine_spatial_sharding(mesh, rng):
    """shard_spatial: activations' H axis shards over the model axis
    (GSPMD inserts halo exchanges); whole-engine result matches
    single-device through strided convs, pools, dilation, grouped
    convs, and eltwise — the huge-input segmentation mode."""
    from feathercnn_tpu.models.builder import GraphBuilder
    b = GraphBuilder("spatial", seed=12)
    x = b.input("data", (2, 32, 32, 8))
    y = b.conv("c1", x, 16, 5, stride=1, pad=2, relu=True)
    y = b.pool("p1", y, 3, 2, pad=1)
    y = b.conv("c2", y, 16, 3, pad=2, dilation=2, relu=True)
    z = b.conv("g1", y, 16, 1, group=4, relu=True)
    y = b.eltwise("add", [y, z])
    y = b.conv("c3", y, 8, 3, stride=2, pad=1)
    g = b.finish([y])

    xv = rng.normal(size=(2, 32, 32, 8)).astype(np.float32)
    ref = np.asarray(Engine(g)(xv))
    cfg = ShardingConfig(mesh_shape=(2, 4), shard_spatial=True)
    eng = Engine(g, EngineConfig(sharding=cfg))
    out = np.asarray(eng(xv))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
    # the input really is H-sharded over the 4-way model axis
    from feathercnn_tpu.parallel import input_shardings
    shards = input_shardings(g, mesh, cfg)
    arr = jax.device_put(xv, shards["data"])
    assert arr.addressable_shards[0].data.shape == (1, 8, 32, 8)


def test_engine_spatial_sharding_int8_small_h(mesh, rng):
    """Small-H spatial workaround (lowering._spatial_small_h_fix): a
    STRIDED int8 conv whose per-shard H is smaller than the stride hits
    an XLA SPMD partitioner bug under shard_spatial (mistyped s8 pad
    broadcast, HLO-verifier RET_CHECK); the lowering gathers H for
    those convs.  Without the workaround this test fails to compile."""
    from feathercnn_tpu.models.builder import GraphBuilder
    from feathercnn_tpu.quant import calibrate

    b = GraphBuilder("smallh", seed=21)
    x = b.input("data", (2, 16, 16, 8))
    y = b.conv("c1", x, 16, 3, pad=1, relu=True)
    y = b.pool("p1", y, 2, 2)                  # H 16 -> 8
    y = b.conv("c2", y, 32, 1, stride=2)       # H 8 -> 4
    y = b.conv("c3", y, 32, 1, stride=2)       # H 4 -> 2: per-shard H
    y = b.pool("gap", y, 0, mode="AVE", global_pooling=True)
    y = b.fc("fc", y, 8)                       # < stride on 4-way axis
    g = b.finish([y])

    xv = rng.normal(size=(2, 16, 16, 8)).astype(np.float32)
    calibrate(g, [xv], method="max")
    qcfg = dict(backend="pallas", quant="w8a8", interpret=True,
                algo_overrides=(("*", "xla"),))
    ref = np.asarray(Engine(g, EngineConfig(**qcfg))(xv))
    eng = Engine(g, EngineConfig(sharding=ShardingConfig(
        mesh_shape=(2, 4), shard_spatial=True), **qcfg))
    np.testing.assert_allclose(np.asarray(eng(xv)), ref,
                               rtol=1e-4, atol=1e-5)


def test_spatial_whole_model_segmentation(mesh, rng):
    """A whole segmentation model (FCN-32s, VGG backbone, stride-32)
    runs H-sharded end-to-end on the virtual mesh and matches the
    single-device engine — the strided-net spatial story VERDICT round
    1 item 8 asked for (engine-level GSPMD shard_spatial; the explicit
    shard_map halo path in parallel/spatial.py stays stride-1)."""
    from feathercnn_tpu.models import MODEL_BUILDERS
    g = MODEL_BUILDERS["fcn32s"](batch=2, size=96, with_softmax=False)
    xv = rng.normal(size=(2, 96, 96, 3)).astype(np.float32) * 0.1
    ref = np.asarray(Engine(g)(xv))
    cfg = ShardingConfig(mesh_shape=(2, 4), shard_spatial=True)
    eng = Engine(g, EngineConfig(sharding=cfg))
    out = np.asarray(eng(xv))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)
    # the input really lands H-sharded over the 4-way model axis
    from feathercnn_tpu.parallel import input_shardings
    shards = input_shardings(g, mesh, cfg)
    arr = jax.device_put(xv, shards["data"])
    assert arr.addressable_shards[0].data.shape == (1, 24, 96, 3)
