"""Device mesh + sharding specs: the pod-slice scaling layer.

The reference has NO distributed anything — its only parallelism is OpenMP
threads inside one CPU (``feather::Net(num_threads)``, [pub] src/net.h).
This module is the TPU-native capability BASELINE.json:5 adds on top:

- **DP**: the image batch shards across the ``data`` mesh axis (hosts x
  chips over DCN+ICI) — inference is embarrassingly parallel over batch.
- **TP (channel sharding)**: conv/FC weights shard on the output-channel
  axis over the ``model`` axis (ICI).  Successive convs then contract over
  a sharded input-channel axis, and XLA's SPMD partitioner inserts the
  all-gather / reduce-scatter pair — the CNN analog of Megatron
  column/row-parallel linear.  Hand-pipelined shard_map/Pallas variants
  live in parallel/tp.py and parallel/spatial.py.

Everything here is declarative NamedSharding: pick a mesh, annotate
shardings, let XLA insert collectives (the scaling-book recipe).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["ShardingConfig", "build_mesh", "param_shardings",
           "input_shardings", "output_shardings", "value_pspec"]


@dataclasses.dataclass(frozen=True)
class ShardingConfig:
    """Mesh shape + axis names + what to shard.

    mesh_shape: e.g. (2, 4) for 2-way data x 4-way model; a dim of 1
    disables that axis.  axis order is (data, model).
    """

    mesh_shape: Tuple[int, ...] = (1, 1)
    axis_names: Tuple[str, ...] = ("data", "model")
    shard_weights: bool = True   # channel-TP on conv/FC weights
    shard_batch: bool = True     # DP on the batch dim
    # Spatial partitioning (the CNN context-parallel analog,
    # SURVEY.md §2.5): use the model axis to shard activations' H dim
    # instead of channel-TP — GSPMD inserts the halo exchanges.  For
    # huge spatial inputs (segmentation/detection at batch 1) where the
    # batch can't cover the mesh.  Weights replicate in this mode.
    shard_spatial: bool = False
    # Route TP InnerProduct layers through the ring-pipelined collective
    # matmul (parallel/overlap.py allgather_matmul) instead of leaving
    # the K-axis all-gather to GSPMD: the per-chunk ppermute is
    # dataflow-independent of the previous chunk's dot, so the
    # latency-hiding scheduler overlaps ICI with MXU (SURVEY.md §2.5
    # "collectives overlapped with conv compute").  Correctness-tested
    # on the virtual mesh; wall-clock benefit needs real multi-chip ICI.
    ring_overlap: bool = False

    @property
    def data_axis(self) -> str:
        return self.axis_names[0]

    @property
    def model_axis(self) -> str:
        return self.axis_names[1]


def build_mesh(cfg: ShardingConfig, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = int(np.prod(cfg.mesh_shape))
    if n > len(devices):
        raise ValueError(
            f"mesh {cfg.mesh_shape} needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(cfg.mesh_shape)
    return Mesh(arr, cfg.axis_names)


def _divisible(dim: int, parts: int) -> bool:
    return parts > 0 and dim % parts == 0


def param_shardings(graph, mesh: Mesh, cfg: ShardingConfig
                    ) -> Dict[str, NamedSharding]:
    """Per-param NamedSharding: conv/FC weights and biases shard on their
    trailing output-channel axis over the model axis; everything else (BN
    stats already folded, scales, small biases) replicates when not
    divisible."""
    model_parts = mesh.shape[cfg.model_axis]
    out: Dict[str, NamedSharding] = {}
    repl = NamedSharding(mesh, P())
    shard_last: Dict[int, NamedSharding] = {}

    def last_axis_sharding(rank: int) -> NamedSharding:
        if rank not in shard_last:
            spec = [None] * (rank - 1) + [cfg.model_axis]
            shard_last[rank] = NamedSharding(mesh, P(*spec))
        return shard_last[rank]

    tp_params = set()
    if cfg.shard_weights and model_parts > 1 and not cfg.shard_spatial:
        for n in graph.nodes:
            if n.op not in ("Convolution", "InnerProduct"):
                continue
            # Grouped (1 < group < channels) conv weights REPLICATE:
            # XLA's SPMD partitioner mispartitions a grouped conv whose
            # kernel output-feature axis is sharded (measured wrong
            # results on the virtual mesh, tests/test_parallel.py).
            # Depthwise (Cin/g == 1) partitions correctly — channels
            # stay channelwise — so it keeps the TP sharding.
            group = n.attrs.get("group", 1)
            if n.op == "Convolution" and group > 1:
                w = np.asarray(graph.params[n.params[0]])
                if w.ndim == 4 and w.shape[-2] != 1:
                    continue
            tp_params.update(n.params)
    for name, arr in graph.params.items():
        a = np.asarray(arr)
        if (name in tp_params and a.ndim >= 1
                and _divisible(a.shape[-1], model_parts)):
            out[name] = last_axis_sharding(a.ndim)
        else:
            out[name] = repl
    return out


def value_pspec(cfg: ShardingConfig, mesh: Mesh, shape) -> P:
    """Activation PartitionSpec for a value of ``shape``: batch over
    the data axis; in spatial mode, H (rank-4 only) over the model
    axis — both gated on divisibility."""
    data_parts = mesh.shape[cfg.data_axis]
    model_parts = mesh.shape[cfg.model_axis]
    spec = [None] * len(shape)
    if (cfg.shard_batch and data_parts > 1 and len(shape) >= 1
            and _divisible(shape[0], data_parts)):
        spec[0] = cfg.data_axis
    if (cfg.shard_spatial and model_parts > 1 and len(shape) == 4
            and _divisible(shape[1], model_parts)):
        spec[1] = cfg.model_axis
    return P(*spec)


def input_shardings(graph, mesh: Mesh, cfg: ShardingConfig
                    ) -> Dict[str, NamedSharding]:
    return {name: NamedSharding(mesh, value_pspec(cfg, mesh, spec.shape))
            for name, spec in graph.inputs.items()}


def output_shardings(graph, mesh: Mesh, cfg: ShardingConfig,
                     names: Sequence[str]) -> Dict[str, NamedSharding]:
    """Outputs come back batch-sharded (caller gathers per-host shards
    in the serving layer); spatially sharded too in spatial mode."""
    return {name: NamedSharding(
        mesh, value_pspec(cfg, mesh, graph.specs[name].shape))
        for name in names}
