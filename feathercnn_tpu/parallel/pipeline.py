"""Pipeline parallelism: stage-partitioned inference across devices.

The reference has no distributed anything (SURVEY.md §2.5); PP is one of
the parallelism strategies the rebuild adds.  For *inference* the
TPU-native shape of PP is simple and honest:

  - partition the (topologically ordered) IR node list into S contiguous
    stages with balanced conv/FC FLOPs;
  - place each stage's params on its own device; compile each stage as
    its own jitted function (committed inputs pin execution to the
    stage's device);
  - drive micro-batches through the stages in wavefront order.  JAX
    dispatch is async, so while stage s computes micro-batch m on chip
    s, stage s-1 is already computing micro-batch m+1 on chip s-1 — the
    classic GPipe-style fill/steady/drain schedule without any collective:
    inter-stage edges are point-to-point device transfers (ICI).

Compared with DP x TP (parallel/mesh.py — the default for CNN inference,
see PARITY.md), PP trades batch latency for weight-memory distribution:
each chip holds only its stage's weights.  Useful when a model's weights
exceed one chip's HBM, or to co-serve many models.

No reference counterpart: [pub] FeatherCNN runs single-process, and its
only parallel resource is an OpenMP thread pool.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig
from ..ir import Graph, infer_shapes
from ..ops.lowering import LoweringCtx, lower_node

__all__ = ["PipelineEngine", "partition_stages"]


def _node_flops(graph: Graph, node) -> float:
    """MAC*2 cost of conv/FC nodes; cheap ops count epsilon so empty
    stages can't occur."""
    if node.op not in ("Convolution", "InnerProduct"):
        return 1e3
    out = graph.specs[node.outputs[0]]
    if node.op == "InnerProduct":
        w = graph.params[node.params[0]]
        return 2.0 * float(np.prod(w.shape))
    kh = node.attrs.get("kernel_h", node.attrs.get("kernel_size", 1))
    kw = node.attrs.get("kernel_w", node.attrs.get("kernel_size", 1))
    group = node.attrs.get("group", 1)
    cin = graph.specs[node.inputs[0]].shape[-1]
    _, oh, ow, co = out.shape
    return 2.0 * oh * ow * co * kh * kw * (cin / group)


@dataclasses.dataclass
class Stage:
    index: int
    nodes: List[Any]
    live_in: List[str]          # values read from earlier stages/inputs
    live_out: List[str]         # values later stages/outputs need


def partition_stages(graph: Graph, num_stages: int) -> List[Stage]:
    """Contiguous FLOP-balanced partition of the topo-ordered node list."""
    if num_stages < 1:
        raise ValueError("num_stages must be >= 1")
    costs = [_node_flops(graph, n) for n in graph.nodes]
    total = sum(costs)
    target = total / num_stages
    cuts, acc, k = [], 0.0, 1
    for i, c in enumerate(costs):
        acc += c
        if k < num_stages and acc >= k * target \
                and len(graph.nodes) - (i + 1) >= num_stages - k:
            cuts.append(i + 1)
            k += 1
    bounds = [0] + cuts + [len(graph.nodes)]

    produced_by_stage: Dict[str, int] = {}
    stages: List[Stage] = []
    for s in range(len(bounds) - 1):
        nodes = graph.nodes[bounds[s]:bounds[s + 1]]
        for n in nodes:
            for o in n.outputs:
                produced_by_stage[o] = s
        stages.append(Stage(s, nodes, [], []))

    # live-in/live-out: any value consumed in stage s but produced earlier
    # (or a graph input) crosses the s-1 -> s edge.
    for s, st in enumerate(stages):
        seen_in = set()
        for n in st.nodes:
            for v in n.inputs:
                src = produced_by_stage.get(v)
                if (src is None or src < s) and v not in seen_in:
                    st.live_in.append(v)
                    seen_in.add(v)
    # a value is live-out of the stage producing it if any later stage
    # consumes it, or it is a graph output
    for s, st in enumerate(stages):
        outs = set()
        for later in stages[s + 1:]:
            outs.update(later.live_in)
        for n in st.nodes:
            for o in n.outputs:
                if o in outs or o in graph.outputs:
                    st.live_out.append(o)
    return stages


class PipelineEngine:
    """Stage-pipelined inference engine.

    num_stages defaults to the device count.  ``micro_batches`` splits
    the batch so the pipeline fills (throughput ~ S/(S+M-1) efficiency
    with M micro-batches over S stages).
    """

    def __init__(self, graph: Graph, config: Optional[EngineConfig] = None,
                 num_stages: Optional[int] = None,
                 devices: Optional[Sequence[Any]] = None,
                 optimize_graph: bool = True):
        import copy

        from ..passes import optimize

        self.config = config or EngineConfig()
        self.graph = copy.deepcopy(graph)
        # same per-model baked defaults as Engine (meta config_overrides)
        from ..config import apply_baked_overrides
        self.config = apply_baked_overrides(self.config, self.graph.meta)
        if optimize_graph:
            optimize(self.graph,
                     merge_siblings=self.config.merge_siblings)
        if self.config.quant:
            from ..quant.rewrite import quantize_graph
            quantize_graph(self.graph, self.config.quant,
                           int8_grouped=self.config.int8_grouped,
                           requant_ops=self.config.int8_requant_ops,
                           fp_act_layers=self.config.fp_act_layers)
        infer_shapes(self.graph)
        self.devices = list(devices if devices is not None
                            else jax.devices())
        self.num_stages = num_stages or len(self.devices)
        if self.num_stages > len(self.devices):
            raise ValueError(
                f"{self.num_stages} stages > {len(self.devices)} devices")
        self.stages = partition_stages(self.graph, self.num_stages)
        self._ctx = LoweringCtx(self.graph, self.config)
        self._stage_params: List[Dict[str, jax.Array]] = []
        self._stage_fns: List[Any] = []
        cdtype = jnp.dtype(self.config.compute_dtype)
        for st in self.stages:
            dev = self.devices[st.index]
            params: Dict[str, jax.Array] = {}
            for n in st.nodes:
                for p in n.params:
                    arr = np.asarray(self.graph.params[p])
                    if (n.op in ("Convolution", "InnerProduct")
                            and p == n.params[0]
                            and arr.dtype == np.float32
                            and cdtype != jnp.float32):
                        arr = arr.astype(cdtype)
                    params[p] = jax.device_put(arr, dev)
            self._stage_params.append(params)
            self._stage_fns.append(jax.jit(self._make_stage_fn(st)))

    def _make_stage_fn(self, st: Stage):
        ctx = self._ctx
        cdtype = jnp.dtype(self.config.compute_dtype)
        graph_inputs = set(self.graph.inputs)

        def fn(params, env):
            env = dict(env)
            for name in list(env):
                if name in graph_inputs and jnp.issubdtype(
                        env[name].dtype, jnp.floating):
                    env[name] = env[name].astype(cdtype)
            for node in st.nodes:
                ins = [env[i] for i in node.inputs]
                ps = [params[p] for p in node.params]
                outs = lower_node(node, ins, ps, ctx)
                for name, val in zip(node.outputs, outs):
                    env[name] = val
            return {v: env[v] for v in st.live_out}

        return fn

    # ------------------------------------------------------------------
    def run(self, x, micro_batches: int = 1) -> Dict[str, jax.Array]:
        if not isinstance(x, dict):
            (name,) = self.graph.inputs
            x = {name: x}
        x = {k: jnp.asarray(v) for k, v in x.items()}
        batch = next(iter(x.values())).shape[0]
        m = max(1, min(micro_batches, batch))
        if batch % m:
            raise ValueError(f"batch {batch} not divisible by {m} "
                             "micro-batches")
        mb = batch // m
        shards = [{k: v[i * mb:(i + 1) * mb] for k, v in x.items()}
                  for i in range(m)]

        # Wavefront: python loop dispatches stage s for micro-batch i as
        # soon as its predecessor produced the inputs; async dispatch
        # overlaps the stages across devices.
        results: List[Dict[str, jax.Array]] = []
        for i in range(m):
            env: Dict[str, jax.Array] = dict(shards[i])
            carry: Dict[str, jax.Array] = {}
            for s, st in enumerate(self.stages):
                dev = self.devices[s]
                stage_in = {}
                for v in st.live_in:
                    val = env[v] if v in env else carry[v]
                    stage_in[v] = jax.device_put(val, dev)
                out = self._stage_fns[s](self._stage_params[s], stage_in)
                carry.update(out)
            results.append({k: carry[k] for k in self.graph.outputs})
        return {k: jnp.concatenate([r[k] for r in results], axis=0)
                for k in self.graph.outputs}

    def __call__(self, x, micro_batches: int = 1) -> jax.Array:
        return self.run(x, micro_batches)[self.graph.outputs[0]]
