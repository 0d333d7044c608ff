"""Tracing / profiling utilities (SURVEY.md §5).

The reference's observability is wall-clock timers + compile-time-gated
per-layer prints ([pub] src/common.h LOGI/LOGE macros, timer helpers).
TPU-native replacements:

- ``trace(logdir)``: jax.profiler context — open the result in
  XProf/TensorBoard for per-kernel HLO timing (the real per-op view;
  per-layer host timers are meaningless under XLA fusion).
- ``layer_timings(engine, x)``: coarse per-layer attribution by running
  prefixes of the graph (the analog of the reference's per-layer timing
  mode — O(n^2) compiles, debug only).
- ``log``: module logger; structured, dependency-light.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict

import jax
import numpy as np

log = logging.getLogger("feathercnn_tpu")

__all__ = ["trace", "layer_timings", "log"]


@contextlib.contextmanager
def trace(logdir: str = "/tmp/feathercnn_tpu_trace"):
    """jax.profiler trace context: view in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def layer_timings(engine, x, iters: int = 5) -> Dict[str, float]:
    """Per-layer ms by timing growing graph prefixes (differences).

    Debug-grade: prefix timing includes less fusion than the full graph,
    so treat results as attribution hints, not ground truth.
    """
    from ..utils.timing import device_bench

    graph = engine.graph
    out: Dict[str, float] = {}
    prev = 0.0
    fwd_all = engine._build_forward()
    params = engine._prepare_params()
    (in_name,) = graph.inputs

    for i in range(len(graph.nodes)):
        sub_outputs = list(graph.nodes[i].outputs)

        def run_prefix(xv, _n=i + 1, _outs=tuple(sub_outputs)):
            env = dict({in_name: xv})
            from ..ops.lowering import LoweringCtx, lower_node
            ctx = LoweringCtx(graph, engine.config)
            for node in graph.nodes[:_n]:
                ins = [env[k] for k in node.inputs]
                ps = [params[p] for p in node.params]
                for name, val in zip(node.outputs,
                                     lower_node(node, ins, ps, ctx)):
                    env[name] = val
            return env[_outs[0]]

        t = device_bench(run_prefix, [np.asarray(x)], iters=iters)
        out[graph.nodes[i].name] = max(0.0, (t - prev) * 1e3)
        prev = t
    return out
