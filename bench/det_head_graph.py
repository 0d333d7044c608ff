"""Time DetectionOutput as a STANDALONE engine graph on real body
outputs — the missing middle between bench/det_head_ablate.py (clean
tensors, hand-copied head: 1.5 + 0.6 ms) and bench/ssd_head_ab.py
(in-graph: 5.6 ms).  If the standalone-graph head is cheap, the gap is
whole-graph fusion/scheduling; if it reproduces 5.6 ms, the hand copy
diverges from the real lowering somewhere that matters.

Usage: python bench/det_head_graph.py [--model mobilenet_ssd]
       [--batch 128]
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="mobilenet_ssd")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--quant", default="w8a8")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from feathercnn_tpu import Engine, EngineConfig
    from feathercnn_tpu.ir import Graph, Node, TensorSpec
    from feathercnn_tpu.models import MODEL_BUILDERS
    from feathercnn_tpu.quant import calibrate
    from feathercnn_tpu.utils.cache import enable_persistent_cache
    from feathercnn_tpu.utils.timing import device_bench
    enable_persistent_cache()

    g0 = MODEL_BUILDERS[args.model](batch=args.batch)
    if args.quant == "w8a8":
        g_cal = MODEL_BUILDERS[args.model](batch=8)
        rng = np.random.default_rng(1)
        spec0 = next(iter(g_cal.inputs.values()))
        calibrate(g_cal, [rng.normal(size=spec0.shape)
                          .astype(np.float32)], method="max",
                  config=EngineConfig(compute_dtype=args.dtype))
        g0.meta.update({k: g_cal.meta[k]
                        for k in ("act_scales", "value_scales")})
    cfg = EngineConfig(compute_dtype=args.dtype, quant=args.quant or None,
                       backend="pallas", algo_overrides=(("*", "xla"),))

    det = copy.deepcopy(next(n for n in g0.nodes
                             if n.op == "DetectionOutput"))

    g = copy.deepcopy(g0)
    g.outputs = ["mbox_loc", "mbox_conf_flatten", "mbox_priorbox"]
    eng = Engine(g, cfg)
    rng = np.random.default_rng(0)
    spec0 = next(iter(g.inputs.values()))
    x = rng.normal(size=spec0.shape).astype(np.float32)
    outs = eng.run(x)
    loc = jnp.asarray(outs["mbox_loc"])
    conf = jnp.asarray(outs["mbox_conf_flatten"])
    priors = np.asarray(outs["mbox_priorbox"], np.float32)

    det.inputs = ["loc", "conf", "priors"]
    det.outputs = ["y"]
    hg = Graph("head", {"loc": TensorSpec(tuple(loc.shape)),
                        "conf": TensorSpec(tuple(conf.shape)),
                        "priors": TensorSpec(priors.shape)},
               ["y"], [det], params={})
    heng = Engine(hg, cfg, optimize_graph=False)
    fwd = heng._build_forward()
    params = heng._prepare_params()
    pr = jax.device_put(jnp.asarray(priors))

    def run(l, c):
        return fwd(params, {"loc": l, "conf": c, "priors": pr})["y"]

    t = device_bench(run, [loc.astype(jnp.float32),
                           conf.astype(jnp.float32)], iters=args.iters)
    print(json.dumps({"variant": "head_graph_f32in",
                      "ms": round(t * 1e3, 3)}), flush=True)
    t = device_bench(run, [loc, conf], iters=args.iters)
    print(json.dumps({"variant": "head_graph_bf16in",
                      "ms": round(t * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
