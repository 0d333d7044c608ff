"""Paired A/B: f32 vs int8 host-side-quantized model input.

Serving already transfers int8 batches (the fp-act stem dequantizes via
the recorded input_scale — BASELINE.md), but the headline bench feeds
f32.  This probe measures what the serving-realistic input dtype is
worth on-device: the stem's HBM read of the input drops 4x (77 MB ->
19 MB at ResNet-50 b128).  Interleaved slope pairs in ONE process, like
bench/batch_sweep.py (separate-process runs cannot rank configs on this
tunnel).

Usage: python bench/input_ab.py [--model resnet50] [--batch 128]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="resnet50")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax.numpy as jnp

    from feathercnn_tpu import Engine, EngineConfig
    from feathercnn_tpu.models import MODEL_BUILDERS
    from feathercnn_tpu.quant import calibrate
    from feathercnn_tpu.utils.cache import enable_persistent_cache
    from feathercnn_tpu.utils.timing import engine_loop, slope_time
    enable_persistent_cache()

    import inspect
    builder = MODEL_BUILDERS[args.model]
    bkw = {}
    if "with_softmax" in inspect.signature(builder).parameters:
        bkw["with_softmax"] = False
    g = builder(batch=args.batch, **bkw)
    g_cal = builder(batch=8, **bkw)
    rng = np.random.default_rng(1)
    spec0 = next(iter(g_cal.inputs.values()))
    calibrate(g_cal, [rng.normal(size=spec0.shape).astype(np.float32)],
              method="max", config=EngineConfig(compute_dtype="bfloat16"))
    g.meta.update({k: g_cal.meta[k] for k in ("act_scales", "value_scales")})
    cfg = EngineConfig(compute_dtype="bfloat16", backend="pallas",
                       quant="w8a8", algo_overrides=(("*", "xla"),))
    eng = Engine(g, cfg)

    stem = next(n for n in eng.graph.nodes
                if n.op == "Convolution"
                and n.inputs[0] in eng.graph.inputs)
    q = eng.graph.meta["quant"][stem.name]
    scale = q.get("input_scale") or q.get("x_scale")
    if scale is None:
        raise SystemExit("stem has no input scale — calibrate first")

    xf = np.random.default_rng(0).normal(
        size=next(iter(eng.graph.inputs.values())).shape
    ).astype(np.float32)
    xq = np.clip(np.round(xf / scale), -127, 127).astype(np.int8)

    loops = {}
    for name, x in (("f32", xf), ("int8", xq)):
        loop, params, xd = engine_loop(eng, x=x)
        float(loop(params, xd, jnp.int32(3)))
        loops[name] = (loop, params, xd)
        print(f"compiled {name}", file=sys.stderr, flush=True)

    res = {k: [] for k in loops}
    for r in range(args.rounds):
        for name, (loop, params, xd) in loops.items():
            dt = slope_time(loop, params, xd, iters=args.iters)
            res[name].append(args.batch / dt)
            print(f"round {r} {name}: {args.batch/dt:,.0f} img/s",
                  file=sys.stderr, flush=True)
    med = {k: float(np.median(v)) for k, v in res.items()}
    print(f"{args.model} b{args.batch} paired medians: "
          f"f32 {med['f32']:,.0f} img/s, int8 {med['int8']:,.0f} img/s "
          f"({(med['int8']/med['f32']-1)*100:+.1f}%)")


if __name__ == "__main__":
    main()
