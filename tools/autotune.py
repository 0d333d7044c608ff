#!/usr/bin/env python
"""Measurement-driven per-layer algorithm selection.

The reference picks conv algorithms from static shape rules at Init
([pub] src/booster/arm/booster.cpp SelectAlgo).  This tool goes further:
it times every candidate kernel (xla / gemm1x1 / implicit / winograd) for
every conv layer on the actual device and records the winners as
``algo_overrides`` — persisted into the model's .ftpu meta so serving
picks them up for free.

Usage:
    python tools/autotune.py --model resnet50 --batch 128 --quant w8a8 \
        [--out overrides.json] [--ftpu model.ftpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def tune(graph, dtype: str, quant, iters: int = 15):
    from bench.roofline import layer_table, measure_algos
    from feathercnn_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    rows = layer_table(graph, quant)
    rows = measure_algos(graph, rows, dtype, quant, iters=iters)
    overrides = {}
    for r in rows:
        best = r.get("best_algo")
        if best and best != "xla":
            overrides[r["layer"]] = best
    return overrides, rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="resnet50")
    ap.add_argument("--ftpu", default=None,
                    help="tune a converted model instead of a zoo model")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--quant", default=None)
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from feathercnn_tpu import Engine, EngineConfig

    if args.ftpu:
        from feathercnn_tpu.model_format import load_ftpu, save_ftpu
        graph = load_ftpu(args.ftpu, mmap_weights=False)
    else:
        from feathercnn_tpu.models import MODEL_BUILDERS
        graph = MODEL_BUILDERS[args.model](batch=args.batch,
                                           with_softmax=False)
    eng = Engine(graph, EngineConfig(compute_dtype=args.dtype,
                                     quant=args.quant))
    overrides, rows = tune(eng.graph, args.dtype, args.quant, args.iters)

    for r in rows:
        if "measured_ms" in r:
            print(f"{r['layer']:28s} {r['measured_ms']} -> "
                  f"{r.get('best_algo')}")
    print(f"\n{len(overrides)} non-default choices")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(overrides, f, indent=1)
        print(f"wrote {args.out}  (pass to EngineConfig via "
              f"algo_overrides=tuple(json.load(f).items()))")
    if args.ftpu:
        graph.meta["algo_overrides"] = overrides
        from feathercnn_tpu.model_format import save_ftpu
        save_ftpu(graph, args.ftpu)
        print(f"baked into {args.ftpu} meta")


if __name__ == "__main__":
    main()
