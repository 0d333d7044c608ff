#!/usr/bin/env python
"""Per-layer blob diff between two engine configurations — the analog of
the reference's Caffe-parity workflow (run feather_test with blob dumps,
diff ExtractBlob output against Caffe's, [pub] feather_test.cpp), turned
into one command.

    python tools/diff_blobs.py --model squeezenet_v11 \
        --a quant=none --b quant=w8a8 [--batch 2] [--threshold 0.999]
    python tools/diff_blobs.py --ftpu model.ftpu --a backend=xla \
        --b backend=pallas

Runs both engines on the same input, extracts EVERY surviving layer
output (post-fusion), and prints per-layer cosine + max|diff| in
topological order — the first layer whose cosine crosses the threshold
is where the configs diverge.  Exits non-zero if the FINAL output
crosses the threshold.

Config specs are comma-separated EngineConfig fields (``quant=w8a8``,
``backend=pallas``, ``compute_dtype=float32``, ``interpret=true``);
``quant=none`` clears quantization.  w8a8 configs trigger a shared
max-calibration on the probe input.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_cfg(spec: str):
    out = {}
    for kv in filter(None, (spec or "").split(",")):
        k, v = kv.split("=", 1)
        if v.lower() in ("true", "false"):
            v = v.lower() == "true"
        elif v.lower() == "none":
            v = None
        out[k] = v
    return out


def cosine(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    denom = np.linalg.norm(a) * np.linalg.norm(b)
    if denom == 0:
        return 1.0 if not (a.any() or b.any()) else 0.0
    return float(a @ b / denom)


def main():
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--model", help="zoo model name")
    src.add_argument("--ftpu", help="path to a .ftpu artifact")
    ap.add_argument("--a", default="quant=none", help="config A spec")
    ap.add_argument("--b", default="quant=w8a8", help="config B spec")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--threshold", type=float, default=0.999)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (oracle-vs-oracle runs)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from feathercnn_tpu import Engine, EngineConfig
    from feathercnn_tpu.quant import calibrate

    if args.model:
        import inspect

        from feathercnn_tpu.models import MODEL_BUILDERS
        builder = MODEL_BUILDERS[args.model]
        kw = ({"with_softmax": False}
              if "with_softmax" in inspect.signature(builder).parameters
              else {})

        def fresh():
            return builder(batch=args.batch, **kw)
    else:
        from feathercnn_tpu.model_format import load_ftpu

        def fresh():
            return load_ftpu(args.ftpu)

    g = fresh()
    spec = next(iter(g.inputs.values()))
    x = np.random.default_rng(args.seed).normal(
        size=spec.shape).astype(np.float32)

    cfg_a, cfg_b = parse_cfg(args.a), parse_cfg(args.b)
    if "w8a8" in (cfg_a.get("quant"), cfg_b.get("quant")):
        calibrate(g, [x], method="max")

    engines = {}
    for tag, ckw in (("a", cfg_a), ("b", cfg_b)):
        gg = fresh()
        gg.meta.update({k: v for k, v in g.meta.items()
                        if k in ("act_scales", "value_scales")})
        engines[tag] = Engine(gg, EngineConfig(**ckw))

    # Compare every value that survives fusion in BOTH engines.
    def live_values(eng):
        return [o for n in eng.graph.nodes for o in n.outputs]

    common = [v for v in live_values(engines["a"])
              if v in set(live_values(engines["b"]))]
    ra = engines["a"].run(x, extract=common)
    rb = engines["b"].run(x, extract=common)

    worst = (1.0, None)
    first_bad = None
    for v in common:
        a, b = np.asarray(ra[v], np.float32), np.asarray(rb[v], np.float32)
        c = cosine(a, b)
        md = float(np.abs(a - b).max()) if a.shape == b.shape else np.nan
        flag = " <-- DIVERGES" if c < args.threshold else ""
        if flag and first_bad is None:
            first_bad = v
        if c < worst[0]:
            worst = (c, v)
        print(f"{v:48s} cos={c:.6f} max|d|={md:10.4g}{flag}")

    out_name = engines["a"].graph.outputs[0]
    final = cosine(np.asarray(ra[out_name]), np.asarray(rb[out_name]))
    print(f"\nfinal output {out_name!r}: cosine={final:.6f} "
          f"(worst layer {worst[1]!r}: {worst[0]:.6f}; "
          f"first divergence: {first_bad or 'none'})")
    sys.exit(0 if final >= args.threshold else 1)


if __name__ == "__main__":
    main()
