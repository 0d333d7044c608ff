"""Paired A/B of two explicit EngineConfig override sets on one model.

bench/batch_sweep.py --variants flips ONE boolean against the baked
baseline; this harness compares two arbitrary override DICTS (so flag
combinations with known interactions — e.g. GoogLeNet's
int8_requant_ops x merge_siblings — can be ranked).  Baked zoo
``config_overrides`` are stripped first: both sides are exactly what you
pass.  Interleaved slope timings in one process, per CLAUDE.md.

Usage:
  python bench/config_ab.py --model googlenet --batch 256 \
      --a '{"int8_requant_ops": false}' \
      --b '{"int8_requant_ops": true, "merge_siblings": false}'
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
    ap.add_argument("--model", default="googlenet")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--quant", default="w8a8")
    ap.add_argument("--a", required=True, help="JSON EngineConfig fields")
    ap.add_argument("--b", required=True, help="JSON EngineConfig fields")
    ap.add_argument("--bkw", default="{}",
                    help="JSON builder kwargs (e.g. bg_bias for the "
                         "SSD realistic-score-distribution variants)")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    if args.quant in ("none", "None"):
        args.quant = None

    import jax.numpy as jnp

    from feathercnn_tpu import Engine, EngineConfig
    from feathercnn_tpu.models import MODEL_BUILDERS
    from feathercnn_tpu.quant import calibrate
    from feathercnn_tpu.utils.cache import enable_persistent_cache
    from feathercnn_tpu.utils.timing import engine_loop, slope_time
    enable_persistent_cache()

    import inspect
    builder = MODEL_BUILDERS[args.model]
    bkw = json.loads(args.bkw)
    if "with_softmax" in inspect.signature(builder).parameters:
        bkw["with_softmax"] = False
    g0 = builder(batch=args.batch, **bkw)
    if args.quant == "w8a8":
        try:
            g_cal = builder(batch=8, **bkw)
        except ValueError:            # batch-1-only builders
            g_cal = builder(batch=args.batch, **bkw)
        rng = np.random.default_rng(1)
        spec0 = next(iter(g_cal.inputs.values()))
        cal0 = rng.normal(size=spec0.shape).astype(np.float32)
        if len(g_cal.inputs) > 1:     # two-stage models: im_info etc.
            from feathercnn_tpu.utils.timing import default_extra_inputs
            cal = [{next(iter(g_cal.inputs)): cal0,
                    **default_extra_inputs(g_cal)}]
        else:
            cal = [cal0]
        calibrate(g_cal, cal, method="max",
                  config=EngineConfig(compute_dtype=args.dtype))
        g0.meta.update({k: g_cal.meta[k]
                        for k in ("act_scales", "value_scales")})

    sides = {"a": json.loads(args.a), "b": json.loads(args.b)}
    loops = {}
    for name, ov in sides.items():
        g = copy.deepcopy(g0)
        g.meta.pop("config_overrides", None)   # explicit configs only
        cfg = EngineConfig(compute_dtype=args.dtype, backend="pallas",
                           quant=args.quant,
                           algo_overrides=(("*", "xla"),), **ov)
        loop, params, xd = engine_loop(Engine(g, cfg))
        float(loop(params, xd, jnp.int32(3)))
        print(f"compiled {name}: {ov}", file=sys.stderr, flush=True)
        loops[name] = (loop, params, xd)

    times = {k: [] for k in sides}
    for r in range(args.rounds):
        for name in sides:
            loop, params, xd = loops[name]
            times[name].append(slope_time(loop, params, xd,
                                          iters=args.iters))
    med = {k: float(np.median(v)) for k, v in times.items()}
    ratios = np.asarray(times["a"]) / np.asarray(times["b"])
    print(json.dumps({
        "model": args.model, "batch": args.batch,
        "a_ms": round(med["a"] * 1e3, 3),
        "b_ms": round(med["b"] * 1e3, 3),
        "a_img_s": round(args.batch / med["a"], 1),
        "b_img_s": round(args.batch / med["b"], 1),
        "b_vs_a": round(float(np.median(ratios)), 4),
    }))


if __name__ == "__main__":
    main()
