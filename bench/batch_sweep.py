"""Paired batch-size sweep: interleaved rounds inside ONE process.

The axon tunnel's throughput drifts by tens of percent across minutes,
so separate-process benches can't rank configs (BASELINE.md).  This
harness compiles every batch size once, then interleaves slope timings
round-robin and reports per-batch medians — drift hits all configs
equally.

Usage: python bench/batch_sweep.py [--batches 128,160,192] [--rounds 5]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="resnet50")
    ap.add_argument("--batches", default="128,160,192")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--quant", default="w8a8")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--variants", default=None,
                    help="comma list of EngineConfig boolean fields "
                         "(e.g. 's2d_stem,fuse_chains') or 'algo:NAME' "
                         "overrides to A/B at the FIRST batch size; "
                         "each runs paired against the baseline config")
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]
    if args.quant in ("none", "None"):
        args.quant = None
    variants = ([None] + args.variants.split(",")) if args.variants \
        else [None]
    if args.variants:
        batches = batches[:1]

    import jax
    import jax.numpy as jnp

    from feathercnn_tpu import Engine, EngineConfig
    from feathercnn_tpu.models import MODEL_BUILDERS
    from feathercnn_tpu.quant import calibrate
    from feathercnn_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "rootbench", os.path.join(os.path.dirname(__file__), "..",
                                  "bench.py"))
    rootbench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rootbench)

    import inspect
    builder = MODEL_BUILDERS[args.model]
    bkw = {}
    if "with_softmax" in inspect.signature(builder).parameters:
        bkw["with_softmax"] = False

    loops = {}
    flops = {}
    configs = [(b, v) for b in batches for v in variants]
    for b, variant in configs:
        g = builder(batch=b, **bkw)
        if args.quant == "w8a8":
            try:
                g_cal = builder(batch=8, **bkw)
            except ValueError as e:   # batch-1-only models (Faster R-CNN)
                if "batch 1" not in str(e):
                    raise
                g_cal = builder(batch=b, **bkw)
            rng = np.random.default_rng(1)
            spec0 = next(iter(g_cal.inputs.values()))
            cal0 = rng.normal(size=spec0.shape).astype(np.float32)
            if len(g_cal.inputs) > 1:
                from feathercnn_tpu.utils.timing import default_extra_inputs
                cal = [{next(iter(g_cal.inputs)): cal0,
                        **default_extra_inputs(g_cal)}]
            else:
                cal = [cal0]
            calibrate(g_cal, cal, method="max",
                      config=EngineConfig(compute_dtype=args.dtype))
            g.meta.update({k: g_cal.meta[k]
                           for k in ("act_scales", "value_scales")})
        cfg = EngineConfig(compute_dtype=args.dtype,
                           backend="pallas", quant=args.quant,
                           algo_overrides=(("*", "xla"),))
        if args.variants:
            # A/B-ing a baked flag against its default would otherwise
            # compare identical engines: a variant value equal to the
            # dataclass default is indistinguishable from "unset" and the
            # bake would override it (config.apply_baked_overrides) —
            # measure both arms from the raw defaults instead.
            g.meta.pop("config_overrides", None)
        if variant and variant.startswith("algo:"):
            cfg = cfg.replace(
                algo_overrides=(("*", variant.split(":", 1)[1]),))
        elif variant and variant.startswith("no-"):
            cfg = cfg.replace(**{variant[3:]: False})
        elif variant:
            cfg = cfg.replace(**{variant: True})
            if variant == "fuse_chains":
                g.meta["chain_regions"] = {"*": True}
        from feathercnn_tpu.utils.timing import engine_loop
        eng = Engine(g, cfg)
        loop, params, xd = engine_loop(eng)
        float(loop(params, xd, jnp.int32(3)))   # compile
        key = (b, variant)
        loops[key] = (loop, params, xd)
        flops[key] = rootbench.graph_flops(eng.graph) * b
        print(f"compiled b{b} {variant or 'base'}",
              file=sys.stderr, flush=True)

    from feathercnn_tpu.utils.timing import slope_time
    results = {k: [] for k in configs}
    for r in range(args.rounds):
        for key in configs:
            b, variant = key
            loop, params, xd = loops[key]
            dt = slope_time(loop, params, xd, iters=args.iters)
            results[key].append(b / dt)
            print(f"round {r} b{b} {variant or 'base':12s}: "
                  f"{b/dt:,.0f} img/s", file=sys.stderr, flush=True)

    peak = rootbench.device_peak_flops(int8=(args.quant == "w8a8"))
    print(f"\n{args.model} {args.quant} medians over {args.rounds} rounds:")
    for key in configs:
        b, variant = key
        med = float(np.median(results[key]))
        frac = med * (flops[key] / b) / peak
        print(f"  b{b:4d} {variant or 'base':12s}: {med:10,.0f} img/s  "
              f"SoL {frac*100:5.1f}%  "
              f"(min {min(results[key]):,.0f} max {max(results[key]):,.0f})")


if __name__ == "__main__":
    main()
