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


def tune_regions(graph, dtype: str, quant, iters: int = 15):
    """Region-level autotune: for every fusable bottleneck-chain
    signature in the model, measure the fused chain kernel against the
    per-layer XLA path on the device and record the winner in
    ``meta['chain_regions']`` (consumed by passes_fusion; the default
    policy is the measured-once heuristic
    kernels/fused_chain.region_worth_fusing)."""
    import copy

    import jax
    import jax.numpy as jnp
    import numpy as np

    from feathercnn_tpu.config import EngineConfig
    from feathercnn_tpu.ir import infer_shapes
    from feathercnn_tpu.kernels.fused_chain import fused_chain
    from feathercnn_tpu.passes import optimize
    from feathercnn_tpu.passes_fusion import fuse_bottlenecks, fuse_chains
    from feathercnn_tpu.quant.rewrite import quantize_graph
    from feathercnn_tpu.utils.cache import enable_persistent_cache
    from feathercnn_tpu.utils.timing import device_bench
    enable_persistent_cache()

    g = copy.deepcopy(graph)
    optimize(g)
    if quant:
        quantize_graph(g, quant)
    infer_shapes(g)
    g.meta.setdefault("chain_regions", {})["*"] = True  # force candidates
    item = jnp.dtype(dtype).itemsize
    fuse_bottlenecks(g, act_itemsize=item)
    fuse_chains(g, act_itemsize=item)
    infer_shapes(g)

    rng = np.random.default_rng(0)
    decisions = {}
    for n in g.nodes:
        if n.op not in ("FusedChain", "FusedBottleneck"):
            continue
        _, H, W, C = g.specs[n.inputs[0]].shape
        w2 = g.params[n.params[2]]
        Cm = w2.shape[-1]
        nb = n.attrs.get("nb", 1)
        key = f"{H}x{W}x{C}x{Cm}"
        if key in decisions:
            continue
        int8 = w2.dtype == np.int8
        s = 0.02
        if int8:
            x = jnp.asarray(rng.integers(-127, 128, size=(g.specs[
                n.inputs[0]].shape[0], H, W, C), dtype=np.int8))
        else:
            x = jnp.asarray(rng.normal(size=g.specs[n.inputs[0]].shape),
                            jnp.dtype(dtype))
        w1 = jnp.asarray(g.params[n.params[0]]).reshape(nb, C, Cm)
        w2j = jnp.asarray(w2).reshape(nb, 9 * Cm, Cm)
        w3 = jnp.asarray(g.params[n.params[4]]).reshape(nb, Cm, C)
        b1 = jnp.asarray(g.params[n.params[1]], jnp.float32).reshape(nb, -1)
        b2 = jnp.asarray(g.params[n.params[3]], jnp.float32).reshape(nb, -1)
        b3 = jnp.asarray(g.params[n.params[5]], jnp.float32).reshape(nb, -1)
        kw = {}
        if int8:
            ones = lambda c: jnp.full((nb, c), 1e-3, jnp.float32)
            kw = dict(w_scales=(ones(Cm), ones(Cm), ones(C)),
                      scales=((s,) * nb, (s,) * nb, (s,) * nb, s))

        # Measure IN CONTEXT (producer conv -> region -> consumer
        # reduction): round 1 showed isolated custom-call timings flip
        # the verdict — the boundary relayout only shows up next to
        # real neighbours (BASELINE.md).
        win = jnp.asarray(rng.integers(-127, 128, size=(1, 1, C, C),
                                       dtype=np.int8) if int8 else
                          rng.normal(size=(1, 1, C, C)).astype(dtype))

        def prod(a):
            y = jax.lax.conv_general_dilated(
                a, win, (1, 1), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32 if int8 else jnp.float32)
            if int8:
                y = jnp.maximum(y.astype(jnp.float32) * (1e-3 * s), 0)
                return jnp.clip(jnp.round(y / s), -127,
                                127).astype(jnp.int8)
            return jnp.maximum(y, 0).astype(a.dtype)

        def cons(a):
            return a.astype(jnp.float32).sum()

        try:
            t_chain = device_bench(
                lambda a: cons(fused_chain(prod(a), w1, b1, w2j, b2, w3,
                                           b3, **kw)),
                [x], iters=iters)
        except Exception as e:
            print(f"{key}: chain FAILED ({type(e).__name__}) -> layers")
            decisions[key] = False
            continue

        if int8:
            from bench.ref_chains import xla_int8_bottlenecks
            ones = lambda c: np.full((nb, c), 1e-3, np.float32)

            def xla_path(a):
                # the SAME canonical reference body the micro-probes use
                return xla_int8_bottlenecks(
                    a, w1, w2j, w3, ones(Cm), ones(Cm), ones(C), s,
                    nb, C, Cm)
        else:
            def xla_path(a):
                cd = jnp.dtype(dtype)
                for j in range(nb):
                    x_in = a
                    y = a
                    for conv_i, (wj, bj, cout) in enumerate(
                            ((w1, b1, Cm), (w2j, b2, Cm), (w3, b3, C))):
                        if conv_i == 1:
                            wc = wj[j].reshape(3, 3, Cm, Cm)
                            pad = ((1, 1), (1, 1))
                        else:
                            cin = y.shape[-1]
                            wc = wj[j].reshape(1, 1, cin, cout)
                            pad = ((0, 0), (0, 0))
                        yf = jax.lax.conv_general_dilated(
                            y.astype(cd), wc.astype(cd), (1, 1), pad,
                            dimension_numbers=("NHWC", "HWIO", "NHWC"),
                            preferred_element_type=jnp.float32)
                        yf = yf + bj[j]
                        if conv_i < 2:
                            y = jnp.maximum(yf, 0.0).astype(cd)
                        else:
                            yf = yf + x_in.astype(jnp.float32)
                            a = jnp.maximum(yf, 0.0).astype(cd)
                return a

        t_xla = device_bench(lambda a: cons(xla_path(prod(a))), [x],
                             iters=iters)
        use_chain = t_chain < t_xla
        decisions[key] = bool(use_chain)
        print(f"{key} nb={nb}: chain {t_chain*1e3:.3f} ms vs layers "
              f"{t_xla*1e3:.3f} ms -> "
              f"{'chain' if use_chain else 'layers'}")
    return decisions


_TUNABLE_FLAGS = ("merge_siblings", "merge_concats", "int8_grouped",
                  "int8_requant_ops", "nms_blocked", "roipool_table",
                  "lrn_band", "shuffle_matmul", "concat_dus",
                  "fold_scale_chains", "topk_radix")

# Flags whose flip moves values onto different quant grids (not just a
# different schedule for the same arithmetic).  Under --flags these are
# additionally gated on NUMERICS: the flipped engine's cosine vs the
# fp32 oracle must not trail the baseline engine's by more than
# _NUMERIC_MARGIN, or the flip is rejected no matter how fast it is
# (ADVICE r3: a broken int8 path must not get auto-baked silently).
_NUMERIC_FLAGS = ("concat_dus", "int8_requant_ops", "int8_grouped",
                  "merge_concats", "fold_scale_chains")
_NUMERIC_MARGIN = 0.01


def tune_flags(graph, dtype: str, quant, rounds: int = 5, iters: int = 20,
               threshold: float = 0.01, interpret: bool = False):
    """Whole-model paired A/B of the boolean EngineConfig flags.

    Compiles the baseline config plus one engine per flipped flag, then
    interleaves slope timings round-robin (the tunnel drifts tens of
    percent across minutes — separate runs cannot rank configs,
    BASELINE.md).  A flag value lands in ``meta['config_overrides']``
    when flipping it beats the baseline by more than ``threshold``
    (median of per-round paired ratios).

    Caveat: each flip is measured against the all-defaults baseline, so
    flag INTERACTIONS are not explored (measured example: GoogLeNet's
    merge_siblings only hurts when int8_requant_ops is also on; with
    requant edges off — its baked config — the merge is neutral).  When
    several flags flip, apply the largest winner, re-run, repeat."""
    import copy

    import dataclasses as dc
    import jax.numpy as jnp
    import numpy as np

    from feathercnn_tpu import Engine, EngineConfig
    from feathercnn_tpu.utils.cache import enable_persistent_cache
    from feathercnn_tpu.utils.timing import engine_loop, slope_time
    enable_persistent_cache()

    defaults = {f.name: f.default for f in dc.fields(EngineConfig)}
    base_cfg = EngineConfig(compute_dtype=dtype, backend="pallas",
                            quant=quant, interpret=interpret,
                            algo_overrides=(("*", "xla"),))
    # flags that are structural no-ops on this graph would burn paired
    # rounds measuring noise — skip them
    ops = {n.op for n in graph.nodes}
    relevant = {"nms_blocked": {"Proposal", "DetectionOutput"},
                "roipool_table": {"ROIPooling"},
                "lrn_band": {"LRN"},
                "shuffle_matmul": {"ShuffleChannel"},
                "concat_dus": {"Concat"},
                "topk_radix": {"DetectionOutput"}}
    variants = [("base", base_cfg)]
    for flag in _TUNABLE_FLAGS:
        need = relevant.get(flag)
        if need is not None and not (ops & need):
            continue
        variants.append((flag, base_cfg.replace(
            **{flag: not defaults[flag]})))

    # Numerics gate (ADVICE r3): for grid-moving flags, compare each
    # engine's output against the fp32 oracle on one fixed input.  Only
    # meaningful for quantized single-input graphs without NMS heads
    # (post-NMS rows are chaotic under near-tied random-weight scores —
    # verify_tpu gates those models on pre-NMS tensors instead).
    gate_numerics = (quant is not None and len(graph.inputs) == 1
                     and not ({"Proposal", "DetectionOutput"} & ops))
    x_gate = None
    ref_out = None
    if gate_numerics:
        spec0 = next(iter(graph.inputs.values()))
        x_gate = np.random.default_rng(0).normal(
            size=spec0.shape).astype(np.float32)
        g0 = copy.deepcopy(graph)
        g0.meta.pop("config_overrides", None)
        ref_out = np.asarray(
            Engine(g0, EngineConfig(compute_dtype=dtype))(x_gate)).ravel()

    def _cos_vs_ref(eng):
        out = np.asarray(eng(x_gate)).ravel().astype(np.float64)
        r = ref_out.astype(np.float64)
        return float(r @ out / (np.linalg.norm(r) * np.linalg.norm(out)
                                + 1e-12))

    loops = {}
    cosines = {}
    for name, cfg in variants:
        g = copy.deepcopy(graph)
        g.meta.pop("config_overrides", None)   # measure from scratch
        eng = Engine(g, cfg)
        if gate_numerics and (name == "base" or name in _NUMERIC_FLAGS):
            cosines[name] = _cos_vs_ref(eng)
        loop, params, xd = engine_loop(eng)
        float(loop(params, xd, jnp.int32(3)))  # compile
        loops[name] = (loop, params, xd)
        print(f"compiled {name}"
              + (f" (cosine {cosines[name]:.5f})"
                 if name in cosines else ""),
              file=sys.stderr, flush=True)

    times = {name: [] for name, _ in variants}
    for r in range(rounds):
        for name, _ in variants:
            loop, params, xd = loops[name]
            times[name].append(slope_time(loop, params, xd, iters=iters))

    overrides = {}
    base_t = np.asarray(times["base"])
    for flag in _TUNABLE_FLAGS:
        if flag not in times:
            continue
        ratios = base_t / np.asarray(times[flag])  # >1: flipped wins
        gain = float(np.median(ratios)) - 1.0
        flipped = not defaults[flag]
        print(f"{flag}={flipped}: {gain*+100:+.1f}% vs default",
              file=sys.stderr, flush=True)
        if gain > threshold:
            if flag in cosines and \
                    cosines[flag] < cosines["base"] - _NUMERIC_MARGIN:
                print(f"{flag}={flipped}: REJECTED by numerics gate "
                      f"(cosine {cosines[flag]:.5f} vs base "
                      f"{cosines['base']:.5f})", file=sys.stderr,
                      flush=True)
                continue
            overrides[flag] = flipped
    return overrides


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="resnet50")
    ap.add_argument("--ftpu", default=None,
                    help="tune a converted model instead of a zoo model")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--quant", default=None)
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--regions", action="store_true",
                    help="also tune region fusion (chain vs per-layer "
                         "XLA per bottleneck signature)")
    ap.add_argument("--flags", action="store_true",
                    help="paired A/B of the boolean EngineConfig flags "
                         "(merge_siblings / int8_grouped / "
                         "int8_requant_ops); winners land in "
                         "meta['config_overrides']")
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
    if args.flags:
        if args.quant == "w8a8" and "act_scales" not in graph.meta:
            if args.ftpu:
                # a converted artifact must carry its own baked scales —
                # calibrating a random-weight zoo twin would rank flags
                # for a model that never runs that way
                print("warning: %s has no baked act_scales; layers "
                      "degrade to weight-only during the flag A/B — "
                      "calibrate and re-save the artifact first for a "
                      "representative measurement" % args.ftpu,
                      file=sys.stderr)
            else:
                import numpy as np
                from feathercnn_tpu.quant import calibrate
                g_cal = MODEL_BUILDERS[args.model](batch=8,
                                                   with_softmax=False)
                spec0 = next(iter(g_cal.inputs.values()))
                cal = [np.random.default_rng(1).normal(
                    size=spec0.shape).astype(np.float32)]
                calibrate(g_cal, cal, method="max",
                          config=EngineConfig(compute_dtype=args.dtype))
                graph.meta.update({k: g_cal.meta[k]
                                   for k in ("act_scales", "value_scales")})
        flag_overrides = tune_flags(graph, args.dtype, args.quant,
                                    iters=args.iters)
        print(f"\nflag decisions: {json.dumps(flag_overrides)}")
        graph.meta["config_overrides"] = flag_overrides
        if args.ftpu:
            from feathercnn_tpu.model_format import save_ftpu
            save_ftpu(graph, args.ftpu)
            print(f"baked config_overrides into {args.ftpu} meta")
        return
    if args.regions:
        regions = tune_regions(graph, args.dtype, args.quant, args.iters)
        print(f"\nregion decisions: {json.dumps(regions)}")
        graph.meta["chain_regions"] = regions
        if args.ftpu:
            from feathercnn_tpu.model_format import save_ftpu
            save_ftpu(graph, args.ftpu)
            print(f"baked chain_regions into {args.ftpu} meta")
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
