"""Whole-model achievable-ceiling table via prefix-truncation differencing.

The per-layer tables from bench/roofline.py time each conv in ISOLATION,
which includes a per-layer activation quantize/dequantize that the whole
model amortizes into int8 edges — their sum (~12.8 ms for ResNet-50 int8
b128) exceeds the measured whole model (~5.5 ms), so they cannot bound
anything.  This tool measures what the VERDICT actually asks for: the
per-segment IN-CONTEXT time of the production executable.

Method: build the headline engine once, truncate its POST-PASS graph at
K cut points (prefixes of the optimized node list), and time every
prefix interleaved in ONE process (the tunnel drifts tens of percent
across minutes; interleaving hits all prefixes equally).  Prefix outputs
are the live frontier (every blob later nodes read), so XLA cannot
dead-code interior branches, and frontier blobs are materialized in the
full model too — segment time = T(prefix_k) - T(prefix_{k-1}) sums to
the whole model by construction.

Per segment the report carries a physics floor: sum over conv/FC nodes
of max(FLOPs/peak, bytes/HBM_bw) — non-MXU ops are EXCLUDED (XLA fuses
them into the convs; excluding them keeps the floor a true lower bound).
The achievable ceiling is then: whole-model time cannot beat
sum(segment floors), and each segment's measured-vs-floor gap is the
addressable headroom IF a better emitter exists at that shape (all
alternatives measured to date — Pallas per-op, region chains, winograd,
1x1-as-dot — lose in context; ROADMAP.md).

Usage: python bench/ceiling.py [--model resnet50] [--batch 128]
         [--granularity stage|layer] [--cuts blob1,blob2,...]
         [--rounds 3] [--out bench/results/ceiling_<model>.json]
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# v5e dense peaks (same constants as bench/roofline.py)
PEAK = {"bfloat16": 197e12, "float32": 98.5e12, "int8": 394e12}
HBM_BW = 819e9


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ----------------------------------------------------------------------
# graph truncation
# ----------------------------------------------------------------------

def frontier(graph, k):
    """Outputs of prefix nodes[:k] that are read by nodes[k:] or are graph
    outputs, plus the cut node's own outputs (ordered, deduped)."""
    later = set()
    for n in graph.nodes[k:]:
        later.update(n.inputs)
    later.update(graph.outputs)
    outs = []
    for n in graph.nodes[:k]:
        for o in n.outputs:
            if o in later and o not in outs:
                outs.append(o)
    for o in graph.nodes[k - 1].outputs:
        if o not in outs:
            outs.append(o)
    return outs


def truncate(graph, k):
    g = copy.copy(graph)
    g.nodes = list(graph.nodes[:k])
    g.outputs = frontier(graph, k)
    used = set()
    for n in g.nodes:
        used.update(n.params)
    g.params = {p: a for p, a in graph.params.items() if p in used}
    g.inputs = dict(graph.inputs)
    g.specs = {}
    g.meta = copy.deepcopy(graph.meta)
    return g


def auto_cuts(graph, granularity):
    """Stage granularity: after every Pooling + before every stride>1 conv
    (stage boundaries in every zoo family).  Layer granularity: after
    every Convolution/InnerProduct."""
    cuts = set()
    for i, n in enumerate(graph.nodes):
        if granularity == "layer":
            if n.op in ("Convolution", "InnerProduct"):
                cuts.add(i + 1)
        else:
            if n.op == "Pooling":
                cuts.add(i + 1)
            stride = max(n.attrs.get("stride", 1),
                         n.attrs.get("stride_h", 1),
                         n.attrs.get("stride_w", 1))
            if n.op == "Convolution" and stride > 1 and i > 0:
                cuts.add(i)
    cuts.add(len(graph.nodes))
    return sorted(c for c in cuts if c > 0)


def cuts_from_blobs(graph, blobs):
    prod = {}
    for i, n in enumerate(graph.nodes):
        for o in n.outputs:
            prod[o] = i + 1
    ks = []
    for b in blobs:
        if b not in prod:
            raise SystemExit(f"--cuts: no node in the optimized graph "
                             f"produces {b!r} (fusion may have renamed it)")
        ks.append(prod[b])
    ks.append(len(graph.nodes))
    return sorted(set(ks))


# ----------------------------------------------------------------------
# physics floor
# ----------------------------------------------------------------------

def node_floor_s(graph, n, quant, peak, concat_floor=False):
    """Lower-bound seconds for one node.

    Conv/FC: max(FLOPs/peak, activation+weight bytes / HBM bw).
    Windowed / multi-operand ops whose traffic XLA cannot fuse away also
    get a memory floor: Pooling reads+writes its maps, Eltwise/Axpy read
    their extra operands (the add fuses into a conv epilogue but still
    reads the shortcut), ShuffleChannel/LRN are real relayouts.  Pure
    elementwise (ReLU/Scale/BN/...) and Concat (alias-able into slices)
    count zero so the floor stays a floor.

    ``concat_floor=True`` is the CORRECTED floor for concat-ladder
    families (DenseNet): on this backend every formulation that avoids
    materializing the running concat measured a loss (DUS ladders -41%;
    per-part matmul heads materialize equal-magnitude partial sums;
    Pallas heads pay the 1.2-2.8 ms custom-call boundary tax — ROADMAP
    r3/r4), so the concat's input read + output write are counted as
    mandatory bytes and the family's SoL is judged against physics it
    can actually reach.
    """
    from feathercnn_tpu.utils.summary import node_flops
    act_b = 1 if quant == "w8a8" else 2
    if n.op == "Concat" and concat_floor:
        b = (sum(graph.specs[i].size for i in n.inputs)
             + graph.specs[n.outputs[0]].size) * act_b
        return b / HBM_BW, 0.0
    if n.op == "Pooling":
        b = (graph.specs[n.inputs[0]].size
             + graph.specs[n.outputs[0]].size) * act_b
        return b / HBM_BW, 0.0
    if n.op in ("Eltwise", "Axpy"):
        extra = sum(graph.specs[i].size for i in n.inputs[1:]) * act_b
        return extra / HBM_BW, 0.0
    if n.op in ("ShuffleChannel", "LRN"):
        b = (graph.specs[n.inputs[0]].size
             + graph.specs[n.outputs[0]].size) * act_b
        return b / HBM_BW, 0.0
    if n.op == "Interp":
        # A resize must materialize its output (and read its input): the
        # PSPNet/DeepLab zoom-x8 heads write hundreds of MB — mandatory
        # traffic the FLOP-only floor was silently omitting.
        b = (graph.specs[n.inputs[0]].size
             + graph.specs[n.outputs[0]].size) * act_b
        return b / HBM_BW, 0.0
    fl = node_flops(graph, n)
    if fl <= 0:
        return 0.0, 0.0
    batch = graph.specs[n.outputs[0]].shape[0]
    fl *= batch
    w_b = 1 if quant else 2
    in_spec = graph.specs[n.inputs[0]]
    out_spec = graph.specs[n.outputs[0]]
    wbytes = sum(graph.params[p].size * w_b for p in n.params[:1])
    in_b = act_b
    qinfo = (graph.meta.get("quant") or {}).get(n.name) or {}
    if "input_scale" in qinfo and n.inputs[0] in graph.inputs:
        # fp-activation stem (the measured-best config for every
        # C_in<=8 stem): the graph input it reads is f32 — any
        # algorithm must move those 4 bytes/elem, so the floor must too.
        in_b = 4
    bytes_moved = in_spec.size * in_b + out_spec.size * act_b + wbytes
    return max(fl / peak, bytes_moved / HBM_BW), fl / peak


# ----------------------------------------------------------------------

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="resnet50")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--quant", default="w8a8")
    ap.add_argument("--granularity", default="stage",
                    choices=["stage", "layer"])
    ap.add_argument("--cuts", default=None,
                    help="explicit comma list of blob names to cut after")
    ap.add_argument("--max-cuts", type=int, default=14,
                    help="cap the number of prefixes (auto cuts are "
                         "thinned evenly, keeping the last) — each prefix "
                         "is a full XLA compile through the remote helper")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--concat-floor", action="store_true",
                    help="corrected floor: count Concat input-read + "
                         "output-write bytes as mandatory (concat-ladder "
                         "families where every avoidance formulation "
                         "measured a loss on this backend)")
    ap.add_argument("--bkw", default="{}",
                    help="JSON builder kwargs (e.g. bg_bias for the SSD "
                         "trained-score-profile floors)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.quant in ("none", "None"):
        args.quant = None

    import jax
    import jax.numpy as jnp

    from feathercnn_tpu import Engine, EngineConfig
    from feathercnn_tpu.models import MODEL_BUILDERS
    from feathercnn_tpu.quant import calibrate
    from feathercnn_tpu.utils.cache import enable_persistent_cache
    from feathercnn_tpu.utils.timing import engine_loop, slope_time
    enable_persistent_cache()
    log(f"devices: {jax.devices()}")

    import inspect
    builder = MODEL_BUILDERS[args.model]
    bkw = dict(json.loads(args.bkw))
    if "with_softmax" in inspect.signature(builder).parameters:
        bkw["with_softmax"] = False
    g = builder(batch=args.batch, **bkw)
    if args.quant == "w8a8":
        try:
            g_cal = builder(batch=8, **bkw)
        except ValueError as e:   # batch-1-only models (Faster R-CNN)
            if "batch 1" not in str(e):
                raise
            g_cal = builder(batch=args.batch, **bkw)
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
    cfg = EngineConfig(compute_dtype=args.dtype, backend="pallas",
                       quant=args.quant, algo_overrides=(("*", "xla"),))
    eng = Engine(g, cfg)   # the headline engine; its graph is post-pass
    cfg = eng.config       # after baked per-model overrides

    if args.cuts:
        ks = cuts_from_blobs(eng.graph, args.cuts.split(","))
    else:
        ks = auto_cuts(eng.graph, args.granularity)
        if args.max_cuts and len(ks) > args.max_cuts:
            idx = np.linspace(0, len(ks) - 1, args.max_cuts)
            ks = sorted({ks[int(round(i))] for i in idx} | {ks[-1]})
            log(f"thinned to {len(ks)} cuts (--max-cuts {args.max_cuts})")
    log(f"{len(ks)} cuts: " + ", ".join(
        eng.graph.nodes[k - 1].name for k in ks))

    peak = PEAK["int8" if args.quant == "w8a8" else args.dtype]
    x = np.random.default_rng(0).normal(
        size=next(iter(eng.graph.inputs.values())).shape).astype(np.float32)

    loops = {}
    for k in ks:
        gk = truncate(eng.graph, k)
        ek = Engine.from_optimized(gk, cfg)
        loop, params, xd = engine_loop(ek, x=x, reduce_all=True)
        t0 = time.time()
        float(loop(params, xd, jnp.int32(3)))
        log(f"compiled prefix @{eng.graph.nodes[k-1].name} "
            f"({k} nodes, {len(gk.outputs)} outs) in {time.time()-t0:.1f}s")
        loops[k] = (loop, params, xd)

    # estimate per-prefix time to size iters (>=80 ms slope delta)
    iters = {}
    for k in ks:
        loop, params, xd = loops[k]
        t = slope_time(loop, params, xd, iters=10)
        iters[k] = int(np.clip(0.08 / max(t, 1e-6), 10, 3000))
    # interleaved rounds
    samples = {k: [] for k in ks}
    for r in range(args.rounds):
        for k in ks:
            loop, params, xd = loops[k]
            dt = slope_time(loop, params, xd, iters=iters[k])
            samples[k].append(dt)
            log(f"round {r} @{eng.graph.nodes[k-1].name:30s}: "
                f"{dt*1e3:8.3f} ms")
    t_med = {k: float(np.median(samples[k])) for k in ks}

    rows = []
    prev_k, prev_t = 0, 0.0
    for k in ks:
        seg_nodes = eng.graph.nodes[prev_k:k]
        floor = comp = gf = 0.0
        nconv = 0
        for n in seg_nodes:
            f, c = node_floor_s(eng.graph, n, args.quant, peak,
                                concat_floor=args.concat_floor)
            floor += f
            comp += c
            if c > 0:
                nconv += 1
                from feathercnn_tpu.utils.summary import node_flops
                gf += node_flops(eng.graph, n) * args.batch / 1e9
        seg_ms = (t_med[k] - prev_t) * 1e3
        rows.append({
            "cut": eng.graph.nodes[k - 1].name,
            "nodes": [seg_nodes[0].name, seg_nodes[-1].name],
            "n_convs": nconv,
            "gflops": round(gf, 1),
            "floor_ms": round(floor * 1e3, 3),
            "compute_ms": round(comp * 1e3, 3),
            "prefix_ms": round(t_med[k] * 1e3, 3),
            "segment_ms": round(seg_ms, 3),
            "seg_sol": round(floor * 1e3 / seg_ms, 3) if seg_ms > 0 else None,
        })
        prev_k, prev_t = k, t_med[k]

    total_ms = t_med[ks[-1]] * 1e3
    floor_ms = sum(r["floor_ms"] for r in rows)
    compute_ms = sum(r["compute_ms"] for r in rows)
    out = {
        "model": args.model, "batch": args.batch, "quant": args.quant,
        "whole_model_ms": round(total_ms, 3),
        "images_per_s": round(args.batch / (total_ms / 1e3), 1),
        "physics_floor_ms": round(floor_ms, 3),
        "compute_only_ms": round(compute_ms, 3),
        "ceiling_images_per_s": round(args.batch / (floor_ms / 1e3), 1),
        "sol_vs_compute": round(compute_ms / total_ms, 3),
        "sol_vs_physics": round(floor_ms / total_ms, 3),
        "iters": iters, "rounds": args.rounds,
        "concat_floor": bool(args.concat_floor),
        "segments": rows,
    }
    log(f"\n{args.model} b{args.batch} {args.quant}: whole={total_ms:.2f} ms "
        f"({out['images_per_s']:,} img/s)  physics floor={floor_ms:.2f} ms "
        f"({out['ceiling_images_per_s']:,} img/s)  "
        f"SoL vs physics={out['sol_vs_physics']*100:.0f}% "
        f"vs compute={out['sol_vs_compute']*100:.0f}%")
    for r in rows:
        log(f"  {r['cut']:30s} {r['segment_ms']:8.3f} ms  "
            f"floor {r['floor_ms']:7.3f}  "
            f"SoL {100*(r['seg_sol'] or 0):5.1f}%  "
            f"({r['n_convs']} convs, {r['gflops']:.0f} GF)")
    path = args.out or os.path.join(
        os.path.dirname(__file__), "results",
        f"ceiling_{args.model}_{args.quant or args.dtype}"
        f"_b{args.batch}_{args.granularity}"
        f"{'_cfloor' if args.concat_floor else ''}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"model": args.model,
                      "whole_model_ms": out["whole_model_ms"],
                      "sol_vs_physics": out["sol_vs_physics"],
                      "out": path}))


if __name__ == "__main__":
    main()
