"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline: ResNet-50 images/sec/chip (the BASELINE.json north-star config),
with ``vs_baseline`` = fraction of the chip's roofline images/s computed
from the model's actual conv/FC FLOPs and the device's peak — the
"speed-of-light fraction" BASELINE.json:5 requires (target >= 0.90).

Extra per-model details go to stderr; stdout carries exactly one JSON line.
Usage: python bench.py [--model resnet50] [--batch N] [--dtype bfloat16]
                       [--backend xla|pallas] [--quant w8|w8a8] [--all]
"""

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# Peak TFLOP/s per chip by device kind (dense).  bf16 / int8.
_PEAKS = {
    # TPU v5 lite (v5e): 197 bf16 TFLOPs, 394 int8 TOPS
    "v5 lite": (197e12, 394e12),
    "v5litepod": (197e12, 394e12),
    "v5e": (197e12, 394e12),
    # TPU v5p: 459 bf16, 918 int8
    "v5p": (459e12, 918e12),
    # TPU v4
    "v4": (275e12, 275e12),
    # fallback: CPU or unknown — use 1 TFLOP so the fraction is tiny but defined
    "cpu": (1e12, 1e12),
}


def device_peak_flops(int8: bool) -> float:
    import jax
    kind = jax.devices()[0].device_kind.lower()
    for key, (bf16_peak, int8_peak) in _PEAKS.items():
        if key in kind:
            return int8_peak if int8 else bf16_peak
    return _PEAKS["cpu"][1 if int8 else 0]


def graph_flops(graph) -> float:
    """MAC*2 FLOPs of all conv/FC nodes (the MXU work), per image
    (batch handled by caller).  Single source of truth:
    feathercnn_tpu.utils.summary.node_flops."""
    from feathercnn_tpu.utils.summary import node_flops
    return sum(node_flops(graph, n) for n in graph.nodes)


# Best batch per model, measured paired on v5e (BASELINE.md table).
BEST_BATCH = {
    "squeezenet_v11": 128, "squeezenet_v10": 128, "vgg19": 128,
    "densenet169": 128, "densenet201": 96, "mobilenet_v1": 256, "vgg16": 128,
    "resnet50": 128, "resnet101": 128, "resnet152": 96,
    "googlenet": 256, "densenet121": 128, "resnext50": 128,
    "alexnet": 256,
    # FCN's pad-100 VGG backbone makes 422x422 maps — keep batch small
    "fcn32s": 16, "fcn16s": 16, "fcn8s": 16,
    # DeepLab holds 321x321 maps at stride 8 through conv4/5 — small batch
    "deeplab_largefov": 16,
    # PSPNet-50 at 473x473: ~0.5 TFLOP/img dilated backbone
    "pspnet50": 4,
    # SSD detectors at 300x300 (DetectionOutput NMS included in the
    # loop); paired sweeps: mobilenet_ssd b128 > b256 > b64, vgg16_ssd300
    # flat 16-64 (compute-bound) — take b16 for latency
    "mobilenet_ssd": 128, "vgg16_ssd300": 16,
    # 2026-08-19 additions (paired sweeps, BASELINE.md)
    "mobilenet_v2": 128, "shufflenet_v1": 128, "shufflenet_v2": 128,
    "se_resnet50": 96,
    "inception_v3": 128,
    # two-stage detection runs batch 1 (the reference deploy)
    "faster_rcnn_vgg16": 1, "rfcn_resnet101": 1,
}


def bench_model(name: str, batch: int, dtype: str, backend: str,
                quant, iters: int = 30, warmup: int = 5, algo=None,
                fuse_chains: bool = False, input_int8: bool = False):
    """Times `iters` forward passes *inside one jitted device loop*.

    Two quirks of the axon-tunnel TPU make naive host-side loops lie:
    ``block_until_ready`` returns without waiting, and each dispatch costs
    ~1.5 ms of RPC.  So the timed region is a single ``lax.fori_loop``
    whose body runs the forward on an iteration-perturbed input (defeats
    LICM/CSE) and accumulates one output scalar; the final ``float(...)``
    fetch is the only true synchronization point.
    """
    import functools

    import jax
    import jax.numpy as jnp
    from feathercnn_tpu import Engine, EngineConfig
    from feathercnn_tpu.models import MODEL_BUILDERS

    import inspect

    builder = MODEL_BUILDERS[name]
    kw = {}
    if "with_softmax" in inspect.signature(builder).parameters:
        kw["with_softmax"] = False   # classifier argmax is scale-invariant
    g = builder(batch=batch, **kw)
    if fuse_chains and "chain_regions" not in g.meta:
        # zoo graphs carry no autotuned region table; --fuse-chains is a
        # measurement flag, so fuse everything eligible (the measured
        # default policy would otherwise make this a silent no-op)
        g.meta["chain_regions"] = {"*": True}
        log("--fuse-chains: no region table; fusing all eligible "
            "signatures (measured slower on v5e, see BASELINE.md)")
    if quant == "w8a8":
        # Calibrate on a small-batch twin graph (same seed -> same weights;
        # scales are batch-independent) so we don't compile the big batch
        # twice.
        from feathercnn_tpu.quant import calibrate
        try:
            g_cal = builder(batch=8, **kw)
        except ValueError as e:  # batch-1-only models (Faster R-CNN)
            if "batch 1" not in str(e):
                raise
            g_cal = builder(batch=batch, **kw)
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
                  config=EngineConfig(compute_dtype=dtype))
        g.meta.update({k: g_cal.meta[k]
                       for k in ("act_scales", "value_scales")})
    cfg = EngineConfig(compute_dtype=dtype, backend=backend, quant=quant,
                       algo_overrides=((("*", algo),) if algo else ()),
                       fuse_chains=fuse_chains)
    eng = Engine(g, cfg)
    spec = next(iter(g.inputs.values()))
    x = np.random.default_rng(0).normal(size=spec.shape).astype(np.float32)

    # --input-int8: serving feeds pre-quantized tensors (the reference's
    # pipeline hands uint8-derived data to Forward); quantize once
    # OUTSIDE the timed loop.  The in-graph path accepts int8 directly
    # (dispatch._quantize_act passes through).
    if input_int8 and quant == "w8a8":
        qm = eng.graph.meta.get("quant", {})
        first_conv = next(n for n in eng.graph.nodes
                          if n.op == "Convolution")
        info = qm.get(first_conv.name, {})
        xs = info.get("x_scale") or info.get("input_scale")
        if xs:
            x = np.clip(np.round(x / xs), -127, 127).astype(np.int8)

    from feathercnn_tpu.utils.timing import engine_loop, slope_time
    loop, params, xd = engine_loop(eng, x=x)
    t0 = time.time()
    float(loop(params, xd, jnp.int32(warmup)))  # compile+warmup, fetch-synced
    compile_s = time.time() - t0

    # Slope timing (utils/timing.py): T(long)-T(short) cancels the
    # tunnel's ~30-50 ms constant dispatch+fetch cost; the tunnel also
    # drifts over minutes, so take the median of three slope pairs.
    dts = [slope_time(loop, params, xd, warm=warmup, iters=iters)
           for _ in range(3)]
    dt = float(np.median(dts))

    imgs_per_s = batch / dt
    flops = graph_flops(eng.graph) * batch
    achieved = flops / dt
    peak = device_peak_flops(int8=(quant == "w8a8"))
    roofline_imgs = peak / (flops / batch)
    return {
        "model": name,
        "batch": batch,
        "ms_per_batch": dt * 1e3,
        "images_per_s": imgs_per_s,
        "compile_s": compile_s,
        "achieved_tflops": achieved / 1e12,
        "roofline_fraction": achieved / peak,
        "roofline_images_per_s": roofline_imgs,
    }


def main():
    ap = argparse.ArgumentParser()
    # Defaults = the headline BASELINE.json config: ResNet-50 full-INT8,
    # batch sized to saturate the chip, XLA int8 convs + int8 edges
    # (measured fastest; see BASELINE.md history).
    ap.add_argument("--model", default="resnet50")
    ap.add_argument("--batch", type=int, default=None,
                    help="explicit batch (default: the model's measured "
                         "best, BEST_BATCH; 128 for unknown models)")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--quant", default="w8a8",
                    help="None|w8|w8a8 (pass 'none' for fp)")
    ap.add_argument("--algo", default="xla",
                    help="force one conv algo for every layer "
                         "(xla|gemm1x1|implicit); 'none' = dispatcher picks")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--fuse-chains", action="store_true",
                    help="fuse bottleneck chains into single Pallas "
                         "kernels (kernels/fused_chain.py)")
    ap.add_argument("--input-int8", action="store_true",
                    help="feed a pre-quantized int8 input tensor "
                         "(serving-style; w8a8 only)")
    ap.add_argument("--all", action="store_true",
                    help="bench every zoo model (details to stderr)")
    args = ap.parse_args()
    if args.quant in ("none", "None"):
        args.quant = None
    if args.algo in ("none", "None"):
        args.algo = None

    import jax
    from feathercnn_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    log(f"devices: {jax.devices()}")

    if args.all:
        from feathercnn_tpu.models import MODEL_BUILDERS
        for name in MODEL_BUILDERS:
            try:
                b = args.batch or BEST_BATCH.get(name, 128)
                r = bench_model(name, b, args.dtype, args.backend,
                                args.quant, iters=args.iters)
                log(f"{name:16s} batch={r['batch']:3d} "
                    f"{r['ms_per_batch']:8.2f} ms  "
                    f"{r['images_per_s']:9.1f} img/s  "
                    f"{r['achieved_tflops']:6.1f} TF/s  "
                    f"SoL {r['roofline_fraction']*100:5.1f}%")
            except Exception as e:
                log(f"{name:16s} FAILED: {type(e).__name__}: {e}")

    batch = args.batch or BEST_BATCH.get(args.model, 128)
    r = bench_model(args.model, batch, args.dtype, args.backend,
                    args.quant, iters=args.iters, algo=args.algo,
                    fuse_chains=args.fuse_chains,
                    input_int8=args.input_int8)
    log(json.dumps(r, indent=2))
    print(json.dumps({
        "metric": f"{args.model} {'int8' if args.quant == 'w8a8' else args.dtype} images/sec/chip",
        "value": round(r["images_per_s"], 1),
        "unit": "images/s",
        "vs_baseline": round(r["roofline_fraction"], 4),
    }))


if __name__ == "__main__":
    main()
