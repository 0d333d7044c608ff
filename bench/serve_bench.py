"""Serving throughput/latency benchmark — the BASELINE.json:11 config
(GoogLeNet, batched serving) measured through the full continuous-batching
path: client threads -> C++ ingest queue -> fixed-slot engine -> scatter.

Usage: python bench/serve_bench.py [--model googlenet] [--batch 64]
       [--clients 16] [--requests 512] [--quant w8a8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="googlenet")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--requests", type=int, default=512)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--quant", default=None)
    ap.add_argument("--timeout-us", type=int, default=3000)
    ap.add_argument("--pipeline-depth", type=int, default=2,
                    help="1 = synchronous serve loop (A/B the "
                         "dispatch/fetch double-buffering)")
    args = ap.parse_args()
    if args.quant in ("none", "None"):
        args.quant = None

    from feathercnn_tpu import Engine, EngineConfig
    from feathercnn_tpu.models import MODEL_BUILDERS
    from feathercnn_tpu.serve import InferenceServer

    import inspect
    builder = MODEL_BUILDERS[args.model]
    bkw = ({"with_softmax": False}
           if "with_softmax" in inspect.signature(builder).parameters
           else {})
    g = builder(batch=args.batch, **bkw)
    if args.quant == "w8a8":
        from feathercnn_tpu.quant import calibrate
        g_cal = builder(batch=4, **bkw)
        cal0 = np.random.default_rng(1).normal(
            size=(4,) + tuple(next(iter(g_cal.inputs.values())).shape[1:])
        ).astype(np.float32)
        if len(g_cal.inputs) > 1:     # two-stage models: im_info etc.
            from feathercnn_tpu.utils.timing import default_extra_inputs
            cal = [{next(iter(g_cal.inputs)): cal0,
                    **default_extra_inputs(g_cal)}]
        else:
            cal = [cal0]
        calibrate(g_cal, cal, method="max")
        g.meta.update({k: g_cal.meta[k]
                       for k in ("act_scales", "value_scales")})
    eng = Engine(g, EngineConfig(compute_dtype=args.dtype,
                                 quant=args.quant,
                                 algo_overrides=((("*", "xla"),)
                                                 if args.quant else ())))
    extra = {}
    if len(g.inputs) > 1:             # two-stage: fixed im_info etc.
        from feathercnn_tpu.utils.timing import default_extra_inputs
        extra = {k: np.asarray(v)[:args.batch] if np.asarray(v).ndim
                 else v for k, v in default_extra_inputs(g).items()}
    srv = InferenceServer(eng, batch_size=args.batch,
                          batch_timeout_us=args.timeout_us,
                          pipeline_depth=args.pipeline_depth,
                          extra_inputs=extra or None)
    print("compiling fixed batch slot...", file=sys.stderr)
    srv.start()

    spec = next(iter(g.inputs.values()))
    img_shape = tuple(spec.shape[1:])
    rng = np.random.default_rng(0)
    img = rng.normal(size=img_shape).astype(np.float32)

    latencies = []
    lat_lock = threading.Lock()
    per_client = args.requests // args.clients

    def client():
        for _ in range(per_client):
            t0 = time.time()
            out = srv.infer(img, timeout_s=120)
            dt = time.time() - t0
            assert out is not None
            with lat_lock:
                latencies.append(dt)

    # warmup
    srv.infer(img, timeout_s=300)

    t0 = time.time()
    threads = [threading.Thread(target=client) for _ in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0

    n = len(latencies)
    lat = np.asarray(sorted(latencies))
    result = {
        "model": args.model,
        "quant": args.quant,
        "batch_slot": args.batch,
        "pipeline_depth": args.pipeline_depth,
        "clients": args.clients,
        "requests": n,
        "throughput_img_s": round(n / wall, 1),
        "p50_ms": round(float(lat[n // 2]) * 1e3, 2),
        "p99_ms": round(float(lat[int(n * 0.99)]) * 1e3, 2),
        "gauges": {k: v for k, v in srv.gauges().items()
                   if k != "batch_latency_ms_sum"},
    }
    srv.stop()
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
