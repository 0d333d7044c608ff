"""In-context SSD head decomposition: paired slope timings of the SAME
engine graph truncated at three depths (one process, interleaved):

  body   outputs = mbox_loc / mbox_conf_flatten / mbox_priorbox
         (everything except DetectionOutput)
  full   the deploy graph (detection_out)

full - body = the true in-context cost of DetectionOutput alone
(decode + per-class topk/gather/NMS + keep_top_k), with the branch
convs/permutes/softmax attributed to the body where they belong — the
ceiling table's 5.7 ms "detection_out segment" lumps them together.

Usage: python bench/ssd_head_ab.py [--model mobilenet_ssd] [--batch 128]
       [--config '{"nms_blocked": true}']
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
    ap.add_argument("--config", default="{}",
                    help="JSON EngineConfig overrides applied to BOTH")
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
                       backend="pallas",
                       algo_overrides=(("*", "xla"),))
    for k, v in json.loads(args.config).items():
        cfg = cfg.replace(**{k: v})

    import feathercnn_tpu.kernels.nms as knms
    real_nms = knms.greedy_nms
    real_bitpack = knms.greedy_nms_bitpack

    def no_nms(boxes, valid, thresh, plus_one=0.0, block=0, scores=None):
        return valid                    # timing-only: keep everything

    pre_nms = ["mbox_loc", "mbox_conf_flatten", "mbox_priorbox"]
    variants = {}
    for name, outs in (("body", pre_nms), ("nonms", None),
                       ("full", None)):
        g = copy.deepcopy(g0)
        if outs is not None:
            g.outputs = list(outs)
        knms.greedy_nms = no_nms if name == "nonms" else real_nms
        knms.greedy_nms_bitpack = (no_nms if name == "nonms"
                                   else real_bitpack)
        eng = Engine(g, cfg)
        loop, params, xd = engine_loop(eng, reduce_all=True)
        float(loop(params, xd, jnp.int32(3)))
        variants[name] = (loop, params, xd)
        print(f"compiled {name}", file=sys.stderr, flush=True)
    knms.greedy_nms = real_nms
    knms.greedy_nms_bitpack = real_bitpack

    times = {k: [] for k in variants}
    for _ in range(args.rounds):
        for k, (loop, params, xd) in variants.items():
            times[k].append(slope_time(loop, params, xd,
                                       iters=args.iters))
    med = {k: float(np.median(v) * 1e3) for k, v in times.items()}
    print(json.dumps({"model": args.model, "batch": args.batch,
                      "config": json.loads(args.config),
                      "body_ms": round(med["body"], 3),
                      "nonms_ms": round(med["nonms"], 3),
                      "full_ms": round(med["full"], 3),
                      "detection_out_ms": round(med["full"]
                                                - med["body"], 3),
                      "nms_ms": round(med["full"] - med["nonms"], 3),
                      "topk_gather_keep_ms": round(med["nonms"]
                                                   - med["body"], 3)}))


if __name__ == "__main__":
    main()
