"""Decompose the SSD DetectionOutput head on-device (ROADMAP r4).

The ceiling sweep attributes 5.6/6.0 ms (MobileNet-SSD / VGG16-SSD300
b128) to the detection_out segment at 1-2% SoL; the blocked-NMS rewrite
measured ~0% whole-model, so this probe times the head's pieces in
isolation at deploy shapes to find where the milliseconds actually sit:

  topk     per-class approx_max_k over (C', P)
  gather   one-hot box gather (C', K, P) @ (P, 4)
  decode   CENTER_SIZE decode of all P priors
  nms_fix  per-class fixpoint NMS on (C', K)
  nms_blk  per-class blocked NMS on (C', K)
  keep     final cross-class approx_max_k + row assembly
  full     the whole per_image vmapped head

Usage: python bench/det_head_probe.py [--model mobilenet_ssd]
       [--batch 128] [--block 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="mobilenet_ssd")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--block", type=int, default=128)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from feathercnn_tpu.kernels.nms import (greedy_nms_blocked,
                                            greedy_nms_fixpoint)
    from feathercnn_tpu.utils.cache import enable_persistent_cache
    from feathercnn_tpu.utils.timing import device_bench
    enable_persistent_cache()

    shapes = {"mobilenet_ssd": (1917, 21), "vgg16_ssd300": (8732, 21)}
    P_, C = shapes[args.model]
    N = args.batch
    Cp = C - 1                      # classes minus background
    K = min(400, P_)
    keep_top_k = 100 if args.model == "mobilenet_ssd" else 200
    conf_thresh, nms_thresh = 0.01, 0.45

    rng = np.random.default_rng(0)
    conf = jnp.asarray(rng.uniform(0, 1, (N, P_, C)).astype(np.float32))
    loc = jnp.asarray(rng.normal(scale=0.3, size=(N, P_, 4))
                      .astype(np.float32))
    pcx = rng.uniform(0.1, 0.9, P_)
    pcy = rng.uniform(0.1, 0.9, P_)
    pw = rng.uniform(0.05, 0.3, P_)
    ph = rng.uniform(0.05, 0.3, P_)
    pbox = jnp.asarray(np.stack([pcx - pw / 2, pcy - ph / 2,
                                 pcx + pw / 2, pcy + ph / 2], -1)
                       .astype(np.float32))
    pvar = jnp.asarray(np.tile(np.asarray([0.1, 0.1, 0.2, 0.2],
                                          np.float32), (P_, 1)))

    pw_ = pbox[:, 2] - pbox[:, 0]
    ph_ = pbox[:, 3] - pbox[:, 1]
    pcx_ = (pbox[:, 0] + pbox[:, 2]) * 0.5
    pcy_ = (pbox[:, 1] + pbox[:, 3]) * 0.5

    def decode(l):
        cx = pvar[:, 0] * l[:, 0] * pw_ + pcx_
        cy = pvar[:, 1] * l[:, 1] * ph_ + pcy_
        w = jnp.exp(pvar[:, 2] * l[:, 2]) * pw_
        h = jnp.exp(pvar[:, 3] * l[:, 3]) * ph_
        return jnp.stack([cx - w / 2, cy - h / 2,
                          cx + w / 2, cy + h / 2], axis=-1)

    def stage_topk(conf_i, loc_i):
        sc, idx = jax.lax.approx_max_k(conf_i[:, 1:].T, K,
                                       recall_target=1.0)
        return sc, idx

    def stage_gather(conf_i, loc_i):
        sc, idx = stage_topk(conf_i, loc_i)
        oh = jax.nn.one_hot(idx, P_, dtype=jnp.float32)
        boxes = decode(loc_i)
        bx = jnp.dot(oh.reshape(-1, P_), boxes,
                     precision=jax.lax.Precision.HIGHEST) \
            .reshape(sc.shape + (4,))
        return sc, bx

    def stage_nms(conf_i, loc_i, which):
        sc, bx = stage_gather(conf_i, loc_i)
        if which == "fix":
            keep = greedy_nms_fixpoint(bx, sc > conf_thresh, nms_thresh)
        else:
            keep = greedy_nms_blocked(bx, sc > conf_thresh, nms_thresh,
                                      block=args.block)
        return sc, bx, keep

    def stage_keep(conf_i, loc_i, which="fix"):
        sc, bx, keep = stage_nms(conf_i, loc_i, which)
        sc = jnp.where(keep, sc, -1.0)
        lb = jnp.broadcast_to(
            jnp.arange(1, C, dtype=jnp.float32)[:, None], sc.shape)
        sc = sc.reshape(-1)
        bx = bx.reshape(-1, 4)
        lb = lb.reshape(-1)
        top, ti = jax.lax.approx_max_k(sc, min(keep_top_k, sc.shape[0]),
                                       recall_target=1.0)
        good = top > 0
        row = jnp.concatenate([
            jnp.where(good, lb[ti], -1.0)[:, None],
            jnp.where(good, top, 0.0)[:, None],
            jnp.where(good[:, None], bx[ti], 0.0)], axis=-1)
        return row

    def bench(label, fn):
        t = device_bench(fn, [conf, loc], iters=args.iters)
        print(json.dumps({"stage": label,
                          "ms": round(t * 1e3, 3)}), flush=True)
        return t

    v = jax.vmap
    bench("decode", lambda c, l: v(decode)(l))
    bench("topk", lambda c, l: v(stage_topk)(c, l)[0])
    bench("gather", lambda c, l: v(stage_gather)(c, l)[1])
    bench("nms_fix", lambda c, l: v(
        lambda ci, li: stage_nms(ci, li, "fix")[2])(c, l))
    bench("nms_blk", lambda c, l: v(
        lambda ci, li: stage_nms(ci, li, "blk")[2])(c, l))
    bench("full_fix", lambda c, l: v(
        lambda ci, li: stage_keep(ci, li, "fix"))(c, l))
    bench("full_blk", lambda c, l: v(
        lambda ci, li: stage_keep(ci, li, "blk"))(c, l))


if __name__ == "__main__":
    main()
