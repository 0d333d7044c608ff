"""Ablate DetectionOutput's stages IN ISOLATION but on REAL body
outputs (bf16, deploy shapes), after bench/ssd_head_ab.py showed the
in-context head = 5.4 ms of which NMS is only 0.6 ms.

Stages mirror ops/lowering._lower_detection_output exactly (drift risk
accepted for a probe; the production A/B gate stays ssd_head_ab.py):

  all        the full head (should reproduce ~detection_out_ms)
  notopk     per-class approx_max_k -> static first-K slice
  nogather   one-hot box-gather matmul -> broadcast boxes[:K]
  nonms      greedy NMS -> keep = valid
  nokeep     final cross-class approx_max_k + row gather -> first rows

Usage: python bench/det_head_ablate.py [--model mobilenet_ssd]
       [--batch 128]
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
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--quant", default="w8a8")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--block", type=int, default=128)
    ap.add_argument("--live", action="store_true",
                    help="feed the head from the LIVE body forward "
                         "inside the same jit (reproduces in-graph "
                         "fusion/layout) instead of materialized arrays")
    args = ap.parse_args()

    import copy

    import jax
    import jax.numpy as jnp

    from feathercnn_tpu import Engine, EngineConfig
    from feathercnn_tpu.kernels.nms import greedy_nms
    from feathercnn_tpu.models import MODEL_BUILDERS
    from feathercnn_tpu.quant import calibrate
    from feathercnn_tpu.utils.cache import enable_persistent_cache
    from feathercnn_tpu.utils.timing import device_bench
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
                       backend="pallas", algo_overrides=(("*", "xla"),))

    det = next(n for n in g0.nodes if n.op == "DetectionOutput")
    a = det.attrs
    num_classes = int(a["num_classes"])
    bg = int(a.get("background_label_id", 0))
    conf_thresh = float(a.get("confidence_threshold", 0.01))
    nms_thresh = float(a.get("nms_threshold", 0.45))
    nms_top_k = int(a.get("nms_top_k", 400))
    keep_top_k = int(a.get("keep_top_k", 200))

    g = copy.deepcopy(g0)
    g.outputs = ["mbox_loc", "mbox_conf_flatten", "mbox_priorbox"]
    eng = Engine(g, cfg)
    rng = np.random.default_rng(0)
    spec0 = next(iter(g.inputs.values()))
    x = rng.normal(size=spec0.shape).astype(np.float32)
    outs = eng.run(x)
    loc = jnp.asarray(outs["mbox_loc"])
    conf = jnp.asarray(outs["mbox_conf_flatten"])
    priors = jnp.asarray(outs["mbox_priorbox"])
    print(f"body outputs: loc {loc.shape} {loc.dtype}, conf "
          f"{conf.shape} {conf.dtype}, priors {priors.shape}",
          file=sys.stderr, flush=True)

    n = loc.shape[0]
    pb = jnp.asarray(priors, jnp.float32).reshape(2, -1, 4)
    pbox, pvar = pb[0], pb[1]
    P = pbox.shape[0]
    K = min(nms_top_k, P)
    cls = np.asarray([c for c in range(num_classes) if c != bg])

    pw = pbox[:, 2] - pbox[:, 0]
    ph = pbox[:, 3] - pbox[:, 1]
    pcx = (pbox[:, 0] + pbox[:, 2]) * 0.5
    pcy = (pbox[:, 1] + pbox[:, 3]) * 0.5

    def decode(l):
        cx = pvar[:, 0] * l[:, 0] * pw + pcx
        cy = pvar[:, 1] * l[:, 1] * ph + pcy
        w = jnp.exp(pvar[:, 2] * l[:, 2]) * pw
        h = jnp.exp(pvar[:, 3] * l[:, 3]) * ph
        return jnp.stack([cx - w / 2, cy - h / 2,
                          cx + w / 2, cy + h / 2], axis=-1)

    def head(loc_f, conf_f, skip=()):
        loc_i = loc_f.reshape(P, 1, 4).astype(jnp.float32)[:, 0]
        conf_i = conf_f.reshape(P, num_classes).astype(jnp.float32)
        if "topk" in skip:
            sc = conf_i[:K, cls].T
            idx = jnp.broadcast_to(jnp.arange(K), (len(cls), K))
        elif "sorttopk" in skip:
            sc, idx = jax.lax.top_k(conf_i[:, cls].T, K)
        elif "sortfull" in skip:
            rows = conf_i[:, cls].T                     # (C', P)
            iota = jnp.broadcast_to(jnp.arange(rows.shape[-1]),
                                    rows.shape)
            sc, idx = jax.lax.sort((-rows, iota), num_keys=1)
            sc, idx = -sc[:, :K], idx[:, :K]
        elif "radixcmp" in skip:
            # radix select + comparison-sum index compaction + takes:
            # idx[k] = sum_p [cum_p <= k] (index of the k-th member),
            # no sort, no scatter, nothing scales past P*K bool ops
            rows = conf_i[:, cls].T                     # (C', P)
            keys = jax.lax.bitcast_convert_type(
                jnp.maximum(rows, 0.0), jnp.int32)
            t = jnp.zeros(rows.shape[:-1], jnp.int32)
            for b in range(30, -1, -1):
                cand = t | (1 << b)
                cnt = jnp.sum(keys >= cand[..., None], axis=-1)
                t = jnp.where(cnt >= K, cand, t)
            above = keys > t[..., None]
            n_above = jnp.sum(above, axis=-1)
            eq = keys == t[..., None]
            eq_rank = jnp.cumsum(eq, axis=-1) - 1
            mem = above | (eq & (eq_rank < (K - n_above)[..., None]))
            cum = jnp.cumsum(mem, axis=-1)              # inclusive
            idx = jnp.sum((cum[..., None, :]
                           <= jnp.arange(K)[None, :, None])
                          .astype(jnp.int32), axis=-1)  # (C', K)
            sc = jnp.take_along_axis(rows, idx, axis=-1)
        elif "radix" in skip:
            rows = conf_i[:, cls].T                     # (C', P)
            keys = jax.lax.bitcast_convert_type(
                jnp.maximum(rows, 0.0), jnp.int32)      # monotone >=0
            if "bar" in skip:
                keys = jax.lax.optimization_barrier(keys)
            if "noloop" in skip:
                # fake threshold (bits of ~0.04): selection machinery
                # only — isolates the counting loop's cost
                t = jnp.full(rows.shape[:-1], 0x3D2B851F, jnp.int32)
            else:
                t = jnp.zeros(rows.shape[:-1], jnp.int32)
                for b in range(30, -1, -1):
                    cand = t | (1 << b)
                    cnt = jnp.sum(keys >= cand[..., None], axis=-1)
                    t = jnp.where(cnt >= K, cand, t)
            if "loopout" in skip:
                # counting loop only: discard selection, keep t alive
                sc, idx = jax.lax.approx_max_k(rows, K,
                                               recall_target=1.0)
                sc = sc + t[..., None].astype(jnp.float32) * 1e-30
            else:
                # membership: above t, plus ==t members by low index
                above = keys > t[..., None]
                n_above = jnp.sum(above, axis=-1)
                eq = keys == t[..., None]
                eq_rank = jnp.cumsum(eq, axis=-1) - 1
                mem = above | (eq & (eq_rank
                                     < (K - n_above)[..., None]))
                # compact BY INDEX: slot = rank among members
                pos = jnp.cumsum(mem, axis=-1) - 1
                src = jnp.broadcast_to(jnp.arange(rows.shape[-1]),
                                       rows.shape)
                if "noscatter" in skip:
                    sc, idx = jax.lax.approx_max_k(rows, K,
                                                   recall_target=1.0)
                    sc = sc + pos[..., -1:].astype(jnp.float32) * 1e-30
                else:
                    slot = jnp.where(mem, pos, K)
                    idx = jnp.zeros(rows.shape[:-1] + (K + 1,),
                                    jnp.int32)
                    idx = idx.at[jnp.arange(rows.shape[0])[:, None],
                                 slot].set(src)
                    idx = idx[:, :K]
                    if "notake" in skip:
                        sc, _ = jax.lax.approx_max_k(
                            rows, K, recall_target=1.0)
                        sc = sc + idx[:, :1].astype(jnp.float32) * 1e-30
                    else:
                        sc = jnp.take_along_axis(rows, idx, axis=-1)
        else:
            sc, idx = jax.lax.approx_max_k(conf_i[:, cls].T, K,
                                           recall_target=1.0)
        boxes = decode(loc_i)
        if "gather" in skip:
            bx = jnp.broadcast_to(boxes[:K], (len(cls), K, 4))
        elif "take" in skip:
            bx = jnp.take(boxes, idx, axis=0)       # gather engine
        else:
            oh = jax.nn.one_hot(idx, P, dtype=jnp.float32)
            bx = jnp.dot(oh.reshape(-1, P), boxes,
                         precision=jax.lax.Precision.HIGHEST) \
                .reshape(sc.shape + (4,))
        if "nms" in skip:
            keep = sc > conf_thresh
        elif "bitpack" in skip:
            from feathercnn_tpu.kernels.nms import greedy_nms_bitpack
            keep = greedy_nms_bitpack(bx, sc > conf_thresh, nms_thresh)
        elif "bitpack_scores" in skip:
            from feathercnn_tpu.kernels.nms import greedy_nms_bitpack
            keep = greedy_nms_bitpack(bx, sc > conf_thresh, nms_thresh,
                                      scores=sc)
        else:
            keep = greedy_nms(bx, sc > conf_thresh, nms_thresh,
                              block=args.block)
        sc = jnp.where(keep, sc, -1.0)
        lb = jnp.broadcast_to(
            jnp.asarray(cls, jnp.float32)[:, None], sc.shape)
        sc = sc.reshape(-1)
        bx = bx.reshape(-1, 4)
        lb = lb.reshape(-1)
        if "keep" in skip:
            row = jnp.concatenate([lb[:keep_top_k, None],
                                   sc[:keep_top_k, None],
                                   bx[:keep_top_k]], axis=-1)
            return row
        top, ti = jax.lax.approx_max_k(sc, min(keep_top_k, sc.shape[0]),
                                       recall_target=1.0)
        good = top > 0
        row = jnp.concatenate([
            jnp.where(good, lb[ti], -1.0)[:, None],
            jnp.where(good, top, 0.0)[:, None],
            jnp.where(good[:, None], bx[ti], 0.0)], axis=-1)
        return row

    fwd = eng._build_forward()
    eparams = eng._prepare_params()
    xdev = jnp.asarray(x)

    def bench(label, skip):
        if args.live:
            def fn(xin):
                o = fwd(eparams, {next(iter(g.inputs)): xin})
                return jax.vmap(lambda li, ci: head(li, ci, skip))(
                    jnp.asarray(o["mbox_loc"], jnp.float32),
                    jnp.asarray(o["mbox_conf_flatten"], jnp.float32))
            t = device_bench(fn, [xdev], iters=args.iters)
        else:
            fn = lambda l, c: jax.vmap(
                lambda li, ci: head(li, ci, skip))(l, c)
            t = device_bench(fn, [loc, conf], iters=args.iters)
        print(json.dumps({"variant": label,
                          "ms": round(t * 1e3, 3)}), flush=True)

    bench("all", ())
    bench("radixcmp_take", ("radixcmp", "take", "bitpack_scores"))
    bench("radixcmp_onehot", ("radixcmp", "bitpack_scores"))


if __name__ == "__main__":
    main()
