"""Isolated stage timing for the threshold-first DetectionOutput fast
path (det_thresh_first) formulations: one-level (NMS over B) vs
two-level (per-class re-compaction to Bc, NMS over Bc), plus stage
cuts.  Indicative only (isolation caveats per CLAUDE.md) — the
production gate is the paired config_ab run.

Usage: python bench/tf_head_micro.py [--batch 16] [--budget 512]
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
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--budget", type=int, default=512)
    ap.add_argument("--bc", type=int, default=256)
    ap.add_argument("--priors", type=int, default=8732)
    ap.add_argument("--classes", type=int, default=20)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from feathercnn_tpu.kernels.nms import greedy_nms_bitpack
    from feathercnn_tpu.utils.timing import device_bench

    N, P, C, B, Bc = (args.batch, args.priors, args.classes,
                      args.budget, args.bc)
    keep_top_k = 200
    rng = np.random.default_rng(0)
    conf = (rng.random((N, P, C)) * 0.009).astype(np.float32)
    hot = rng.random((N, P, C)) < (330 / (P * C) * 3)
    conf = np.where(hot, rng.random((N, P, C)).astype(np.float32), conf)
    loc = rng.normal(size=(N, P, 4)).astype(np.float32)
    pconst = np.abs(rng.normal(size=(P, 8))).astype(np.float32)
    conf_d = jnp.asarray(conf)
    loc_d = jnp.asarray(loc)
    pconst_d = jnp.asarray(pconst)
    HI = jax.lax.Precision.HIGHEST

    def compact(loc_i, conf_i):
        mem = jnp.any(conf_i > 0.01, axis=-1)
        pos = jnp.cumsum(mem.astype(jnp.int32)) - 1
        slot = jnp.where(mem, pos, B)
        oh = (slot[None, :] == jnp.arange(B)[:, None]).astype(jnp.float32)
        payload = jnp.concatenate([loc_i, pconst_d, conf_i], axis=-1)
        return jnp.dot(oh, payload, precision=HI)

    def decode(comp):
        l, pv = comp[:, :4], comp[:, 4:8]
        pw_c, ph_c = comp[:, 8], comp[:, 9]
        pcx_c, pcy_c = comp[:, 10], comp[:, 11]
        csc = comp[:, 12:]
        cx = pv[:, 0] * l[:, 0] * pw_c + pcx_c
        cy = pv[:, 1] * l[:, 1] * ph_c + pcy_c
        w_ = jnp.exp(pv[:, 2] * l[:, 2]) * pw_c
        h_ = jnp.exp(pv[:, 3] * l[:, 3]) * ph_c
        boxes = jnp.stack([cx - w_ / 2, cy - h_ / 2,
                           cx + w_ / 2, cy + h_ / 2], axis=-1)
        return boxes, csc.T                    # (B, 4), (C, B)

    def level2(boxes, sc):
        candc = sc > 0.01
        posc = jnp.cumsum(candc.astype(jnp.int32), axis=-1) - 1
        slotc = jnp.where(candc, posc, Bc)
        ohc = (slotc[:, None, :]
               == jnp.arange(Bc)[None, :, None]).astype(jnp.float32)
        payc = jnp.concatenate(
            [jnp.broadcast_to(boxes[None], (C, B, 4)), sc[..., None]],
            axis=-1)
        compc = jnp.einsum("ckb,cbf->ckf", ohc, payc, precision=HI)
        return compc[..., :4], compc[..., 4]

    def tail(sc, bx):
        lb = jnp.broadcast_to(jnp.arange(C, dtype=jnp.float32)[:, None],
                              sc.shape)
        sc = sc.reshape(-1)
        bx = bx.reshape(-1, 4)
        lb = lb.reshape(-1)
        top, ti = jax.lax.approx_max_k(sc, keep_top_k, recall_target=1.0)
        good = top > 0
        return jnp.concatenate([
            jnp.where(good, lb[ti], -1.0)[:, None],
            jnp.where(good, top, 0.0)[:, None],
            jnp.where(good[:, None], bx[ti], 0.0)], axis=-1)

    def one_level(lo, co):
        def im(a, b):
            boxes, sc = decode(compact(a, b))
            bx = jnp.broadcast_to(boxes[None], (C, B, 4))
            keep = greedy_nms_bitpack(bx, sc > 0.01, 0.45, scores=sc)
            return tail(jnp.where(keep, sc, -1.0), bx)
        return jax.vmap(im)(lo, co)

    def two_level(lo, co):
        def im(a, b):
            boxes, sc = decode(compact(a, b))
            bx, sc2 = level2(boxes, sc)
            keep = greedy_nms_bitpack(bx, sc2 > 0.01, 0.45, scores=sc2)
            return tail(jnp.where(keep, sc2, -1.0), bx)
        return jax.vmap(im)(lo, co)

    def two_level_nonms(lo, co):
        def im(a, b):
            boxes, sc = decode(compact(a, b))
            bx, sc2 = level2(boxes, sc)
            return tail(sc2, bx)
        return jax.vmap(im)(lo, co)

    def compact_only(lo, co):
        return jax.vmap(compact)(lo, co)

    def predicate(lo, co):
        n_cls = jnp.sum(co > 0.01, axis=1)
        return (jnp.max(jnp.sum(n_cls, -1)) + jnp.sum(lo) * 0,
                jnp.max(n_cls))

    stages = {
        "compact": compact_only,
        "one_level": one_level,
        "two_level": two_level,
        "two_level_nonms": two_level_nonms,
        "predicate": predicate,
    }
    out = {}
    for name, fn in stages.items():
        ms = device_bench(fn, (loc_d, conf_d), iters=args.iters) * 1e3
        out[name] = round(ms, 3)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"batch": N, "budget": B, "bc": Bc, "stages": out}))


if __name__ == "__main__":
    main()
