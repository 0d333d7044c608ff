"""Isolated Proposal-stage selection forms at faster_rcnn b16 shapes:
pre-NMS top-6000-of-17100 sits at K/P=35% — approx_max_k's degenerate
regime (the round-4 MobileNet-SSD finding at 21%).  Races approx vs
lax.top_k vs radix-slot compaction, and the box gather forms.
Indicative only — production gate is a paired config_ab run.

Usage: python bench/proposal_micro.py [--batch 16]
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
    ap.add_argument("--P", type=int, default=17100)
    ap.add_argument("--K", type=int, default=6000)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from feathercnn_tpu.utils.timing import device_bench

    N, P, K = args.batch, args.P, args.K
    rng = np.random.default_rng(0)
    fg = jnp.asarray(rng.normal(size=(N, P)).astype(np.float32))
    boxes = jnp.asarray(rng.uniform(0, 600, size=(N, P, 4))
                        .astype(np.float32))
    HI = jax.lax.Precision.HIGHEST

    def approx_onehot(fg, boxes):
        def im(f, b):
            top, idx = jax.lax.approx_max_k(f, K, recall_target=1.0)
            oh = jax.nn.one_hot(idx, P, dtype=jnp.float32)
            return top, jnp.dot(oh, b, precision=HI)
        return jax.vmap(im)(fg, boxes)

    def approx_take(fg, boxes):
        def im(f, b):
            top, idx = jax.lax.approx_max_k(f, K, recall_target=1.0)
            return top, jnp.take(b, idx, axis=0)
        return jax.vmap(im)(fg, boxes)

    def topk_take(fg, boxes):
        def im(f, b):
            top, idx = jax.lax.top_k(f, K)
            return top, jnp.take(b, idx, axis=0)
        return jax.vmap(im)(fg, boxes)

    def sort_all(fg, boxes):
        # full sort of (P,) keys carrying the 4 box columns
        def im(f, b):
            out = jax.lax.sort([-f] + [b[:, i] for i in range(4)],
                               num_keys=1)
            return -out[0][:K], jnp.stack([o[:K] for o in out[1:]], -1)
        return jax.vmap(im)(fg, boxes)

    def radix_compact(fg, boxes):
        # exact radix threshold + index-ordered slot compaction,
        # payload = boxes + score (no sort; NMS would need score-ranked)
        def im(f, b):
            # production radix form (non-negative scores: Proposal's fg
            # are softmax probs; filtered rows ride as 0)
            keys = jax.lax.bitcast_convert_type(jnp.maximum(f, 0.0),
                                                jnp.int32)
            t = jnp.zeros((), jnp.int32)
            for bit in range(30, -1, -1):
                cand = t | (1 << bit)
                cnt = jnp.sum(keys >= cand)
                t = jnp.where(cnt >= K, cand, t)
            above = keys > t
            n_above = jnp.sum(above)
            eq = keys == t
            eq_rank = jnp.cumsum(eq) - 1
            mem = above | (eq & (eq_rank < (K - n_above)))
            pos = jnp.cumsum(mem) - 1
            slot = jnp.where(mem, pos, K)
            oh = (slot[None, :] == jnp.arange(K)[:, None]
                  ).astype(jnp.float32)
            payload = jnp.concatenate([b, f[:, None]], -1)
            comp = jnp.dot(oh, payload, precision=HI)
            return comp[:, 4], comp[:, :4]
        return jax.vmap(im)(fg, boxes)

    stages = {
        "approx_onehot": approx_onehot,
        "approx_take": approx_take,
        "topk_take": topk_take,
        "sort_all": sort_all,
        "radix_compact": radix_compact,
    }
    out = {}
    for name, fn in stages.items():
        ms = device_bench(fn, (fg, boxes), iters=args.iters) * 1e3
        out[name] = round(ms, 3)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"cfg": vars(args), "stages": out}))


if __name__ == "__main__":
    main()
