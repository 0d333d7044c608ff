"""Isolated LRN stage bisect at AlexNet norm2 shapes (128,27,27,256)
int8-requant: which pass holds the 0.579 ms (10% SoL, the b128 layer
probe's one concentrated segment)?  Stages mirror ops/lowering._lower_lrn.

Usage: python bench/lrn_micro.py [--batch 128]
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
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--hw", type=int, default=27)
    ap.add_argument("--C", type=int, default=256)
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from feathercnn_tpu.utils.timing import device_bench

    N, HW, C, n = args.batch, args.hw, args.C, args.n
    alpha, beta, k = 1e-4, 0.75, 1.0
    xs, ys = 0.05, 0.04
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(-127, 128, size=(N, HW, HW, C))
                    .astype(np.int8))
    half = n // 2
    i = np.arange(C)
    d = i[:, None] - i[None, :]
    band = ((d >= -half) & (d <= n - 1 - half)).astype(np.float32)
    band_bf = jnp.asarray(band, jnp.bfloat16)

    def full(qv):
        x = qv.astype(jnp.float32) * xs
        sq = x * x
        ssum = jnp.dot(sq.reshape(-1, C).astype(jnp.bfloat16), band_bf,
                       preferred_element_type=jnp.float32
                       ).reshape(sq.shape)
        b = k + (alpha / n) * ssum
        r = jax.lax.rsqrt(b)
        scl = r * jnp.sqrt(r)
        y = x * scl
        return jnp.clip(jnp.round(y / ys), -127, 127).astype(jnp.int8)

    def dot_only(qv):
        x = qv.astype(jnp.float32) * xs
        sq = x * x
        return jnp.dot(sq.reshape(-1, C).astype(jnp.bfloat16), band_bf,
                       preferred_element_type=jnp.float32)

    def elemwise_only(qv):
        # everything except the dot (ssum faked as sq itself)
        x = qv.astype(jnp.float32) * xs
        sq = x * x
        b = k + (alpha / n) * sq
        r = jax.lax.rsqrt(b)
        scl = r * jnp.sqrt(r)
        y = x * scl
        return jnp.clip(jnp.round(y / ys), -127, 127).astype(jnp.int8)

    def int_sq_dot(qv):
        # x^2 = s^2 * q^2; q in [-127,127] is bf16-EXACT, q^2 <= 16129
        # rides the dot's f32 accumulation; s^2 folds into alpha
        qb = qv.astype(jnp.bfloat16)
        sqq = qb * qb                     # 2^-9 rel (q^2 needs 14 bits)
        return jnp.dot(sqq.reshape(-1, C), band_bf,
                       preferred_element_type=jnp.float32)

    def full_int(qv):
        qb = qv.astype(jnp.bfloat16)
        ssumq = jnp.dot((qb * qb).reshape(-1, C), band_bf,
                        preferred_element_type=jnp.float32
                        ).reshape(qv.shape)
        b = k + (alpha / n) * (xs * xs) * ssumq
        r = jax.lax.rsqrt(b)
        scl = r * jnp.sqrt(r)
        # y/ys = (xs/ys) * q * scl — no dequantized x tensor at all
        y = (xs / ys) * qv.astype(jnp.float32) * scl
        return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)

    def full_rw(qv):
        # reduce_window form (lrn_band=False reference)
        x = qv.astype(jnp.float32) * xs
        sq = x * x
        ssum = jax.lax.reduce_window(
            sq, 0.0, jax.lax.add,
            window_dimensions=(1, 1, 1, n), window_strides=(1, 1, 1, 1),
            padding=((0, 0), (0, 0), (0, 0), (half, n - 1 - half)))
        b = k + (alpha / n) * ssum
        r = jax.lax.rsqrt(b)
        scl = r * jnp.sqrt(r)
        y = x * scl
        return jnp.clip(jnp.round(y / ys), -127, 127).astype(jnp.int8)

    stages = {
        "full": full,
        "dot_only": dot_only,
        "elemwise_only": elemwise_only,
        "int_sq_dot": int_sq_dot,
        "full_int": full_int,
        "full_rw": full_rw,
    }
    out = {}
    for name, fn in stages.items():
        ms = device_bench(fn, (q,), iters=args.iters) * 1e3
        out[name] = round(ms, 3)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"cfg": vars(args), "stages": out}))


if __name__ == "__main__":
    main()
