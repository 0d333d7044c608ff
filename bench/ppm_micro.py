"""Micro-probe: PSPNet pyramid-pooling formulations at the PPM shape.

The ceiling bisect (bench/results/ceiling_pspnet50_b4_ppm.json) puts the
four non-overlapping AVE pools at 2.3 ms / 2-29% SoL in context while
their byte floor is ~0.14 ms, and the in-context avepool_reshape A/B
measured a WASH — the cost is contextual, not the window machinery
(same verdict as the ShuffleNet-v1 transitions).  This micro isolates
candidate forms on (4, 60, 60, 2048) int8 to find which primitive is
slow at this shape and whether the int8->i32 widening is the tax:

  rw_i32     current requant path: reduce_window add over astype(i32)
  reshape    astype(i32) -> reshape (n,oh,k,ow,k,c) -> sum axes (2,4)
  base6      ONE 6x6 base grid (10x10 blocks, reshape-sum) + the other
             three bins derived from it by tiny i32 sums (1 read total)
  dwconv     depthwise conv with ones kernel (int8 conv path, i32 accum)
  matmul     ones-band einsum pair riding the MXU: "bh,nhwc->nbwc" then
             "ow,nbwc->nboc" in int8 x int8 -> i32
  maxref     MAX pool same windows (no widening — control for convert)
  allfour    rw_i32 for all four bins {1,2,3,6} (the real PPM read x4)
  allbase    base6 producing all four bins (the real PPM read x1)

Usage: python bench/ppm_micro.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from feathercnn_tpu.utils.cache import enable_persistent_cache
    from feathercnn_tpu.utils.timing import device_bench
    enable_persistent_cache()

    n, h, w, c = 4, 60, 60, 2048
    s_x, s_y = 0.05, 0.04
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, size=(n, h, w, c),
                                 dtype=np.int8))

    def requant(sums_i32, k):
        s = (s_x / s_y) / float(k * k)
        return jnp.clip(jnp.round(sums_i32.astype(jnp.float32) * s),
                        -127, 127).astype(jnp.int8)

    def rw(k):
        def f(xx):
            y = jax.lax.reduce_window(
                xx.astype(jnp.int32), 0, jax.lax.add,
                window_dimensions=(1, k, k, 1),
                window_strides=(1, k, k, 1),
                padding=((0, 0), (0, 0), (0, 0), (0, 0)))
            return requant(y, k)
        return f

    def reshape(k):
        def f(xx):
            o = h // k
            y = xx.astype(jnp.int32).reshape(n, o, k, o, k, c).sum(
                axis=(2, 4))
            return requant(y, k)
        return f

    def base6(xx):
        # 6x6 grid of 10x10 block sums — one pass over x
        return xx.astype(jnp.int32).reshape(n, 6, 10, 6, 10, c).sum(
            axis=(2, 4))

    def derive(all_bins):
        def f(xx):
            g = base6(xx)                                  # (n,6,6,c)
            outs = [requant(g.reshape(n, 6, 1, 6, 1, c).sum((2, 4)), 10)]
            if all_bins:
                b1 = g.sum(axis=(1, 2), keepdims=True)      # 60x60
                b2 = g.reshape(n, 2, 3, 2, 3, c).sum((2, 4))  # 30x30
                b3 = g.reshape(n, 3, 2, 3, 2, c).sum((2, 4))  # 20x20
                outs = [requant(b1, 60), requant(b2, 30),
                        requant(b3, 20), requant(g, 10)]
            return tuple(outs)
        return f

    def dwconv(k):
        def f(xx):
            ones = jnp.ones((k, k, 1, c), jnp.int8)
            y = jax.lax.conv_general_dilated(
                xx, ones, (k, k), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c,
                preferred_element_type=jnp.int32)
            return requant(y, k)
        return f

    def matmul(k):
        o = h // k
        P = np.zeros((o, h), np.int8)
        for i in range(o):
            P[i, i * k:(i + 1) * k] = 1
        Pj = jnp.asarray(P)

        def f(xx):
            y = jnp.einsum("bh,nhwc->nbwc", Pj, xx,
                           preferred_element_type=jnp.int32)
            y = jnp.einsum("ow,nbwc->nboc", Pj, y.astype(jnp.int32),
                           preferred_element_type=jnp.int32)
            return requant(y, k)
        return f

    def maxref(k):
        def f(xx):
            return jax.lax.reduce_window(
                xx, jnp.int8(-128), jax.lax.max,
                window_dimensions=(1, k, k, 1),
                window_strides=(1, k, k, 1),
                padding=((0, 0), (0, 0), (0, 0), (0, 0)))
        return f

    def allfour(xx):
        return tuple(rw(k)(xx) for k in (60, 30, 20, 10))

    probes = [("rw_i32 k60", rw(60)), ("rw_i32 k10", rw(10)),
              ("reshape k60", reshape(60)), ("reshape k10", reshape(10)),
              ("dwconv k60", dwconv(60)), ("dwconv k10", dwconv(10)),
              ("matmul k60", matmul(60)), ("matmul k10", matmul(10)),
              ("maxref k60", maxref(60)), ("maxref k10", maxref(10)),
              ("allfour rw", allfour), ("allbase", derive(True))]
    out = {}
    for name, f in probes:
        ms = device_bench(jax.jit(f), (x,)) * 1e3
        out[name] = round(ms, 3)
        print(f"{name:14s} {ms:8.3f} ms", flush=True)
    print(json.dumps({"shape": [n, h, w, c], "ms": out}))


if __name__ == "__main__":
    main()
