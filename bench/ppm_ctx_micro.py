"""Context micro: WHY do PSPNet's PPM pools cost 2.3 ms in-graph when
every isolated form measures ~0 (bench/ppm_micro.py)?

Reconstructs the fan-out context: an int8-requant Eltwise producer
(conv5_3's tail: i32 conv accum + shortcut, one fused requant) feeding
the four non-overlapping AVE pools PLUS the passthrough into the
concat.  Variants isolate which structural element re-creates the
in-context cost:

  base        producer + passthrough only (no pools)
  pools       producer + 4 rw_i32 pools + passthrough
  pools_bar   same, optimization_barrier between producer and fan-out
              (forces ONE materialization of x, kills recompute-fusion)
  pools_rs    reshape-sum pools instead of reduce_window
  pools_base6 ONE 6x6 base-grid pass, bins derived (1 consumer on x)
  pools_mm    ones-matmul pools (MXU consumers on x)

Usage: python bench/ppm_ctx_micro.py
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
    # producer operands: conv branch accum (i32) + int8 shortcut
    acc = jnp.asarray(rng.integers(-2000, 2000, size=(n, h, w, c),
                                   dtype=np.int32))
    sc = jnp.asarray(rng.integers(-127, 128, size=(n, h, w, c),
                                  dtype=np.int8))

    def producer(a):
        # eltwise-add + one fused requant to int8 (conv5_3's tail shape)
        y = a.astype(jnp.float32) * 0.002 + sc.astype(jnp.float32) * 0.05
        return jnp.clip(jnp.round(y * (1.0 / s_x)), -127, 127).astype(
            jnp.int8)

    def requant(sums_i32, k):
        s = (s_x / s_y) / float(k * k)
        return jnp.clip(jnp.round(sums_i32.astype(jnp.float32) * s),
                        -127, 127).astype(jnp.int8)

    def rw(x, k):
        y = jax.lax.reduce_window(
            x.astype(jnp.int32), 0, jax.lax.add,
            window_dimensions=(1, k, k, 1), window_strides=(1, k, k, 1),
            padding=((0, 0), (0, 0), (0, 0), (0, 0)))
        return requant(y, k)

    def rs(x, k):
        o = h // k
        return requant(x.astype(jnp.int32).reshape(
            n, o, k, o, k, c).sum((2, 4)), k)

    def mm(x, k):
        o = h // k
        P = np.zeros((o, h), np.int8)
        for i in range(o):
            P[i, i * k:(i + 1) * k] = 1
        Pj = jnp.asarray(P)
        y = jnp.einsum("bh,nhwc->nbwc", Pj, x,
                       preferred_element_type=jnp.int32)
        y = jnp.einsum("ow,nbwc->nboc", Pj, y,
                       preferred_element_type=jnp.int32)
        return requant(y, k)

    def base6(x):
        g = x.astype(jnp.int32).reshape(n, 6, 10, 6, 10, c).sum((2, 4))
        return (requant(g.sum((1, 2), keepdims=True), 60),
                requant(g.reshape(n, 2, 3, 2, 3, c).sum((2, 4)), 30),
                requant(g.reshape(n, 3, 2, 3, 2, c).sum((2, 4)), 20),
                requant(g, 10))

    def f_base(a):
        x = producer(a)
        return (x,)

    def f_pools(a, form):
        x = producer(a)
        return (x,) + tuple(form(x, k) for k in (60, 30, 20, 10))

    def f_pools_bar(a):
        x = jax.lax.optimization_barrier(producer(a))
        return (x,) + tuple(rw(x, k) for k in (60, 30, 20, 10))

    def f_pools_base6(a):
        x = producer(a)
        return (x,) + base6(x)

    probes = [("base", f_base),
              ("pools_rw", lambda a: f_pools(a, rw)),
              ("pools_bar", f_pools_bar),
              ("pools_rs", lambda a: f_pools(a, rs)),
              ("pools_mm", lambda a: f_pools(a, mm)),
              ("pools_base6", f_pools_base6)]
    out = {}
    for name, f in probes:
        ms = device_bench(jax.jit(f), (acc,)) * 1e3
        out[name] = round(ms, 3)
        print(f"{name:12s} {ms:8.3f} ms", flush=True)
    print(json.dumps({"shape": [n, h, w, c], "ms": out}))


if __name__ == "__main__":
    main()
