"""Micro-probe: windowed AVE pool formulations at ShuffleNet-v1
transition shapes (ceiling probe: resx5/resx13 avepool run at 2-3.5%
SoL — 28x their byte floor — and hold ~2.0 of the family's 2.1 ms gap).

Variants (all int8 in / int8 out at the requant-edge contract):
  f32_rw     current lowering: astype(f32) -> reduce_window add ->
             /denom -> requant multiply -> int8
  i32_rw     reduce_window add in int32 (9 int8 fit easily), ONE fused
             f32 multiply folds denom and x/y scales -> int8
  dw_conv    AVE as depthwise conv with ones kernel (int8 conv path,
             int32 accum), same epilogue fold
  max_ref    MAX pool on the same shape (lower bound for reduce_window
             machinery; byte-identical traffic)

Usage: python bench/pool_micro.py
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

    shapes = [((128, 28, 28, 240), "resx5"),
              ((128, 14, 14, 480), "resx13")]
    kh = kw = 3
    sh = sw = 2
    ph = pw = 0
    s_x, s_y = 0.04, 0.05

    rng = np.random.default_rng(0)
    for shape, name in shapes:
        n, h, w, c = shape
        x = jnp.asarray(rng.integers(-127, 128, size=shape,
                                     dtype=np.int8))
        # Caffe ceil-mode output size + per-window denominators
        oh = -(-(h - kh) // sh) + 1
        ow = -(-(w - kw) // sw) + 1
        extra_h = max((oh - 1) * sh + kh - h, 0)
        extra_w = max((ow - 1) * sw + kw - w, 0)
        pad_cfg = ((0, 0), (0, extra_h), (0, extra_w), (0, 0))

        def counts(size, k, s, out):
            starts = np.arange(out) * s
            ends = np.minimum(starts + k, size)
            return (ends - starts).astype(np.float32)

        denom = np.outer(counts(h, kh, sh, oh),
                         counts(w, kw, sw, ow))[None, :, :, None]
        scale = jnp.asarray(s_x / s_y / denom, jnp.float32)

        def f32_rw(xx):
            y = jax.lax.reduce_window(
                xx.astype(jnp.float32), 0.0, jax.lax.add,
                (1, kh, kw, 1), (1, sh, sw, 1), pad_cfg)
            return jnp.clip(jnp.round(y * scale), -127,
                            127).astype(jnp.int8)

        def i32_rw(xx):
            y = jax.lax.reduce_window(
                xx.astype(jnp.int32), 0, jax.lax.add,
                (1, kh, kw, 1), (1, sh, sw, 1), pad_cfg)
            return jnp.clip(jnp.round(y.astype(jnp.float32) * scale),
                            -127, 127).astype(jnp.int8)

        ones = jnp.ones((kh, kw, 1, 1), jnp.int8)

        def dw_conv(xx):
            y = jax.lax.conv_general_dilated(
                xx, jnp.broadcast_to(ones, (kh, kw, 1, c)),
                (sh, sw), ((0, extra_h), (0, extra_w)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c,
                preferred_element_type=jnp.int32)
            return jnp.clip(jnp.round(y.astype(jnp.float32) * scale),
                            -127, 127).astype(jnp.int8)

        def max_ref(xx):
            return jax.lax.reduce_window(
                xx, jnp.int8(-128), jax.lax.max,
                (1, kh, kw, 1), (1, sh, sw, 1), pad_cfg)

        for label, fn in [("f32_rw", f32_rw), ("i32_rw", i32_rw),
                          ("dw_conv", dw_conv), ("max_ref", max_ref)]:
            t = device_bench(fn, [x], iters=40)
            print(json.dumps({"shape": name, "variant": label,
                              "ms": round(t * 1e3, 3)}), flush=True)
        # exactness cross-check on device
        a = np.asarray(f32_rw(x)).astype(np.int32)
        b = np.asarray(i32_rw(x)).astype(np.int32)
        d = np.asarray(dw_conv(x)).astype(np.int32)
        print(json.dumps({"shape": name,
                          "i32_max_delta": int(np.abs(a - b).max()),
                          "dw_max_delta": int(np.abs(a - d).max())}),
              flush=True)


if __name__ == "__main__":
    main()
