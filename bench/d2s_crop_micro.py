"""Micro-probe: subpixel-deconv tail (depth-to-space + crop) at FCN
shapes.  The fcn32s layer probe puts 3.5 ms (0% SoL) in the Crop node:
the (16,544,544,21) intermediate and the 500x500 crop both run at
21/128 lane utilization (~6x padded traffic).

Variants:
  d2s_crop   reshape/transpose depth-to-space then lax.slice (current)
  onehot2    crop+interleave as TWO one-hot selection einsums over the
             lane-dense phase tensor (rows then cols) — same values,
             every contraction/free dim lane-full
Usage: python bench/d2s_crop_micro.py
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

    n, q, s, c, out_hw, o = 16, 17, 32, 21, 500, 22
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, q, q, s * s * c))
                    .astype(np.float32), jnp.bfloat16)

    def d2s_crop(xx):
        y = xx.reshape(n, q, q, s, s, c)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, q * s, q * s, c)
        return jax.lax.slice(y, (0, o, o, 0),
                             (n, o + out_hw, o + out_hw, c))

    # one-hot row/col selection: R[Y, qh, rh] = 1 iff qh = (Y+o)//s and
    # rh = (Y+o) % s
    Y = np.arange(out_hw)
    R = np.zeros((out_hw, q, s), np.float32)
    R[Y, (Y + o) // s, (Y + o) % s] = 1.0
    Rj = jnp.asarray(R, jnp.bfloat16)

    def onehot2(xx):
        p = xx.reshape(n, q, q, s, s, c)
        # rows: contract (qh, rh) -> Y
        y1 = jnp.einsum("yqr,nqwrvc->nywvc", Rj, p)  # (n,Y,qw,rw,c)
        # cols: contract (qw, rw) -> X
        y2 = jnp.einsum("xwv,nywvc->nyxc", Rj, y1)
        return y2

    a = np.asarray(d2s_crop(x), np.float32)
    b = np.asarray(onehot2(x), np.float32)
    print(json.dumps({"max_delta": float(np.abs(a - b).max())}),
          flush=True)
    for label, fn in [("d2s_crop", d2s_crop), ("onehot2", onehot2)]:
        t = device_bench(fn, [x], iters=30)
        print(json.dumps({"variant": label, "ms": round(t * 1e3, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
