"""Canonical per-layer XLA reference for a bottleneck chain.

This exact body is what the region-fusion policy is judged against
(bench/chain_micro.py micro/ctx probes and tools/autotune.py --regions
share it) — keep it in ONE place so a quantization-ordering fix can't
silently diverge between the probe and the autotuner.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["xla_int8_bottlenecks"]


def xla_int8_bottlenecks(a, w1, w2, w3, w1s, w2s, w3s, s, nb, C, Cm):
    """nb identity bottlenecks, int8 edges, requant between layers.

    a: (N,H,W,C) int8.  w1: (nb,C,Cm); w2: (nb,9*Cm,Cm) row-major over
    (kh*3+kw); w3: (nb,Cm,C) — all int8.  w*s: per-channel scales
    (nb,·).  ``s`` is the shared per-tensor activation scale.
    """
    w1 = jnp.asarray(w1)
    w2 = jnp.asarray(w2)
    w3 = jnp.asarray(w3)

    def q8(v):
        return jnp.clip(jnp.round(v / s), -127, 127).astype(jnp.int8)

    for j in range(nb):
        x_in = a
        y = jax.lax.conv_general_dilated(
            a, w1[j].reshape(1, 1, C, Cm), (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = q8(jnp.maximum(y.astype(jnp.float32) * (w1s[j] * s), 0))
        y = jax.lax.conv_general_dilated(
            y, w2[j].reshape(3, 3, Cm, Cm), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = q8(jnp.maximum(y.astype(jnp.float32) * (w2s[j] * s), 0))
        y = jax.lax.conv_general_dilated(
            y, w3[j].reshape(1, 1, Cm, C), (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (w3s[j] * s)
        a = q8(jnp.maximum(y + x_in.astype(jnp.float32) * s, 0))
    return a
