"""VMEM-resident fused bottleneck block — the region-fusion kernel.

Round-1 measurement (ROADMAP.md): swapping single ops for Pallas kernels
loses to XLA because every custom-call boundary costs HBM round trips.
The TPU-first answer is to fuse a whole ResNet bottleneck —

    y1 = relu(x @ W1 + b1)            (1x1, C -> Cm)
    y2 = relu(conv3x3(y1, W2) + b2)   (pad 1, stride 1, Cm -> Cm)
    y3 = y2 @ W3 + b3                 (1x1, Cm -> C)
    out = relu(y3 + x)                (identity shortcut)

— into ONE pallas_call with every intermediate pinned in VMEM: one HBM
read of x, one write of out, weights resident (they fit: stage-3/4/5
blocks are <= ~9 MB bf16, half that int8).  The reference's analog is its
layer-fusion pass + shared scratch arena ([pub] src/net.cpp fusion,
src/mempool.h), taken to its logical endpoint on a machine with 16 MB of
software-managed SRAM.

Full-int8 variant: int8 MXU dots with per-channel weight scales and
per-tensor activation scales; y1/y2 are requantized in-register, so the
whole block's activation traffic is int8 and never leaves VMEM anyway.

Identity-shortcut blocks only (stride 1, C_in == C_out) — 12 of ResNet-50's
16 blocks; projection blocks stay on the per-layer path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_bottleneck"]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fused_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                  o_ref, *, H: int, W: int, C: int, Cm: int, NB: int,
                  int8: bool, s_x: float, s_y1: float, s_y2: float,
                  w1s_ref=None, w2s_ref=None, w3s_ref=None,
                  out_scale: float = 1.0):
    M = NB * H * W
    x = x_ref[0]                      # (NB*H*W, C)

    def q8(v, scale):
        return jnp.clip(jnp.round(v * (1.0 / scale)), -127, 127
                        ).astype(jnp.int8)

    # ---- conv1: 1x1 C -> Cm -------------------------------------------
    if int8:
        a1 = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.int32
                     ).astype(jnp.float32) * (w1s_ref[:] * s_x)
    else:
        a1 = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    y1 = jnp.maximum(a1 + b1_ref[:], 0.0)

    # ---- conv2: 3x3 pad 1, Cm -> Cm (9 shifted GEMMs in VMEM) ---------
    if int8:
        y1 = q8(y1, s_y1)
    else:
        y1 = y1.astype(x.dtype)
    y1p = jnp.pad(y1.reshape(NB, H, W, Cm),
                  ((0, 0), (1, 1), (1, 1), (0, 0)))
    a2 = jnp.zeros((M, Cm), jnp.float32)
    for kh in range(3):
        for kw in range(3):
            sl = y1p[:, kh:kh + H, kw:kw + W, :].reshape(M, Cm)
            wk = w2_ref[(kh * 3 + kw) * Cm:(kh * 3 + kw + 1) * Cm, :]
            if int8:
                a2 += jnp.dot(sl, wk, preferred_element_type=jnp.int32
                              ).astype(jnp.float32)
            else:
                a2 += jnp.dot(sl, wk, preferred_element_type=jnp.float32)
    if int8:
        a2 = a2 * (w2s_ref[:] * s_y1)
    y2 = jnp.maximum(a2 + b2_ref[:], 0.0)

    # ---- conv3: 1x1 Cm -> C + shortcut + relu -------------------------
    if int8:
        y2 = q8(y2, s_y2)
    else:
        y2 = y2.astype(x.dtype)
    if int8:
        a3 = jnp.dot(y2, w3_ref[:], preferred_element_type=jnp.int32
                     ).astype(jnp.float32) * (w3s_ref[:] * s_y2)
        shortcut = x.astype(jnp.float32) * s_x
    else:
        a3 = jnp.dot(y2, w3_ref[:], preferred_element_type=jnp.float32)
        shortcut = x.astype(jnp.float32)
    out = jnp.maximum(a3 + b3_ref[:] + shortcut, 0.0)
    if o_ref.dtype == jnp.int8:
        out = jnp.clip(jnp.round(out * out_scale), -127, 127)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scales", "out_dtype", "interpret"))
def fused_bottleneck(x: jnp.ndarray,
                     w1, b1, w2, b2, w3, b3,
                     w_scales=None,
                     scales: Optional[tuple] = None,
                     out_dtype=None,
                     interpret: bool = False) -> jnp.ndarray:
    """x: (N,H,W,C) bf16/f32 or int8.  w1: (C,Cm); w2: (3,3,Cm,Cm);
    w3: (Cm,C).  int8 mode: pass int8 weights + ``w_scales=(s1,s2,s3)``
    per-channel arrays and ``scales=(s_x, s_y1, s_y2[, s_out])`` floats
    (s_out present -> int8 output)."""
    N, H, W, C = x.shape
    Cm = w1.shape[-1]
    int8 = x.dtype == jnp.int8
    if out_dtype is None:
        out_dtype = jnp.bfloat16 if int8 else x.dtype
    s_x = s_y1 = s_y2 = 1.0
    out_scale = 1.0
    if int8:
        assert scales is not None and w_scales is not None
        s_x, s_y1, s_y2 = scales[:3]
        if len(scales) > 3 and scales[3] is not None:
            out_dtype = jnp.int8
            out_scale = 1.0 / scales[3]

    # Batch chunking to fit VMEM.
    itemsize = jnp.dtype(x.dtype).itemsize
    HW = H * W

    def vmem(chunk):
        act = chunk * HW * max(C, 4 * Cm) * 4 * 3     # f32 temporaries
        pad_act = chunk * (H + 2) * (W + 2) * Cm * itemsize
        wbytes = (C * Cm + 9 * Cm * Cm + Cm * C) * w1.dtype.itemsize
        return act + pad_act + wbytes + chunk * HW * C * itemsize * 4

    chunk = N
    while chunk > 1 and vmem(chunk) > 10 * 1024 * 1024:
        for d in (2, 3, 5, 7):
            if chunk % d == 0:
                chunk //= d
                break
        else:
            chunk = 1
    q = N // chunk
    M = chunk * HW

    xs = x.reshape(q, M, C)
    w2f = w2.reshape(9 * Cm, Cm)
    ones = lambda c: jnp.ones((c,), jnp.float32)
    w1s, w2s, w3s = (w_scales if w_scales is not None
                     else (ones(Cm), ones(Cm), ones(C)))

    kernel = functools.partial(
        _fused_kernel, H=H, W=W, C=C, Cm=Cm, NB=chunk, int8=int8,
        s_x=float(s_x), s_y1=float(s_y1), s_y2=float(s_y2),
        out_scale=float(out_scale))

    def body(x_r, w1_r, b1_r, w2_r, b2_r, w3_r, b3_r, w1s_r, w2s_r, w3s_r,
             o_r):
        kernel(x_r, w1_r, b1_r, w2_r, b2_r, w3_r, b3_r, o_r,
               w1s_ref=w1s_r, w2s_ref=w2s_r, w3s_ref=w3s_r)

    out = pl.pallas_call(
        body,
        grid=(q,),
        in_specs=[
            pl.BlockSpec((1, M, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((C, Cm), lambda i: (0, 0)),
            pl.BlockSpec((1, Cm), lambda i: (0, 0)),
            pl.BlockSpec((9 * Cm, Cm), lambda i: (0, 0)),
            pl.BlockSpec((1, Cm), lambda i: (0, 0)),
            pl.BlockSpec((Cm, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, Cm), lambda i: (0, 0)),
            pl.BlockSpec((1, Cm), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, M, C), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((q, M, C), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * HW * (C * Cm * 2 + 9 * Cm * Cm),
            bytes_accessed=int(2 * N * HW * C * itemsize),
            transcendentals=0),
        interpret=interpret,
    )(xs, w1, b1.astype(jnp.float32).reshape(1, -1), w2f,
      b2.astype(jnp.float32).reshape(1, -1), w3,
      b3.astype(jnp.float32).reshape(1, -1),
      w1s.reshape(1, -1), w2s.reshape(1, -1), w3s.reshape(1, -1))

    return out.reshape(N, H, W, C)
