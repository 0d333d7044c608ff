"""VMEM-resident fused bottleneck *chains* — region fusion v2.

Round-1 measurement (ROADMAP.md): fusing one bottleneck into one Pallas
call wins +17% per block but loses whole-model, because every per-block
custom call still pays an HBM round trip + layout transition at its
boundary.  All identity blocks in a ResNet stage share one (H, W, C, Cm)
signature, so this kernel runs the *whole chain* of them in a single
``pallas_call``:

  - grid = (batch_chunk,); the block loop is unrolled inside the kernel,
    so the chunk's activation never leaves VMEM between blocks — HBM sees
    ONE read of x and ONE write of the result per chunk, regardless of
    chain length (vs 2 reads + 1 write per block per layer before);
  - every block's weights sit in VMEM for the whole call (constant
    BlockSpec index) — loaded from HBM exactly once per batch, like the
    per-layer path, and far cheaper than re-streaming them per chunk;
  - Mosaic's pipeline machinery double-buffers the x/out chunks, so the
    next chunk streams in while the current one computes;
  - per-block quant scales are compile-time constants (static unroll).

Full-int8 variant: int8 MXU dots, per-channel weight scales, per-tensor
activation scales; activations are requantized in-register to the next
block's input scale, so the chain's internal traffic is int8 in VMEM.

The reference's analog is its layer-fusion pass + shared scratch arena
([pub] src/net.cpp fusion, src/mempool.h) taken to the logical endpoint
on a machine with 16 MB of software-managed SRAM.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_chain", "chain_vmem_bytes"]


def _chain_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                  b3_ref, w1s_ref, w2s_ref, w3s_ref, o_ref, *,
                  H: int, W: int, C: int, Cm: int, NB: int, nb: int,
                  int8: bool, out_int8: bool, sx, sy1, sy2, r_out):
    M = NB * H * W
    act = x_ref[0]                         # (M, C) int8 (or float)

    def q8(v, inv_scale):
        return jnp.clip(jnp.round(v * inv_scale), -127, 127
                        ).astype(jnp.int8)

    for j in range(nb):
        # ---- conv1: 1x1 C -> Cm --------------------------------------
        if int8:
            a1 = jnp.dot(act, w1_ref[j], preferred_element_type=jnp.int32
                         ).astype(jnp.float32) * (w1s_ref[j] * sx[j])
        else:
            a1 = jnp.dot(act, w1_ref[j], preferred_element_type=jnp.float32)
        y1 = jnp.maximum(a1 + b1_ref[j], 0.0)

        # ---- conv2: 3x3 pad 1 (9 shifted GEMMs in VMEM) --------------
        if int8:
            y1 = q8(y1, 1.0 / sy1[j])
        else:
            y1 = y1.astype(act.dtype)
        y1p = jnp.pad(y1.reshape(NB, H, W, Cm),
                      ((0, 0), (1, 1), (1, 1), (0, 0)))
        a2 = jnp.zeros((M, Cm), jnp.float32)
        for kh in range(3):
            for kw in range(3):
                sl = y1p[:, kh:kh + H, kw:kw + W, :].reshape(M, Cm)
                wk = w2_ref[j, (kh * 3 + kw) * Cm:(kh * 3 + kw + 1) * Cm, :]
                if int8:
                    a2 += jnp.dot(sl, wk, preferred_element_type=jnp.int32
                                  ).astype(jnp.float32)
                else:
                    a2 += jnp.dot(sl, wk,
                                  preferred_element_type=jnp.float32)
        if int8:
            a2 = a2 * (w2s_ref[j] * sy1[j])
        y2 = jnp.maximum(a2 + b2_ref[j], 0.0)

        # ---- conv3: 1x1 Cm -> C + shortcut + relu --------------------
        if int8:
            y2 = q8(y2, 1.0 / sy2[j])
            a3 = jnp.dot(y2, w3_ref[j], preferred_element_type=jnp.int32
                         ).astype(jnp.float32) * (w3s_ref[j] * sy2[j])
            shortcut = act.astype(jnp.float32) * sx[j]
        else:
            y2 = y2.astype(act.dtype)
            a3 = jnp.dot(y2, w3_ref[j], preferred_element_type=jnp.float32)
            shortcut = act.astype(jnp.float32)
        out = jnp.maximum(a3 + b3_ref[j] + shortcut, 0.0)

        if j < nb - 1:
            # requantize (int8) / downcast to the next block's input
            act = q8(out, r_out[j]) if int8 else out.astype(act.dtype)
        elif int8 and out_int8:
            o_ref[0] = q8(out, r_out[j])
        else:
            o_ref[0] = out.astype(o_ref.dtype)


def chain_vmem_bytes(chunk: int, H: int, W: int, C: int, Cm: int,
                     itemsize: int, wbytes_total: int) -> int:
    """Rough per-grid-step VMEM footprint for the chunk sizer and the
    fusion pass's eligibility gate: f32 temporaries (a1/a2 at Cm, the
    f32 block output at C, x1.5 safety for Mosaic's transients) + padded
    conv2 input + in/out chunk double buffers + all resident weights."""
    M = chunk * H * W
    f32_tmp = M * (2 * Cm + C) * 6
    pad_act = chunk * (H + 2) * (W + 2) * Cm * itemsize
    act = 4 * M * C * itemsize                # x/out blocks, double-buffered
    return f32_tmp + pad_act + act + wbytes_total


@functools.partial(
    jax.jit,
    static_argnames=("scales", "out_dtype", "interpret"))
def fused_chain(x: jnp.ndarray,
                w1, b1, w2, b2, w3, b3,
                w_scales=None,
                scales: Optional[tuple] = None,
                out_dtype=None,
                interpret: bool = False) -> jnp.ndarray:
    """Run ``nb`` chained identity bottlenecks in one pallas_call.

    x: (N,H,W,C) int8 (full-int8 mode) or bf16/f32.
    w1: (nb,C,Cm); w2: (nb,9*Cm,Cm); w3: (nb,Cm,C); biases (nb,·) f32.
    int8 mode: ``w_scales=(s1,s2,s3)`` with shapes (nb,Cm/Cm/C) and
    ``scales = (sx_tuple, sy1_tuple, sy2_tuple, s_out)`` where each tuple
    has nb entries and ``s_out`` is the output int8 scale or None for a
    float output.
    """
    N, H, W, C = x.shape
    nb, _, Cm = w1.shape
    int8 = x.dtype == jnp.int8
    if out_dtype is None:
        out_dtype = jnp.bfloat16 if int8 else x.dtype
    out_int8 = False
    sx = sy1 = sy2 = r = (1.0,) * nb
    if int8:
        assert scales is not None and w_scales is not None
        sx, sy1, sy2, s_out = scales
        out_int8 = s_out is not None
        if out_int8:
            out_dtype = jnp.int8
        # r[j] = 1/s_x[j+1] (requant for the next block); the last entry
        # requantizes to the chain output scale (or is unused: float out).
        r = tuple([1.0 / sx[j + 1] for j in range(nb - 1)]
                  + [1.0 / s_out if out_int8 else 1.0])

    itemsize = jnp.dtype(x.dtype).itemsize
    HW = H * W
    wbytes = (C * Cm + 9 * Cm * Cm + Cm * C) * w1.dtype.itemsize * nb

    chunk = N
    while chunk > 1 and chain_vmem_bytes(
            chunk, H, W, C, Cm, itemsize, wbytes) > 10 * 1024 * 1024:
        for d in (2, 3, 5, 7):
            if chunk % d == 0:
                chunk //= d
                break
        else:
            chunk = 1
    q = N // chunk
    M = chunk * HW

    xs = x.reshape(q, M, C)
    ones = lambda shape: jnp.ones(shape, jnp.float32)
    w1s, w2s, w3s = (w_scales if w_scales is not None
                     else (ones((nb, Cm)), ones((nb, Cm)), ones((nb, C))))

    kernel = functools.partial(
        _chain_kernel, H=H, W=W, C=C, Cm=Cm, NB=chunk, nb=nb,
        int8=int8, out_int8=out_int8,
        sx=tuple(map(float, sx)), sy1=tuple(map(float, sy1)),
        sy2=tuple(map(float, sy2)), r_out=tuple(map(float, r)))

    full = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    out = pl.pallas_call(
        kernel,
        grid=(q,),
        in_specs=[
            pl.BlockSpec((1, M, C), lambda i: (i, 0, 0)),
            full(nb, C, Cm),
            full(nb, 1, Cm),
            full(nb, 9 * Cm, Cm),
            full(nb, 1, Cm),
            full(nb, Cm, C),
            full(nb, 1, C),
            full(nb, 1, Cm),
            full(nb, 1, Cm),
            full(nb, 1, C),
        ],
        out_specs=pl.BlockSpec((1, M, C), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((q, M, C), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * HW * (C * Cm * 2 + 9 * Cm * Cm) * nb,
            bytes_accessed=int(2 * N * HW * C * itemsize + wbytes),
            transcendentals=0),
        interpret=interpret,
    )(xs,
      w1, b1.astype(jnp.float32).reshape(nb, 1, Cm),
      w2.reshape(nb, 9 * Cm, Cm),
      b2.astype(jnp.float32).reshape(nb, 1, Cm),
      w3, b3.astype(jnp.float32).reshape(nb, 1, C),
      jnp.asarray(w1s, jnp.float32).reshape(nb, 1, Cm),
      jnp.asarray(w2s, jnp.float32).reshape(nb, 1, Cm),
      jnp.asarray(w3s, jnp.float32).reshape(nb, 1, C))

    return out.reshape(N, H, W, C)
