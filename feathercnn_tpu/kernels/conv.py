"""Implicit-GEMM convolution on the MXU (no im2col materialization).

The reference lowers conv to im2col + packed SGEMM, materializing the
patch matrix in a scratch arena ([pub] src/booster/arm/generic_kernels.cpp
im2col + src/booster/arm/sgemm.cpp).  On TPU the patch matrix would burn
HBM bandwidth (KH*KW x activation bytes), so this kernel gathers patches
implicitly (cf. PAPERS.md:5, implicit convolution on MMA accelerators):

  - activations are laid out as row slabs (Hp, N*Wp, C): one padded image
    row across the whole batch, flattened so M = N*Wp feeds the MXU even
    at small spatial sizes (7x7 features at batch 32 -> M=416, not 9);
  - grid (OH, Co/bn, KH): the kh axis is a *grid* dimension, so the
    overlapping input windows become block-granular row indices
    (row = stride*oh + kh) — no unaligned BlockSpec windows;
  - inside the kernel, for each kw: GEMM the whole slab against
    w[kh, kw] (C x bn) and accumulate the kw-shifted product into the
    f32 accumulator — shifting the *product* instead of gathering input
    patches costs a VPU copy of OW*bn instead of OW*C per tap;
  - epilogue on the last kh: dequant (per-out-channel w_scale x x_scale)
    + bias + ReLU/ReLU6 + optional requant to int8, identical to
    kernels/matmul.py (the fused store-back of the reference's sgemm /
    Winograd output transform, [pub] src/booster/arm/winograd_kernels_F63.cpp).

Supports stride 1 and 2 (stride 2 via parity split of the padded width),
f32 / bf16 / weight-only-int8 / full-int8.  Grouped, dilated, or tiny-C
convs fall back to XLA in kernels/dispatch.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv2d_implicit_gemm"]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _conv_kernel(x_ref, w_ref, bias_ref, wscale_ref, o_ref, acc_ref, *,
                 KH: int, KW: int, C: int, NB: int, Wp: int, OWp: int,
                 stride: int, activation: Optional[str], has_bias: bool,
                 w_quant: bool, x_scale: float, out_scale: float):
    kh = pl.program_id(2)

    @pl.when(kh == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[0]  # (NB*Wp, C) row slab at input row stride*oh + kh
    int8_in = x.dtype == jnp.int8
    bn = acc_ref.shape[-1]
    # One GEMM per kw tap against the whole row slab; the kw shift is
    # applied to the *product* (OW x bn VPU copy), never to the input —
    # an in-VMEM im2col variant compiled slower and hangs Mosaic on this
    # backend (concat/scratch-write sublane-offset lowering).
    for kw in range(KW):
        wk = w_ref[0, kw * C:(kw + 1) * C, :]
        if int8_in:
            p = jnp.dot(x, wk, preferred_element_type=jnp.int32
                        ).astype(jnp.float32)
        else:
            if wk.dtype == jnp.int8:
                wk = wk.astype(x.dtype)
            p = jnp.dot(x, wk, preferred_element_type=jnp.float32)
        p3 = p.reshape(NB, Wp, bn)
        if stride == 1:
            ps = p3[:, kw:kw + OWp, :]
        else:  # stride 2: padded col = 2*ow + kw -> parity plane kw%2
            p4 = p3.reshape(NB, Wp // 2, 2, bn)
            ps = p4[:, kw // 2: kw // 2 + OWp, kw % 2, :]
        acc_ref[:] += ps.reshape(NB * OWp, bn)

    @pl.when(kh == KH - 1)
    def _():
        acc = acc_ref[:]
        if w_quant:
            acc = acc * wscale_ref[:]
        if x_scale != 1.0:
            acc = acc * x_scale
        if has_bias:
            acc = acc + bias_ref[:]
        if activation == "relu":
            acc = jnp.maximum(acc, 0.0)
        elif activation == "relu6":
            acc = jnp.clip(acc, 0.0, 6.0)
        if o_ref.dtype == jnp.int8:
            acc = jnp.clip(jnp.round(acc * out_scale), -127, 127)
        o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("stride", "pad_h", "pad_w", "activation", "out_dtype",
                     "x_scale", "out_scale", "bn", "interpret"))
def conv2d_implicit_gemm(x: jnp.ndarray, w: jnp.ndarray,
                         bias: Optional[jnp.ndarray] = None,
                         w_scale: Optional[jnp.ndarray] = None,
                         stride: int = 1, pad_h: int = 0, pad_w: int = 0,
                         activation: Optional[str] = None,
                         out_dtype=None,
                         x_scale: float = 1.0, out_scale: float = 1.0,
                         bn: int = 256,
                         interpret: bool = False) -> jnp.ndarray:
    """NHWC conv.  x: (N,H,W,C) f32/bf16/int8; w: (KH,KW,C,Co)."""
    N, H, W, C = x.shape
    KH, KW, Cw, Co = w.shape
    assert C == Cw, (x.shape, w.shape)
    assert stride in (1, 2), stride
    out_dtype = out_dtype or (x.dtype if x.dtype != jnp.int8 else jnp.bfloat16)
    OH = (H + 2 * pad_h - KH) // stride + 1
    OW = (W + 2 * pad_w - KW) // stride + 1

    # Row-align the flattened M dims (N*OWp for the accumulator, N*Wp for
    # the input slab) to the sublane tile of their dtypes.
    min_sub = {jnp.dtype(jnp.int8): 32, jnp.dtype(jnp.bfloat16): 16}.get(
        jnp.dtype(x.dtype), 8)
    OWp = OW
    while (N * OWp) % 8:
        OWp += 1
    # Padded width must cover every tap: stride*(OWp-1) + KW; even for s=2.
    Wp = stride * (OWp - 1) + KW
    if stride == 2 and Wp % 2:
        Wp += 1
    while (N * Wp) % min_sub or (stride == 2 and Wp % 2):
        Wp += 2 if stride == 2 else 1
    Hp = stride * (OH - 1) + KH

    # Chunk the batch so slab + accumulator + weight blocks fit VMEM.
    itemsize = jnp.dtype(x.dtype).itemsize
    chunk = N
    q = 1
    def _vmem(chunk):
        slab = chunk * Wp * C * itemsize * 2          # double-buffered
        acc = chunk * OWp * 256 * 4
        xcol = chunk * OWp * KW * C * itemsize        # im2col scratch
        return slab + acc + xcol
    while chunk > 1 and _vmem(chunk) > 6 * 1024 * 1024:
        # halve along the largest divisor split
        for d in (2, 3, 5, 7):
            if chunk % d == 0:
                chunk //= d
                break
        else:
            chunk = 1
        q = N // chunk

    pad_w_hi = Wp - W - pad_w
    pad_h_hi = Hp - H - pad_h
    xp = jnp.pad(x, ((0, 0), (pad_h, max(pad_h_hi, 0)),
                     (pad_w, max(pad_w_hi, 0)), (0, 0)))
    xp = xp[:, :Hp, :Wp, :]
    # (N, Hp, Wp, C) -> (q, Hp, chunk*Wp, C): batch-chunked row slabs.
    xs = jnp.transpose(xp.reshape(q, chunk, Hp, Wp, C),
                       (0, 2, 1, 3, 4)).reshape(q, Hp, chunk * Wp, C)

    bnc = min(bn, _round_up(Co, 128))
    Cop = _round_up(Co, bnc)
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, Cop - Co)))
    wf = wp.reshape(KH, KW * C, Cop)

    has_bias = bias is not None
    w_quant = w_scale is not None
    bias_p = jnp.pad((bias if has_bias else jnp.zeros((Co,), jnp.float32))
                     .astype(jnp.float32), (0, Cop - Co)).reshape(1, -1)
    wscale_p = jnp.pad((w_scale if w_quant else jnp.ones((Co,), jnp.float32))
                       .astype(jnp.float32), (0, Cop - Co)).reshape(1, -1)

    kernel = functools.partial(
        _conv_kernel, KH=KH, KW=KW, C=C, NB=chunk, Wp=Wp, OWp=OWp,
        stride=stride, activation=activation, has_bias=has_bias,
        w_quant=w_quant, x_scale=float(x_scale), out_scale=float(out_scale))

    M = chunk * OWp

    def run_chunk(xs_c):
        # NOTE: index maps must stay divmod-free — integer %// in an
        # index_map hangs the axon backend (memory: axon-pallas-quirks).
        return pl.pallas_call(
            kernel,
            grid=(OH, Cop // bnc, KH),
            in_specs=[
                pl.BlockSpec((1, chunk * Wp, C),
                             lambda oh, j, kh, s=stride: (s * oh + kh, 0, 0)),
                pl.BlockSpec((1, KW * C, bnc), lambda oh, j, kh: (kh, 0, j)),
                pl.BlockSpec((1, bnc), lambda oh, j, kh: (0, j)),
                pl.BlockSpec((1, bnc), lambda oh, j, kh: (0, j)),
            ],
            out_specs=pl.BlockSpec((1, M, bnc), lambda oh, j, kh: (oh, 0, j)),
            out_shape=jax.ShapeDtypeStruct((OH, M, Cop), out_dtype),
            scratch_shapes=[pltpu.VMEM((M, bnc), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=2 * OH * KH * KW * chunk * Wp * C * Cop,
                bytes_accessed=int(OH * KH * chunk * Wp * C * xs.dtype.itemsize
                                   + OH * M * Cop * jnp.dtype(out_dtype).itemsize),
                transcendentals=0),
            interpret=interpret,
        )(xs_c, wf, bias_p, wscale_p)

    if q == 1:
        out = run_chunk(xs[0])[None]
    else:
        out = jax.lax.map(run_chunk, xs)

    # (q, OH, chunk*OWp, Cop) -> (N, OH, OW, Co)
    out = out.reshape(q, OH, chunk, OWp, Cop)
    out = jnp.transpose(out, (0, 2, 1, 3, 4)).reshape(N, OH, OWp, Cop)
    return out[:, :, :OW, :Co]
