"""Implicit-GEMM convolution on the MXU (no im2col materialization).

The reference lowers conv to im2col + packed SGEMM, materializing the
patch matrix in a scratch arena ([pub] src/booster/arm/generic_kernels.cpp
im2col + src/booster/arm/sgemm.cpp).  On TPU the patch matrix would burn
HBM bandwidth (KH*KW x activation bytes), so this kernel gathers patches
implicitly (cf. PAPERS.md:5, implicit convolution on MMA accelerators):

  - activations are laid out as row slabs (Hp, chunk*Wp, C): padded image
    rows across a batch chunk, flattened so the MXU M dimension is
    bh * chunk * Wp even at small spatial sizes;
  - the grid is (OH/bh, Co/bn); each step reads ONE overlapping window of
    bh_in = (bh-1)*stride + KH input rows via an element-granular
    ``pl.Element`` BlockSpec (overlap is not expressible with blocked
    indexing), unrolls the KH x KW taps, and accumulates the kw-shifted
    GEMM products — shifting the *product* costs a VPU copy of OW*bn
    instead of gathering OW*C patches per tap;
  - stride 2 uses parity-plane reshapes (static slicing only — Mosaic has
    no strided vector loads);
  - the epilogue fuses dequant (per-out-channel w_scale x per-tensor
    x_scale) + bias + ReLU/ReLU6 + optional requant-to-int8, the same
    store-back set as the reference's sgemm / Winograd output transforms
    ([pub] src/booster/arm/winograd_kernels_F63.cpp) plus the INT8 the
    north-star adds (BASELINE.json:5).

Supports stride 1 and 2, f32 / bf16 / weight-only-int8 / full-int8.
Grouped, dilated, or tiny-C convs fall back to XLA in kernels/dispatch.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv2d_implicit_gemm"]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _conv_kernel(x_ref, w_ref, bias_ref, wscale_ref, o_ref, acc_ref, *,
                 KH: int, KW: int, C: int, NB: int, Wp: int, OWp: int,
                 bh: int, stride: int, activation: Optional[str],
                 has_bias: bool, w_quant: bool, x_scale: float,
                 out_scale: float):
    int8_in = x_ref.dtype == jnp.int8
    bn = o_ref.shape[-1]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for kh in range(KH):
        if stride == 1:
            xk = x_ref[kh:kh + bh]                   # (bh, NB*Wp, C)
        else:
            bh_in = x_ref.shape[0]
            xr = x_ref[:].reshape(bh_in // 2, 2, NB * Wp, C)
            xk = xr[kh // 2: kh // 2 + bh, kh % 2]
        xk = xk.reshape(bh * NB, Wp, C).reshape(bh * NB * Wp, C)
        for kw in range(KW):
            wk = w_ref[0, (kh * KW + kw) * C:(kh * KW + kw + 1) * C, :]
            if int8_in:
                p = jnp.dot(xk, wk, preferred_element_type=jnp.int32
                            ).astype(jnp.float32)
            else:
                if wk.dtype == jnp.int8:
                    wk = wk.astype(xk.dtype)
                p = jnp.dot(xk, wk, preferred_element_type=jnp.float32)
            p3 = p.reshape(bh * NB, Wp, bn)
            if stride == 1:
                ps = p3[:, kw:kw + OWp, :]
            else:  # padded col = 2*ow + kw -> parity plane kw%2
                p4 = p3.reshape(bh * NB, Wp // 2, 2, bn)
                ps = p4[:, kw // 2: kw // 2 + OWp, kw % 2, :]
            acc_ref[:] += ps.reshape(bh * NB * OWp, bn)

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
    o_ref[:] = acc.reshape(bh, NB * OWp, bn).astype(o_ref.dtype)


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
    itemsize = jnp.dtype(x.dtype).itemsize
    min_sub = {jnp.dtype(jnp.int8): 32, jnp.dtype(jnp.bfloat16): 16}.get(
        jnp.dtype(x.dtype), 8)

    bnc = min(bn, _round_up(Co, 128))
    Cop = _round_up(Co, bnc)

    # ---- tile-size selection ------------------------------------------
    # chunk: batch images per pallas call; bh: output rows per grid step.
    # Aim the GEMM M dimension (bh*chunk*Wp) at ~2-4k rows and keep
    # window + accumulator + weights inside a VMEM budget.
    def wp_of(ow_p):
        wp = stride * (ow_p - 1) + KW
        if stride == 2 and wp % 2:
            wp += 1
        return wp

    def aligned(chunk):
        ow_p = OW
        while (chunk * ow_p) % 8:
            ow_p += 1
        wp = wp_of(ow_p)
        while (chunk * wp) % min_sub or (stride == 2 and wp % 2):
            wp += 2 if stride == 2 else 1
        return ow_p, wp

    def vmem_use(chunk, bh, ow_p, wp):
        bh_in = (bh - 1) * stride + KH + (1 if stride == 2 else 0)
        win = bh_in * chunk * wp * C * itemsize * 2
        accv = bh * chunk * ow_p * bnc * 4
        wv = KH * KW * C * bnc * (w.dtype.itemsize) * 2
        out = bh * chunk * ow_p * bnc * jnp.dtype(out_dtype).itemsize * 2
        return win + accv + wv + out

    chunk = N
    while True:
        ow_p, wp = aligned(chunk)
        bh = max(1, min(OH, 4096 // max(chunk * wp, 1)))
        if vmem_use(chunk, bh, ow_p, wp) <= 8 * 1024 * 1024 or chunk == 1:
            break
        for d in (2, 3, 5, 7):
            if chunk % d == 0:
                chunk //= d
                break
        else:
            chunk = 1
    while bh > 1 and vmem_use(chunk, bh, ow_p, wp) > 8 * 1024 * 1024:
        bh -= 1
    q = N // chunk
    OWp, Wp = ow_p, wp
    OHp = _round_up(OH, bh)
    Hp = stride * (OHp - 1) + KH
    bh_in = (bh - 1) * stride + KH
    if stride == 2 and bh_in % 2:
        bh_in += 1
    Hp = max(Hp, stride * (OHp - bh) + bh_in)

    # ---- data staging --------------------------------------------------
    xp = jnp.pad(x, ((0, 0), (pad_h, max(Hp - H - pad_h, 0)),
                     (pad_w, max(Wp - W - pad_w, 0)), (0, 0)))
    xp = xp[:, :Hp, :Wp, :]
    # (N, Hp, Wp, C) -> (q, Hp, chunk*Wp, C): batch-chunked row slabs.
    xs = jnp.transpose(xp.reshape(q, chunk, Hp, Wp, C),
                       (0, 2, 1, 3, 4)).reshape(q, Hp, chunk * Wp, C)

    wf = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, Cop - Co))
                 ).reshape(1, KH * KW * C, Cop)

    has_bias = bias is not None
    w_quant = w_scale is not None
    bias_p = jnp.pad((bias if has_bias else jnp.zeros((Co,), jnp.float32))
                     .astype(jnp.float32), (0, Cop - Co)).reshape(1, -1)
    wscale_p = jnp.pad((w_scale if w_quant else jnp.ones((Co,), jnp.float32))
                       .astype(jnp.float32), (0, Cop - Co)).reshape(1, -1)

    kernel = functools.partial(
        _conv_kernel, KH=KH, KW=KW, C=C, NB=chunk, Wp=Wp, OWp=OWp, bh=bh,
        stride=stride, activation=activation, has_bias=has_bias,
        w_quant=w_quant, x_scale=float(x_scale), out_scale=float(out_scale))

    Ms = chunk * Wp
    Mo = chunk * OWp

    def run_chunk(xs_c):
        # NOTE: index maps must stay divmod-free, and overlapping input
        # windows need all-Element block dims (axon-pallas-quirks).
        return pl.pallas_call(
            kernel,
            grid=(OHp // bh, Cop // bnc),
            in_specs=[
                pl.BlockSpec((pl.Element(bh_in), pl.Element(Ms),
                              pl.Element(C)),
                             lambda i, j, s=stride, b=bh: (i * b * s, 0, 0)),
                pl.BlockSpec((1, KH * KW * C, bnc), lambda i, j: (0, 0, j)),
                pl.BlockSpec((1, bnc), lambda i, j: (0, j)),
                pl.BlockSpec((1, bnc), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((bh, Mo, bnc), lambda i, j: (i, 0, j)),
            out_shape=jax.ShapeDtypeStruct((OHp, Mo, Cop), out_dtype),
            scratch_shapes=[pltpu.VMEM((bh * Mo, bnc), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=2 * OHp * KH * KW * chunk * Wp * C * Cop,
                bytes_accessed=int(OHp * chunk * Wp * C * itemsize
                                   + OHp * Mo * Cop
                                   * jnp.dtype(out_dtype).itemsize),
                transcendentals=0),
            interpret=interpret,
        )(xs_c, wf, bias_p, wscale_p)

    if q == 1:
        out = run_chunk(xs[0])[None]
    else:
        out = jax.lax.map(run_chunk, xs)

    # (q, OHp, chunk*OWp, Cop) -> (N, OH, OW, Co)
    out = out.reshape(q, OHp, chunk, OWp, Cop)
    out = jnp.transpose(out, (0, 2, 1, 3, 4)).reshape(N, OHp, OWp, Cop)
    return out[:, :OH, :OW, :Co]
