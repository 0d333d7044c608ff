"""Depthwise convolution on the VPU — the MobileNet path.

The reference's depthwise kernels are channelwise 3x3 NEON loops with
fused bias/ReLU, OpenMP over channels ([pub] src/booster/arm/depthwise.cpp).
TPU-native shape: NHWC with channels on the 128-lane axis and the padded
width on sublanes, one padded input row per (oh, kh) grid step (the same
block-granular halo trick as kernels/conv.py), multiply-accumulate per
(kh, kw) tap on the VPU, epilogue fused on the last kh.

Supports stride 1 and 2, f32/bf16 activations; int8 depthwise is
dequantized at the edge (depthwise is <2% of MobileNet FLOPs and is
bandwidth-bound, so int8 buys little on the VPU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["depthwise_conv2d"]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _dw_kernel(x_ref, w_ref, bias_ref, o_ref, acc_ref, *,
               KH: int, KW: int, NB: int, Wp: int, OWp: int, stride: int,
               activation: Optional[str], has_bias: bool):
    kh = pl.program_id(1)

    @pl.when(kh == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:, 0].astype(jnp.float32)  # (NB, Wp, C) row at stride*oh + kh
    for kw in range(KW):
        if stride == 1:
            xs = x[:, kw:kw + OWp, :]
        else:
            x4 = x.reshape(NB, Wp // 2, 2, x.shape[-1])
            xs = x4[:, kw // 2: kw // 2 + OWp, kw % 2, :]
        acc_ref[:] += xs * w_ref[kh, kw][None, None, :]

    @pl.when(kh == KH - 1)
    def _():
        acc = acc_ref[:]
        if has_bias:
            acc = acc + bias_ref[0][None, None, :]
        if activation == "relu":
            acc = jnp.maximum(acc, 0.0)
        elif activation == "relu6":
            acc = jnp.clip(acc, 0.0, 6.0)
        o_ref[:, 0] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("stride", "pad_h", "pad_w", "activation", "interpret"))
def depthwise_conv2d(x: jnp.ndarray, w: jnp.ndarray,
                     bias: Optional[jnp.ndarray] = None,
                     stride: int = 1, pad_h: int = 0, pad_w: int = 0,
                     activation: Optional[str] = None,
                     interpret: bool = False) -> jnp.ndarray:
    """x: (N,H,W,C); w: (KH,KW,C) or HWIO-style (KH,KW,1,C)."""
    if w.ndim == 4:
        w = w.reshape(w.shape[0], w.shape[1], -1)
    N, H, W, C = x.shape
    KH, KW, Cw = w.shape
    assert C == Cw, (x.shape, w.shape)
    assert stride in (1, 2)
    OH = (H + 2 * pad_h - KH) // stride + 1
    OW = (W + 2 * pad_w - KW) // stride + 1

    OWp = OW
    while OWp % 8:
        OWp += 1
    Wp = stride * (OWp - 1) + KW
    if stride == 2 and Wp % 2:
        Wp += 1
    while Wp % 8 or (stride == 2 and Wp % 2):
        Wp += 2 if stride == 2 else 1
    Hp = stride * (OH - 1) + KH

    xp = jnp.pad(x, ((0, 0), (pad_h, max(Hp - H - pad_h, 0)),
                     (pad_w, max(Wp - W - pad_w, 0)), (0, 0)))
    xp = xp[:, :Hp, :Wp, :]

    has_bias = bias is not None
    bias_p = (bias if has_bias else jnp.zeros((C,))).astype(
        jnp.float32).reshape(1, C)
    wf = w.astype(jnp.float32)

    kernel = functools.partial(
        _dw_kernel, KH=KH, KW=KW, NB=N, Wp=Wp, OWp=OWp, stride=stride,
        activation=activation, has_bias=has_bias)

    out = pl.pallas_call(
        kernel,
        grid=(OH, KH),
        in_specs=[
            pl.BlockSpec((N, 1, Wp, C),
                         lambda oh, kh, s=stride: (0, s * oh + kh, 0, 0)),
            pl.BlockSpec((KH, KW, C), lambda oh, kh: (0, 0, 0)),
            pl.BlockSpec((1, C), lambda oh, kh: (0, 0)),
        ],
        out_specs=pl.BlockSpec((N, 1, OWp, C), lambda oh, kh: (0, oh, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, OH, OWp, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((N, OWp, C), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * OH * OWp * KH * KW * C,
            bytes_accessed=int(N * Hp * Wp * C * x.dtype.itemsize * KH
                               + N * OH * OWp * C * x.dtype.itemsize),
            transcendentals=0),
        interpret=interpret,
    )(xp, wf, bias_p)
    return out[:, :, :OW, :]
