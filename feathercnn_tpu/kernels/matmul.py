"""Pallas MXU matmul with fused epilogue — the engine's SGEMM.

The reference's performance core is a packed SGEMM with bias/ReLU fused
into the store-back ([pub] src/booster/arm/sgemm.cpp: NEON micro-kernels,
OpenMP over row blocks).  The TPU-native equivalent is one Pallas kernel:

  grid (M/bm, N/bn, K/bk), K innermost; f32 accumulation in VMEM scratch;
  the epilogue on the last K step fuses — in order —
     int8 dequant (per-output-channel scale x per-tensor act scale)
     + bias + activation (ReLU/ReLU6) + optional requantize-to-int8
  exactly the set FeatherCNN folds into its GEMM/Winograd epilogues, plus
  the quantization the north-star adds (BASELINE.json:5).

Variants (all one kernel, static flags):
  f32/bf16 x f32/bf16          -> float out            (FP paths)
  bf16 x int8 (+w scales)      -> float out            (weight-only INT8)
  int8 x int8 (+both scales)   -> float or int8 out    (full INT8, int32 MXU)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["matmul_epilogue", "pad_dim"]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pad_dim(x: jnp.ndarray, axis: int, mult: int):
    """Pad ``axis`` up to a multiple of ``mult`` (XLA fuses the pad)."""
    size = x.shape[axis]
    target = _round_up(size, mult)
    if target == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - size)
    return jnp.pad(x, pads)


def _matmul_kernel(x_ref, w_ref, bias_ref, wscale_ref, o_ref, acc_ref, *,
                   n_k: int, activation: Optional[str], has_bias: bool,
                   w_quant: bool, x_scale: float, out_scale: float,
                   out_dtype):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    w = w_ref[:]
    if x.dtype == jnp.int8:
        # int8 x int8 -> int32 on the MXU (double throughput vs bf16)
        acc_ref[:] += jnp.dot(
            x, w, preferred_element_type=jnp.int32).astype(jnp.float32)
    else:
        if w.dtype == jnp.int8:
            # weight-only int8: upcast the weight tile in VMEM; the
            # per-channel scale applies once in the epilogue so the K-loop
            # stays a plain MXU matmul.
            w = w.astype(x.dtype)
        acc_ref[:] += jnp.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        acc = acc_ref[:]
        if w_quant:
            acc = acc * wscale_ref[:]          # (1, bn) per-out-channel
        if x_scale != 1.0:
            acc = acc * x_scale                # per-tensor activation scale
        if has_bias:
            acc = acc + bias_ref[:]
        if activation == "relu":
            acc = jnp.maximum(acc, 0.0)
        elif activation == "relu6":
            acc = jnp.clip(acc, 0.0, 6.0)
        if out_dtype == jnp.int8:
            # requantize: round-to-nearest-even, saturate
            acc = jnp.clip(jnp.round(acc * out_scale), -127, 127)
        o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("activation", "out_dtype", "x_scale", "out_scale",
                     "bm", "bn", "bk", "interpret"))
def matmul_epilogue(x: jnp.ndarray, w: jnp.ndarray,
                    bias: Optional[jnp.ndarray] = None,
                    w_scale: Optional[jnp.ndarray] = None,
                    activation: Optional[str] = None,
                    out_dtype=None,
                    x_scale: float = 1.0,
                    out_scale: float = 1.0,
                    bm: int = 512, bn: int = 1024, bk: int = 1024,
                    interpret: bool = False) -> jnp.ndarray:
    """``y = act((x @ w) * w_scale * x_scale + bias) [* out_scale -> int8]``

    x: (M, K) float32/bfloat16/int8;  w: (K, N) same-or-int8;
    bias: (N,) f32;  w_scale: (N,) f32 per-output-channel dequant scale.
    Ragged M/N/K are padded here and sliced on return.
    """
    M, K = x.shape
    K2, N = w.shape
    assert K == K2, (x.shape, w.shape)
    out_dtype = out_dtype or (x.dtype if x.dtype != jnp.int8 else jnp.bfloat16)
    w_quant = w_scale is not None
    has_bias = bias is not None

    # Thin-K fat-M problems (1x1 convs flattened to GEMM: K=C small,
    # M=N*H*W huge) want much taller M blocks — grid-step overhead
    # otherwise dominates the tiny per-step matmul.
    if K <= 512 and M >= 8 * bm:
        bm, bn = 2048, 256

    # Clamp block sizes to the (padded) problem and hardware minima.
    min_tile = 32 if jnp.int8 in (x.dtype, w.dtype) else (
        16 if x.dtype == jnp.bfloat16 else 8)
    bm = min(bm, _round_up(M, min_tile))
    bn = min(bn, _round_up(N, 128))
    bk = min(bk, _round_up(K, min_tile * 2 if x.dtype == jnp.int8 else 128))

    xp = pad_dim(pad_dim(x, 0, bm), 1, bk)
    wp = pad_dim(pad_dim(w, 0, bk), 1, bn)
    Mp, Kp = xp.shape
    Np = wp.shape[1]
    n_k = Kp // bk

    # Dummy epilogue vectors must still span Np: every grid block (0, j) is
    # addressed, and an out-of-range BlockSpec block hangs real hardware.
    bias_p = pad_dim((bias if has_bias else jnp.zeros((N,), jnp.float32))
                     .astype(jnp.float32).reshape(1, -1), 1, bn)
    wscale_p = pad_dim((w_scale if w_quant else jnp.ones((N,), jnp.float32))
                       .astype(jnp.float32).reshape(1, -1), 1, bn)

    kernel = functools.partial(
        _matmul_kernel, n_k=n_k, activation=activation, has_bias=has_bias,
        w_quant=w_quant, x_scale=float(x_scale), out_scale=float(out_scale),
        out_dtype=jnp.dtype(out_dtype))

    out = pl.pallas_call(
        kernel,
        grid=(Mp // bm, Np // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        # NOTE: no dimension_semantics — it hangs the axon TPU backend
        # (see memory: axon-pallas-quirks).
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=(Mp * Kp * xp.dtype.itemsize
                            + Kp * Np * wp.dtype.itemsize
                            + Mp * Np * jnp.dtype(out_dtype).itemsize),
            transcendentals=0),
        interpret=interpret,
    )(xp, wp, bias_p, wscale_p)
    if (Mp, Np) != (M, N):
        out = out[:M, :N]
    return out
