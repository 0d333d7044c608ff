"""Winograd F(6x6,3x3) convolution — the WINOGRADF63 path.

The reference's highest-optimized kernel: 8x8 input tiles, B^T d B input
transform, 64 batched GEMMs over transformed positions, A^T m A output
transform with fused bias/ReLU ([pub] src/booster/arm/winograd_kernels_F63.cpp,
selected for 3x3 stride-1 convs by [pub] src/booster/arm/booster.cpp).

TPU-native restatement: the transforms are small dense matmuls XLA fuses
onto the VPU/MXU, and the 64 per-position GEMMs become one batched
``dot_general`` (batch dim 64) that maps straight onto the MXU.  Numerics:
F(6,3) transform magnitudes force f32 transforms even for bf16 activations
(SURVEY.md §7 hard parts); the GEMM runs in the compute dtype with f32
accumulation.

As SURVEY.md predicts, on an MXU implicit GEMM often beats Winograd (the
MXU makes multiplies cheap; the transforms cost bandwidth) — this kernel
exists for parity and for the measured comparison the dispatcher can make
per layer (kernels/dispatch.py 'winograd' algo; bench/roofline.py reports
both).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["winograd_conv2d", "BT", "G", "AT"]

# F(6x6, 3x3) transform matrices, interpolation points {0, ±1, ±2, ±1/2, ∞}
# (Lavin & Gray convention, as used by the reference's F63 kernels).
BT = np.array([
    [1, 0, -21 / 4, 0, 21 / 4, 0, -1, 0],
    [0, 1, 1, -17 / 4, -17 / 4, 1, 1, 0],
    [0, -1, 1, 17 / 4, -17 / 4, -1, 1, 0],
    [0, 1 / 2, 1 / 4, -5 / 2, -5 / 4, 2, 1, 0],
    [0, -1 / 2, 1 / 4, 5 / 2, -5 / 4, -2, 1, 0],
    [0, 2, 4, -5 / 2, -5, 1 / 2, 1, 0],
    [0, -2, 4, 5 / 2, -5, -1 / 2, 1, 0],
    [0, -1, 0, 21 / 4, 0, -21 / 4, 0, 1],
], dtype=np.float64)

G = np.array([
    [1, 0, 0],
    [-2 / 9, -2 / 9, -2 / 9],
    [-2 / 9, 2 / 9, -2 / 9],
    [1 / 90, 1 / 45, 2 / 45],
    [1 / 90, -1 / 45, 2 / 45],
    [32 / 45, 16 / 45, 8 / 45],
    [32 / 45, -16 / 45, 8 / 45],
    [0, 0, 1],
], dtype=np.float64)

AT = np.array([
    [1, 1, 1, 1, 1, 1, 1, 0],
    [0, 1, -1, 2, -2, 1 / 2, -1 / 2, 0],
    [0, 1, 1, 4, 4, 1 / 4, 1 / 4, 0],
    [0, 1, -1, 8, -8, 1 / 8, -1 / 8, 0],
    [0, 1, 1, 16, 16, 1 / 16, 1 / 16, 0],
    [0, 1, -1, 32, -32, 1 / 32, -1 / 32, 1],
], dtype=np.float64)

_M = 6   # output tile
_A = 8   # input tile (m + r - 1)


def transform_weights(w: jnp.ndarray) -> jnp.ndarray:
    """G g G^T: (3,3,C,Co) -> (64, C, Co).  Done once per weight (the
    reference pre-transforms at Init; here XLA CSEs it across steps)."""
    g = jnp.asarray(G, jnp.float32)
    wf = w.astype(jnp.float32)
    v = jnp.einsum("ai,ijco,bj->abco", g, wf, g)
    return v.reshape(_A * _A, w.shape[2], w.shape[3])


@functools.partial(
    jax.jit,
    static_argnames=("pad_h", "pad_w", "activation", "out_dtype"))
def winograd_conv2d(x: jnp.ndarray, w: jnp.ndarray,
                    bias: Optional[jnp.ndarray] = None,
                    w_scale: Optional[jnp.ndarray] = None,
                    pad_h: int = 1, pad_w: int = 1,
                    activation: Optional[str] = None,
                    out_dtype=None) -> jnp.ndarray:
    """3x3 stride-1 conv via F(6x6,3x3).  x: (N,H,W,C) f32/bf16;
    w: (3,3,C,Co) float or int8 (weight-only: dequantized pre-transform,
    which is exact — the transform is linear)."""
    N, H, W, C = x.shape
    KH, KW, _, Co = w.shape
    assert (KH, KW) == (3, 3), "winograd path is 3x3 only"
    out_dtype = out_dtype or x.dtype
    OH, OW = H + 2 * pad_h - 2, W + 2 * pad_w - 2

    if w.dtype == jnp.int8:
        w = w.astype(jnp.float32) * w_scale.reshape(1, 1, 1, -1)

    nth, ntw = -(-OH // _M), -(-OW // _M)
    Hp, Wp = nth * _M + 2, ntw * _M + 2
    xp = jnp.pad(x, ((0, 0), (pad_h, Hp - H - pad_h),
                     (pad_w, Wp - W - pad_w), (0, 0))).astype(jnp.float32)

    # Gather 8x8 tiles at stride 6: d[a,b] = xp[:, 6*th+a, 6*tw+b, :]
    rows = []
    for a in range(_A):
        cols = []
        for b in range(_A):
            cols.append(jax.lax.slice(
                xp, (0, a, b, 0),
                (N, a + _M * (nth - 1) + 1, b + _M * (ntw - 1) + 1, C),
                (1, _M, _M, 1)))
        rows.append(jnp.stack(cols, axis=0))
    d = jnp.stack(rows, axis=0)            # (8, 8, N, nth, ntw, C)

    bt = jnp.asarray(BT, jnp.float32)
    u = jnp.einsum("ai,bj,ijntwc->abntwc", bt, bt,
                   d.reshape(_A, _A, N, nth, ntw, C))
    T = N * nth * ntw
    u = u.reshape(_A * _A, T, C)

    v = transform_weights(w)                # (64, C, Co)

    cdtype = x.dtype if x.dtype != jnp.float32 else jnp.float32
    m = jax.lax.dot_general(
        u.astype(cdtype), v.astype(cdtype),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (64, T, Co)

    at = jnp.asarray(AT, jnp.float32)
    m = m.reshape(_A, _A, N, nth, ntw, Co)
    y = jnp.einsum("ai,bj,ijntwc->abntwc", at, at, m)   # (6,6,N,nth,ntw,Co)

    # Reassemble tiles: (6,6,N,nth,ntw,Co) -> (N, 6*nth, 6*ntw, Co)
    y = jnp.transpose(y, (2, 3, 0, 4, 1, 5)).reshape(
        N, nth * _M, ntw * _M, Co)[:, :OH, :OW, :]

    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if activation == "relu":
        y = jnp.maximum(y, 0)
    elif activation == "relu6":
        y = jnp.clip(y, 0, 6)
    return y.astype(out_dtype)
