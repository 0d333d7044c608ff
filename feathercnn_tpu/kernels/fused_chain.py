"""VMEM-resident fused bottleneck *chains* — region fusion v2.

Round-1 measurement (ROADMAP.md): fusing one bottleneck into one Pallas
call wins per-block but loses whole-model, because every per-block custom
call still pays an HBM round trip + layout transition at its boundary;
and the per-layer roofline (BASELINE.md) shows ResNet-50's 56x56 stage is
bandwidth-bound — its 1x1 convs move ~130 MB/batch each and run at
16-18 TF/s.  All identity blocks in a ResNet stage share one
(H, W, C, Cm) signature, so this kernel runs the *whole chain* of them in
a single ``pallas_call``:

  - grid = (batch_chunk,); the block loop is unrolled inside the kernel,
    so the chunk's activation never leaves VMEM between blocks — HBM sees
    ONE read of x and ONE write of the result per chunk, regardless of
    chain length (vs 2 reads + 1 write per block per layer before);
  - every block's weights sit in VMEM for the whole call (constant
    BlockSpec index) — loaded from HBM exactly once per batch;
  - Mosaic's pipeline machinery double-buffers the x/out chunks, so the
    next chunk streams in while the current one computes;
  - per-block quant scales are compile-time constants (static unroll);
  - for large spatial sizes (56x56) the f32 GEMM temporaries are bounded
    by *row-slab tiling*: activations persist in int8 VMEM scratch, and
    each 1x1/3x3 GEMM processes a slab of image rows at a time (1-row
    halo for the 3x3), so stage-2 fuses too instead of being VMEM-gated
    out.

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

__all__ = ["fused_chain", "chain_plan", "chain_vmem_bytes"]


def _q8(v, inv_scale):
    return jnp.clip(jnp.round(v * inv_scale), -127, 127).astype(jnp.int8)


def _block_math(act_get, y1_set, y1_slab_get, sc_get, out_set, *,
                H, W, NB, C, Cm, int8, dtype, slabs, cat_scr,
                w1, b1, w2, b2, w3, b3, w1s, w2s, w3s,
                s_x, s_y1, s_y2, r_out, requant_out, store_dtype):
    """One bottleneck over row slabs.

    act_get(r0, r1) -> (NB, R, W, C) current activation rows
    y1_set(r0, r1, val) / y1_slab_get(lo, hi) -> conv1 output rows
    sc_get(r0, r1) -> shortcut rows (same as act_get)
    out_set(r0, r1, val) -> write block output rows
    cat_scr: (NB, R, W, 9*Cm) scratch or None — when present, the 3x3's
    nine taps are materialized side-by-side (im2col in VMEM) and conv2
    becomes ONE MXU GEMM with K = 9*Cm instead of nine K=Cm dots; the
    big-K single dot keeps the MXU full when Cm is narrow (stage-2's
    Cm=64 runs at half the lanes otherwise).
    """
    # ---- conv1 over slabs: 1x1 C -> Cm -------------------------------
    for r0, r1 in slabs:
        Ms = NB * (r1 - r0) * W
        xs = act_get(r0, r1).reshape(Ms, C)
        if int8:
            a1 = jnp.dot(xs, w1, preferred_element_type=jnp.int32
                         ).astype(jnp.float32) * (w1s * s_x)
        else:
            a1 = jnp.dot(xs, w1, preferred_element_type=jnp.float32)
        y1 = jnp.maximum(a1 + b1, 0.0)
        y1 = _q8(y1, 1.0 / s_y1) if int8 else y1.astype(dtype)
        y1_set(r0, r1, y1.reshape(NB, r1 - r0, W, Cm))

    # ---- conv2 + conv3 + shortcut over slabs -------------------------
    for r0, r1 in slabs:
        R = r1 - r0
        Ms = NB * R * W
        lo, hi = max(r0 - 1, 0), min(r1 + 1, H)
        y1s = y1_slab_get(lo, hi)                 # (NB, hi-lo, W, Cm)
        # zero-pad only at the image border; interior halo rows come from
        # the slice above/below the slab
        y1p = jnp.pad(y1s, ((0, 0), (1 if r0 == 0 else 0,
                                     1 if r1 == H else 0),
                            (1, 1), (0, 0)))
        if cat_scr is not None:
            fold = cat_scr.shape[-1] // Cm        # 3 or 9 taps per GEMM
            groups = ([[(kh, kw) for kh in range(3) for kw in range(3)]]
                      if fold == 9 else
                      [[(kh, kw) for kw in range(3)] for kh in range(3)])
            a2 = jnp.zeros((Ms, Cm), jnp.float32)
            for gi, taps in enumerate(groups):
                for ti, (kh, kw) in enumerate(taps):
                    cat_scr[:, :, :, ti * Cm:(ti + 1) * Cm] = (
                        y1p[:, kh:kh + R, kw:kw + W, :])
                cat = cat_scr[:].reshape(Ms, fold * Cm)
                wk = w2[gi * fold * Cm:(gi + 1) * fold * Cm, :]
                if int8:
                    a2 += jnp.dot(cat, wk, preferred_element_type=jnp.int32
                                  ).astype(jnp.float32)
                else:
                    a2 += jnp.dot(cat, wk,
                                  preferred_element_type=jnp.float32)
            if int8:
                a2 = a2 * (w2s * s_y1)
        else:
            a2 = jnp.zeros((Ms, Cm), jnp.float32)
            for kh in range(3):
                for kw in range(3):
                    sl = y1p[:, kh:kh + R, kw:kw + W, :].reshape(Ms, Cm)
                    wk = w2[(kh * 3 + kw) * Cm:(kh * 3 + kw + 1) * Cm, :]
                    if int8:
                        a2 += jnp.dot(sl, wk,
                                      preferred_element_type=jnp.int32
                                      ).astype(jnp.float32)
                    else:
                        a2 += jnp.dot(sl, wk,
                                      preferred_element_type=jnp.float32)
            if int8:
                a2 = a2 * (w2s * s_y1)
        y2 = jnp.maximum(a2 + b2, 0.0)
        y2 = _q8(y2, 1.0 / s_y2) if int8 else y2.astype(dtype)

        if int8:
            a3 = jnp.dot(y2, w3, preferred_element_type=jnp.int32
                         ).astype(jnp.float32) * (w3s * s_y2)
            shortcut = sc_get(r0, r1).reshape(Ms, C).astype(
                jnp.float32) * s_x
        else:
            a3 = jnp.dot(y2, w3, preferred_element_type=jnp.float32)
            shortcut = sc_get(r0, r1).reshape(Ms, C).astype(jnp.float32)
        out = jnp.maximum(a3 + b3 + shortcut, 0.0)
        if requant_out:
            out = _q8(out, r_out)
        else:
            out = out.astype(store_dtype)
        out_set(r0, r1, out.reshape(NB, R, W, C))


def _chain_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                  b3_ref, w1s_ref, w2s_ref, w3s_ref, o_ref,
                  act_scr, y1_scr, *scratches,
                  H: int, W: int, C: int, Cm: int, NB: int, nb: int,
                  int8: bool, out_int8: bool, slabs,
                  sx, sy1, sy2, r_out):
    dtype = x_ref.dtype
    cat_scr = scratches[0] if scratches else None

    def y1_set(r0, r1, val):
        y1_scr[:, r0:r1] = val

    def y1_get(lo, hi):
        return y1_scr[:, lo:hi]

    for j in range(nb):
        last = j == nb - 1
        requant = int8 and (not last or out_int8)

        if j == 0:
            # block 0 reads straight from the streamed-in x block — no
            # whole-chunk copy into the activation scratch
            def act_get(r0, r1):
                return x_ref[0, :, r0:r1]
        else:
            def act_get(r0, r1):
                return act_scr[:, r0:r1]

        if last:
            def out_set(r0, r1, val):
                o_ref[0, :, r0:r1] = val
        else:
            def out_set(r0, r1, val):
                act_scr[:, r0:r1] = val

        _block_math(
            act_get, y1_set, y1_get, act_get, out_set,
            H=H, W=W, NB=NB, C=C, Cm=Cm, int8=int8, dtype=dtype,
            slabs=slabs, cat_scr=cat_scr,
            w1=w1_ref[j], b1=b1_ref[j], w2=w2_ref[j], b2=b2_ref[j],
            w3=w3_ref[j], b3=b3_ref[j],
            w1s=w1s_ref[j] if int8 else None,
            w2s=w2s_ref[j] if int8 else None,
            w3s=w3s_ref[j] if int8 else None,
            s_x=sx[j], s_y1=sy1[j], s_y2=sy2[j], r_out=r_out[j],
            requant_out=requant,
            store_dtype=o_ref.dtype if last else dtype)


def region_worth_fusing(H, W, C, Cm, quant: bool) -> bool:
    """Default region-fusion policy: OFF, from round-1 on-device data
    (BASELINE.md).  Isolated, the chain kernel beats XLA at HBM-bound
    56x56 shapes (1.38 vs 1.98 ms per b128 pair) — but measured *in
    context* (producer conv -> region -> consumer conv) XLA's per-layer
    int8 path runs near the bandwidth roofline (0.99 ms for the whole
    probe) while the pallas custom-call boundary adds ~1 ms of
    relayout/scheduling cost (2.41 ms).  Whole-model: chains regressed
    22.3k -> 18.7k img/s.  The kernel + planner stay for backends where
    the boundary is cheap; enable per signature via
    graph.meta['chain_regions'] after measuring with
    tools/autotune.py --regions (which compares in-context)."""
    return False


def chain_plan(N, H, W, C, Cm, nb, act_item, w_item,
               budget=13 * 1024 * 1024 + 512 * 1024, out_item=None):
    """(chunk, slab_rows) such that the kernel fits ``budget`` VMEM, or
    None if even (1, min_slab) overflows."""
    wbytes = (C * Cm + 9 * Cm * Cm + Cm * C) * w_item * nb
    # keep the unrolled slab count bounded (compile size) — at most 8
    # slabs per image
    divisors = [d for d in range(1, H + 1)
                if H % d == 0 and H // d <= 8]

    def fits(chunk, R):
        return chain_vmem_bytes(chunk, H, W, C, Cm, act_item, wbytes,
                                R, out_item=out_item) <= budget

    # chunk must divide N exactly (the kernel reshapes to (N//chunk,
    # chunk, ...)); walk N's divisors from largest to smallest
    for chunk in sorted((d for d in range(1, N + 1) if N % d == 0),
                        reverse=True):
        for R in reversed(divisors):          # prefer big slabs
            if fits(chunk, R):
                return (chunk, R)
    return None


def _use_im2col(Cm: int) -> bool:
    """One big K=9*Cm GEMM for conv2 when Cm is narrow (the nine K=Cm
    dots waste MXU lanes below 128)."""
    return Cm <= 128


def chain_vmem_bytes(chunk, H, W, C, Cm, act_item, wbytes_total,
                     slab_rows=None, out_item=None):
    """Rough per-grid-step VMEM footprint: slab f32 temporaries (x1.5
    safety for Mosaic transients), int8 act + y1 (+ conv2 im2col)
    scratches, in/out chunk double buffers, resident weights.
    ``out_item`` covers int8-in/bf16-out chains (s_out=None)."""
    R = slab_rows or H
    Ms = chunk * R * W
    M = chunk * H * W
    f32_tmp = Ms * (2 * Cm + C) * 6
    pad_slab = chunk * (R + 2) * (W + 2) * Cm * act_item
    scratch = M * (C + Cm) * act_item
    if _use_im2col(Cm):
        scratch += Ms * 9 * Cm * act_item
    io = 2 * M * C * (act_item + (out_item or act_item))
    return f32_tmp + pad_slab + scratch + io + wbytes_total


@functools.partial(
    jax.jit,
    static_argnames=("scales", "out_dtype", "interpret", "vmem_budget",
                     "plan_override", "conv2_fold"))
def fused_chain(x: jnp.ndarray,
                w1, b1, w2, b2, w3, b3,
                w_scales=None,
                scales: Optional[tuple] = None,
                out_dtype=None,
                interpret: bool = False,
                vmem_budget: int = 13 * 1024 * 1024 + 512 * 1024,
                plan_override: Optional[tuple] = None,
                conv2_fold: Optional[int] = None) -> jnp.ndarray:
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
    fold = conv2_fold or (9 if _use_im2col(Cm) else 1)
    plan = plan_override or chain_plan(
        N, H, W, C, Cm, nb, itemsize, w1.dtype.itemsize,
        budget=vmem_budget, out_item=jnp.dtype(out_dtype).itemsize)
    if plan is None:
        raise ValueError(
            f"fused_chain: no VMEM-feasible plan for {x.shape} Cm={Cm} "
            f"nb={nb}")
    chunk, R = plan
    slabs = tuple((r0, r0 + R) for r0 in range(0, H, R))
    q = N // chunk

    xs = x.reshape(q, chunk, H, W, C)
    ones = lambda shape: jnp.ones(shape, jnp.float32)
    w1s, w2s, w3s = (w_scales if w_scales is not None
                     else (ones((nb, Cm)), ones((nb, Cm)), ones((nb, C))))

    kernel = functools.partial(
        _chain_kernel, H=H, W=W, C=C, Cm=Cm, NB=chunk, nb=nb,
        int8=int8, out_int8=out_int8, slabs=slabs,
        sx=tuple(map(float, sx)), sy1=tuple(map(float, sy1)),
        sy2=tuple(map(float, sy2)), r_out=tuple(map(float, r)))

    full = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    wbytes = (C * Cm + 9 * Cm * Cm + Cm * C) * w1.dtype.itemsize * nb
    out = pl.pallas_call(
        kernel,
        grid=(q,),
        in_specs=[
            pl.BlockSpec((1, chunk, H, W, C), lambda i: (i, 0, 0, 0, 0)),
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
        out_specs=pl.BlockSpec((1, chunk, H, W, C),
                               lambda i: (i, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((q, chunk, H, W, C), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((chunk, H, W, C), x.dtype),
            pltpu.VMEM((chunk, H, W, Cm), jnp.int8 if int8 else x.dtype),
        ] + ([pltpu.VMEM((chunk, R, W, fold * Cm),
                         jnp.int8 if int8 else x.dtype)]
             if fold > 1 else []),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * H * W * (C * Cm * 2 + 9 * Cm * Cm) * nb,
            bytes_accessed=int(2 * N * H * W * C * itemsize + wbytes),
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
