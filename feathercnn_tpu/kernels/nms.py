"""Greedy NMS as fixpoint sweeps — the shared detection-head kernel.

Exact greedy NMS is a serial scan (box i survives iff no higher-ranked
survivor overlaps it), which compiles to K serial steps.  The fixpoint
form runs vectorized sweeps

    keep <- valid & ~any_{j<i}(keep[j] & iou[i, j] > thresh)

over a precomputed lower-triangular suppression mask: box i's verdict
settles within i sweeps and real score distributions converge in ~3-5,
so a while_loop of whole-matrix VPU sweeps replaces the serial chain
(measured 1.41 vs 1.95 ms at SSD b128 shapes — ROADMAP.md).  Used by
DetectionOutput (normalized coords), Proposal (pixel coords, the
+1-width convention), and any future detection head.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["greedy_nms", "greedy_nms_bitpack", "greedy_nms_blocked",
           "greedy_nms_fixpoint"]


def greedy_nms(boxes: jnp.ndarray, valid: jnp.ndarray, thresh: float,
               plus_one: float = 0.0, block: int = 0) -> jnp.ndarray:
    """Exact greedy NMS; picks the blocked form when it pays.

    The fixpoint form materializes the full K x K IoU matrix and
    re-sweeps it until convergence — at Proposal scale (K = 6000) that
    is a ~144 MB HBM tensor touched 3-5x.  The blocked form streams
    (block x K) strips once, so it wins for large K; for small K the
    strip setup overhead loses.  ``block = 0`` always uses fixpoint.
    """
    k = boxes.shape[-2]
    if block and k > 2 * block:
        return greedy_nms_blocked(boxes, valid, thresh, plus_one, block)
    return greedy_nms_fixpoint(boxes, valid, thresh, plus_one)


def greedy_nms_fixpoint(boxes: jnp.ndarray, valid: jnp.ndarray,
                        thresh: float, plus_one: float = 0.0
                        ) -> jnp.ndarray:
    """Boolean keep mask for score-DESCENDING ``boxes``.

    ``boxes``: (..., K, 4) [x1, y1, x2, y2], already sorted by score
    within each leading batch/class slice; ``valid``: (..., K) initial
    candidate mask; ``plus_one``: 1.0 for the Caffe/py-faster-rcnn
    pixel convention (w = x2 - x1 + 1), 0.0 for normalized coords.
    """
    k = boxes.shape[-2]
    wh = jnp.maximum(boxes[..., 2:] - boxes[..., :2] + plus_one, 0)
    area = wh[..., 0] * wh[..., 1]
    lt = jnp.maximum(boxes[..., :, None, :2], boxes[..., None, :, :2])
    rb = jnp.minimum(boxes[..., :, None, 2:], boxes[..., None, :, 2:])
    inter = jnp.prod(jnp.maximum(rb - lt + plus_one, 0), axis=-1)
    iou = inter / jnp.maximum(
        area[..., :, None] + area[..., None, :] - inter, 1e-10)
    smat = (iou > thresh) & jnp.tril(jnp.ones((k, k), jnp.bool_), -1)

    def cond(st):
        keep, prev, it = st
        return jnp.any(keep != prev) & (it < k)

    def step(st):
        keep, _, it = st
        new = valid & ~jnp.any(smat & keep[..., None, :], axis=-1)
        return new, keep, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, step, (valid, jnp.zeros_like(valid), 0))
    return keep


def greedy_nms_bitpack(boxes: jnp.ndarray, valid: jnp.ndarray,
                       thresh: float, plus_one: float = 0.0,
                       scores: jnp.ndarray | None = None
                       ) -> jnp.ndarray:
    """Fixpoint greedy NMS over a BIT-PACKED suppression matrix.

    The plain fixpoint materializes a (K, K) boolean matrix and re-reads
    it every sweep — at SSD head scale (N=128 images x 20 classes x
    K=400) that is ~410 MB touched ~7x (measured sweep counts 5-10 on
    real score distributions), ~3.7 ms of pure HBM traffic.  Packing the
    suppression columns 32-per-uint32 word (the classic CUDA bitmask-NMS
    layout, restated for the VPU) cuts the matrix to K x ceil(K/32)
    words — 32x less traffic, same exact greedy recurrence:

        keep_bits <- pack(valid & ~any_w(bits[i, w] & keep_w))

    The IoU evaluation fuses into the packing reduction (elementwise ->
    32-lane sum), so the K x K boolean form never hits HBM either.

    ``scores``: when given (same leading shape as ``valid``), rows need
    NOT be score-sorted — greedy rank is taken from the scores with ties
    broken by position: j suppresses i iff s_j > s_i, or s_j == s_i and
    j < i.  With score-DESCENDING rows this reduces exactly to the
    positional (tril) form; it exists so sort-free candidate selection
    (radix-select membership, index-ordered compaction) can skip the
    sort entirely.
    """
    k = boxes.shape[-2]
    w = -(-k // 32)
    kp = w * 32
    if kp != k:
        pad = [(0, 0)] * (boxes.ndim - 2) + [(0, kp - k), (0, 0)]
        boxes = jnp.pad(boxes, pad)
        valid = jnp.pad(valid, [(0, 0)] * (valid.ndim - 1)
                        + [(0, kp - k)])
        if scores is not None:
            scores = jnp.pad(scores, [(0, 0)] * (scores.ndim - 1)
                             + [(0, kp - k)],
                             constant_values=-jnp.inf)
    wh = jnp.maximum(boxes[..., 2:] - boxes[..., :2] + plus_one, 0)
    area = wh[..., 0] * wh[..., 1]
    lt = jnp.maximum(boxes[..., :, None, :2], boxes[..., None, :, :2])
    rb = jnp.minimum(boxes[..., :, None, 2:], boxes[..., None, :, 2:])
    inter = jnp.prod(jnp.maximum(rb - lt + plus_one, 0), axis=-1)
    iou = inter / jnp.maximum(
        area[..., :, None] + area[..., None, :] - inter, 1e-10)
    col = jnp.arange(kp)
    if scores is None:
        rank = col[None, :] < col[:, None]                 # strict tril
    else:
        s = scores
        rank = ((s[..., None, :] > s[..., :, None])
                | ((s[..., None, :] == s[..., :, None])
                   & (col[None, :] < col[:, None])))
    sup = (iou > thresh) & rank
    pow2 = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))

    def pack(b):                       # (..., kp) bool -> (..., w) u32
        return jnp.sum(b.reshape(b.shape[:-1] + (w, 32))
                       .astype(jnp.uint32) * pow2, axis=-1,
                       dtype=jnp.uint32)

    bits = pack(sup)                   # (..., kp, w) — 32x smaller
    kb0 = pack(valid)

    def cond(st):
        kb, prev, it = st
        return jnp.any(kb != prev) & (it < k)

    def step(st):
        kb, _, it = st
        hit = jnp.any(jnp.bitwise_and(bits, kb[..., None, :]) != 0,
                      axis=-1)                         # (..., kp)
        new = pack(valid & ~hit)
        return new, kb, it + 1

    kb, _, _ = jax.lax.while_loop(
        cond, step, (kb0, jnp.zeros_like(kb0), 0))
    # unpack: bit j of word i -> keep[i*32 + j]
    keep = (jnp.bitwise_and(kb[..., :, None], pow2[None, :])
            != 0).reshape(kb.shape[:-1] + (kp,))
    return keep[..., :k]


def greedy_nms_blocked(boxes: jnp.ndarray, valid: jnp.ndarray,
                       thresh: float, plus_one: float = 0.0,
                       block: int = 1024) -> jnp.ndarray:
    """Blocked/tiled exact greedy NMS (VERDICT round-1 item 7).

    Same greedy semantics and signature as ``greedy_nms_fixpoint``, but
    instead of a K x K IoU matrix swept to fixpoint, a ``lax.scan`` walks
    score-order tiles of ``block`` boxes: each tile computes one
    (block, K) IoU strip against the whole set, drops tile boxes that
    overlap an already-kept earlier box (those verdicts are settled —
    greedy is a prefix-causal recurrence), then resolves within-tile
    order with the triangular fixpoint restricted to (block, block).
    Peak intermediate is block*K instead of K*K, and each strip is
    computed exactly once instead of once per sweep.
    """
    if boxes.ndim > 2:
        lead = boxes.shape[:-2]
        keep = jax.vmap(
            lambda b, v: greedy_nms_blocked(b, v, thresh, plus_one, block)
        )(boxes.reshape((-1,) + boxes.shape[-2:]),
          valid.reshape((-1, boxes.shape[-2])))
        return keep.reshape(lead + (boxes.shape[-2],))

    k = boxes.shape[0]
    b = min(block, k)
    kp = -(-k // b) * b
    if kp != k:
        boxes = jnp.concatenate(
            [boxes, jnp.zeros((kp - k, 4), boxes.dtype)])
        valid = jnp.concatenate(
            [valid, jnp.zeros((kp - k,), valid.dtype)])
    wh = jnp.maximum(boxes[:, 2:] - boxes[:, :2] + plus_one, 0)
    area = wh[:, 0] * wh[:, 1]
    col = jnp.arange(kp)
    tril = jnp.tril(jnp.ones((b, b), jnp.bool_), -1)

    def tile_step(keep, t):
        s = t * b
        rows = jax.lax.dynamic_slice(boxes, (s, 0), (b, 4))
        rarea = jax.lax.dynamic_slice(area, (s,), (b,))
        rvalid = jax.lax.dynamic_slice(valid, (s,), (b,))
        lt = jnp.maximum(rows[:, None, :2], boxes[None, :, :2])
        rb = jnp.minimum(rows[:, None, 2:], boxes[None, :, 2:])
        inter = jnp.prod(jnp.maximum(rb - lt + plus_one, 0), axis=-1)
        iou = inter / jnp.maximum(
            rarea[:, None] + area[None, :] - inter, 1e-10)
        sup = iou > thresh                              # (b, kp)
        # settled earlier tiles: any kept box with col < s suppresses
        alive = rvalid & ~jnp.any(sup & (col[None, :] < s) & keep[None, :],
                                  axis=-1)
        # within-tile triangular fixpoint (identical recurrence to
        # greedy_nms_fixpoint, restricted to this tile).  The (b, b)
        # block is recomputed from the tile rows rather than sliced out
        # of ``sup``: a dynamic_slice use would force the whole (b, K)
        # strip to materialize in HBM, while two independent uses let
        # XLA fuse each IoU evaluation into its consuming reduction —
        # identical arithmetic on identical values, so bit-identical.
        lt2 = jnp.maximum(rows[:, None, :2], rows[None, :, :2])
        rb2 = jnp.minimum(rows[:, None, 2:], rows[None, :, 2:])
        inter2 = jnp.prod(jnp.maximum(rb2 - lt2 + plus_one, 0), axis=-1)
        iou2 = inter2 / jnp.maximum(
            rarea[:, None] + rarea[None, :] - inter2, 1e-10)
        tsup = (iou2 > thresh) & tril

        def cond(st):
            a, prev, it = st
            return jnp.any(a != prev) & (it < b)

        def step(st):
            a, _, it = st
            return alive & ~jnp.any(tsup & a[None, :], axis=-1), a, it + 1

        a, _, _ = jax.lax.while_loop(
            cond, step, (alive, jnp.zeros_like(alive), 0))
        return jax.lax.dynamic_update_slice(keep, a, (s,)), None

    keep, _ = jax.lax.scan(tile_step, jnp.zeros((kp,), bool),
                           jnp.arange(kp // b))
    return keep[:k]
