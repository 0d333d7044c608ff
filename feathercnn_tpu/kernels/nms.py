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

__all__ = ["greedy_nms_fixpoint"]


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
