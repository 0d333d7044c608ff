"""Isolated ROIPooling stage timing at faster_rcnn b16 shapes: dyadic
table BUILD vs QUERY, level capping, per-image vs flattened-batch
forms.  Indicative only — the production gate is a paired whole-model
A/B (bench/config_ab.py).

Usage: python bench/roi_micro.py [--batch 16] [--rois 300]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--rois", type=int, default=300)
    ap.add_argument("--H", type=int, default=38)
    ap.add_argument("--W", type=int, default=50)
    ap.add_argument("--C", type=int, default=512)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from feathercnn_tpu.ops.lowering import _roi_range_max
    from feathercnn_tpu.utils.timing import device_bench

    N, R, H, W, C = args.batch, args.rois, args.H, args.W, args.C
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N * H, W, C)).astype(np.float32)
                    .astype(jnp.bfloat16))
    # synthetic ROI bin bounds: random boxes quantized to 7x7 bins
    RT = N * R
    bidx = np.repeat(np.arange(N), R)
    y1 = rng.integers(0, H - 8, RT)
    y2 = y1 + rng.integers(4, 8, RT) * 4
    y2 = np.minimum(y2, H - 1)
    x1 = rng.integers(0, W - 8, RT)
    x2 = np.minimum(x1 + rng.integers(4, 8, RT) * 5, W - 1)

    def bounds(start, end, bins, size, off=None):
        ln = np.maximum(end - start + 1, 1)
        i = np.arange(bins)
        lo = (i[None] * ln[:, None]) // bins + start[:, None]
        hi = ((i[None] + 1) * ln[:, None] + bins - 1) // bins \
            + start[:, None]
        lo, hi = np.clip(lo, 0, size), np.clip(hi, 0, size)
        if off is not None:
            lo, hi = lo + off[:, None], hi + off[:, None]
        return lo.astype(np.int32), hi.astype(np.int32)

    lo_h, hi_h = bounds(y1, y2, 7, H, off=bidx * H)
    lo_w, hi_w = bounds(x1, x2, 7, W)
    lo_h, hi_h = jnp.asarray(lo_h), jnp.asarray(hi_h)
    lo_w, hi_w = jnp.asarray(lo_w), jnp.asarray(hi_w)

    def full(xv):
        return _roi_range_max(xv, lo_h, hi_h, lo_w, hi_w, max_len_h=H)

    def build_only(xv):
        # replicate the pyramid construction (levels as in production)
        nlh = max(H - 1, 1).bit_length()
        nlw = max(W - 1, 1).bit_length()
        NH = xv.shape[0]
        rows = [xv]
        for l in range(1, nlh):
            s = 1 << (l - 1)
            p = rows[-1]
            rows.append(jnp.maximum(p, p[jnp.minimum(
                jnp.arange(NH) + s, NH - 1)]))
        tabs = []
        for p0 in rows:
            cols = [p0]
            for l in range(1, nlw):
                s = 1 << (l - 1)
                p = cols[-1]
                cols.append(jnp.maximum(p, p[:, jnp.minimum(
                    jnp.arange(W) + s, W - 1)]))
            tabs.append(jnp.stack(cols))
        return jnp.stack(tabs)

    def per_image(xv):
        xi = xv.reshape(N, H, W, C)
        lo_h_i = (lo_h.reshape(N, R, 7)
                  - jnp.arange(N)[:, None, None] * H)
        hi_h_i = (hi_h.reshape(N, R, 7)
                  - jnp.arange(N)[:, None, None] * H)
        return jax.vmap(
            lambda xm, lh, hh, lw, hw: _roi_range_max(
                xm, lh, hh, lw, hw, max_len_h=H)
        )(xi, lo_h_i, hi_h_i, lo_w.reshape(N, R, 7),
          hi_w.reshape(N, R, 7))

    def build_shift(xv, nlh=None, nlw=None):
        # pyramid via STATIC slice+concat shifts (no row fancy-index)
        nlh = nlh or max(H - 1, 1).bit_length()
        nlw = nlw or max(W - 1, 1).bit_length()
        rows = [xv]
        for l in range(1, nlh):
            s = 1 << (l - 1)
            p = rows[-1]
            sh = jnp.concatenate(
                [p[s:], jnp.broadcast_to(p[-1:], (s,) + p.shape[1:])])
            rows.append(jnp.maximum(p, sh))
        tabs = []
        for p0 in rows:
            cols = [p0]
            for l in range(1, nlw):
                s = 1 << (l - 1)
                p = cols[-1]
                sh = jnp.concatenate(
                    [p[:, s:], jnp.broadcast_to(
                        p[:, -1:], p.shape[:1] + (s,) + p.shape[2:])],
                    axis=1)
                cols.append(jnp.maximum(p, sh))
            tabs.append(jnp.stack(cols))
        return jnp.stack(tabs)

    def build_shift_only(xv):
        return build_shift(xv)

    def build_shift_capped(xv):
        # levels capped to max bin length: ceil(size/bins)+2
        nlh = int(np.ceil(H / 7) + 2 - 1).bit_length()
        nlw = int(np.ceil(W / 7) + 2 - 1).bit_length()
        return build_shift(xv, nlh, nlw)

    def query_only(xv):
        nlh = max(H - 1, 1).bit_length()
        nlw = max(W - 1, 1).bit_length()
        NH = xv.shape[0]
        table = jnp.broadcast_to(
            xv, (nlh * nlw,) + xv.shape).reshape(nlh * nlw * NH * W, C)
        len_h, len_w = hi_h - lo_h, hi_w - lo_w
        lh = jnp.minimum(31 - jax.lax.clz(jnp.maximum(len_h, 1)), nlh - 1)
        lw = jnp.minimum(31 - jax.lax.clz(jnp.maximum(len_w, 1)), nlw - 1)
        y0 = jnp.clip(lo_h, 0, NH - 1)
        y1 = jnp.clip(hi_h - jnp.left_shift(1, lh), 0, NH - 1)
        x0 = jnp.clip(lo_w, 0, W - 1)
        x1 = jnp.clip(hi_w - jnp.left_shift(1, lw), 0, W - 1)
        base = (lh[:, :, None] * nlw + lw[:, None, :]) * NH
        ys = jnp.stack([y0, y1], axis=-1)
        xs = jnp.stack([x0, x1], axis=-1)
        idx = ((base[..., None, None] + ys[:, :, None, :, None]) * W
               + xs[:, None, :, None, :])
        RT_ = idx.shape[0]
        g = jnp.take(table, idx.reshape(RT_, 7, 7, 4), axis=0)
        return jnp.max(g, axis=3)

    def query_clip(xv):
        nlh = max(H - 1, 1).bit_length()
        nlw = max(W - 1, 1).bit_length()
        NH = xv.shape[0]
        table = jnp.broadcast_to(
            xv, (nlh * nlw,) + xv.shape).reshape(nlh * nlw * NH * W, C)
        len_h, len_w = hi_h - lo_h, hi_w - lo_w
        lh = jnp.minimum(31 - jax.lax.clz(jnp.maximum(len_h, 1)), nlh - 1)
        lw = jnp.minimum(31 - jax.lax.clz(jnp.maximum(len_w, 1)), nlw - 1)
        y0 = jnp.clip(lo_h, 0, NH - 1)
        y1 = jnp.clip(hi_h - jnp.left_shift(1, lh), 0, NH - 1)
        x0 = jnp.clip(lo_w, 0, W - 1)
        x1 = jnp.clip(hi_w - jnp.left_shift(1, lw), 0, W - 1)
        base = (lh[:, :, None] * nlw + lw[:, None, :]) * NH
        ys = jnp.stack([y0, y1], axis=-1)
        xs = jnp.stack([x0, x1], axis=-1)
        idx = ((base[..., None, None] + ys[:, :, None, :, None]) * W
               + xs[:, None, :, None, :])
        RT_ = idx.shape[0]
        g = jnp.take(table, idx.reshape(RT_, 7, 7, 4), axis=0,
                     mode="clip")
        return jnp.max(g, axis=3)

    def full_capped(xv):
        # capped levels + clip-mode take, end to end
        nlh = int(np.ceil(H / 7) + 2 - 1).bit_length()
        nlw = int(np.ceil(W / 7) + 2 - 1).bit_length()
        NH = xv.shape[0]
        tab = build_shift(xv, nlh, nlw)       # (nlh, nlw, NH, W, C)
        table = tab.reshape(nlh * nlw * NH * W, C)
        len_h, len_w = hi_h - lo_h, hi_w - lo_w
        lh = jnp.minimum(31 - jax.lax.clz(jnp.maximum(len_h, 1)), nlh - 1)
        lw = jnp.minimum(31 - jax.lax.clz(jnp.maximum(len_w, 1)), nlw - 1)
        y0 = jnp.clip(lo_h, 0, NH - 1)
        y1 = jnp.clip(hi_h - jnp.left_shift(1, lh), 0, NH - 1)
        x0 = jnp.clip(lo_w, 0, W - 1)
        x1 = jnp.clip(hi_w - jnp.left_shift(1, lw), 0, W - 1)
        base = (lh[:, :, None] * nlw + lw[:, None, :]) * NH
        ys = jnp.stack([y0, y1], axis=-1)
        xs = jnp.stack([x0, x1], axis=-1)
        idx = ((base[..., None, None] + ys[:, :, None, :, None]) * W
               + xs[:, None, :, None, :])
        RT_ = idx.shape[0]
        g = jnp.take(table, idx.reshape(RT_, 7, 7, 4), axis=0,
                     mode="clip")
        out = jnp.max(g, axis=3)
        valid = (len_h[:, :, None] > 0) & (len_w[:, None, :] > 0)
        return jnp.where(valid[..., None], out, jnp.zeros((), xv.dtype))

    def query_f32(xv):
        return query_clip(xv.astype(jnp.float32))

    def query_flat1d(xv):
        # single flat 1-D index vector (no trailing batch dims)
        nlh = max(H - 1, 1).bit_length()
        nlw = max(W - 1, 1).bit_length()
        NH = xv.shape[0]
        table = jnp.broadcast_to(
            xv, (nlh * nlw,) + xv.shape).reshape(nlh * nlw * NH * W, C)
        len_h, len_w = hi_h - lo_h, hi_w - lo_w
        lh = jnp.minimum(31 - jax.lax.clz(jnp.maximum(len_h, 1)), nlh - 1)
        lw = jnp.minimum(31 - jax.lax.clz(jnp.maximum(len_w, 1)), nlw - 1)
        y0 = jnp.clip(lo_h, 0, NH - 1)
        y1 = jnp.clip(hi_h - jnp.left_shift(1, lh), 0, NH - 1)
        x0 = jnp.clip(lo_w, 0, W - 1)
        x1 = jnp.clip(hi_w - jnp.left_shift(1, lw), 0, W - 1)
        base = (lh[:, :, None] * nlw + lw[:, None, :]) * NH
        ys = jnp.stack([y0, y1], axis=-1)
        xs = jnp.stack([x0, x1], axis=-1)
        idx = ((base[..., None, None] + ys[:, :, None, :, None]) * W
               + xs[:, None, :, None, :])
        g = jnp.take(table, idx.reshape(-1), axis=0, mode="clip")
        return jnp.max(g.reshape(idx.shape[0], 7, 7, 4, C), axis=3)

    def query_4takes(xv):
        # four separate gathers (no trailing 4-dim), maxed pairwise
        nlh = max(H - 1, 1).bit_length()
        nlw = max(W - 1, 1).bit_length()
        NH = xv.shape[0]
        table = jnp.broadcast_to(
            xv, (nlh * nlw,) + xv.shape).reshape(nlh * nlw * NH * W, C)
        len_h, len_w = hi_h - lo_h, hi_w - lo_w
        lh = jnp.minimum(31 - jax.lax.clz(jnp.maximum(len_h, 1)), nlh - 1)
        lw = jnp.minimum(31 - jax.lax.clz(jnp.maximum(len_w, 1)), nlw - 1)
        y0 = jnp.clip(lo_h, 0, NH - 1)
        y1 = jnp.clip(hi_h - jnp.left_shift(1, lh), 0, NH - 1)
        x0 = jnp.clip(lo_w, 0, W - 1)
        x1 = jnp.clip(hi_w - jnp.left_shift(1, lw), 0, W - 1)
        base = (lh[:, :, None] * nlw + lw[:, None, :]) * NH
        g = None
        for ys_ in (y0, y1):
            for xs_ in (x0, x1):
                ix = ((base + ys_[:, :, None]) * W + xs_[:, None, :])
                t = jnp.take(table, ix.reshape(-1), axis=0, mode="clip")
                g = t if g is None else jnp.maximum(g, t)
        return g.reshape(base.shape + (C,))

    def query_sorted(xv):
        # locality probe: gather in sorted-index order, scatter-free
        # restore via argsort-of-argsort positions
        nlh = max(H - 1, 1).bit_length()
        nlw = max(W - 1, 1).bit_length()
        NH = xv.shape[0]
        table = jnp.broadcast_to(
            xv, (nlh * nlw,) + xv.shape).reshape(nlh * nlw * NH * W, C)
        len_h, len_w = hi_h - lo_h, hi_w - lo_w
        lh = jnp.minimum(31 - jax.lax.clz(jnp.maximum(len_h, 1)), nlh - 1)
        lw = jnp.minimum(31 - jax.lax.clz(jnp.maximum(len_w, 1)), nlw - 1)
        y0 = jnp.clip(lo_h, 0, NH - 1)
        y1 = jnp.clip(hi_h - jnp.left_shift(1, lh), 0, NH - 1)
        x0 = jnp.clip(lo_w, 0, W - 1)
        x1 = jnp.clip(hi_w - jnp.left_shift(1, lw), 0, W - 1)
        base = (lh[:, :, None] * nlw + lw[:, None, :]) * NH
        ys = jnp.stack([y0, y1], axis=-1)
        xs = jnp.stack([x0, x1], axis=-1)
        idx = ((base[..., None, None] + ys[:, :, None, :, None]) * W
               + xs[:, None, :, None, :]).reshape(-1)
        order = jnp.argsort(idx)
        inv = jnp.argsort(order)
        g = jnp.take(table, idx[order], axis=0, mode="clip")
        g = jnp.take(g, inv, axis=0)
        return jnp.max(g.reshape(-1, 7, 7, 4, C), axis=3)

    def full_strips(xv):
        # H-axis dyadic (capped) + strip gather + W-axis masked
        # reduction on VMEM-resident strips
        nlh = int(np.ceil(H / 7) + 2 - 1).bit_length()
        NH = xv.shape[0]
        rows = [xv]
        for l in range(1, nlh):
            s = 1 << (l - 1)
            p = rows[-1]
            sh = jnp.concatenate(
                [p[s:], jnp.broadcast_to(p[-1:], (s,) + p.shape[1:])])
            rows.append(jnp.maximum(p, sh))
        tab = jnp.concatenate(rows)              # (nlh*NH, W, C)
        len_h, len_w = hi_h - lo_h, hi_w - lo_w
        lh = jnp.minimum(31 - jax.lax.clz(jnp.maximum(len_h, 1)), nlh - 1)
        y0 = jnp.clip(lo_h, 0, NH - 1)
        y1 = jnp.clip(hi_h - jnp.left_shift(1, lh), 0, NH - 1)
        s0 = jnp.take(tab, lh * NH + y0, axis=0, mode="clip")
        s1 = jnp.take(tab, lh * NH + y1, axis=0, mode="clip")
        strip = jnp.maximum(s0, s1)              # (RT, ph, W, C)
        posw = jnp.arange(W, dtype=jnp.int32)
        mw = ((posw[None, None, :] >= lo_w[:, :, None])
              & (posw[None, None, :] < hi_w[:, :, None]))  # (RT, pw, W)
        neg = jnp.asarray(-jnp.inf, strip.dtype)
        out = jnp.max(jnp.where(mw[:, None, :, :, None],
                                strip[:, :, None, :, :], neg), axis=3)
        valid = (len_h[:, :, None] > 0) & (len_w[:, None, :] > 0)
        return jnp.where(valid[..., None], out, jnp.zeros((), xv.dtype))

    def strip_gather_only(xv):
        nlh = int(np.ceil(H / 7) + 2 - 1).bit_length()
        NH = xv.shape[0]
        rows = [xv]
        for l in range(1, nlh):
            s = 1 << (l - 1)
            p = rows[-1]
            sh = jnp.concatenate(
                [p[s:], jnp.broadcast_to(p[-1:], (s,) + p.shape[1:])])
            rows.append(jnp.maximum(p, sh))
        tab = jnp.concatenate(rows)
        len_h = hi_h - lo_h
        lh = jnp.minimum(31 - jax.lax.clz(jnp.maximum(len_h, 1)), nlh - 1)
        y0 = jnp.clip(lo_h, 0, NH - 1)
        y1 = jnp.clip(hi_h - jnp.left_shift(1, lh), 0, NH - 1)
        s0 = jnp.take(tab, lh * NH + y0, axis=0, mode="clip")
        s1 = jnp.take(tab, lh * NH + y1, axis=0, mode="clip")
        return jnp.maximum(s0, s1)

    stages = {
        "query_4takes": query_4takes,
        "full_capped": full_capped,
        "strip_gather_only": strip_gather_only,
        "full_strips": full_strips,
    }
    out = {}
    for name, fn in stages.items():
        ms = device_bench(fn, (x,), iters=args.iters) * 1e3
        out[name] = round(ms, 3)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"cfg": vars(args), "stages": out}))


if __name__ == "__main__":
    main()
