#!/usr/bin/env python
"""On-hardware numerics cross-check: run a zoo model on the REAL TPU and
compare against the CPU oracle (same weights/input) — catches Mosaic/XLA
miscompiles that interpret-mode CI can't see.

    python tools/verify_tpu.py [--model resnet50] [--batch 4]
        [--quant w8a8] [--dtype bfloat16]

Prints cosine similarity and top-1 agreement; exits non-zero on failure.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CPU_HELPER = """
import sys, numpy as np
import jax; jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {root!r})
from feathercnn_tpu import Engine, EngineConfig
from feathercnn_tpu.models import MODEL_BUILDERS
from feathercnn_tpu.quant import calibrate
model, batch, quant, dtype, xpath, opath = sys.argv[1:7]
quant = None if quant == "none" else quant
import inspect
builder = MODEL_BUILDERS[model]
kw = dict(with_softmax=False) if "with_softmax" in \
    inspect.signature(builder).parameters else dict()
try:
    g = builder(batch=int(batch), **kw)
except ValueError as e:
    if "batch 1" not in str(e):
        raise
    g = builder(**kw)
x = np.load(xpath)
inp = {{next(iter(g.inputs)): x}}
if len(g.inputs) > 1:
    from feathercnn_tpu.utils.timing import default_extra_inputs
    inp.update(default_extra_inputs(g))
if quant == "w8a8":
    calibrate(g, [inp], method="max")
cfg = EngineConfig(compute_dtype=dtype, backend="pallas", quant=quant,
                   interpret=True, algo_overrides=(("*", "xla"),))
eng = Engine(g, cfg)
det = next((n for n in g.nodes
            if n.op in ("DetectionOutput", "Proposal")), None)
extract = list(det.inputs[:2]) if det is not None else []
res = eng.run(inp, extract=extract)
np.savez(opath, **dict(
    (k, np.asarray(v, np.float32)) for k, v in res.items()))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="resnet50")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--quant", default="w8a8")
    ap.add_argument("--min-cosine", type=float, default=0.995)
    ap.add_argument("--min-top1", type=float, default=1.0,
                    help="top-1 agreement gate; relax below 1.0 for "
                         "models whose random-weight logit gaps sit "
                         "under the int8 rounding noise (e.g. "
                         "densenet121 — see BASELINE.md)")
    args = ap.parse_args()
    quant = None if args.quant in ("none", "None") else args.quant

    from feathercnn_tpu import Engine, EngineConfig
    from feathercnn_tpu.models import MODEL_BUILDERS
    from feathercnn_tpu.quant import calibrate

    import inspect
    builder = MODEL_BUILDERS[args.model]
    kw = {"with_softmax": False} if "with_softmax" in \
        inspect.signature(builder).parameters else {}
    try:
        g = builder(batch=args.batch, **kw)
    except ValueError as e:   # batch-1-only two-stage deploys
        if "batch 1" not in str(e):
            raise
        g = builder(**kw)
        args.batch = 1
    spec = next(iter(g.inputs.values()))
    x = np.random.default_rng(0).normal(size=spec.shape).astype(np.float32)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory() as td:
        xp, op = os.path.join(td, "x.npy"), os.path.join(td, "o.npz")
        np.save(xp, x)
        # CPU oracle in a subprocess (the axon sitecustomize grabs the
        # TPU in-process; a child with jax_platforms=cpu stays off it)
        subprocess.run(
            [sys.executable, "-c", CPU_HELPER.format(root=root),
             args.model, str(args.batch), quant or "none",
             args.dtype, xp, op],
            check=True, env={**os.environ, "PALLAS_AXON_POOL_IPS": "",
                             "JAX_PLATFORMS": "cpu"})
        refs = dict(np.load(op))

    inp = {next(iter(g.inputs)): x}
    if len(g.inputs) > 1:
        from feathercnn_tpu.utils.timing import default_extra_inputs
        inp.update(default_extra_inputs(g))
    if quant == "w8a8":
        calibrate(g, [inp], method="max")
    cfg = EngineConfig(compute_dtype=args.dtype, backend="pallas",
                       quant=quant, algo_overrides=(("*", "xla"),))
    import jax
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    eng = Engine(g, cfg)
    det = next((n for n in g.nodes
                if n.op in ("DetectionOutput", "Proposal")), None)
    extract = list(det.inputs[:2]) if det is not None else []
    res = eng.run(inp, extract=extract)
    out = np.asarray(res[g.outputs[0]], np.float32)
    ref = refs[g.outputs[0]]

    if det is not None and det.op == "Proposal":
        # Two-stage models: gate on the pre-NMS RPN tensors — beyond
        # the proposal NMS everything is ROI-order-chaotic under
        # near-tied random-weight scores (same rationale as SSD).
        cos_min = 1.0
        for name in extract:
            a = np.asarray(res[name], np.float32).ravel()
            b = refs[name].ravel()
            c = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)
                               + 1e-12))
            print(f"  {name}: cosine={c:.6f}", file=sys.stderr)
            cos_min = min(cos_min, c)
        print(f"{args.model} {args.quant} b{args.batch}: TPU-vs-CPU "
              f"rpn cosine={cos_min:.6f}")
        sys.exit(0 if cos_min >= args.min_cosine else 1)

    if det is not None:
        # Gate on the pre-NMS loc/conf tensors: with near-tied scores
        # (random weights especially) sub-1e-3 numeric differences
        # reorder the greedy NMS chaotically, so row identity between
        # backends is not a meaningful miscompile signal — the detection
        # row match is reported as information only.
        cos_min = 1.0
        for name in extract:
            a = np.asarray(res[name], np.float32).ravel()
            b = refs[name].ravel()
            c = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)
                               + 1e-12))
            print(f"  {name}: cosine={c:.6f}", file=sys.stderr)
            cos_min = min(cos_min, c)
        matched = total = 0
        for n in range(args.batch):
            va = out[n][out[n][:, 1] >= 0]
            vb = ref[n][ref[n][:, 1] >= 0]
            k = min(len(va), len(vb))
            total += max(len(va), len(vb))
            for ra, rb in zip(va[:k], vb[:k]):
                lt = np.maximum(ra[3:5], rb[3:5])
                rbr = np.minimum(ra[5:7], rb[5:7])
                inter = np.prod(np.maximum(rbr - lt, 0))
                ua = np.prod(np.maximum(ra[5:7] - ra[3:5], 0)) \
                    + np.prod(np.maximum(rb[5:7] - rb[3:5], 0)) - inter
                if ra[1] == rb[1] and inter / max(ua, 1e-10) > 0.8:
                    matched += 1
        rate = matched / max(total, 1)
        print(f"{args.model} {args.quant} b{args.batch}: TPU-vs-CPU "
              f"loc/conf cosine={cos_min:.6f}  (info: detection row "
              f"match {rate:.3f}, {matched}/{total})")
        sys.exit(0 if cos_min >= args.min_cosine else 1)

    a, b = out.ravel(), ref.ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    top1 = float((out.reshape(args.batch, -1).argmax(-1)
                  == ref.reshape(args.batch, -1).argmax(-1)).mean())
    print(f"{args.model} {args.quant} b{args.batch}: TPU-vs-CPU "
          f"cosine={cos:.6f} top1-agreement={top1:.3f}")
    ok = cos >= args.min_cosine and top1 >= args.min_top1
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
