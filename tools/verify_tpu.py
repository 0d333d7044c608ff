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
g = MODEL_BUILDERS[model](batch=int(batch), with_softmax=False)
x = np.load(xpath)
if quant == "w8a8":
    calibrate(g, [x], method="max")
cfg = EngineConfig(compute_dtype=dtype, backend="pallas", quant=quant,
                   interpret=True, algo_overrides=(("*", "xla"),))
out = np.asarray(Engine(g, cfg)(x), np.float32)
np.save(opath, out)
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

    g = MODEL_BUILDERS[args.model](batch=args.batch, with_softmax=False)
    spec = next(iter(g.inputs.values()))
    x = np.random.default_rng(0).normal(size=spec.shape).astype(np.float32)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory() as td:
        xp, op = os.path.join(td, "x.npy"), os.path.join(td, "o.npy")
        np.save(xp, x)
        # CPU oracle in a subprocess (the axon sitecustomize grabs the
        # TPU in-process; a child with jax_platforms=cpu stays off it)
        subprocess.run(
            [sys.executable, "-c", CPU_HELPER.format(root=root),
             args.model, str(args.batch), quant or "none",
             args.dtype, xp, op],
            check=True, env={**os.environ, "PALLAS_AXON_POOL_IPS": "",
                             "JAX_PLATFORMS": "cpu"})
        ref = np.load(op)

    if quant == "w8a8":
        calibrate(g, [x], method="max")
    cfg = EngineConfig(compute_dtype=args.dtype, backend="pallas",
                       quant=quant, algo_overrides=(("*", "xla"),))
    import jax
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    out = np.asarray(Engine(g, cfg)(x), np.float32)

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
