#!/usr/bin/env python
"""Classify one image end-to-end: preprocess -> Engine -> top-5.

    python examples/classify.py --model resnet50 --quant w8a8
    python examples/classify.py --ftpu out.ftpu --image img.npy

``--image`` takes a .npy HWC uint8/float array; without it a synthetic
image is used so the example runs anywhere.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from feathercnn_tpu import Engine, EngineConfig           # noqa: E402
from feathercnn_tpu.serve import preprocess               # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--model", help="zoo model name")
    src.add_argument("--ftpu", help="converted model artifact")
    ap.add_argument("--image", help=".npy HWC image")
    ap.add_argument("--quant", default=None, help="w8|w8a8")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    # Pallas kernels need interpret mode off-TPU (the CPU test path).
    interpret = jax.default_backend() not in ("tpu", "axon")
    cfg = EngineConfig(compute_dtype=args.dtype, backend="pallas",
                       quant=args.quant or None, interpret=interpret)
    if args.ftpu:
        from feathercnn_tpu.model_format import load_ftpu
        graph = load_ftpu(args.ftpu)
    else:
        from feathercnn_tpu.models import MODEL_BUILDERS
        graph = MODEL_BUILDERS[args.model](batch=1)

    in_spec = next(iter(graph.inputs.values()))
    _, h, w, _ = in_spec.shape
    if args.image:
        raw = np.load(args.image)
        if raw.dtype != np.uint8:   # pre-scaled float images
            raw = np.clip(raw, 0, 255).astype(np.uint8)
    else:
        raw = np.random.default_rng(0).integers(
            0, 256, size=(h + 32, w + 32, 3)).astype(np.uint8)
    img = preprocess(raw, (h, w), mean=(0.485, 0.456, 0.406),
                     std=(0.229, 0.224, 0.225))

    # Calibrate BEFORE constructing the quantized engine — the engine's
    # Init quantizes weights in place, and a second construction would
    # skip the (already-int8) weights without attaching act scales.
    if args.quant == "w8a8" and "act_scales" not in graph.meta:
        from feathercnn_tpu.quant import calibrate
        calibrate(graph, [img[None]], method="max")
    eng = Engine(graph, cfg)

    probs = np.asarray(eng(img[None]), np.float32)[0].ravel()
    top5 = np.argsort(-probs)[:5]
    for i in top5:
        print(f"class {i:4d}: {probs[i]:.4f}")


if __name__ == "__main__":
    main()
