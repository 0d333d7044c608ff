#!/usr/bin/env python
"""Two-stage detection end-to-end: Faster R-CNN / R-FCN on device, the
test.py-style final decode on host.

    python examples/detect.py --model faster_rcnn_vgg16 [--image img.npy]
    python examples/detect.py --model rfcn_resnet101 --quant w8a8
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from feathercnn_tpu import Engine, EngineConfig                # noqa: E402
from feathercnn_tpu.serve import decode_detections, preprocess  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="faster_rcnn_vgg16",
                    choices=["faster_rcnn_vgg16", "rfcn_resnet101"])
    ap.add_argument("--image", help=".npy HWC image (uint8 or float)")
    ap.add_argument("--quant", default=None, help="w8|w8a8")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--score-thresh", type=float, default=0.05)
    args = ap.parse_args()

    import jax
    from feathercnn_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    interpret = jax.default_backend() not in ("tpu", "axon")
    from feathercnn_tpu.models import MODEL_BUILDERS
    graph = MODEL_BUILDERS[args.model]()
    (h, w) = next(iter(graph.inputs.values())).shape[1:3]

    if args.image:
        raw = np.load(args.image)
        if raw.dtype != np.uint8:
            raw = np.clip(raw, 0, 255).astype(np.uint8)
    else:
        raw = np.random.default_rng(0).integers(
            0, 256, size=(h, w, 3)).astype(np.uint8)
    img = preprocess(raw, (h, w), mean=(0.485, 0.456, 0.406),
                     std=(0.229, 0.224, 0.225))
    inputs = {"data": img[None],
              "im_info": np.asarray([[h, w, 1.0]], np.float32)}

    if args.quant == "w8a8":
        from feathercnn_tpu.quant import calibrate
        calibrate(graph, [inputs], method="max")
    eng = Engine(graph, EngineConfig(compute_dtype=args.dtype,
                                     backend="pallas",
                                     quant=args.quant or None,
                                     interpret=interpret))
    res = eng.run(inputs)
    cls_prob = np.asarray(res[graph.outputs[0]], np.float32)
    bbox_pred = np.asarray(res[graph.outputs[1]], np.float32)
    rois = np.asarray(res[graph.outputs[2]], np.float32)
    dets = decode_detections(
        cls_prob, bbox_pred, rois, (h, w),
        score_thresh=args.score_thresh,
        class_agnostic=(args.model == "rfcn_resnet101"))
    total = sum(len(d) for d in dets.values())
    print(f"{total} detections across {len(dets)} classes")
    for c, d in sorted(dets.items()):
        for row in d[:3]:
            print(f"  class {c:3d} score {row[4]:.3f} "
                  f"box [{row[0]:.0f}, {row[1]:.0f}, "
                  f"{row[2]:.0f}, {row[3]:.0f}]")


if __name__ == "__main__":
    main()
