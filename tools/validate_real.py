#!/usr/bin/env python
"""Real-weights end-to-end validation (SURVEY.md §4; the reference's
[pub] tools/feather_convert_caffe.cpp + feather_test.cpp golden-output
workflow).

One command: real deploy.prototxt + .caffemodel + an image directory →
convert → fp32 top-1 → int8 calibrate → int8 top-1 → the ≤0.5%
accuracy gate (BASELINE.json).  Built and unit-tested against a
synthetic wire-encoded caffemodel (tests/test_validate_real.py) so the
moment genuine bytes appear this runs unchanged:

    python tools/validate_real.py tools/deploys/resnet50_deploy.prototxt \
        ResNet-50-model.caffemodel --images val_dir --labels val.txt

Images: .npy files are taken as preprocessed (H, W, C) float32 BGR;
anything PIL opens is resized (shorter side → --resize), center-cropped
to the deploy's input size, RGB→BGR, mean-subtracted (--mean, Caffe
ImageNet BGR default).  Labels file: ``<filename> <int>`` per line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def load_image(path: str, size: int, resize: int,
               mean: np.ndarray, scale: float) -> np.ndarray:
    """One preprocessed (size, size, 3) float32 BGR image."""
    if path.endswith(".npy"):
        arr = np.load(path).astype(np.float32)
        if arr.shape[:2] != (size, size):
            raise ValueError(f"{path}: expected ({size},{size},3), "
                             f"got {arr.shape}")
        return arr
    from PIL import Image
    im = Image.open(path).convert("RGB")
    w, h = im.size
    r = resize / min(w, h)
    im = im.resize((max(size, int(round(w * r))),
                    max(size, int(round(h * r)))), Image.BILINEAR)
    w, h = im.size
    left, top = (w - size) // 2, (h - size) // 2
    im = im.crop((left, top, left + size, top + size))
    arr = np.asarray(im, np.float32)[:, :, ::-1]      # RGB -> BGR
    return (arr - mean) * scale


def top1(engine, images: np.ndarray, batch: int) -> np.ndarray:
    """Class predictions for (M, H, W, 3) preprocessed images."""
    preds = []
    for i in range(0, len(images), batch):
        chunk = images[i:i + batch]
        pad = batch - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.zeros_like(chunk[:1])
                                    .repeat(pad, 0)])
        out = np.asarray(engine(chunk), np.float32)
        out = out.reshape(out.shape[0], -1)
        preds.append(out.argmax(-1)[:len(images[i:i + batch])])
    return np.concatenate(preds)


def validate(deploy: str, caffemodel: str, image_paths, labels=None,
             batch: int = 8, calib_n: int = 8, resize: int = 256,
             mean=(104.0, 117.0, 123.0), scale: float = 1.0,
             dtype: str = "float32", gate: float = 0.005,
             quant: str = "w8a8", backend: str = "xla",
             interpret: bool = False) -> dict:
    from convert_caffe import convert

    from feathercnn_tpu import Engine, EngineConfig
    from feathercnn_tpu.quant import calibrate

    g = convert(deploy, caffemodel, batch=batch)
    spec = next(iter(g.inputs.values()))
    size = spec.shape[1]
    mean = np.asarray(mean, np.float32)
    images = np.stack([load_image(p, size, resize, mean, scale)
                       for p in image_paths])

    fp_eng = Engine(g, EngineConfig(compute_dtype=dtype,
                                    backend=backend, interpret=interpret))
    fp_pred = top1(fp_eng, images, batch)

    result = {"deploy": os.path.basename(deploy),
              "images": len(images), "fp_top1_pred": fp_pred.tolist()}
    if quant:
        calib = images[:calib_n]
        pad = batch - len(calib) % batch if len(calib) % batch else 0
        if pad:
            calib = np.concatenate([calib, calib[:1].repeat(pad, 0)])
        calibrate(g, [calib[i:i + batch]
                      for i in range(0, len(calib), batch)],
                  method="max",
                  config=EngineConfig(compute_dtype=dtype))
        q_eng = Engine(g, EngineConfig(compute_dtype=dtype, quant=quant,
                                       backend=backend,
                                       interpret=interpret))
        q_pred = top1(q_eng, images, batch)
        result["int8_top1_pred"] = q_pred.tolist()
        result["fp_vs_int8_agree"] = float((fp_pred == q_pred).mean())

    if labels is not None:
        y = np.asarray([labels[os.path.basename(p)] for p in image_paths])
        result["fp_top1"] = float((fp_pred == y).mean())
        if quant:
            result["int8_top1"] = float((q_pred == y).mean())
            result["top1_drop"] = result["fp_top1"] - result["int8_top1"]
            result["gate"] = gate
            result["gate_pass"] = bool(result["top1_drop"] <= gate)
    return result


def main():
    ap = argparse.ArgumentParser(
        description="Convert a real Caffe model and validate fp32/int8 "
                    "top-1 on real images")
    ap.add_argument("deploy")
    ap.add_argument("caffemodel")
    ap.add_argument("--images", required=True,
                    help="directory of images (or .npy preprocessed)")
    ap.add_argument("--labels", default=None,
                    help="file of '<filename> <int label>' lines")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--calib-n", type=int, default=8,
                    help="images used for int8 calibration")
    ap.add_argument("--resize", type=int, default=256)
    ap.add_argument("--mean", default="104,117,123",
                    help="BGR channel means")
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--quant", default="w8a8",
                    help="'none' skips the int8 leg")
    ap.add_argument("--gate", type=float, default=0.005)
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args()

    exts = (".npy", ".jpg", ".jpeg", ".png", ".bmp")
    paths = sorted(
        os.path.join(args.images, f) for f in os.listdir(args.images)
        if f.lower().endswith(exts))[:args.limit]
    if not paths:
        sys.exit(f"no images under {args.images}")
    labels = None
    if args.labels:
        labels = {}
        with open(args.labels) as f:
            for line in f:
                if line.strip():
                    k, v = line.split()
                    labels[k] = int(v)
    res = validate(
        args.deploy, args.caffemodel, paths, labels=labels,
        batch=args.batch, calib_n=args.calib_n, resize=args.resize,
        mean=tuple(float(v) for v in args.mean.split(",")),
        scale=args.scale, dtype=args.dtype, gate=args.gate,
        quant=None if args.quant in ("none", "None") else args.quant)
    print(json.dumps(res, indent=1))
    if "gate_pass" in res and not res["gate_pass"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
