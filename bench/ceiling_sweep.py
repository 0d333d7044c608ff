"""Run bench/ceiling.py for every zoo model, one process per model.

The remote Mosaic compile helper destabilizes when many big models share
one process (CLAUDE.md), so each model gets a fresh interpreter under a
timeout with one retry.  Results land in bench/results/ceiling_*.json;
render the rolling table with bench/ceiling_summary.py.

    python bench/ceiling_sweep.py [--only m1,m2] [--timeout 2400]
"""

import argparse
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))

# (model, best batch) — batches from BASELINE.md per-model medians.
MODELS = [
    # VERDICT r2 priority: biggest unexplained gaps first
    ("shufflenet_v1", 128),
    ("shufflenet_v2", 128),
    ("mobilenet_v2", 128),
    ("densenet121", 128),
    ("densenet169", 128),
    ("densenet201", 96),
    ("inception_v3", 128),
    ("se_resnet50", 96),
    ("mobilenet_ssd", 128),
    ("faster_rcnn_vgg16", 1),
    ("rfcn_resnet101", 1),
    ("pspnet50", 4),
    # the rest of the zoo
    ("alexnet", 256),
    ("resnet101", 128),
    ("resnet152", 96),
    ("vgg16", 128),
    ("vgg19", 128),
    ("resnext50", 128),
    ("squeezenet_v10", 128),
    ("fcn32s", 16),
    ("fcn16s", 16),
    ("fcn8s", 16),
    ("deeplab_largefov", 16),
    ("vgg16_ssd300", 16),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="comma list of model names")
    ap.add_argument("--timeout", type=int, default=2400)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--skip-existing", action="store_true")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    for model, batch in MODELS:
        if only and model not in only:
            continue
        out = os.path.join(HERE, "results",
                           f"ceiling_{model}_w8a8_b{batch}_stage.json")
        if args.skip_existing and os.path.exists(out):
            print(f"skip {model} (exists)", flush=True)
            continue
        cmd = [sys.executable, os.path.join(HERE, "ceiling.py"),
               "--model", model, "--batch", str(batch),
               "--rounds", str(args.rounds), "--out", out]
        for attempt in (1, 2):
            t0 = time.time()
            print(f"=== {model} b{batch} attempt {attempt}", flush=True)
            try:
                r = subprocess.run(cmd, timeout=args.timeout,
                                   capture_output=True, text=True)
            except subprocess.TimeoutExpired:
                print(f"{model}: TIMEOUT after {args.timeout}s",
                      flush=True)
                continue
            dt = time.time() - t0
            if r.returncode == 0 and os.path.exists(out):
                print(f"{model}: ok in {dt:.0f}s", flush=True)
                break
            print(f"{model}: rc={r.returncode} in {dt:.0f}s\n"
                  + r.stderr[-1500:], flush=True)


if __name__ == "__main__":
    main()
