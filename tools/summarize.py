#!/usr/bin/env python
"""Print a model's per-layer summary table (shapes/params/FLOPs/bytes).

    python tools/summarize.py --model resnet50 [--batch 1] [--raw]
    python tools/summarize.py --ftpu out.ftpu --top 20
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--model", help="zoo model name")
    src.add_argument("--ftpu", help="path to a .ftpu artifact")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--top", type=int, default=None,
                    help="only the N most FLOP-heavy layers")
    ap.add_argument("--raw", action="store_true",
                    help="summarize the UNfused graph (as converted)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from feathercnn_tpu import Engine
    from feathercnn_tpu.utils.summary import summarize

    if args.model:
        from feathercnn_tpu.models import MODEL_BUILDERS
        g = MODEL_BUILDERS[args.model](batch=args.batch)
    else:
        from feathercnn_tpu.model_format import load_ftpu
        g = load_ftpu(args.ftpu)

    if args.raw:
        print(summarize(g, top=args.top))
    else:
        print(Engine(g, optimize_graph=True).summary(top=args.top))


if __name__ == "__main__":
    main()
