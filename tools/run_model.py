#!/usr/bin/env python
"""Demo / benchmark CLI — the feather_test analog ([pub] feather_test.cpp).

Loads a model (.ftpu file or zoo name), warms up, runs timed forward
loops, prints per-run ms and images/s, and optionally dumps named blobs
for parity checking against another runtime.

    python tools/run_model.py resnet50 --batch 8 --loops 20
    python tools/run_model.py model.ftpu --dump conv1 --dump-dir /tmp/blobs
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model", help=".ftpu path or zoo model name")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--loops", type=int, default=10)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--quant", default=None)
    ap.add_argument("--input", default=None,
                    help=".npy NHWC input (random if omitted)")
    ap.add_argument("--dump", action="append", default=[],
                    help="blob name to dump (repeatable)")
    ap.add_argument("--dump-dir", default=".")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--config", default=None,
                    help="EngineConfig JSON file (overrides "
                         "--dtype/--quant)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from feathercnn_tpu import Engine, EngineConfig

    if args.config:
        cfg = EngineConfig.from_json(args.config)
    else:
        cfg = EngineConfig(compute_dtype=args.dtype, quant=args.quant)
    if os.path.exists(args.model):
        eng = Engine.from_path(args.model, cfg)
    else:
        from feathercnn_tpu.models import MODEL_BUILDERS
        eng = Engine(MODEL_BUILDERS[args.model](batch=args.batch), cfg)

    (in_name,) = eng.graph.inputs
    spec = eng.graph.inputs[in_name]
    shape = (args.batch,) + tuple(spec.shape[1:])
    if args.input:
        x = np.load(args.input).astype(np.float32)
    else:
        x = np.random.default_rng(0).normal(size=shape).astype(np.float32)
    print(f"{eng.graph.name}: {len(eng.graph.nodes)} layers, "
          f"input {x.shape}")

    t0 = time.time()
    out = eng.run({in_name: x}, extract=args.dump)
    first = np.asarray(out[eng.output_names[0]], np.float32)
    print(f"warmup (compile): {time.time() - t0:.2f}s")

    times = []
    for _ in range(args.loops):
        t0 = time.time()
        out = eng.run({in_name: x}, extract=args.dump)
        # force a real fetch (block_until_ready is unreliable over tunnels)
        _ = float(np.asarray(out[eng.output_names[0]]).ravel()[0])
        times.append(time.time() - t0)
    times = np.asarray(times)
    print(f"{args.loops} loops: mean {times.mean()*1e3:.2f} ms  "
          f"min {times.min()*1e3:.2f} ms  "
          f"{args.batch/times.mean():.1f} images/s")

    top = first.reshape(args.batch, -1)
    for i in range(min(args.batch, 3)):
        idx = np.argsort(top[i])[::-1][:5]
        print(f"image {i} top-5: " +
              ", ".join(f"{j}:{top[i][j]:.4f}" for j in idx))

    for name in args.dump:
        path = os.path.join(args.dump_dir,
                            name.replace("/", "_") + ".npy")
        np.save(path, np.asarray(out[name], np.float32))
        print(f"dumped {name} -> {path}")


if __name__ == "__main__":
    main()
