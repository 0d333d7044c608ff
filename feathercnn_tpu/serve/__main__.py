"""Serving CLI: load a model, start the continuous-batching server and
its HTTP front-end.

    python -m feathercnn_tpu.serve --model out.ftpu --port 8000
    python -m feathercnn_tpu.serve --zoo resnet50 --quant w8a8

The deployment analog of the reference's feather_test binary
([pub] feather_test.cpp): one process owning the chip, callers over HTTP
(POST /infer with .npy or JSON; GET /healthz, /metrics).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="python -m feathercnn_tpu.serve")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--model", help="path to a .ftpu artifact")
    src.add_argument("--zoo", help="zoo model name (random weights)")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--batch-slots", default=None,
                    help="comma list of extra pre-compiled batch sizes")
    ap.add_argument("--batch-timeout-us", type=int, default=2000)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--quant", default=None, help="w8|w8a8")
    ap.add_argument("--im-info", default=None, metavar="H,W,SCALE",
                    help="fixed im_info row for two-stage detectors "
                    "(default: derived from the input spec)")
    ap.add_argument("--extra-input", action="append", default=[],
                    metavar="NAME=V1,V2,...",
                    help="fixed flat value for an extra graph input "
                    "(reshaped to its spec); repeatable")
    args = ap.parse_args(argv)

    # Multi-host bring-up must precede the first backend use: env-gated
    # (FEATHERCNN_COORDINATOR / _NUM_PROCESSES / _PROCESS_ID), no-op on
    # a single host.
    from ..parallel import maybe_initialize_distributed
    if maybe_initialize_distributed():
        import jax
        print(f"distributed: process {jax.process_index()}/"
              f"{jax.process_count()}", file=sys.stderr, flush=True)

    from .. import Engine, EngineConfig
    from . import HttpFrontend, InferenceServer

    cfg = EngineConfig(compute_dtype=args.dtype, backend=args.backend,
                       quant=args.quant or None)
    if args.model:
        eng = Engine.from_path(args.model, cfg)
    else:
        from ..models import MODEL_BUILDERS
        eng = Engine(MODEL_BUILDERS[args.zoo](batch=args.batch_size), cfg)

    # Fixed values for graph inputs beyond the image (two-stage
    # detectors need im_info): start from the spec-derived defaults,
    # then apply CLI overrides.
    import numpy as np

    from ..utils.timing import default_extra_inputs
    extra = default_extra_inputs(eng.graph)
    if args.im_info is not None:
        row = np.asarray([float(v) for v in args.im_info.split(",")],
                         np.float32)
        spec = eng.graph.inputs.get("im_info")
        if spec is None:
            ap.error("--im-info given but the graph has no im_info input")
        extra["im_info"] = np.tile(row[None], (spec.shape[0], 1))
    for kv in args.extra_input:
        name, _, vals = kv.partition("=")
        spec = eng.graph.inputs.get(name)
        if spec is None:
            ap.error(f"--extra-input {name!r}: no such graph input")
        flat = np.asarray([float(v) for v in vals.split(",")], np.float32)
        extra[name] = flat.reshape(spec.shape)

    slots = ([int(s) for s in args.batch_slots.split(",")]
             if args.batch_slots else None)
    srv = InferenceServer(eng, batch_size=args.batch_size,
                          batch_timeout_us=args.batch_timeout_us,
                          batch_slots=slots,
                          extra_inputs=extra or None)
    print("compiling batch slots...", file=sys.stderr, flush=True)
    srv.start()
    front = HttpFrontend(srv, host=args.host, port=args.port)
    print(f"serving on {args.host}:{front.port} "
          f"(POST /infer, GET /healthz, GET /metrics)",
          file=sys.stderr, flush=True)
    try:
        front.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        front.stop()
        srv.stop()


if __name__ == "__main__":
    main()
