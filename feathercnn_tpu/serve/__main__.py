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
    args = ap.parse_args(argv)

    from .. import Engine, EngineConfig
    from . import HttpFrontend, InferenceServer

    cfg = EngineConfig(compute_dtype=args.dtype, backend=args.backend,
                       quant=args.quant or None)
    if args.model:
        eng = Engine.from_path(args.model, cfg)
    else:
        from ..models import MODEL_BUILDERS
        eng = Engine(MODEL_BUILDERS[args.zoo](batch=args.batch_size), cfg)

    slots = ([int(s) for s in args.batch_slots.split(",")]
             if args.batch_slots else None)
    srv = InferenceServer(eng, batch_size=args.batch_size,
                          batch_timeout_us=args.batch_timeout_us,
                          batch_slots=slots)
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
