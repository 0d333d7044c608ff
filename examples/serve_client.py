#!/usr/bin/env python
"""Client for the HTTP serving front-end (python -m feathercnn_tpu.serve).

    python examples/serve_client.py --url http://localhost:8000 \
        [--image img.npy] [--shape 224,224,3] [-n 8]
"""

import argparse
import io
import urllib.request

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://localhost:8000")
    ap.add_argument("--image", help=".npy HWC float image")
    ap.add_argument("--shape", default="224,224,3")
    ap.add_argument("-n", type=int, default=1, help="requests to send")
    args = ap.parse_args()

    if args.image:
        img = np.load(args.image).astype(np.float32)
    else:
        shape = tuple(int(d) for d in args.shape.split(","))
        img = np.random.default_rng(0).normal(size=shape).astype(np.float32)

    buf = io.BytesIO()
    np.save(buf, img)
    payload = buf.getvalue()
    for i in range(args.n):
        req = urllib.request.Request(
            args.url + "/infer", data=payload,
            headers={"Content-Type": "application/x-npy"})
        with urllib.request.urlopen(req, timeout=60) as resp:
            out = np.load(io.BytesIO(resp.read()))
        top = int(np.argmax(out.ravel()))
        print(f"request {i}: out {out.shape}, argmax {top}")


if __name__ == "__main__":
    main()
