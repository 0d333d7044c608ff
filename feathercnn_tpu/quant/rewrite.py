"""Graph rewrite: swap f32 conv/FC weights for int8 + epilogue scales.

Runs inside Engine.__init__ after the fusion passes (so BN/Scale folds are
already baked into the weights being quantized — matching the reference's
order of fuse-then-transform at Init, [pub] src/net.cpp).  Activation
scales (for the full-int8 "w8a8" mode) come from quant/calibrate.py via
``graph.meta["act_scales"]``; a layer without a calibrated scale degrades
to weight-only for that layer.
"""

from __future__ import annotations

import numpy as np

from .qscheme import quantize_weight_per_channel

__all__ = ["quantize_graph"]

_QUANT_OPS = ("Convolution", "InnerProduct")


def quantize_graph(graph, mode: str) -> None:
    if mode not in ("w8", "w8a8"):
        raise ValueError(f"unknown quant mode {mode!r}")
    act_scales = graph.meta.get("act_scales", {})
    value_scales = graph.meta.get("value_scales", {})
    qmeta = graph.meta.setdefault("quant", {})
    for n in graph.nodes:
        if n.op not in _QUANT_OPS or not n.params:
            continue
        w = graph.params[n.params[0]]
        if w.dtype == np.int8:
            continue  # pre-quantized artifact
        # First conv from 3-channel images: tiny-C layers run via the XLA
        # fp path anyway (dispatch), but int8 storage still shrinks the
        # artifact; keep quantizing uniformly.
        wq, scale = quantize_weight_per_channel(np.asarray(w))
        graph.params[n.params[0]] = wq
        info = {"w_scale": scale}
        if mode == "w8a8":
            xs = value_scales.get(n.inputs[0], act_scales.get(n.name))
            if xs is not None:
                info["x_scale"] = float(xs)
        qmeta[n.name] = info

    if mode != "w8a8":
        return
    consumers = graph.consumers()

    # Residual adds on int8 edges: an Eltwise SUM whose operand and output
    # scales are calibrated and whose consumers all take int8 computes
    # y = clip(round((sum_i x_i * s_i) / s_y)) — the rescale-add replaces
    # two bf16 reads + one bf16 write with int8 traffic.  Marked in
    # reverse topological order so chained adds resolve.
    def _takes_int8(c, value):
        info = qmeta.get(c.name)
        if info is None:
            return False
        if c.op in ("Convolution", "InnerProduct"):
            return info.get("x_scale") is not None and c.inputs[0] == value
        if c.op == "Eltwise":
            return bool(info.get("eltwise_int8"))
        return False

    for n in reversed(graph.nodes):
        if (n.op == "Eltwise" and n.attrs.get("operation", "SUM") == "SUM"
                and not n.attrs.get("coeffs")):
            out = n.outputs[0]
            y_scale = value_scales.get(out)
            cons = consumers.get(out, [])
            if (y_scale is not None and cons and out not in graph.outputs
                    and all(v in value_scales for v in n.inputs)
                    and all(_takes_int8(c, out) for c in cons)):
                qmeta[n.name] = {
                    "eltwise_int8": True,
                    "in_scales": [float(value_scales[v]) for v in n.inputs],
                    "y_scale": float(y_scale),
                }

    # int8 edge propagation: a quantized producer whose every consumer
    # takes int8 at the producer's output scale emits int8 directly from
    # its epilogue (requant fused, kernels/matmul.py out_scale) — no
    # standalone quantize pass, half the HBM traffic.
    for n in graph.nodes:
        info = qmeta.get(n.name)
        if info is None or "x_scale" not in info:
            continue
        out = n.outputs[0]
        y_scale = value_scales.get(out)
        cons = consumers.get(out, [])
        if (y_scale is not None and cons and out not in graph.outputs
                and all(_takes_int8(c, out) for c in cons)):
            info["emit_int8"] = True
            info["y_scale"] = float(y_scale)
