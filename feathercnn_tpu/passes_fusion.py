"""Region fusion: replace identity-shortcut bottlenecks with one fused node.

Runs AFTER passes.optimize and quant.rewrite (so conv/BN/ReLU folds and
int8 metadata are already in place).  Pattern:

    a = Conv1x1(x, act=relu)          s1, single consumer
    b = Conv3x3(a, act=relu)          s1 p1, single consumer
    c = Conv1x1(b)                    no act, single consumer
    y = Eltwise SUM (x, c) act=relu   identity shortcut

-> one ``FusedBottleneck`` node lowered to the VMEM-resident Pallas kernel
(kernels/fused_block.py).  Opt-in via EngineConfig.fuse_blocks.
"""

from __future__ import annotations

from typing import List

from .ir import Graph, Node

__all__ = ["fuse_bottlenecks"]


def _conv_is(n: Node, k: int, act, stride=1) -> bool:
    if n is None or n.op != "Convolution":
        return False
    a = n.attrs
    kh = a.get("kernel_h", a.get("kernel_size", 1))
    kw = a.get("kernel_w", a.get("kernel_size", 1))
    sh = a.get("stride_h", a.get("stride", 1))
    if (kh, kw) != (k, k) or sh != stride or a.get("group", 1) != 1 \
            or a.get("dilation", 1) != 1:
        return False
    if k == 3 and a.get("pad_h", a.get("pad", 0)) != 1:
        return False
    return a.get("activation") == act


def fuse_bottlenecks(graph: Graph) -> int:
    """Returns the number of blocks fused."""
    producers = graph.producers()
    consumers = graph.consumers()
    qmeta = graph.meta.get("quant", {})
    vscales = graph.meta.get("value_scales", {})

    def sole(v):
        return len(consumers.get(v, [])) == 1 and v not in graph.outputs

    fused = 0
    remove: set = set()
    new_nodes: List[Node] = []
    for n in graph.nodes:
        if n.name in remove:
            continue
        if (n.op == "Eltwise" and n.attrs.get("operation", "SUM") == "SUM"
                and n.attrs.get("activation") == "relu"
                and not n.attrs.get("coeffs") and len(n.inputs) == 2):
            for x_val, c_val in (n.inputs, n.inputs[::-1]):
                c = producers.get(c_val)
                if not (_conv_is(c, 1, None) and sole(c_val)):
                    continue
                b = producers.get(c.inputs[0])
                if not (_conv_is(b, 3, "relu") and sole(c.inputs[0])):
                    continue
                a = producers.get(b.inputs[0])
                if not (_conv_is(a, 1, "relu") and sole(b.inputs[0])):
                    continue
                if a.inputs[0] != x_val:
                    continue
                # channel constraints: C == Co, all biases present
                if not all(len(m.params) > 1 for m in (a, b, c)):
                    continue
                # VMEM gate: even a single image's temporaries must fit
                # (56x56 ResNet stage-2 blocks don't — they stay
                # per-layer).
                spec = graph.specs.get(x_val)
                if spec is None or spec.rank != 4:
                    continue
                _, H, W, C = spec.shape
                Cm = a.attrs["num_output"]
                est = (H * W * max(C, 4 * Cm) * 4 * 3
                       + (H + 2) * (W + 2) * Cm * 2
                       + (2 * C * Cm + 9 * Cm * Cm) * 2
                       + H * W * C * 2 * 4)
                if est > 8 * 1024 * 1024:
                    continue

                quant = all(m.name in qmeta
                            and qmeta[m.name].get("x_scale") is not None
                            for m in (a, b, c)) if qmeta else False
                meta = {}
                if quant:
                    meta = {
                        "s_x": qmeta[a.name]["x_scale"],
                        "s_y1": qmeta[b.name]["x_scale"],
                        "s_y2": qmeta[c.name]["x_scale"],
                        # int8 out only when the producer of x emitted int8
                        # (same scale domain) AND downstream wants it;
                        # keep float out for simplicity/correctness.
                        "s_out": None,
                    }
                elif any(m.name in qmeta for m in (a, b, c)):
                    # mixed/weight-only: stay on the per-layer path
                    continue

                node = Node(
                    name=n.name + "/fused", op="FusedBottleneck",
                    inputs=[x_val], outputs=list(n.outputs),
                    attrs={"quant": quant, **meta},
                    params=[a.params[0], a.params[1], b.params[0],
                            b.params[1], c.params[0], c.params[1]])
                if quant:
                    graph.meta.setdefault("quant", {})[node.name] = {
                        "w_scales": [qmeta[a.name]["w_scale"],
                                     qmeta[b.name]["w_scale"],
                                     qmeta[c.name]["w_scale"]],
                        "x_scale": qmeta[a.name]["x_scale"],
                    }
                remove.update((a.name, b.name, c.name, n.name))
                new_nodes.append(node)
                fused += 1
                break

    if fused:
        out = []
        for n in graph.nodes:
            if n.name in remove:
                # insert the fused node where the Eltwise was
                for fnode in new_nodes:
                    if fnode.name == n.name + "/fused":
                        out.append(fnode)
                        break
            else:
                out.append(n)
        graph.nodes = out
        graph.validate()
        _propagate_int8_through_blocks(graph)
    return fused


def _propagate_int8_through_blocks(graph: Graph) -> None:
    """Second pass: a quantized FusedBottleneck emits int8 directly when
    every consumer reads int8 at the same (calibrated) scale — chains of
    fused blocks then never leave int8 between HBM round trips."""
    qmeta = graph.meta.get("quant", {})
    vscales = graph.meta.get("value_scales", {})
    consumers = graph.consumers()
    fused_by_name = {n.name: n for n in graph.nodes
                     if n.op == "FusedBottleneck"}
    for n in fused_by_name.values():
        if not n.attrs.get("quant"):
            continue
        out = n.outputs[0]
        scale = vscales.get(out)
        if scale is None or out in graph.outputs:
            continue
        ok = True
        for c in consumers.get(out, []):
            if c.op == "FusedBottleneck":
                if not c.attrs.get("quant") or c.attrs.get("s_x") != scale:
                    ok = False
            elif c.op in ("Convolution", "InnerProduct"):
                info = qmeta.get(c.name)
                if not info or info.get("x_scale") != scale \
                        or c.inputs[0] != out:
                    ok = False
            else:
                ok = False
        if ok and consumers.get(out):
            n.attrs["s_out"] = float(scale)
