"""Graph optimization passes.

The reference runs a single in-place fusion walk in ``Net::InitFromBuffer``:
for each adjacent layer pair, ``prev->TryFuse(next)`` folds
Conv <- BatchNorm <- Scale <- ReLU chains and erases the fused layers
([pub] src/net.cpp, [pub] src/layers/conv_layer.cpp).  Here the same
transformations are explicit IR->IR passes that run *before* tracing; XLA's
HLO fusion then handles everything elementwise that remains.

Pass order (``optimize``):
  1. drop_identities     -- Dropout / Split vanish (inference is identity)
  2. fold_batchnorm      -- BN folds into preceding Conv/InnerProduct,
                            otherwise canonicalizes to a Scale node
  3. fold_scale          -- Scale folds into preceding Conv/InnerProduct
  4. fuse_activation     -- ReLU/ReLU6/LeakyReLU folds into the producer's
                            epilogue (Conv/InnerProduct/Eltwise/Scale)
  5. dce                 -- drop nodes whose outputs are never used
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from .ir import Graph, Node, topo_sort

__all__ = [
    "optimize",
    "drop_identities",
    "fold_batchnorm",
    "fold_scale",
    "fuse_activation",
    "dce",
]

# Ops whose weight layout ends in an output-channel axis, making
# per-output-channel affine folds (BN/Scale) possible.
_FOLDABLE = {"Convolution", "InnerProduct"}
# Ops that support a fused activation epilogue attr.
_EPILOGUE_OPS = {"Convolution", "InnerProduct", "Eltwise", "Scale"}


def optimize(graph: Graph) -> Graph:
    drop_identities(graph)
    fold_batchnorm(graph)
    fold_scale(graph)
    fuse_activation(graph)
    dce(graph)
    topo_sort(graph)
    graph.validate()
    return graph


# ----------------------------------------------------------------------
def _rename_uses(graph: Graph, old: str, new: str) -> None:
    """Replace every read of value ``old`` with ``new`` (SSA rewire)."""
    for n in graph.nodes:
        n.inputs = [new if i == old else i for i in n.inputs]
    graph.outputs = [new if o == old else o for o in graph.outputs]


def _sole_consumer(graph: Graph, value: str) -> bool:
    if value in graph.outputs:
        return False
    return len(graph.consumers().get(value, [])) == 1


def drop_identities(graph: Graph) -> None:
    """Dropout is identity at inference ([pub] src/layers/dropout_layer.h);
    Split fan-out is implicit in SSA."""
    keep: List[Node] = []
    for n in graph.nodes:
        if n.op == "Dropout":
            _rename_uses(graph, n.outputs[0], n.inputs[0])
        elif n.op == "Split":
            for o in n.outputs:
                _rename_uses(graph, o, n.inputs[0])
        else:
            keep.append(n)
    graph.nodes = keep


# ----------------------------------------------------------------------
def _bn_affine(graph: Graph, node: Node):
    """BatchNorm -> per-channel (gamma, beta): y = gamma*x + beta."""
    mean = graph.params[node.params[0]].astype(np.float64)
    var = graph.params[node.params[1]].astype(np.float64)
    eps = node.attrs.get("eps", 1e-5)
    inv_std = 1.0 / np.sqrt(var + eps)
    return inv_std, -mean * inv_std


def _scale_affine(graph: Graph, node: Node):
    gamma = graph.params[node.params[0]].astype(np.float64)
    if node.attrs.get("bias_term", False) and len(node.params) > 1:
        beta = graph.params[node.params[1]].astype(np.float64)
    else:
        beta = np.zeros_like(gamma)
    return gamma, beta


def _fold_affine_into(graph: Graph, prod: Node, gamma, beta) -> None:
    """Fold y -> gamma*y + beta into a Conv/InnerProduct's weights+bias.

    Conv weights are HWIO (or HWI'O for grouped), InnerProduct weights are
    (in, out): output channels are the trailing axis for both, so the fold
    is a broadcast multiply on the last axis — the math FeatherCNN's
    ConvLayer::Fuse does on its NCHW weights ([pub] src/layers/conv_layer.cpp),
    restated for TPU layout.
    """
    w = graph.params[prod.params[0]]
    dtype = w.dtype
    graph.params[prod.params[0]] = (w.astype(np.float64) * gamma).astype(dtype)
    if prod.attrs.get("bias_term", True) and len(prod.params) > 1:
        b = graph.params[prod.params[1]].astype(np.float64)
        graph.params[prod.params[1]] = (b * gamma + beta).astype(dtype)
    else:
        bias_name = prod.name + "/folded_bias"
        graph.params[bias_name] = beta.astype(dtype)
        prod.params.append(bias_name)
        prod.attrs["bias_term"] = True


def fold_batchnorm(graph: Graph) -> None:
    producers = graph.producers()
    keep: List[Node] = []
    for n in graph.nodes:
        if n.op != "BatchNorm":
            keep.append(n)
            continue
        gamma, beta = _bn_affine(graph, n)
        prod = producers.get(n.inputs[0])
        if (prod is not None and prod.op in _FOLDABLE
                and not prod.attrs.get("activation")
                and _sole_consumer(graph, n.inputs[0])):
            _fold_affine_into(graph, prod, gamma, beta)
            _rename_uses(graph, n.outputs[0], prod.outputs[0])
            # prod's output takes over BN's role; keep producers map fresh
            producers[prod.outputs[0]] = prod
        else:
            # Canonicalize standalone BN to a Scale node (precomputed affine)
            gname, bname = n.name + "/bn_gamma", n.name + "/bn_beta"
            graph.params[gname] = gamma.astype(np.float32)
            graph.params[bname] = beta.astype(np.float32)
            keep.append(Node(
                name=n.name, op="Scale", inputs=list(n.inputs),
                outputs=list(n.outputs),
                attrs={"bias_term": True}, params=[gname, bname]))
    graph.nodes = keep


def fold_scale(graph: Graph) -> None:
    producers = graph.producers()
    keep: List[Node] = []
    for n in graph.nodes:
        if n.op != "Scale":
            keep.append(n)
            continue
        prod = producers.get(n.inputs[0])
        if (prod is not None and prod.op in _FOLDABLE
                and not prod.attrs.get("activation")
                and _sole_consumer(graph, n.inputs[0])):
            gamma, beta = _scale_affine(graph, n)
            _fold_affine_into(graph, prod, gamma, beta)
            _rename_uses(graph, n.outputs[0], prod.outputs[0])
            producers[prod.outputs[0]] = prod
        else:
            keep.append(n)
    graph.nodes = keep


# ----------------------------------------------------------------------
_ACT_OPS = {"ReLU": "relu", "ReLU6": "relu6"}


def fuse_activation(graph: Graph) -> None:
    """Fold ReLU-family nodes into the producing op's epilogue — the analog
    of the reference's fused bias/ReLU GEMM store-back
    ([pub] src/booster/arm/sgemm.cpp epilogues, WinogradOutType variants)."""
    producers = graph.producers()
    keep: List[Node] = []
    for n in graph.nodes:
        act = _ACT_OPS.get(n.op)
        if act == "relu" and n.attrs.get("negative_slope", 0) != 0:
            act = None  # leaky relu stays standalone
        if act is None:
            keep.append(n)
            continue
        prod = producers.get(n.inputs[0])
        if (prod is not None and prod.op in _EPILOGUE_OPS
                and not prod.attrs.get("activation")
                and _sole_consumer(graph, n.inputs[0])):
            prod.attrs["activation"] = act
            _rename_uses(graph, n.outputs[0], prod.outputs[0])
            producers[prod.outputs[0]] = prod
        else:
            keep.append(n)
    graph.nodes = keep


# ----------------------------------------------------------------------
def dce(graph: Graph) -> None:
    live = set(graph.outputs)
    keep_rev: List[Node] = []
    for n in reversed(graph.nodes):
        if any(o in live for o in n.outputs):
            keep_rev.append(n)
            live.update(n.inputs)
    graph.nodes = list(reversed(keep_rev))
    # Drop orphaned params
    used = {p for n in graph.nodes for p in n.params}
    graph.params = {k: v for k, v in graph.params.items() if k in used}
