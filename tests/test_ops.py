"""Op-level cross-checks against torch (independent reference)."""

import numpy as np
import pytest

from feathercnn_tpu import Engine
from feathercnn_tpu.models.builder import GraphBuilder
from feathercnn_tpu.ir import Graph, Node, TensorSpec


def _run_single(op, attrs, x, params=None):
    g = Graph("t", {"x": TensorSpec(x.shape)}, ["y"],
              [Node("n", op, ["x"], ["y"], attrs,
                    list(params or {}))],
              params=dict(params or {}))
    return np.asarray(Engine(g, optimize_graph=False)(x))


def test_lrn_vs_torch(rng):
    import torch
    x = rng.normal(size=(2, 6, 6, 16)).astype(np.float32)
    attrs = {"local_size": 5, "alpha": 1e-3, "beta": 0.75, "k": 1.0}
    y = _run_single("LRN", attrs, x)
    t = torch.nn.LocalResponseNorm(5, alpha=1e-3, beta=0.75, k=1.0)
    ref = t(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-6)


def test_caffe_ave_pool_pad_counting(rng):
    """Caffe AVE pooling divides by the window clipped to the padded
    region — not by the constant kernel area."""
    import torch
    x = rng.normal(size=(1, 5, 5, 3)).astype(np.float32)
    attrs = {"pool": "AVE", "kernel_size": 3, "stride": 2, "pad": 1,
             "ceil_mode": True}
    y = _run_single("Pooling", attrs, x)
    # torch with count_include_pad=True matches Caffe's padded-window count
    ref = torch.nn.functional.avg_pool2d(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), 3, stride=2,
        padding=1, ceil_mode=True, count_include_pad=True)
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-6)


def test_prelu_channelwise(rng):
    import torch
    x = rng.normal(size=(2, 4, 4, 6)).astype(np.float32)
    slope = rng.random(6).astype(np.float32)
    y = _run_single("PReLU", {}, x, params={"s": slope})
    ref = torch.nn.functional.prelu(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
        torch.from_numpy(slope))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(y, ref, rtol=1e-6, atol=1e-6)
