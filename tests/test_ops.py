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


def test_lrn_band_matches_reduce_window(rng):
    """The banded-matmul LRN path (lrn_band, the production default)
    must match the reduce_window oracle to f32 rounding — including even
    local_size (asymmetric window) and C < n (fallback)."""
    from feathercnn_tpu import EngineConfig
    for C, n in ((16, 5), (16, 4), (192, 5), (3, 5)):
        x = rng.normal(size=(2, 4, 4, C)).astype(np.float32)
        attrs = {"local_size": n, "alpha": 1e-3, "beta": 0.75, "k": 1.0}
        g = Graph("t", {"x": TensorSpec(x.shape)}, ["y"],
                  [Node("n", "LRN", ["x"], ["y"], attrs)])
        y_band = np.asarray(Engine(g, EngineConfig(lrn_band=True),
                                   optimize_graph=False)(x))
        y_rw = np.asarray(Engine(g, EngineConfig(lrn_band=False),
                                 optimize_graph=False)(x))
        np.testing.assert_allclose(y_band, y_rw, rtol=2e-6, atol=1e-7,
                                   err_msg=f"C={C} n={n}")


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


def test_ave_pool_formulations_match(rng):
    """avepool_matmul (ones-band MXU contractions) and avepool_reshape
    (non-overlapping grid sums) must match the reduce_window oracle to
    f32 rounding — including pads, ceil-mode extra cells, overlapping
    windows (matmul only), and the clipped Caffe denominators."""
    from feathercnn_tpu import EngineConfig
    cases = [
        {"pool": "AVE", "kernel_size": 3, "stride": 2, "pad": 1,
         "ceil_mode": True},                       # overlap + pad
        {"pool": "AVE", "kernel_size": 4, "stride": 4, "pad": 0,
         "ceil_mode": True},                       # non-overlapping grid
        {"pool": "AVE", "kernel_size": 12, "stride": 12, "pad": 0,
         "ceil_mode": True},                       # global-as-kernel
        {"pool": "AVE", "kernel_size": 5, "stride": 3, "pad": 2,
         "ceil_mode": True},                       # asymmetric tail
    ]
    x = rng.normal(size=(2, 12, 12, 8)).astype(np.float32)
    for attrs in cases:
        g = Graph("t", {"x": TensorSpec(x.shape)}, ["y"],
                  [Node("n", "Pooling", ["x"], ["y"], attrs)])
        ref = np.asarray(Engine(g, optimize_graph=False)(x))
        for flag in ("avepool_matmul", "avepool_reshape"):
            y = np.asarray(Engine(g, EngineConfig(**{flag: True}),
                                  optimize_graph=False)(x))
            np.testing.assert_allclose(
                y, ref, rtol=2e-6, atol=1e-6,
                err_msg=f"{flag} attrs={attrs}")


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


def test_deconv_vs_torch(rng):
    """Deconvolution (transposed conv) vs torch.conv_transpose2d,
    including stride/pad/groups — Caffe deconv shares torch's formula.
    Our IR weights are HWIO (KH,KW,Cin/g,Cout) with lax's grouped-output
    convention; torch wants (Cin, Cout/g, KH, KW)."""
    import torch
    for (cin, cout, k, s, p, g) in [(8, 6, 3, 1, 0, 1),
                                    (8, 6, 4, 2, 1, 1),
                                    (8, 8, 3, 2, 1, 4),
                                    (4, 5, 8, 4, 0, 1),   # FCN-style k=2s
                                    (4, 5, 6, 3, 2, 1),
                                    (6, 4, 5, 2, 2, 2),
                                    (3, 3, 16, 8, 4, 3),  # k=2s, big phase
                                    (4, 4, 7, 3, 1, 1)]:  # k not mult of s
        x = rng.normal(size=(2, 5, 5, cin)).astype(np.float32)
        w = rng.normal(size=(k, k, cin // g, cout)).astype(np.float32)
        b = rng.normal(size=(cout,)).astype(np.float32)
        attrs = {"num_output": cout, "kernel_size": k, "stride": s,
                 "pad": p, "group": g, "bias_term": True}
        y = _run_single("Deconvolution", attrs, x,
                        params={"w": w, "b": b})
        # IR (KH,KW,Cin/g,Cout) grouped-output -> torch (Cin,Cout/g,K,K):
        # invert the converter's reshuffle
        wt = w.reshape(k, k, cin // g, g, cout // g)
        wt = np.transpose(wt, (3, 2, 4, 0, 1)).reshape(
            cin, cout // g, k, k)
        ref = torch.nn.functional.conv_transpose2d(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            torch.from_numpy(wt), torch.from_numpy(b),
            stride=s, padding=p, groups=g)
        ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
        assert y.shape == ref.shape, (y.shape, ref.shape)
        np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4)


def test_interp_vs_torch_align_corners(rng):
    """Interp (DeepLab InterpLayer) == torch bilinear align_corners=True,
    up- and down-sampling, explicit sizes."""
    import torch
    for (h, w, oh, ow) in [(8, 8, 33, 33), (17, 13, 65, 49),
                           (33, 33, 8, 8), (9, 9, 9, 9), (1, 5, 1, 9)]:
        x = rng.normal(size=(2, h, w, 6)).astype(np.float32)
        y = _run_single("Interp", {"height": oh, "width": ow}, x)
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            size=(oh, ow), mode="bilinear", align_corners=True)
        ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
        assert y.shape == ref.shape, (y.shape, ref.shape)
        np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)


def test_interp_zoom_shrink_semantics(rng):
    """Caffe factor semantics: zoom gives (in-1)*z+1 (align-corners
    upsample where input pixels land exactly on output grid points);
    shrink gives (in-1)/s+1 == strided subsample of the input."""
    import torch
    x = rng.normal(size=(1, 9, 9, 4)).astype(np.float32)
    y = _run_single("Interp", {"zoom_factor": 4}, x)
    assert y.shape == (1, 33, 33, 4)
    # input pixels are reproduced exactly at stride-4 output positions
    np.testing.assert_allclose(y[:, ::4, ::4, :], x, rtol=1e-6, atol=1e-6)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
        size=(33, 33), mode="bilinear", align_corners=True)
    np.testing.assert_allclose(
        y, np.transpose(ref.numpy(), (0, 2, 3, 1)), rtol=1e-5, atol=1e-5)

    ys = _run_single("Interp", {"shrink_factor": 2}, x)
    assert ys.shape == (1, 5, 5, 4)
    # align-corners shrink of an odd size is an exact strided subsample
    np.testing.assert_allclose(ys, x[:, ::2, ::2, :], rtol=1e-6, atol=1e-6)

    # shrink-then-zoom composition (DeepLab v1 uses zoom only; the layer
    # supports both set at once: (in-1)/s+1 then (.-1)*z+1)
    yz = _run_single("Interp", {"shrink_factor": 2, "zoom_factor": 3}, x)
    assert yz.shape == (1, 13, 13, 4)


def test_interp_pad_crops_before_resize(rng):
    """pad_beg/pad_end are <= 0 in the reference layer: a crop applied
    BEFORE the resize."""
    x = rng.normal(size=(1, 10, 10, 3)).astype(np.float32)
    y = _run_single("Interp", {"pad_beg": -1, "pad_end": -1,
                               "height": 15, "width": 15}, x)
    ref = _run_single("Interp", {"height": 15, "width": 15},
                      x[:, 1:9, 1:9, :])
    np.testing.assert_allclose(y, ref, rtol=1e-6, atol=1e-6)


def test_crop_fcn_style(rng):
    """FCN pattern: deconv upsample then Crop to the encoder skip's
    spatial size (axes {H,W}, channels untouched)."""
    from feathercnn_tpu.models.builder import GraphBuilder
    b = GraphBuilder("fcn", seed=17)
    x = b.input("data", (1, 14, 14, 8))
    up = b.deconv("up", x, 4, 4, stride=2, pad=0)     # -> 30x30
    ref = b.conv("skip", x, 6, 1)                     # -> 14x14x6
    out = b.crop("crop", up, ref, axes=(1, 2), offsets=(2, 2))
    g = b.finish([out, ref])
    eng = Engine(g)
    xv = rng.normal(size=(1, 14, 14, 8)).astype(np.float32)
    outs = eng.run(xv)
    y = np.asarray(outs["crop"])
    assert y.shape == (1, 14, 14, 4)   # H,W cropped; C kept
    full = np.asarray(eng.run(xv, extract=["up"])["up"])
    np.testing.assert_allclose(y, full[:, 2:16, 2:16, :], atol=0)


def test_argmax_axis_vs_torch(rng):
    """ArgMax with axis (segmentation label map) and top_k, vs torch."""
    import torch
    x = rng.normal(size=(2, 5, 5, 11)).astype(np.float32)
    y = _run_single("ArgMax", {"axis": -1}, x)
    ref = np.argmax(x, axis=-1)[..., None].astype(np.float32)
    np.testing.assert_array_equal(y, ref)
    # top_k=3 indices over channels
    y3 = _run_single("ArgMax", {"axis": -1, "top_k": 3}, x)
    ref3 = torch.topk(torch.from_numpy(x), 3, dim=-1).indices.numpy()
    np.testing.assert_array_equal(y3, ref3.astype(np.float32))
    # out_max_val with axis -> max values
    ymax = _run_single("ArgMax", {"axis": -1, "out_max_val": True}, x)
    np.testing.assert_allclose(ymax, x.max(-1, keepdims=True))


def test_argmax_flat_caffe_order(rng):
    """Axis-less ArgMax flattens per image in Caffe's NCHW order: the
    flat index must equal argmax over the NCHW-transposed tensor."""
    x = rng.normal(size=(3, 4, 5, 6)).astype(np.float32)
    y = _run_single("ArgMax", {"top_k": 2, "out_max_val": True}, x)
    assert y.shape == (3, 2, 2)
    flat = np.transpose(x, (0, 3, 1, 2)).reshape(3, -1)
    order = np.argsort(-flat, axis=1)[:, :2]
    np.testing.assert_array_equal(y[:, 0, :], order.astype(np.float32))
    np.testing.assert_allclose(y[:, 1, :],
                               np.take_along_axis(flat, order, 1))


def test_shuffle_channel_caffe_semantics(rng):
    """ShuffleChannel vs the direct index formula of the caffe-ShuffleNet
    fork: output channel j*g+i reads input channel i*(c/g)+j."""
    x = rng.normal(size=(2, 4, 4, 12)).astype(np.float32)
    y = _run_single("ShuffleChannel", {"group": 3}, x)
    c, g = 12, 3
    perm = np.empty(c, np.int64)
    for i in range(g):
        for j in range(c // g):
            perm[j * g + i] = i * (c // g) + j
    np.testing.assert_array_equal(y, x[..., perm])
    # shuffle twice with transposed grouping = identity
    y2 = _run_single("ShuffleChannel", {"group": 4},
                     np.ascontiguousarray(y))
    np.testing.assert_array_equal(y2, x)


def test_shuffle_matmul_matches_relayout(rng):
    """The one-hot permutation-matmul ShuffleChannel (shuffle_matmul)
    must equal the reshape/transpose form EXACTLY — a permutation matmul
    has one nonzero per column, so there is no accumulation in any
    dtype (int8 grid values are exact in bf16)."""
    from feathercnn_tpu import EngineConfig
    for c, g, dtype in ((12, 3, np.float32), (240, 3, np.float32),
                        (116, 2, np.float32)):
        x = rng.normal(size=(2, 4, 4, c)).astype(dtype)
        gr = Graph("t", {"x": TensorSpec(x.shape)}, ["y"],
                   [Node("n", "ShuffleChannel", ["x"], ["y"],
                         {"group": g})])
        y_mm = np.asarray(Engine(gr, EngineConfig(shuffle_matmul=True),
                                 optimize_graph=False)(x))
        y_rl = np.asarray(Engine(gr, EngineConfig(shuffle_matmul=False),
                                 optimize_graph=False)(x))
        np.testing.assert_array_equal(y_mm, y_rl)
    # int8 grid values survive the bf16 dot bit-exactly
    import jax
    import jax.numpy as jnp
    from feathercnn_tpu.ops.lowering import lower_node
    xi = rng.integers(-127, 128, size=(2, 3, 3, 60), dtype=np.int8)

    class _Ctx:
        config = EngineConfig(shuffle_matmul=True)

        def qinfo(self, node):
            return None

    node = Node("n", "ShuffleChannel", ["x"], ["y"], {"group": 3})
    (y,) = lower_node(node, [jnp.asarray(xi)], {}, _Ctx())
    assert y.dtype == jnp.int8
    perm = np.arange(60).reshape(3, 20).T.ravel()
    np.testing.assert_array_equal(np.asarray(y), xi[..., perm])


def test_slice_matmul_matches_split(rng):
    """Under shuffle_matmul, sub-lane channel Slice pieces lower as
    selection matmuls — must equal jnp.split exactly; lane-aligned
    offsets keep the plain slice."""
    from feathercnn_tpu import EngineConfig
    x = rng.normal(size=(2, 4, 4, 116)).astype(np.float32)
    g = Graph("t", {"x": TensorSpec(x.shape)}, ["a", "b"],
              [Node("n", "Slice", ["x"], ["a", "b"], {"axis": -1})])
    e1 = Engine(g, EngineConfig(shuffle_matmul=True),
                optimize_graph=False)
    e2 = Engine(g, EngineConfig(shuffle_matmul=False),
                optimize_graph=False)
    o1 = e1.run({"x": x})
    o2 = e2.run({"x": x})
    for k in ("a", "b"):
        np.testing.assert_array_equal(np.asarray(o1[k]),
                                      np.asarray(o2[k]))
    assert np.asarray(o1["a"]).shape == (2, 4, 4, 58)


def test_threshold_layer(rng):
    x = rng.normal(size=(2, 3, 3, 5)).astype(np.float32)
    y = _run_single("Threshold", {"threshold": 0.25}, x)
    np.testing.assert_array_equal(y, (x > 0.25).astype(np.float32))


def test_axpy_se_semantics(rng):
    """Axpy (SENet-Caffe axpy_layer.cpp): out = a*x + y with a per-channel
    (N,1,1,C) gate; trailing ReLU fuses into its epilogue."""
    a = rng.random(size=(2, 1, 1, 6)).astype(np.float32)
    x = rng.normal(size=(2, 4, 4, 6)).astype(np.float32)
    y = rng.normal(size=(2, 4, 4, 6)).astype(np.float32)
    g = Graph("t", {"a": TensorSpec(a.shape), "x": TensorSpec(x.shape),
                    "y": TensorSpec(y.shape)}, ["out"],
              [Node("n", "Axpy", ["a", "x", "y"], ["out"], {})])
    got = np.asarray(Engine(g, optimize_graph=False).run(
        {"a": a, "x": x, "y": y})["out"])
    np.testing.assert_allclose(got, a * x + y, rtol=1e-6, atol=1e-6)


def test_scale_two_bottom_broadcast(rng):
    """Caffe ScaleLayer with a runtime second bottom (SE-style gate):
    bottom[1] (N,1,1,C) broadcasts over bottom[0]'s spatial dims."""
    x = rng.normal(size=(2, 4, 4, 6)).astype(np.float32)
    s = rng.random(size=(2, 1, 1, 6)).astype(np.float32)
    g = Graph("t", {"x": TensorSpec(x.shape), "s": TensorSpec(s.shape)},
              ["out"],
              [Node("n", "Scale", ["x", "s"], ["out"], {})])
    got = np.asarray(Engine(g, optimize_graph=False).run(
        {"x": x, "s": s})["out"])
    np.testing.assert_allclose(got, x * s, rtol=1e-6, atol=1e-6)


def test_mvn_vs_numpy(rng):
    """MVN: per-channel and across-channels forms vs a direct numpy
    oracle (Caffe divides by stddev + eps)."""
    x = rng.normal(2.0, 3.0, size=(2, 5, 5, 4)).astype(np.float32)
    y = _run_single("MVN", {}, x)
    m = x.mean(axis=(1, 2), keepdims=True)
    sd = np.sqrt(((x - m) ** 2).mean(axis=(1, 2), keepdims=True))
    np.testing.assert_allclose(y, (x - m) / (sd + 1e-9), rtol=1e-4,
                               atol=1e-5)
    y2 = _run_single("MVN", {"across_channels": True,
                             "normalize_variance": False}, x)
    np.testing.assert_allclose(
        y2, x - x.mean(axis=(1, 2, 3), keepdims=True), rtol=1e-4,
        atol=1e-5)


def test_tile_whole_block(rng):
    x = rng.normal(size=(2, 3, 3, 4)).astype(np.float32)
    y = _run_single("Tile", {"axis": -1, "tiles": 3}, x)
    np.testing.assert_array_equal(y, np.concatenate([x] * 3, axis=-1))
    yh = _run_single("Tile", {"axis": 1, "tiles": 2}, x)
    np.testing.assert_array_equal(yh, np.concatenate([x] * 2, axis=1))


def test_reduction_caffe_axes(rng):
    """Reduction reduces NCHW dims >= axis; rank-4 output keeps Caffe's
    leading order."""
    x = rng.normal(size=(2, 3, 4, 5)).astype(np.float32)  # NHWC
    nchw = np.transpose(x, (0, 3, 1, 2))
    # atol floors the check: a sum of +-O(1) terms lands near zero
    # (catastrophic cancellation), where f32 reassociation differences
    # between compilations dwarf any relative tolerance
    y = _run_single("Reduction", {"axis": 1}, x)           # -> (N,)
    np.testing.assert_allclose(y, nchw.reshape(2, -1).sum(1),
                               rtol=1e-5, atol=1e-5)
    y = _run_single("Reduction", {"operation": "MEAN", "axis": 2,
                                  "coeff": 2.0}, x)        # -> (N, C)
    np.testing.assert_allclose(
        y, 2.0 * nchw.mean(axis=(2, 3)), rtol=1e-5, atol=1e-5)
    y = _run_single("Reduction", {"operation": "ASUM", "axis": 3}, x)
    np.testing.assert_allclose(y, np.abs(nchw).sum(-1), rtol=1e-5,
                               atol=1e-5)
    y = _run_single("Reduction", {"operation": "SUMSQ", "axis": 0}, x)
    np.testing.assert_allclose(y, (nchw ** 2).sum(), rtol=1e-5,
                               atol=1e-5)


def test_spp_caffe_semantics(rng):
    """SPP vs a direct numpy oracle of Caffe spp_layer.cpp: per-level
    kernel=ceil(size/bins), stride=kernel, pad=(kernel*bins-size+1)//2,
    MAX over the in-bounds window, NCHW-order flatten, channel concat."""
    x = rng.normal(size=(2, 13, 9, 5)).astype(np.float32)
    P = 3
    y = _run_single("SPP", {"pyramid_height": P}, x)

    def level(xn, bins):
        n, h, w, c = xn.shape
        kh, kw = -(-h // bins), -(-w // bins)
        ph, pw = (kh * bins - h + 1) // 2, (kw * bins - w + 1) // 2
        out = np.full((n, bins, bins, c), -np.inf, np.float32)
        for i in range(bins):
            for j in range(bins):
                y0, x0 = i * kh - ph, j * kw - pw
                y1, x1 = min(y0 + kh, h), min(x0 + kw, w)
                y0, x0 = max(y0, 0), max(x0, 0)
                out[:, i, j] = xn[:, y0:y1, x0:x1].max(axis=(1, 2))
        return np.transpose(out, (0, 3, 1, 2)).reshape(n, -1)

    ref = np.concatenate([level(x, 2 ** l) for l in range(P)], axis=-1)
    assert y.shape == (2, 5 * (1 + 4 + 16))
    np.testing.assert_allclose(y, ref, rtol=1e-6, atol=1e-6)


def test_scale_two_bottom_with_bias(rng):
    """Two-bottom Scale with bias_term: params[0] is the BIAS (the
    scaler comes from bottom[1]) — Caffe ScaleLayer's runtime form."""
    x = rng.normal(size=(2, 4, 4, 6)).astype(np.float32)
    s = rng.random(size=(2, 1, 1, 6)).astype(np.float32)
    beta = rng.normal(size=(6,)).astype(np.float32)
    g = Graph("t", {"x": TensorSpec(x.shape), "s": TensorSpec(s.shape)},
              ["out"],
              [Node("n", "Scale", ["x", "s"], ["out"],
                    {"bias_term": True}, ["beta"])],
              params={"beta": beta})
    got = np.asarray(Engine(g, optimize_graph=False).run(
        {"x": x, "s": s})["out"])
    np.testing.assert_allclose(got, x * s + beta, rtol=1e-6, atol=1e-6)
    # and the optimizer must NOT fold it into a preceding conv
    b = GraphBuilder("t2", seed=1)
    xi = b.input("data", (2, 4, 4, 6))
    si = b.input("gate", (2, 1, 1, 6))
    y = b.conv("c", xi, 6, 1)
    out = b._add(Node("sc", "Scale", [y, si], ["sc"],
                      {"bias_term": True}, ["sc/beta"]))[0]
    b.graph.params["sc/beta"] = beta
    b._channels[out] = 6
    g2 = b.finish([out])
    eng = Engine(g2)   # optimize_graph=True
    assert any(n.op == "Scale" for n in eng.graph.nodes)
    ref = np.asarray(Engine(g2, optimize_graph=False).run(
        {"data": x, "gate": s})["sc"])
    got = np.asarray(eng.run({"data": x, "gate": s})["sc"])
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def _np_roipool(x, rois, ph, pw, scale):
    """Direct numpy port of Caffe roi_pooling_layer.cpp Forward."""
    H, W, C = x.shape
    out = np.zeros((len(rois), ph, pw, C), np.float32)
    for r, roi in enumerate(rois):
        x1, y1, x2, y2 = [int(np.floor(v * scale + 0.5))  # C round()
                          for v in roi[1:]]
        rw = max(x2 - x1 + 1, 1)
        rh = max(y2 - y1 + 1, 1)
        bh, bw = rh / ph, rw / pw
        for i in range(ph):
            for j in range(pw):
                hs = min(max(int(np.floor(i * bh)) + y1, 0), H)
                he = min(max(int(np.ceil((i + 1) * bh)) + y1, 0), H)
                ws = min(max(int(np.floor(j * bw)) + x1, 0), W)
                we = min(max(int(np.ceil((j + 1) * bw)) + x1, 0), W)
                if he > hs and we > ws:
                    out[r, i, j] = x[hs:he, ws:we].max(axis=(0, 1))
    return out


def test_roipooling_vs_numpy(rng):
    x = rng.normal(size=(1, 14, 10, 6)).astype(np.float32)
    rois = np.asarray([
        [0, 0, 0, 100, 100],      # near-whole image (raw coords / 16)
        [0, 32, 16, 128, 96],
        [0, 80, 64, 81, 65],      # tiny -> empty bins
        [0, 0, 48, 159, 223],
        [0, 8, 24, 104, 120],     # 8/16 = .5: C-round boundary
    ], np.float32)
    g = Graph("t", {"x": TensorSpec(x.shape),
                    "rois": TensorSpec(rois.shape)}, ["y"],
              [Node("n", "ROIPooling", ["x", "rois"], ["y"],
                    {"pooled_h": 3, "pooled_w": 4,
                     "spatial_scale": 1 / 16.0})])
    y = np.asarray(Engine(g, optimize_graph=False).run(
        {"x": x, "rois": rois})["y"])
    ref = _np_roipool(x[0], rois, 3, 4, 1 / 16.0)
    np.testing.assert_allclose(y, ref, rtol=1e-6, atol=1e-6)


def test_roipool_table_matches_masks(rng):
    """The dyadic range-max pyramid path (roipool_table, the production
    default) must agree bit-for-bit with the membership-mask oracle —
    both are pure selections over the same bin partitions — including
    empty bins, off-map ROIs, and degenerate 1-cell ROIs."""
    from feathercnn_tpu import EngineConfig
    # pow2 H/W maps pin the pyramid-level clamp: len==size==2^m used to
    # index one level past the table and return NaN (ADVICE r2, high)
    for shape in ((1, 23, 31, 5), (1, 16, 16, 5), (1, 32, 64, 5),
                  (1, 8, 23, 5), (1, 1, 1, 5)):
        _roipool_table_vs_masks(rng, shape)


def _roipool_table_vs_masks(rng, shape):
    from feathercnn_tpu import EngineConfig
    x = rng.normal(size=shape).astype(np.float32)
    rois = np.concatenate([
        np.asarray([
            [0, 0, 0, 1000, 1000],    # whole map (clips)
            [0, 500, 500, 2000, 2000],  # mostly off-map
            [0, 80, 64, 81, 65],      # 1-2 cell ROI -> empty bins
            [0, -32, -16, 64, 48],    # negative raw coords
            [0, 0, 0, 0, 0],          # degenerate single cell
        ], np.float32),
        # random ROIs incl. inverted (x2<x1) degenerate ones
        rng.uniform(-64, 560, size=(40, 5)).astype(np.float32)
        * np.asarray([0, 1, 1, 1, 1], np.float32),
    ])
    for ph, pw in ((7, 7), (3, 4), (1, 1)):
        g = Graph("t", {"x": TensorSpec(x.shape),
                        "rois": TensorSpec(rois.shape)}, ["y"],
                  [Node("n", "ROIPooling", ["x", "rois"], ["y"],
                        {"pooled_h": ph, "pooled_w": pw,
                         "spatial_scale": 1 / 16.0})])
        feed = {"x": x, "rois": rois}
        y_tab = np.asarray(Engine(g, EngineConfig(roipool_table=True),
                                  optimize_graph=False).run(feed)["y"])
        y_msk = np.asarray(Engine(g, EngineConfig(roipool_table=False),
                                  optimize_graph=False).run(feed)["y"])
        assert np.isfinite(y_tab).all(), shape
        np.testing.assert_array_equal(y_tab, y_msk)


def test_roipool_capped_pyramid_matches_full(rng):
    """The bin-length level cap (round 5: 36 -> 12 map copies at
    faster_rcnn b16) must be invisible for map-clipped ROIs: query
    ranges never exceed ceil(size/bins)+2, so the capped pyramid
    returns bit-identical bin maxima."""
    from feathercnn_tpu.ops.lowering import _roi_range_max
    import jax.numpy as jnp
    H, W, C, bins = 23, 31, 5, 7
    x = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    R = 40
    y1 = rng.integers(0, H, R)
    y2 = np.minimum(y1 + rng.integers(0, H, R), H - 1)
    x1 = rng.integers(0, W, R)
    x2 = np.minimum(x1 + rng.integers(0, W, R), W - 1)

    def bounds(start, end, size):
        ln = np.maximum(end - start + 1, 1)
        i = np.arange(bins)
        lo = (i[None] * ln[:, None]) // bins + start[:, None]
        hi = ((i[None] + 1) * ln[:, None] + bins - 1) // bins \
            + start[:, None]
        return (jnp.asarray(np.clip(lo, 0, size).astype(np.int32)),
                jnp.asarray(np.clip(hi, 0, size).astype(np.int32)))

    lo_h, hi_h = bounds(y1, y2, H)
    lo_w, hi_w = bounds(x1, x2, W)
    full = _roi_range_max(x, lo_h, hi_h, lo_w, hi_w)
    capped = _roi_range_max(x, lo_h, hi_h, lo_w, hi_w,
                            max_bin_h=(H + bins - 1) // bins + 2,
                            max_bin_w=(W + bins - 1) // bins + 2)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(capped))


def test_psroi_fuse_ave_matches_unfused(rng):
    """psroi_fuse_ave: PSROIPooling + global AVE vote pool fused into
    one mask contraction must match the staged pair to f32 rounding
    (separable-count normalization; empty bins contribute 0 either
    way)."""
    from feathercnn_tpu import EngineConfig
    k, cdim = 3, 4
    x = rng.normal(size=(2, 12, 9, k * k * cdim)).astype(np.float32)
    rois = np.asarray([
        [0, 0, 0, 130, 170],
        [1, 16, 32, 120, 150],
        [0, 63, 63, 62, 62],      # degenerate: empty bins
        [-1, 0, 0, 0, 0],         # padding row
    ], np.float32)
    g0 = Graph("t", {"x": TensorSpec(x.shape),
                     "rois": TensorSpec(rois.shape)}, ["y"],
               [Node("n", "PSROIPooling", ["x", "rois"], ["p"],
                     {"group_size": k, "output_dim": cdim,
                      "spatial_scale": 1 / 16.0}),
                Node("ave", "Pooling", ["p"], ["y"],
                     {"pool": "AVE", "global_pooling": True})])
    feed = {"x": x, "rois": rois}
    import copy
    base = np.asarray(Engine(copy.deepcopy(g0),
                             EngineConfig(psroi_fuse_ave=False)
                             ).run(feed)["y"])
    fused = np.asarray(Engine(copy.deepcopy(g0),
                              EngineConfig(psroi_fuse_ave=True)
                              ).run(feed)["y"])
    assert fused.shape == base.shape == (4, 1, 1, cdim)
    np.testing.assert_allclose(fused, base, rtol=1e-5, atol=1e-6)


def _np_proposal(scores, deltas, im_info, anchors, feat_stride,
                 pre_n, post_n, thresh, min_size):
    """Direct numpy port of py-faster-rcnn proposal_layer.py."""
    A = anchors.shape[0]
    fh, fw = scores.shape[1:3]
    fg = scores[0, :, :, A:].reshape(-1)
    dl = deltas[0].reshape(-1, 4)
    sx, sy = np.meshgrid(np.arange(fw) * feat_stride,
                         np.arange(fh) * feat_stride)
    shifts = np.stack([sx, sy, sx, sy], -1).astype(np.float32)
    anc = (shifts[:, :, None, :] + anchors).reshape(-1, 4)
    aw = anc[:, 2] - anc[:, 0] + 1
    ah = anc[:, 3] - anc[:, 1] + 1
    cx = dl[:, 0] * aw + anc[:, 0] + 0.5 * aw
    cy = dl[:, 1] * ah + anc[:, 1] + 0.5 * ah
    w = np.exp(dl[:, 2]) * aw
    h = np.exp(dl[:, 3]) * ah
    boxes = np.stack([cx - 0.5 * w, cy - 0.5 * h,
                      cx + 0.5 * w, cy + 0.5 * h], -1)
    boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, im_info[1] - 1)
    boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, im_info[0] - 1)
    ms = min_size * im_info[2]
    keep = ((boxes[:, 2] - boxes[:, 0] + 1 >= ms)
            & (boxes[:, 3] - boxes[:, 1] + 1 >= ms))
    boxes, fg = boxes[keep], fg[keep]
    order = np.argsort(-fg)[:pre_n]
    boxes, fg = boxes[order], fg[order]
    picked = []
    area = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    for i in range(len(boxes)):
        ok = True
        for j in picked:
            lt = np.maximum(boxes[i, :2], boxes[j, :2])
            rb = np.minimum(boxes[i, 2:], boxes[j, 2:])
            inter = np.prod(np.maximum(rb - lt + 1, 0))
            if inter / (area[i] + area[j] - inter) > thresh:
                ok = False
                break
        if ok:
            picked.append(i)
        if len(picked) >= post_n:
            break
    return boxes[picked]


def test_proposal_vs_numpy(rng):
    """Proposal vs a direct numpy port of proposal_layer.py (anchor
    grid, +1 decode, clip, min-size, greedy NMS, top post_nms)."""
    fh, fw, A = 6, 5, 9
    scores = rng.random(size=(1, fh, fw, 2 * A)).astype(np.float32)
    deltas = (rng.normal(size=(1, fh, fw, 4 * A)) * 0.3).astype(np.float32)
    im_info = np.asarray([[96.0, 80.0, 1.0]], np.float32)
    attrs = {"feat_stride": 16, "pre_nms_top_n": 100,
             "post_nms_top_n": 20, "nms_thresh": 0.7, "min_size": 8}
    g = Graph("t", {"s": TensorSpec(scores.shape),
                    "d": TensorSpec(deltas.shape),
                    "i": TensorSpec(im_info.shape)}, ["y"],
              [Node("n", "Proposal", ["s", "d", "i"], ["y"], attrs)])
    y = np.asarray(Engine(g, optimize_graph=False).run(
        {"s": scores, "d": deltas, "i": im_info})["y"])
    from feathercnn_tpu.ops.lowering import generate_anchors
    ref = _np_proposal(scores, deltas, im_info[0], generate_anchors(),
                       16, 100, 20, 0.7, 8)
    assert y.shape == (20, 5)
    k = len(ref)
    np.testing.assert_array_equal(y[:k, 0], 0.0)
    np.testing.assert_allclose(y[:k, 1:], ref, rtol=1e-4, atol=1e-3)
    if k < 20:
        # padding rows carry the batch_idx = -1 sentinel (ADVICE round 1)
        np.testing.assert_array_equal(y[k:, 0], -1.0)
        np.testing.assert_array_equal(y[k:, 1:], 0.0)


def test_proposal_batch2_matches_per_image(rng):
    """Batch>1 Proposal (vmap over images, per-image im_info rows):
    each image's block of rows equals the batch-1 run of that image,
    with batch_idx set to the image index (VERDICT round 1 item 7)."""
    fh, fw, A = 6, 5, 9
    scores = rng.random(size=(2, fh, fw, 2 * A)).astype(np.float32)
    deltas = (rng.normal(size=(2, fh, fw, 4 * A)) * 0.3).astype(np.float32)
    im_info = np.asarray([[96.0, 80.0, 1.0],
                          [64.0, 72.0, 2.0]], np.float32)
    attrs = {"feat_stride": 16, "pre_nms_top_n": 100,
             "post_nms_top_n": 20, "nms_thresh": 0.7, "min_size": 8}

    def run(s, d, i):
        g = Graph("t", {"s": TensorSpec(s.shape),
                        "d": TensorSpec(d.shape),
                        "i": TensorSpec(i.shape)}, ["y"],
                  [Node("n", "Proposal", ["s", "d", "i"], ["y"], attrs)])
        return np.asarray(Engine(g, optimize_graph=False).run(
            {"s": s, "d": d, "i": i})["y"])

    y = run(scores, deltas, im_info)
    assert y.shape == (40, 5)
    for b in range(2):
        yb = run(scores[b:b + 1], deltas[b:b + 1], im_info[b:b + 1])
        blk = y[b * 20:(b + 1) * 20]
        np.testing.assert_allclose(blk[:, 1:], yb[:, 1:],
                                   rtol=1e-5, atol=1e-5)
        real = yb[:, 0] == 0
        np.testing.assert_array_equal(blk[real, 0], float(b))
        np.testing.assert_array_equal(blk[~real, 0], -1.0)


def test_roipool_batch_matches_per_image(rng):
    """Batched ROIPooling (flattened-row-axis gather, VERDICT r2 item 4):
    each ROI's output equals the batch-1 run on its own image, on both
    the dyadic-table and mask paths; padding rows (batch_idx=-1) are 0."""
    from feathercnn_tpu import EngineConfig
    N, H, W, C = 3, 14, 10, 6
    x = rng.normal(size=(N, H, W, C)).astype(np.float32)
    per_img = np.asarray([
        [0, 0, 0, 100, 100],
        [2, 32, 16, 128, 96],
        [1, 80, 64, 81, 65],
        [0, 8, 24, 104, 120],
        [2, 0, 48, 159, 223],
        [-1, 0, 0, 0, 0],         # Proposal padding sentinel
        [1, 0, 0, 220, 150],
    ], np.float32)
    for table in (True, False):
        g = Graph("t", {"x": TensorSpec(x.shape),
                        "rois": TensorSpec(per_img.shape)}, ["y"],
                  [Node("n", "ROIPooling", ["x", "rois"], ["y"],
                        {"pooled_h": 3, "pooled_w": 4,
                         "spatial_scale": 1 / 16.0})])
        y = np.asarray(Engine(g, EngineConfig(roipool_table=table),
                              optimize_graph=False).run(
            {"x": x, "rois": per_img})["y"])
        assert np.isfinite(y).all()
        for r, roi in enumerate(per_img):
            b = int(roi[0])
            if b < 0:
                np.testing.assert_array_equal(y[r], 0.0)
                continue
            ref = _np_roipool(x[b], roi[None], 3, 4, 1 / 16.0)[0]
            np.testing.assert_allclose(y[r], ref, rtol=1e-6, atol=1e-6,
                                       err_msg=f"roi {r} table={table}")


def _np_psroipool(x, rois, k, cdim, scale):
    """Direct numpy port of R-FCN psroi_pooling_layer.cu (float bins)."""
    H, W, _ = x.shape
    out = np.zeros((len(rois), k, k, cdim), np.float32)
    for r, roi in enumerate(rois):
        sx = np.floor(roi[1] + 0.5) * scale   # C round()
        sy = np.floor(roi[2] + 0.5) * scale
        ex = np.floor(roi[3] + 1.5) * scale
        ey = np.floor(roi[4] + 1.5) * scale
        rw = max(ex - sx, 0.1)
        rh = max(ey - sy, 0.1)
        for i in range(k):
            for j in range(k):
                hs = min(max(int(np.floor(i * rh / k + sy)), 0), H)
                he = min(max(int(np.ceil((i + 1) * rh / k + sy)), 0), H)
                ws = min(max(int(np.floor(j * rw / k + sx)), 0), W)
                we = min(max(int(np.ceil((j + 1) * rw / k + sx)), 0), W)
                if he > hs and we > ws:
                    for c in range(cdim):
                        ch = (c * k + i) * k + j
                        out[r, i, j, c] = x[hs:he, ws:we, ch].mean()
    return out


def test_psroipooling_vs_numpy(rng):
    k, cdim = 3, 4
    x = rng.normal(size=(1, 12, 9, k * k * cdim)).astype(np.float32)
    rois = np.asarray([
        [0, 0, 0, 130, 170],
        [0, 16, 32, 120, 150],
        [0, 48, 16, 90, 120],
        [0, 40.5, 16, 90, 120],   # .5 coord: C-round boundary
        [0, 63, 63, 62, 62],      # degenerate: 0.1-feature clamp
    ], np.float32)
    g = Graph("t", {"x": TensorSpec(x.shape),
                    "rois": TensorSpec(rois.shape)}, ["y"],
              [Node("n", "PSROIPooling", ["x", "rois"], ["y"],
                    {"group_size": k, "output_dim": cdim,
                     "spatial_scale": 1 / 16.0})])
    y = np.asarray(Engine(g, optimize_graph=False).run(
        {"x": x, "rois": rois})["y"])
    ref = _np_psroipool(x[0], rois, k, cdim, 1 / 16.0)
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-6)


def test_psroipooling_batch_matches_per_image(rng):
    """Batched PSROIPooling: each ROI pools from its own image
    (batch_idx column), padding rows (batch_idx=-1) return 0."""
    k, cdim = 3, 4
    N = 2
    x = rng.normal(size=(N, 12, 9, k * k * cdim)).astype(np.float32)
    rois = np.asarray([
        [1, 0, 0, 130, 170],
        [0, 16, 32, 120, 150],
        [1, 48, 16, 90, 120],
        [-1, 0, 0, 0, 0],
        [0, 63, 63, 62, 62],
    ], np.float32)
    g = Graph("t", {"x": TensorSpec(x.shape),
                    "rois": TensorSpec(rois.shape)}, ["y"],
              [Node("n", "PSROIPooling", ["x", "rois"], ["y"],
                    {"group_size": k, "output_dim": cdim,
                     "spatial_scale": 1 / 16.0})])
    y = np.asarray(Engine(g, optimize_graph=False).run(
        {"x": x, "rois": rois})["y"])
    for r, roi in enumerate(rois):
        b = int(roi[0])
        if b < 0:
            np.testing.assert_array_equal(y[r], 0.0)
            continue
        ref = _np_psroipool(x[b], roi[None], k, cdim, 1 / 16.0)[0]
        np.testing.assert_allclose(y[r], ref, rtol=1e-5, atol=1e-6,
                                   err_msg=f"roi {r}")


def test_max_pool_shift_matches_reduce_window(rng):
    """maxpool_shift (separable shifted-slice maxima) must be
    BIT-identical to the reduce_window oracle — max is order-free and
    both pad with -inf — across stride/pad/ceil geometries."""
    from feathercnn_tpu import EngineConfig
    cases = [
        {"kernel_size": 3, "stride": 1, "pad": 1, "ceil_mode": True},
        {"kernel_size": 3, "stride": 2, "pad": 0, "ceil_mode": True},
        {"kernel_size": 3, "stride": 2, "pad": 1, "ceil_mode": True},
        {"kernel_size": 2, "stride": 2, "pad": 0, "ceil_mode": True},
        {"kernel_size": 5, "stride": 3, "pad": 2, "ceil_mode": False},
    ]
    for attrs in cases:
        x = rng.normal(size=(2, 13, 13, 8)).astype(np.float32)
        g = Graph("t", {"x": TensorSpec(x.shape)}, ["y"],
                  [Node("n", "Pooling", ["x"], ["y"], attrs)])
        ref = np.asarray(Engine(g, optimize_graph=False)(x))
        y = np.asarray(Engine(g, EngineConfig(maxpool_shift=True),
                              optimize_graph=False)(x))
        assert np.array_equal(y, ref), attrs
