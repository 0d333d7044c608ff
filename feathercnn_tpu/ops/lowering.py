"""Per-op lowering: IR node -> jnp/lax expression (NHWC).

This is the analog of the per-layer ``Forward`` implementations under
[pub] src/layers/ — but instead of mutating blobs through a mempool, each
lowering is a pure function composed into one traced graph that XLA fuses.

Two backends share this module:
  - "xla":    every op lowers to plain jnp/lax (the oracle; runs on CPU).
  - "pallas": Convolution / InnerProduct / Pooling route to the Pallas
    MXU/VPU kernels in feathercnn_tpu.kernels (the booster analog,
    [pub] src/booster/arm/*); everything elementwise stays jnp and XLA
    fuses it.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ir import Graph, Node, conv_out_dim

__all__ = ["LoweringCtx", "lower_node", "register_lowering", "apply_activation"]


class LoweringCtx:
    """Carried through lowering: config + graph + per-node quant metadata."""

    def __init__(self, graph: Graph, config, mesh=None):
        self.graph = graph
        self.config = config
        # GSPMD mesh when the engine runs sharded (set by Engine);
        # lowerings that need explicit sharding constraints read it.
        self.mesh = mesh

    @property
    def backend(self) -> str:
        return self.config.backend

    def qinfo(self, node: Node) -> Optional[Dict[str, Any]]:
        return self.graph.meta.get("quant", {}).get(node.name)


LowerFn = Callable[[Node, List[jnp.ndarray], List[jnp.ndarray], LoweringCtx],
                   List[jnp.ndarray]]
_LOWERINGS: Dict[str, LowerFn] = {}


def register_lowering(op: str):
    def deco(fn: LowerFn) -> LowerFn:
        _LOWERINGS[op] = fn
        return fn
    return deco


def lower_node(node: Node, inputs, params, ctx: LoweringCtx):
    fn = _LOWERINGS.get(node.op)
    if fn is None:
        raise NotImplementedError(f"no lowering for op {node.op!r}")
    return fn(node, inputs, params, ctx)


def apply_activation(x: jnp.ndarray, act: Optional[str]) -> jnp.ndarray:
    """Fused epilogue activations — the WinogradOutType / sgemm store-back
    variants of the reference ([pub] src/booster/arm/winograd_kernels_F63.cpp)."""
    if act is None:
        return x
    if act == "relu":
        return jnp.maximum(x, 0)
    if act == "relu6":
        return jnp.clip(x, 0, 6)
    raise ValueError(f"unknown activation {act!r}")


def apply_act_segments(y: jnp.ndarray, segments) -> jnp.ndarray:
    """Per-output-channel activation for horizontally-merged convs
    (passes.merge_sibling_convs): each (act, channels) segment gets its own
    clamp bounds, applied as ONE vectorized clip the compiler fuses into
    the conv epilogue.  ``y`` must be float (pre-requant)."""
    lo = np.concatenate([
        np.full(c, 0.0 if a in ("relu", "relu6") else -np.inf, np.float32)
        for a, c in segments])
    hi = np.concatenate([
        np.full(c, 6.0 if a == "relu6" else np.inf, np.float32)
        for a, c in segments])
    return jnp.minimum(jnp.maximum(y, lo), hi)


# ----------------------------------------------------------------------
# Convolution family
# ----------------------------------------------------------------------

def _dequant_for_oracle(x, w, q, ctx):
    """The "xla" backend is the float oracle: if quantization replaced
    the weights with int8 grids (or an int8 edge arrives), dequantize
    here so the oracle stays numerically meaningful instead of silently
    multiplying raw lattice values.  The quantized *compute* paths live
    in kernels/dispatch.py (backend="pallas")."""
    if x.dtype == jnp.int8:
        xs = (q.get("x_scale") or q.get("input_scale", 1.0)) if q else 1.0
        x = (x.astype(jnp.float32) * xs).astype(
            jnp.dtype(ctx.config.compute_dtype))
    if w.dtype == jnp.int8:
        ws = q["w_scale"] if q is not None else 1.0
        w = (w.astype(jnp.float32)
             * np.reshape(ws, (1,) * (w.ndim - 1) + (-1,))).astype(x.dtype)
    else:
        w = w.astype(x.dtype)
    return x, w


def _conv_hparams(node: Node):
    a = node.attrs
    kh = a.get("kernel_h", a.get("kernel_size", 1))
    kw = a.get("kernel_w", a.get("kernel_size", 1))
    sh = a.get("stride_h", a.get("stride", 1))
    sw = a.get("stride_w", a.get("stride", 1))
    ph = a.get("pad_h", a.get("pad", 0))
    pw = a.get("pad_w", a.get("pad", 0))
    dil = a.get("dilation", 1)
    group = a.get("group", 1)
    return kh, kw, sh, sw, ph, pw, dil, group


def _grouped_batch_only(node, ctx, w):
    """True when this conv needs the grouped-conv SPMD workaround: a
    grouped (1 < group, Cin/g > 1) convolution whose input OR output is
    channel-sharded returns WRONG values from XLA's SPMD partitioner
    (measured on the virtual mesh,
    tests/test_parallel.py::test_engine_mesh_shuffle_axpy).  Depthwise
    (Cin/g == 1) partitions correctly."""
    mesh = getattr(ctx, "mesh", None)
    group = node.attrs.get("group", 1)
    return not (mesh is None or group <= 1
                or (w.ndim == 4 and w.shape[-2] == 1))


def _constrain_batch_only(x, ctx):
    """Pin a value's CHANNEL axis to replicated (batch — and, in
    spatial mode, H — may stay sharded): the grouped-conv workaround
    only needs channels gathered."""
    from jax.sharding import NamedSharding
    from ..parallel.mesh import value_pspec
    mesh = ctx.mesh
    scfg = ctx.config.sharding
    if scfg is None:
        from jax.sharding import PartitionSpec
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, PartitionSpec(*([None] * x.ndim))))
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, value_pspec(scfg, mesh, x.shape)))


def _spatial_small_h_fix(node, ctx, x):
    """True when this conv needs the small-H spatial workaround: under
    shard_spatial, XLA's SPMD partitioner emits a mistyped pad-value
    broadcast for a STRIDED int8 conv whose per-shard H is smaller than
    the stride (``s8[...] broadcast`` of a non-s8 constant — HLO
    verifier RET_CHECK after spmd-partitioning; reproduced standalone
    on the virtual mesh: s8 1x1 stride-2 at H=4 over a 4-way model axis
    fails, f32 at the same shape and s8 at H=8 both pass).  Gathering H
    for those convs is cheap — they only occur in the deepest, smallest
    stages."""
    mesh = getattr(ctx, "mesh", None)
    scfg = getattr(ctx.config, "sharding", None)
    if (mesh is None or scfg is None or not scfg.shard_spatial
            or x.dtype != jnp.int8 or x.ndim != 4):
        return False
    stride = max(node.attrs.get("stride_h", node.attrs.get("stride", 1)),
                 node.attrs.get("stride_w", node.attrs.get("stride", 1)))
    nshards = mesh.shape[scfg.model_axis]
    return stride > 1 and nshards > 1 and x.shape[1] < nshards * stride


def _constrain_h_replicated(x, ctx):
    """Gather a value's H axis (keep batch sharded): the small-H
    spatial workaround only needs rows un-sharded."""
    from jax.sharding import NamedSharding, PartitionSpec
    scfg = ctx.config.sharding
    spec = [None] * x.ndim
    if (scfg.shard_batch and ctx.mesh.shape[scfg.data_axis] > 1
            and x.shape[0] % ctx.mesh.shape[scfg.data_axis] == 0):
        spec[0] = scfg.data_axis
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(ctx.mesh, PartitionSpec(*spec)))


@register_lowering("Convolution")
def _lower_conv(node, inputs, params, ctx):
    x = inputs[0]
    w = params[0]  # HWIO (H, W, Cin/group, Cout)
    grouped_fix = _grouped_batch_only(node, ctx, w)
    if grouped_fix:
        x = _constrain_batch_only(x, ctx)
    elif _spatial_small_h_fix(node, ctx, x):
        x = _constrain_h_replicated(x, ctx)
    bias = params[1] if node.attrs.get("bias_term", True) and len(params) > 1 else None
    kh, kw, sh, sw, ph, pw, dil, group = _conv_hparams(node)
    act = node.attrs.get("activation")

    if ctx.backend == "pallas":
        from ..kernels import dispatch as kdispatch
        y = kdispatch.conv_forward(node, x, w, bias, ctx)
        return [_constrain_batch_only(y, ctx) if grouped_fix else y]

    x, w = _dequant_for_oracle(x, w, ctx.qinfo(node), ctx)
    segs = node.attrs.get("act_segments")
    if (segs is None and group == 1 and dil == 1 and w.ndim == 4
            and kh == kw == 1 and sh == sw == 1 and ph == pw == 0
            and _ring_tp_ok(ctx, x.shape[-1], w.shape[-1])):
        # TP pointwise conv via the ring-pipelined collective matmul: a
        # 1x1 conv IS the FC GEMM reshaped, so the same w_sharded_out
        # (Megatron column-parallel) form applies — the K-chunk ring
        # replaces GSPMD's blocking all-gather of the channel-sharded
        # input (SURVEY.md §2.5 overlap; VERDICT r3 task 8).  M = N*H*W
        # keeps the DP batch sharding via batch_axis (N is M's major
        # dim, so the merged sharding is representable).
        nb, hh, wb, cc = x.shape
        y = _ring_tp_matmul(ctx, x.reshape(-1, cc), w.reshape(cc, -1),
                            bias)
        y = apply_activation(y, act)
        return [y.astype(x.dtype).reshape(nb, hh, wb, -1)]
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        rhs_dilation=(dil, dil),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=group,
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    segs = node.attrs.get("act_segments")
    y = apply_act_segments(y, segs) if segs else apply_activation(y, act)
    y = y.astype(x.dtype)
    return [_constrain_batch_only(y, ctx) if grouped_fix else y]


def _subpixel_plan(k: int, s: int, p: int):
    """Per-dimension plan for the subpixel deconv decomposition: a
    stride-s transposed conv equals s dense convs (one per output phase
    r = oy mod s) with ~ceil(k/s)-tap subkernels, interleaved.

    Returns (Lp, PL, taps) with taps[t][r] = source kernel index (or -1)
    so that  y[s*q + r] = sum_t x[q + t - PL] * W[taps[t][r]],
    or None when the geometry needs the fallback (pads go negative)."""
    L = -(-k // s)                       # max taps any phase uses
    a = [(r + p) // s for r in range(s)]
    Lp = L + (max(a) - min(a))
    PL = Lp - 1 - max(a)
    if PL < 0:
        return None
    taps = np.full((Lp, s), -1, np.int64)
    for r in range(s):
        b = (r + p) % s
        for t in range(Lp):
            m = PL + a[r] - t
            idx = s * m + b
            if 0 <= idx < k:
                taps[t, r] = idx
    return Lp, PL, taps


def _deconv_subpixel(x, w, sh, sw, ph, pw, group, oh, ow):
    """Stride>1 transposed conv as ONE dense conv + depth-to-space.

    XLA lowers the textbook lhs-dilated form by computing all k*k taps —
    including the (s-1)/s that hit dilation zeros (measured: FCN-16s'
    k32/s16 upsample ran 5x slower than the whole FCN-8s ladder).  Here
    each of the s*s output phases gets its own ceil(k/s)-tap subkernel,
    batched into one MXU-friendly conv with s*s*Cout output channels,
    then interleaved spatially.  Exact (pure reindexing of the sum)."""
    n, ih, iw, cin = x.shape
    k_h, k_w, cig, cout = w.shape
    plan_h = _subpixel_plan(k_h, sh, ph)
    plan_w = _subpixel_plan(k_w, sw, pw)
    if plan_h is None or plan_w is None:
        return None
    Lph, PLh, taps_h = plan_h
    Lpw, PLw, taps_w = plan_w
    qh, qw = -(-oh // sh), -(-ow // sw)
    pr_h = qh + max((r + ph) // sh for r in range(sh)) - ih
    pr_w = qw + max((r + pw) // sw for r in range(sw)) - iw
    if pr_h < 0 or pr_w < 0:
        return None

    # Gather the subkernels: (Lph, sh, Lpw, sw, cig, cout), zeros where a
    # phase has no tap.  Constant indices — XLA folds the gather.
    ih_idx = np.clip(taps_h, 0, k_h - 1)            # (Lph, sh)
    iw_idx = np.clip(taps_w, 0, k_w - 1)            # (Lpw, sw)
    mask = ((taps_h >= 0)[:, :, None, None]
            & (taps_w >= 0)[None, None, :, :]).astype(np.float32)
    wg = w[ih_idx[:, :, None, None], iw_idx[None, None, :, :]]
    wg = wg * jnp.asarray(mask[..., None, None], wg.dtype)
    # -> (Lph, Lpw, cig, g, sh, sw, cout/g): keep lax's grouped-output
    # convention (contiguous per-group channel blocks)
    g = group
    wg = wg.reshape(Lph, sh, Lpw, sw, cig, g, cout // g)
    wg = jnp.transpose(wg, (0, 2, 4, 5, 1, 3, 6))
    wg = wg.reshape(Lph, Lpw, cig, g * sh * sw * (cout // g))

    y = jax.lax.conv_general_dilated(
        x, wg, window_strides=(1, 1),
        padding=((PLh, pr_h), (PLw, pr_w)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=g,
        preferred_element_type=jnp.float32,
    )                                   # (n, qh, qw, g*sh*sw*cpg)
    y = y.reshape(n, qh, qw, g, sh, sw, cout // g)
    y = jnp.transpose(y, (0, 1, 4, 2, 5, 3, 6))    # n qh sh qw sw g cpg
    y = y.reshape(n, qh * sh, qw * sw, cout)
    return y[:, :oh, :ow, :]


@register_lowering("Deconvolution")
def _lower_deconv(node, inputs, params, ctx):
    """Transposed conv (Caffe Deconvolution — FCN upsampling).  Weights
    are HWIO (KH, KW, Cin/g, Cout) with lax's grouped-output convention
    (the converter reshuffles Caffe's (Cin, Cout/g, KH, KW)).

    stride>1, dilation==1 lowers via the subpixel decomposition
    (_deconv_subpixel) — s*s dense phase convs in one MXU call instead of
    XLA's all-taps lhs-dilated form; otherwise the textbook equivalent
    forward conv (input dilated by the stride, kernel flipped,
    padding = dilated_kernel - 1 - pad)."""
    x = inputs[0]
    w = params[0].astype(x.dtype)
    bias = (params[1] if node.attrs.get("bias_term", True)
            and len(params) > 1 else None)
    kh, kw, sh, sw, ph, pw, dil, group = _conv_hparams(node)

    y = None
    if dil == 1 and (sh > 1 or sw > 1):
        n, ih, iw, _ = x.shape
        oh = sh * (ih - 1) + kh - 2 * ph
        ow = sw * (iw - 1) + kw - 2 * pw
        y = _deconv_subpixel(x, w, sh, sw, ph, pw, group, oh, ow)
    if y is None:
        wf = jnp.flip(w, axis=(0, 1))
        y = jax.lax.conv_general_dilated(
            x, wf,
            window_strides=(1, 1),
            padding=((dil * (kh - 1) - ph,) * 2,
                     (dil * (kw - 1) - pw,) * 2),
            lhs_dilation=(sh, sw),
            rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=group,
            preferred_element_type=jnp.float32,
        )
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    y = apply_activation(y, node.attrs.get("activation"))
    return [y.astype(x.dtype)]


def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Align-corners bilinear interpolation as a dense (n_out, n_in)
    matrix (Caffe InterpLayer semantics: src = i*(in-1)/(out-1))."""
    A = np.zeros((n_out, n_in), np.float32)
    if n_out == 1 or n_in == 1:
        A[:, 0] = 1.0
        return A
    for i in range(n_out):
        src = i * (n_in - 1) / (n_out - 1)
        lo = min(int(np.floor(src)), n_in - 2)
        frac = src - lo
        A[i, lo] = 1.0 - frac
        A[i, lo + 1] = frac
    return A


@register_lowering("Interp")
def _lower_interp(node, inputs, params, ctx):
    """Bilinear resize (DeepLab's InterpLayer) as TWO dense matmuls with
    static interpolation matrices — rides the MXU instead of a gather."""
    x = inputs[0]
    pb = node.attrs.get("pad_beg", 0)
    pe = node.attrs.get("pad_end", 0)
    if pb or pe:  # negative pads = crop before the resize
        x = x[:, -pb:x.shape[1] + pe, -pb:x.shape[2] + pe, :]
    n, h, w, c = x.shape
    spec = ctx.graph.specs[node.outputs[0]]
    oh, ow = spec.shape[1], spec.shape[2]
    xf = x.astype(jnp.float32)
    if oh != h:
        Ah = jnp.asarray(_interp_matrix(h, oh))
        xf = jnp.einsum("oh,nhwc->nowc", Ah, xf)
    if ow != w:
        Aw = jnp.asarray(_interp_matrix(w, ow))
        xf = jnp.einsum("ow,nhwc->nhoc", Aw, xf)
    return [xf.astype(x.dtype)]


@register_lowering("Permute")
def _lower_permute(node, inputs, params, ctx):
    """SSD's NCHW->NHWC Permute — the identity in this IR's NHWC storage
    (ir._permute_shape rejects every other order).  The value is a
    literal tensor afterwards: Flatten reads it in Caffe's post-permute
    order for free."""
    return [inputs[0]]


@register_lowering("Normalize")
def _lower_normalize(node, inputs, params, ctx):
    """Caffe ssd NormalizeLayer (across_spatial=false form, SSD conv4_3):
    per-pixel L2 over channels, then a learned per-channel (or shared)
    scale."""
    x = inputs[0].astype(jnp.float32)
    if node.attrs.get("across_spatial"):
        norm = jnp.sqrt(jnp.sum(x * x, axis=(1, 2, 3), keepdims=True)
                        + 1e-10)
    else:
        norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-10)
    y = x / norm
    if params:
        y = y * params[0].astype(jnp.float32).reshape(-1)
    return [y.astype(inputs[0].dtype)]


def priorbox_boxes(node, feat_shape, img_shape) -> np.ndarray:
    """Caffe ssd PriorBoxLayer generation (prior_box_layer.cpp Forward),
    computed host-side at trace time — priors depend only on shapes, so
    they become an XLA constant.  Returns (1, 2, H*W*np*4) f32."""
    a = node.attrs
    _, fh, fw, _ = feat_shape
    _, ih, iw, _ = img_shape
    step_w = float(a.get("step", 0)) or iw / fw
    step_h = float(a.get("step", 0)) or ih / fh
    offset = float(a.get("offset", 0.5))
    min_sizes = [float(s) for s in a.get("min_sizes", [])]
    max_sizes = [float(s) for s in a.get("max_sizes", [])]
    flip = bool(a.get("flip", True))
    # Caffe expands aspect_ratios_ = [1] + [r, (1/r if flip)] per given r
    ars = [1.0]
    for r in a.get("aspect_ratios", []):
        r = float(r)
        if any(abs(r - e) < 1e-6 for e in ars):
            continue
        ars.append(r)
        if flip:
            ars.append(1.0 / r)
    wh = []      # (box_w, box_h) per prior, Caffe emission order
    for i, s in enumerate(min_sizes):
        wh.append((s, s))
        if max_sizes:
            sp = float(np.sqrt(s * max_sizes[i]))
            wh.append((sp, sp))
        for r in ars:
            if abs(r - 1.0) < 1e-6:
                continue
            wh.append((s * np.sqrt(r), s / np.sqrt(r)))
    wh = np.asarray(wh, np.float32)                      # (np, 2)
    cx = (np.arange(fw, dtype=np.float32) + offset) * step_w
    cy = (np.arange(fh, dtype=np.float32) + offset) * step_h
    cxg, cyg = np.meshgrid(cx, cy)                       # (fh, fw)
    cxg = cxg[..., None]
    cyg = cyg[..., None]
    boxes = np.stack([
        (cxg - wh[:, 0] / 2) / iw, (cyg - wh[:, 1] / 2) / ih,
        (cxg + wh[:, 0] / 2) / iw, (cyg + wh[:, 1] / 2) / ih,
    ], axis=-1)                                          # (fh, fw, np, 4)
    if a.get("clip"):
        boxes = np.clip(boxes, 0.0, 1.0)
    var = [float(v) for v in a.get("variances", [0.1])]
    if len(var) == 1:
        var = var * 4
    variances = np.tile(np.asarray(var, np.float32),
                        fh * fw * len(wh))
    return np.stack([boxes.reshape(-1), variances])[None]


@register_lowering("PriorBox")
def _lower_priorbox(node, inputs, params, ctx):
    feat = ctx.graph.specs[node.inputs[0]].shape
    img = ctx.graph.specs[node.inputs[1]].shape
    return [jnp.asarray(priorbox_boxes(node, feat, img))]


@register_lowering("DetectionOutput")
def _lower_detection_output(node, inputs, params, ctx):
    """Caffe ssd DetectionOutputLayer, static-shape TPU form: CENTER_SIZE
    decode + per-class greedy NMS (lax.fori_loop over a precomputed IoU
    matrix) + cross-class keep_top_k.  Output (N, keep_top_k, 7) rows
    [image_id, label, score, xmin, ymin, xmax, ymax], padded with
    label -1 (the reference emits a ragged (1,1,num_det,7) — ragged
    shapes don't compile; consumers mask on label >= 0)."""
    a = node.attrs
    num_classes = int(a["num_classes"])
    bg = int(a.get("background_label_id", 0))
    conf_thresh = float(a.get("confidence_threshold", 0.01))
    nms_thresh = float(a.get("nms_threshold", 0.45))
    nms_top_k = int(a.get("nms_top_k", 400))
    keep_top_k = int(a.get("keep_top_k", 200))
    share_loc = bool(a.get("share_location", True))
    # Caffe loc layout (GetLocPredictions): per prior, num_loc_classes
    # blocks of 4 deltas — 1 block when share_location, else one per
    # class (each class regresses its own box).
    num_loc = 1 if share_loc else num_classes

    loc, conf, priors = inputs
    loc0, conf0 = loc, conf                     # raw flat (cond operands)
    # bf16-origin conf upcast to f32 has zero low-16 mantissa bits, so
    # the radix count loop can skip them — 15 passes instead of 31,
    # still exact (every key, including the K-th, has those bits zero).
    conf_min_bit = 16 if conf.dtype == jnp.bfloat16 else 0
    n = loc.shape[0]
    pb = jnp.asarray(priors, jnp.float32).reshape(2, -1, 4)
    pbox, pvar = pb[0], pb[1]                   # (P, 4)
    P = pbox.shape[0]
    loc = loc.reshape(n, P, num_loc, 4).astype(jnp.float32)
    conf = conf.reshape(n, P, num_classes).astype(jnp.float32)
    K = min(nms_top_k, P)

    # CENTER_SIZE decode, variance applied from the prior row
    pw = pbox[:, 2] - pbox[:, 0]
    ph = pbox[:, 3] - pbox[:, 1]
    pcx = (pbox[:, 0] + pbox[:, 2]) * 0.5
    pcy = (pbox[:, 1] + pbox[:, 3]) * 0.5

    def decode(l):                              # (P, 4) -> (P, 4)
        cx = pvar[:, 0] * l[:, 0] * pw + pcx
        cy = pvar[:, 1] * l[:, 1] * ph + pcy
        w = jnp.exp(pvar[:, 2] * l[:, 2]) * pw
        h = jnp.exp(pvar[:, 3] * l[:, 3]) * ph
        return jnp.stack([cx - w / 2, cy - h / 2,
                          cx + w / 2, cy + h / 2], axis=-1)

    from ..kernels.nms import greedy_nms, greedy_nms_bitpack

    # Per-class NMS runs C'-way (x N images) batched: the fixpoint form
    # materializes (N, C', K, K) IoU/suppression matrices (~1.6 GB at
    # SSD b128) and RE-READS them every sweep.  The blocked form streams
    # (block, K) strips exactly once, each fused into its consuming
    # reduction, so nothing K x K ever hits HBM.  Exact greedy either
    # way (tests/test_kernels.py oracles).
    det_block = 128 if ctx.config.nms_blocked else 0
    # Candidate selection is the head's real cost (in-context ablation,
    # bench/det_head_ablate.py b128 MobileNet-SSD: per-class
    # approx_max_k 4.2 ms of the 5.6 ms head; NMS 0.8, gather ~0):
    # K=400 of P=1917 is approx_max_k's degenerate regime.  topk_radix
    # selects the SAME top-K set sort-free — exact radix select on the
    # f32 score bits, membership compacted by prior index — and feeds
    # the score-ranked bitpack NMS (rank from scores, ties by index).
    use_radix = bool(getattr(ctx.config, "topk_radix", False))
    tf_budget = int(getattr(ctx.config, "det_thresh_first", 0))

    cls = np.asarray([c for c in range(num_classes) if c != bg])
    # bg==0 (the universal Caffe layout) makes the foreground classes a
    # CONTIGUOUS suffix: slice instead of fancy-index — the gather of 20
    # of 21 lane-axis columns measured ~1 ms at (16, 8732, 21) through
    # the predicate/selection paths.
    if bg == 0:
        take_cls = lambda c: c[..., 1:]
    else:
        take_cls = lambda c: c[..., cls]

    def radix_slots(rows):
        """Exact top-K membership of each row as compaction SLOTS:
        (..., P) -> (..., P) int32 where the k-th member BY PRIOR INDEX
        gets slot k and non-members get K.  t := max value with
        count(>= t) >= K, found bit-by-bit on the f32 pattern (monotone
        for non-negatives); membership = (> t) plus the first
        K - n_above ties by index.

        No sort, no scatter, no gather anywhere: downstream reads the
        selection through generated one-hot (slot == k) operands fused
        into an MXU contraction.  (A scatter-based compaction measured
        a 23 ms blowup in-graph: every non-member aliases the same
        spill slot, and XLA's safe scatter path serializes the
        colliding writes — bench/det_head_ablate.py --live bisect.)"""
        P_ = rows.shape[-1]
        if K == P_:                     # everyone is a member
            return jnp.broadcast_to(jnp.arange(P_), rows.shape)
        keys = jax.lax.bitcast_convert_type(jnp.maximum(rows, 0.0),
                                            jnp.int32)
        t = jnp.zeros(keys.shape[:-1], jnp.int32)
        for bit in range(30, conf_min_bit - 1, -1):
            # scores <= 1.0 < 2.0 and >= 0: bits 31/30 never set
            cand = t | (1 << bit)
            cnt = jnp.sum(keys >= cand[..., None], axis=-1)
            t = jnp.where(cnt >= K, cand, t)
        above = keys > t[..., None]
        n_above = jnp.sum(above, axis=-1)
        eq = keys == t[..., None]
        eq_rank = jnp.cumsum(eq, axis=-1) - 1
        mem = above | (eq & (eq_rank < (K - n_above)[..., None]))
        pos = jnp.cumsum(mem, axis=-1) - 1
        return jnp.where(mem, pos, K)       # (..., P)

    def per_image(loc_i, conf_i, slot=None):
        # per-class top-K: approx_max_k's partitioned reduction beats the
        # sort-based lax.top_k ~1.8x on TPU; recall_target=1.0 keeps it
        # exact (scores bit-identical, tie order may differ).  Under
        # topk_radix, compaction slots arrive precomputed (batched
        # radix select) and the one-hot comes from slot comparisons.
        rows = take_cls(conf_i).T                          # (C', P)
        if slot is None:
            sc, idx = jax.lax.approx_max_k(rows, K,
                                           recall_target=1.0)  # (C', K)
            oh = jax.nn.one_hot(idx, P, dtype=jnp.float32)  # (C', K, P)
        else:
            oh = (slot[:, None, :]
                  == jnp.arange(K)[None, :, None]).astype(jnp.float32)
            sc = None
        # gather candidate boxes as a one-hot MXU matmul: 3x faster than
        # the gather engine at these shapes (0.4-1.0 vs 2.9 ms at b128);
        # HIGHEST keeps it exact (1.0 * f32 splits reconstruct exactly).
        # Under radix the scores ride the SAME contraction as a 5th
        # payload column, so selection needs no gather of any kind.
        take = bool(getattr(ctx.config, "det_take_gather", False))
        if share_loc:
            boxes = decode(loc_i[:, 0])         # (P, 4), class-shared
            if sc is not None and take:
                bx = jnp.take(boxes, idx, axis=0)   # gather engine
            elif sc is not None:
                bx = jnp.dot(oh.reshape(-1, P), boxes,
                             precision=jax.lax.Precision.HIGHEST) \
                    .reshape(sc.shape + (4,))   # (C', K, 4)
            else:
                payload = jnp.concatenate(
                    [jnp.broadcast_to(boxes, rows.shape + (4,)),
                     rows[..., None]], axis=-1)            # (C', P, 5)
                out = jnp.einsum("ckp,cpf->ckf", oh, payload,
                                 precision=jax.lax.Precision.HIGHEST)
                bx, sc = out[..., :4], out[..., 4]
        else:
            # per-class regressed boxes: decode each class's deltas,
            # then gather per class (batched one-hot matmul)
            boxes_c = jax.vmap(decode)(
                loc_i[:, cls].transpose(1, 0, 2))          # (C', P, 4)
            if sc is not None:
                bx = jnp.einsum("ckp,cpf->ckf", oh, boxes_c,
                                precision=jax.lax.Precision.HIGHEST)
            else:
                payload = jnp.concatenate(
                    [boxes_c, rows[..., None]], axis=-1)   # (C', P, 5)
                out = jnp.einsum("ckp,cpf->ckf", oh, payload,
                                 precision=jax.lax.Precision.HIGHEST)
                bx, sc = out[..., :4], out[..., 4]
        if use_radix:
            # index-ordered candidates: greedy rank comes from the
            # scores (ties by prior index) — no sort anywhere
            keep = greedy_nms_bitpack(bx, sc > conf_thresh, nms_thresh,
                                      scores=sc)
        else:
            keep = greedy_nms(bx, sc > conf_thresh, nms_thresh,
                              block=det_block)
        sc = jnp.where(keep, sc, -1.0)
        lb = jnp.broadcast_to(
            jnp.asarray(cls, jnp.float32)[:, None], sc.shape)
        sc = sc.reshape(-1)
        bx = bx.reshape(-1, 4)
        lb = lb.reshape(-1)
        top, ti = jax.lax.approx_max_k(sc, min(keep_top_k, sc.shape[0]),
                                       recall_target=1.0)
        pad = keep_top_k - top.shape[0]
        good = top > 0
        row = jnp.concatenate([
            jnp.where(good, lb[ti], -1.0)[:, None],
            jnp.where(good, top, 0.0)[:, None],
            jnp.where(good[:, None], bx[ti], 0.0)], axis=-1)
        if pad:
            row = jnp.concatenate(
                [row, jnp.tile(jnp.asarray([[-1., 0., 0., 0., 0., 0.]],
                                           jnp.float32), (pad, 1))])
        return row                              # (keep_top_k, 6)

    def _dispatch(loc_, conf_):
        if use_radix:
            slot_all = radix_slots(
                jnp.transpose(take_cls(conf_), (0, 2, 1)))  # (N, C', P)
            return jax.vmap(per_image)(loc_, conf_, slot_all)
        return jax.vmap(per_image)(loc_, conf_)  # (N, keep, 6)

    if tf_budget and share_loc:
        # Threshold-FIRST candidate compaction — Caffe's actual order
        # ([pub] ssd DetectionOutputLayer: ApplyNMSFast runs on the
        # conf > confidence_threshold survivors, then top-nms_top_k):
        # a trained SSD's 0.01 threshold leaves O(100) candidates, so
        # selection/gather/NMS can scale with a static budget B instead
        # of P.  Priors that clear the threshold for ANY class compact
        # (by index) into B slots via cumsum-slot one-hot contractions
        # (never .at[].set — aliased-scatter serialization, CLAUDE.md);
        # loc deltas, the per-prior decode constants, and all C' class
        # scores ride the same (B, P) x (P, 12+C') payload matmul, so
        # the fast path has NO per-class top-K and NO gather at all:
        # survivor counts <= nms_top_k make the top-K restriction inert
        # (checked by the same predicate), and the score-ranked bitpack
        # NMS consumes the index-ordered compacted set directly.
        # Exactness: a batch-level lax.cond falls back to the full path
        # whenever the predicate can't prove the budgets hold — the
        # predicate is batch-uniform, so XLA executes ONE branch (a
        # per-image cond under vmap would select BOTH).  Decode on
        # compacted rows keeps the fallback's exact f32 op order
        # (pvar*l*pw, not (pvar*pw)*l).
        #
        # Predicate: only per-class survivor counts are computed, in
        # the FLAT (N, P*C) conf layout as one MXU contraction with a
        # 0/1 class-selection matrix — any formulation that touches the
        # reshaped (N, P, C) tensor pays its C(=21)-lane minor layout
        # (lanes 21/128 padded): the obvious
        # jnp.sum(above, axis=1) predicate measured 3.3 ms in-context
        # at b16 while this form is ~0.1 ms (FTPU trivial-pred probe
        # bisect).  The union-of-priors bound uses the counts' SUM —
        # conservative (multi-class priors count once per class) but
        # reduction-free.  Counts are exact: 0/1 bf16 products, f32
        # accumulation.
        #
        # Two-level compaction: level 1 packs the union of survivors
        # into B index-ordered slots ONCE (payload = loc deltas, the
        # 8 per-prior decode constants, all C' scores — one (B, P) x
        # (P, 12+C') matmul); level 2 re-compacts each class's
        # survivors from B into Bc slots (a (C', Bc, B) one-hot einsum
        # — B-minor, P-free), so the NMS IoU work scales with Bc^2,
        # not B^2 (measured: NMS over (C', 512, 512) was 2.0 of the
        # fast head's 2.5 ms).
        B = min(abs(tf_budget), P)
        Bc = min(256, K, B)
        sel = ((jnp.arange(P * num_classes) % num_classes)[:, None]
               == jnp.arange(num_classes)[None, :]
               ).astype(jnp.bfloat16)  # device-generated (no host const)
        af = (conf0.reshape(n, P * num_classes).astype(jnp.float32)
              > conf_thresh)
        n_cls = jnp.dot(af.astype(jnp.bfloat16), sel,
                        preferred_element_type=jnp.float32)  # (N, C)
        n_fg = take_cls(n_cls)                               # (N, C')
        ok = ((jnp.max(jnp.sum(n_fg, axis=-1)) <= B)
              & (jnp.max(n_fg) <= Bc))
        pconst = jnp.concatenate(
            [pvar, pw[:, None], ph[:, None],
             pcx[:, None], pcy[:, None]], axis=-1)       # (P, 8)
        nc = len(cls)

        def per_image_fast(loc_i, conf_i):
            rows = take_cls(conf_i)                      # (P, C')
            mem = jnp.any(rows > conf_thresh, axis=-1)   # (P,)
            pos = jnp.cumsum(mem.astype(jnp.int32)) - 1
            slot = jnp.where(mem, pos, B)                # (P,)
            oh = (slot[None, :]
                  == jnp.arange(B)[:, None]).astype(jnp.float32)
            payload = jnp.concatenate(
                [loc_i[:, 0], pconst, rows], axis=-1)    # (P, 12+C')
            comp = jnp.dot(oh, payload,
                           precision=jax.lax.Precision.HIGHEST)
            l, pv = comp[:, :4], comp[:, 4:8]            # (B, 4)
            pw_c, ph_c = comp[:, 8], comp[:, 9]
            pcx_c, pcy_c = comp[:, 10], comp[:, 11]
            csc = comp[:, 12:]                           # (B, C')
            cx = pv[:, 0] * l[:, 0] * pw_c + pcx_c
            cy = pv[:, 1] * l[:, 1] * ph_c + pcy_c
            w_ = jnp.exp(pv[:, 2] * l[:, 2]) * pw_c
            h_ = jnp.exp(pv[:, 3] * l[:, 3]) * ph_c
            boxes = jnp.stack([cx - w_ / 2, cy - h_ / 2,
                               cx + w_ / 2, cy + h_ / 2], axis=-1)
            sc = csc.T                                   # (C', B)
            # level 2: per-class compaction B -> Bc (index-ordered)
            candc = sc > conf_thresh                     # (C', B)
            posc = jnp.cumsum(candc.astype(jnp.int32), axis=-1) - 1
            slotc = jnp.where(candc, posc, Bc)           # (C', B)
            ohc = (slotc[:, None, :]
                   == jnp.arange(Bc)[None, :, None]).astype(jnp.float32)
            payc = jnp.concatenate(
                [jnp.broadcast_to(boxes[None], (nc, B, 4)),
                 sc[..., None]], axis=-1)                # (C', B, 5)
            compc = jnp.einsum("ckb,cbf->ckf", ohc, payc,
                               precision=jax.lax.Precision.HIGHEST)
            bx, sc = compc[..., :4], compc[..., 4]       # (C', Bc, ...)
            keep = greedy_nms_bitpack(bx, sc > conf_thresh, nms_thresh,
                                      scores=sc)
            sc = jnp.where(keep, sc, -1.0)
            lb = jnp.broadcast_to(
                jnp.asarray(cls, jnp.float32)[:, None], sc.shape)
            sc = sc.reshape(-1)
            bx = bx.reshape(-1, 4)
            lb = lb.reshape(-1)
            top, ti = jax.lax.approx_max_k(
                sc, min(keep_top_k, sc.shape[0]), recall_target=1.0)
            pad = keep_top_k - top.shape[0]
            good = top > 0
            row = jnp.concatenate([
                jnp.where(good, lb[ti], -1.0)[:, None],
                jnp.where(good, top, 0.0)[:, None],
                jnp.where(good[:, None], bx[ti], 0.0)], axis=-1)
            if pad:
                row = jnp.concatenate(
                    [row, jnp.tile(jnp.asarray(
                        [[-1., 0., 0., 0., 0., 0.]], jnp.float32),
                        (pad, 1))])
            return row

        # Branch operands stay RAW/FLAT: a conditional materializes its
        # operands, and the reshaped (N, P, C) f32 conf at 21-lane
        # minor layout is ~6x padded in VMEM/HBM.  Each branch does its
        # own reshape+upcast.
        def _reshape(lc):
            lo = lc[0].reshape(n, P, num_loc, 4).astype(jnp.float32)
            co = lc[1].reshape(n, P, num_classes).astype(jnp.float32)
            return lo, co

        if tf_budget < 0:
            # PROBE ONLY (unsafe on overflow): skip the predicate/cond
            # to measure the conditional boundary's in-context cost.
            rows = jax.vmap(per_image_fast)(loc, conf)
        else:
            rows = jax.lax.cond(
                ok,
                lambda lc: jax.vmap(per_image_fast)(*_reshape(lc)),
                lambda lc: _dispatch(*_reshape(lc)),
                (loc0, conf0))
    else:
        rows = _dispatch(loc, conf)
    img_id = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.float32)[:, None, None],
        (n, keep_top_k, 1))
    return [jnp.concatenate([img_id, rows], axis=-1)]


def generate_anchors(base_size=16, ratios=(0.5, 1.0, 2.0),
                     scales=(8.0, 16.0, 32.0)) -> np.ndarray:
    """Reference RPN anchor grid (py-faster-rcnn generate_anchors.py
    semantics): enumerate aspect ratios of the base box, then scales.
    Returns (A, 4) [x1, y1, x2, y2] around the base box's center."""
    w = h = float(base_size)
    cx = cy = (base_size - 1) * 0.5
    out = []
    size = w * h
    for r in ratios:
        ws = np.round(np.sqrt(size / r))
        hs = np.round(ws * r)
        for s in scales:
            sw, sh = ws * s, hs * s
            out.append([cx - 0.5 * (sw - 1), cy - 0.5 * (sh - 1),
                        cx + 0.5 * (sw - 1), cy + 0.5 * (sh - 1)])
    return np.asarray(out, np.float32)


@register_lowering("Proposal")
def _lower_proposal(node, inputs, params, ctx):
    """RPN proposal generation, static-shape TPU form (semantics of
    py-faster-rcnn proposal_layer.py / the Caffe forks' C++ Proposal
    layer): shift the anchor grid over the feature map, decode the bbox
    deltas (+1 width convention), clip to the image, suppress
    sub-min_size boxes, take pre_nms_top_n by fg score, greedy-NMS via
    the same fixpoint-sweep trick as DetectionOutput, and emit the top
    post_nms_top_n as (R, 5) [batch_idx, x1, y1, x2, y2] rows padded
    with zero boxes.  Batch 1 (the canonical Faster R-CNN deploy)."""
    a = node.attrs
    feat_stride = float(a.get("feat_stride", 16))
    pre_n = int(a.get("pre_nms_top_n", 6000))
    post_n = int(a.get("post_nms_top_n", 300))
    nms_thresh = float(a.get("nms_thresh", 0.7))
    min_size = float(a.get("min_size", 16))
    anchors = generate_anchors(
        int(a.get("base_size", 16)),
        tuple(a.get("ratios", (0.5, 1.0, 2.0))),
        tuple(a.get("scales", (8.0, 16.0, 32.0))))
    A = anchors.shape[0]

    scores, deltas, im_info = inputs
    # im_info must be f32: under bf16 compute, im_w - 1 rounds back to
    # im_w (799 is not a bf16 value), breaking the clip bound.
    im_info = im_info.astype(jnp.float32)
    n, fh, fw, c2a = scores.shape
    # The reference layer is batch-1; batch > 1 vmaps the per-image
    # pipeline with per-image im_info rows (broadcast when one row is
    # supplied for the whole batch).
    if im_info.shape[0] != n:
        im_info = jnp.broadcast_to(im_info[:1], (n, im_info.shape[-1]))

    sx = (np.arange(fw, dtype=np.float32) * feat_stride)
    sy = (np.arange(fh, dtype=np.float32) * feat_stride)
    sxg, syg = np.meshgrid(sx, sy)                    # (fh, fw)
    shifts = np.stack([sxg, syg, sxg, syg], -1)       # (fh, fw, 4)
    all_anchors = jnp.asarray(
        (shifts[:, :, None, :] + anchors).reshape(-1, 4))
    # anchor geometry (static): widths carry the +1 convention
    aw = all_anchors[:, 2] - all_anchors[:, 0] + 1.0
    ah = all_anchors[:, 3] - all_anchors[:, 1] + 1.0
    acx = all_anchors[:, 0] + 0.5 * aw
    acy = all_anchors[:, 1] + 0.5 * ah

    from ..kernels.nms import greedy_nms
    nms_block = 1024 if ctx.config.nms_blocked else 0

    def per_image(score_hw, delta_hw, info):
        # channels are Caffe-ordered [bg*A, fg*A]; keep the fg half
        fg = score_hw[:, :, A:].astype(jnp.float32).reshape(-1)
        dl = delta_hw.astype(jnp.float32).reshape(-1, 4)
        # decode (bbox_transform_inv)
        cx = dl[:, 0] * aw + acx
        cy = dl[:, 1] * ah + acy
        w = jnp.exp(dl[:, 2]) * aw
        h = jnp.exp(dl[:, 3]) * ah
        boxes = jnp.stack([cx - 0.5 * w, cy - 0.5 * h,
                           cx + 0.5 * w, cy + 0.5 * h], axis=-1)
        # clip to image (im_info rows are [im_h, im_w, im_scale])
        im_h, im_w, im_scale = info[0], info[1], info[2]
        boxes = jnp.stack([
            jnp.clip(boxes[:, 0], 0, im_w - 1.0),
            jnp.clip(boxes[:, 1], 0, im_h - 1.0),
            jnp.clip(boxes[:, 2], 0, im_w - 1.0),
            jnp.clip(boxes[:, 3], 0, im_h - 1.0)], axis=-1)
        # min_size filter (scaled to the input image): -inf score mask
        ms = min_size * im_scale
        bw = boxes[:, 2] - boxes[:, 0] + 1.0
        bh = boxes[:, 3] - boxes[:, 1] + 1.0
        fg = jnp.where((bw >= ms) & (bh >= ms), fg, -jnp.inf)

        K = min(pre_n, fg.shape[0])
        if getattr(ctx.config, "proposal_sort_payload", True):
            # Pre-NMS top-K via ONE stable sort carrying the 4 box
            # columns as payload — no gather, no one-hot.  K/P is 35%
            # (6000 of 17100), approx_max_k's DEGENERATE regime (the
            # round-4 MobileNet-SSD finding): the approx + one-hot-dot
            # stage measured 2.62 ms isolated at b16 vs 0.64 ms for the
            # payload sort (bench/proposal_micro.py; approx+take 0.90,
            # radix 3.16 — the one-hot contraction scales with P).
            srt = jax.lax.sort(
                [-fg, boxes[:, 0], boxes[:, 1], boxes[:, 2],
                 boxes[:, 3]], num_keys=1)
            top = -srt[0][:K]
            b = jnp.stack([s[:K] for s in srt[1:]], axis=-1)  # (K, 4)
        else:
            # legacy: approx_max_k + one-hot box gather
            top, idx = jax.lax.approx_max_k(fg, K, recall_target=1.0)
            oh = jax.nn.one_hot(idx, boxes.shape[0], dtype=jnp.float32)
            b = jnp.dot(oh, boxes,
                        precision=jax.lax.Precision.HIGHEST)  # (K, 4)
        keep = greedy_nms(b, top > -jnp.inf, nms_thresh,
                          plus_one=1.0, block=nms_block)
        sc = jnp.where(keep, top, -jnp.inf)
        R = min(post_n, K)
        sc_top, ri = jax.lax.approx_max_k(sc, R, recall_target=1.0)
        # defensive vs TPU ApproxTopK padded-slot index semantics when
        # fewer than R boxes survive NMS: clip indices into range and
        # require the gathered score to be finite, so a sentinel index
        # can never resurrect a suppressed/zero box as a valid ROI
        ri = jnp.clip(ri, 0, K - 1)
        if getattr(ctx.config, "proposal_sort_payload", True):
            rb_ = jnp.take(b, ri, axis=0)   # gather engine: scales w/ R
        else:
            oh2 = jax.nn.one_hot(ri, K, dtype=jnp.float32)
            rb_ = jnp.dot(oh2, b, precision=jax.lax.Precision.HIGHEST)
        good = jnp.take(keep, ri) & (sc_top > -jnp.inf)
        rois = jnp.where(good[:, None], rb_, 0.0)
        if R < post_n:
            rois = jnp.concatenate(
                [rois, jnp.zeros((post_n - R, 4), jnp.float32)])
            good = jnp.concatenate(
                [good, jnp.zeros((post_n - R,), bool)])
        return rois, good

    rois_b, good_b = jax.vmap(per_image)(scores, deltas, im_info)
    # Row layout: image-major (N * post_n, 5).  batch_idx = the image
    # index on real rows, -1 on padding rows (fewer than post_nms_top_n
    # NMS survivors) so downstream consumers can tell padding from a
    # real 1-pixel ROI at the origin; the reference emits variable-
    # length rois instead, static shapes force padding here.  The ROI
    # heads ignore column 0, and serve.decode_detections drops -1 rows.
    img_idx = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.float32)[:, None], (n, post_n))
    bidx = jnp.where(good_b, img_idx, -1.0)[..., None]  # (N, post_n, 1)
    out = jnp.concatenate([bidx, rois_b], axis=-1)
    return [out.reshape(n * post_n, 5)]


@register_lowering("ROIPooling")
def _lower_roipool(node, inputs, params, ctx):
    """Fast R-CNN ROIPoolingLayer (roi_pooling_layer.cpp): quantize each
    ROI to the feature grid (round at spatial_scale), split into
    pooled_h x pooled_w bins with floor/ceil boundaries, MAX over each
    bin, 0 for empty bins.  TPU form: per-bin membership masks on the H
    and W axes, max-reduced against the feature map — static shapes, no
    gathers; XLA fuses the select into the reductions."""
    x, rois = inputs
    ph = int(node.attrs["pooled_h"])
    pw = int(node.attrs["pooled_w"])
    scale = float(node.attrs.get("spatial_scale", 1.0 / 16))
    N, H, W, C = x.shape
    # dtype-preserving: bin max is a pure selection, so computing on the
    # engine dtype (bf16 in production) returns bit-identical values to
    # an f32 upcast while halving the pyramid/gather bytes.
    #
    # batch > 1: flatten (N, H, W, C) -> (N*H, W, C) and offset each
    # ROI's row bounds by batch_idx*H (rois column 0; Proposal emits
    # image-major rows with batch_idx = image index, -1 on padding).
    # Queried [lo, hi) ranges stay inside one image by construction, so
    # both the dyadic table and the mask form work unchanged on the
    # flattened axis; pyramid entries whose blocks spill across an image
    # boundary are never queried (same argument as the existing
    # shortened-tail entries).
    xf = x.reshape(N * H, W, C)
    r = rois.astype(jnp.float32)
    bidx = jnp.clip(r[:, 0].astype(jnp.int32), 0, N - 1)  # (R,)
    pad_roi = r[:, 0] < 0                             # Proposal padding
    # Caffe uses C round() (half AWAY from zero); jnp.round is
    # half-to-even and shifts the window one cell at exact .5 coords.
    # floor(x + 0.5) matches for the non-negative coords ROIs carry.
    x1 = jnp.floor(r[:, 1] * scale + 0.5)
    y1 = jnp.floor(r[:, 2] * scale + 0.5)
    x2 = jnp.floor(r[:, 3] * scale + 0.5)
    y2 = jnp.floor(r[:, 4] * scale + 0.5)
    rw = jnp.maximum(x2 - x1 + 1.0, 1.0)              # (R,)
    rh = jnp.maximum(y2 - y1 + 1.0, 1.0)

    def axis_bounds(start, length, bins, size):
        """(R, bins) [lo, hi) bin boundaries with Caffe's floor/ceil
        split, clipped to [0, size].  Integer arithmetic — the rounded
        ROI coords are integer-valued, and XLA's reciprocal-multiply
        rewrite of f32 division flips exact boundaries
        (jit ceil(3 * (7/3)) == 8 on CPU, measured).

        Deliberate deviation from Caffe: roi_pooling_layer.cpp computes
        floor(ph * (float)(roi_h / pooled_h)) in f32, which at exact-tie
        ratios truncates one cell low (roi_h=7, bins=3, i=3: f32 gives
        floor(6.9999998) = 6 where exact arithmetic gives 7).  We keep
        the exact-rational boundary — it is the mathematically intended
        partition — so a 1-cell bin-boundary difference vs real Caffe
        outputs is expected at exact ratios."""
        st = start.astype(jnp.int32)
        ln = length.astype(jnp.int32)
        i = jnp.arange(bins, dtype=jnp.int32)
        lo = (i[None, :] * ln[:, None]) // bins + st[:, None]
        hi = ((i[None, :] + 1) * ln[:, None] + bins - 1) // bins \
            + st[:, None]
        return jnp.clip(lo, 0, size), jnp.clip(hi, 0, size)

    lo_h, hi_h = axis_bounds(y1, rh, ph, H)           # (R, ph)
    lo_w, hi_w = axis_bounds(x1, rw, pw, W)           # (R, pw)
    # per-image clipping done; shift into the flattened N*H row axis.
    # Padding ROIs (batch_idx < 0) collapse to an empty range so every
    # bin returns 0 on both paths.
    off = bidx * H                                    # (R,)
    lo_h = jnp.where(pad_roi[:, None], 0, lo_h + off[:, None])
    hi_h = jnp.where(pad_roi[:, None], 0, hi_h + off[:, None])

    if ctx.config.roipool_table:
        # Pyramid level cap (b16 re-diagnosis, bench/roi_micro.py): the
        # full dyadic pyramid builds nlh*nlw = 36 map copies (13.6 ms of
        # pure HBM traffic at faster_rcnn b16) but bin RANGES never
        # exceed ceil(size/bins)+2 when the ROI fits the map, so only
        # bit_length(maxbin-1) levels are ever queried — 12 copies,
        # 3.9 ms.  Sound only for map-clipped ROIs: Proposal clips its
        # boxes to the image, so cap when that is the producer; raw ROI
        # inputs keep the full pyramid (a beyond-map ROI's clipped bins
        # can span the whole axis).
        prod = {pn.outputs[0]: pn for pn in ctx.graph.nodes}.get(
            node.inputs[1])
        clipped = (prod is not None and prod.op == "Proposal"
                   and not getattr(ctx.config, "roipool_full_pyramid",
                                   False))
        mb_h = (H + ph - 1) // ph + 2 if clipped else None
        mb_w = (W + pw - 1) // pw + 2 if clipped else None
        out = _roi_range_max(xf, lo_h, hi_h, lo_w, hi_w, max_len_h=H,
                             max_bin_h=mb_h, max_bin_w=mb_w)
        return [out.astype(x.dtype)]

    # membership-mask form (roipool_table=False): select-and-reduce the
    # full map per (ROI, bin) — R*ph*H*W*C VPU ops, kept as the oracle /
    # fallback for maps too large to build the dyadic pyramid on.
    pos_h = jnp.arange(N * H, dtype=jnp.int32)
    mh = (pos_h >= lo_h[..., None]) & (pos_h < hi_h[..., None])
    pos_w = jnp.arange(W, dtype=jnp.int32)
    mw = (pos_w >= lo_w[..., None]) & (pos_w < hi_w[..., None])

    def per_roi(mh_r, mw_r):
        # (ph, H, 1, 1) select -> max over H -> (ph, W, C)
        t = jnp.max(jnp.where(mh_r[:, :, None, None], xf[None], -jnp.inf),
                    axis=1)
        # (pw, W) select against (ph, W, C) -> max over W
        o = jnp.max(jnp.where(mw_r[None, :, :, None], t[:, None],
                              -jnp.inf), axis=2)      # (ph, pw, C)
        return o

    out = jax.vmap(per_roi)(mh, mw)                   # (R, ph, pw, C)
    out = jnp.where(jnp.isfinite(out), out, 0.0)      # empty bins -> 0
    return [out.astype(x.dtype)]


def _roi_range_max(x, lo_h, hi_h, lo_w, hi_w, max_len_h=None,
                   max_bin_h=None, max_bin_w=None):
    """Exact 2D range-max over [lo_h,hi_h) x [lo_w,hi_w) bins via a
    dyadic (sparse-table) pyramid: T[lh, lw, y, x] = max over the
    2^lh x 2^lw block at (y, x).  Each bin is then the max of the 4
    overlapping dyadic blocks that cover it (exact for max — idempotent),
    i.e. 4 gathered C-rows per bin instead of a full-map masked
    reduction: O(HWC log H log W) build + O(R*bins*C) query vs the mask
    form's O(R*bins*HWC).  Empty bins (hi<=lo after clipping) return 0,
    matching Caffe's is_empty branch.

    x: (H, W, C); lo/hi: (R, bins) int32 in [0, size].  Returns
    (R, ph, pw, C) in x.dtype.

    max_len_h caps the H-axis levels when the row axis is a flattened
    N*H batch (batched ROIPooling): queried ranges never exceed one
    image's H, so levels past (H-1).bit_length() would be pure build
    waste.  Entries whose block spills across an image boundary are
    never queried (ranges live inside one image by construction).

    max_bin_h/max_bin_w cap levels further to the maximum BIN length
    (caller-guaranteed bound on hi-lo): the two half-size blocks cover
    any len <= 2^nlevels, so bit_length(maxbin-1) levels suffice —
    at faster_rcnn b16 this cuts the build from 36 to 12 map copies
    (13.6 -> 3.9 ms, bench/roi_micro.py)."""
    H, W, C = x.shape
    nlh = max((max_len_h or H) - 1, 1).bit_length()
    nlw = max(W - 1, 1).bit_length()   # levels 0..nl-1 cover len<=size
    if max_bin_h:
        nlh = min(nlh, max(max_bin_h - 1, 1).bit_length())
    if max_bin_w:
        nlw = min(nlw, max(max_bin_w - 1, 1).bit_length())

    rows = [x]
    for l in range(1, nlh):
        s = 1 << (l - 1)
        p = rows[-1]
        # entries past H-2^l shorten to [y, H) — never queried there
        rows.append(jnp.maximum(p, p[jnp.minimum(jnp.arange(H) + s,
                                                 H - 1)]))
    tabs = []
    for p0 in rows:
        cols = [p0]
        for l in range(1, nlw):
            s = 1 << (l - 1)
            p = cols[-1]
            cols.append(jnp.maximum(p, p[:, jnp.minimum(
                jnp.arange(W) + s, W - 1)]))
        tabs.append(jnp.stack(cols))                  # (nlw, H, W, C)
    table = jnp.stack(tabs).reshape(nlh * nlw * H * W, C)

    len_h = hi_h - lo_h                               # (R, ph)
    len_w = hi_w - lo_w                               # (R, pw)
    # floor(log2(len)), clamped to the top level actually built: when
    # len == size == 2^m the unclamped value is m == nlh, one past the
    # table (jnp.take's fill mode then returns NaN).  Two half-size
    # blocks [lo, lo+2^lh) and [hi-2^lh, hi) still exactly cover any
    # len <= 2^(lh+1) = size, because max is idempotent.
    lh = jnp.minimum(31 - jax.lax.clz(jnp.maximum(len_h, 1)), nlh - 1)
    lw = jnp.minimum(31 - jax.lax.clz(jnp.maximum(len_w, 1)), nlw - 1)
    y0 = jnp.clip(lo_h, 0, H - 1)
    y1 = jnp.clip(hi_h - jnp.left_shift(1, lh), 0, H - 1)
    x0 = jnp.clip(lo_w, 0, W - 1)
    x1 = jnp.clip(hi_w - jnp.left_shift(1, lw), 0, W - 1)

    base = (lh[:, :, None] * nlw + lw[:, None, :]) * H    # (R, ph, pw)
    # Four SEPARATE flat gathers maxed pairwise instead of one take
    # with a trailing (2, 2) batch dim: 18.6 -> 14.9 ms at b16
    # (bench/roi_micro.py query_4takes); mode="clip" skips the
    # fill-mode bounds select (indices are in range by construction).
    out = None
    for ys_ in (y0, y1):
        for xs_ in (x0, x1):
            ix = (base + ys_[:, :, None]) * W + xs_[:, None, :]
            g = jnp.take(table, ix.reshape(-1), axis=0, mode="clip")
            out = g if out is None else jnp.maximum(out, g)
    out = out.reshape(base.shape + (C,))              # (R, ph, pw, C)
    valid = (len_h[:, :, None] > 0) & (len_w[:, None, :] > 0)
    return jnp.where(valid[..., None], out, jnp.zeros((), x.dtype))


@register_lowering("PSROIPooling")
def _lower_psroipool(node, inputs, params, ctx):
    """R-FCN position-sensitive ROI pooling (psroi_pooling_layer.cu):
    roi_start = round(coord) * spatial_scale, roi_end =
    round(coord + 1) * spatial_scale; bin (i, j) AVERAGES its window of
    channel group (c*k + i)*k + j; empty bins -> 0.

    TPU form: AVE pooling is linear, so each ROI reduces to two mask
    matmuls — sum[r,i,j,c] = mh[r,i,:] @ x[:,:,i,j,c] @ mw[r,j,:] — one
    einsum on the MXU, no gathers.  Bin boundaries use exact rational
    arithmetic (coords are integers after round; spatial_scale = 1/q):
    floor(i*bin + start) = (i*(E-S) + k*S) // (k*q) — float floor/ceil
    flips under XLA's reciprocal-multiply division rewrite."""
    x, rois = inputs
    k = int(node.attrs["group_size"])
    cdim = int(node.attrs["output_dim"])
    scale = float(node.attrs.get("spatial_scale", 1.0 / 16))
    q = int(round(1.0 / scale))
    if abs(1.0 / scale - q) > 1e-4:
        raise NotImplementedError(
            f"{node.name}: spatial_scale {scale} is not 1/int")
    N, H, W, _ = x.shape
    # channel layout (Caffe): idx = (c*k + gh)*k + gw -> (H, W, C, k, k).
    # batch > 1 rides the same flattened-row-axis trick as ROIPooling:
    # (N, H, ...) -> (N*H, ...) with each ROI's H-axis mask offset by
    # batch_idx*H — the einsum below is agnostic to where the rows live.
    xs = x.astype(jnp.float32).reshape(N * H, W, cdim, k, k)
    xs = jnp.transpose(xs, (0, 1, 3, 4, 2))           # (N*H, W, k, k, C)

    r = rois.astype(jnp.float32)
    bidx = jnp.clip(r[:, 0].astype(jnp.int32), 0, N - 1)
    pad_roi = r[:, 0] < 0
    # half-away-from-zero round (C round()), like ROIPooling above
    S_x = jnp.floor(r[:, 1] + 0.5).astype(jnp.int32)  # pixel units
    S_y = jnp.floor(r[:, 2] + 0.5).astype(jnp.int32)
    E_x = jnp.floor(r[:, 3] + 1.5).astype(jnp.int32)
    E_y = jnp.floor(r[:, 4] + 1.5).astype(jnp.int32)
    # Caffe clamps the FEATURE-unit extent to 0.1 = q/10 pixel units;
    # work in units of 1/(10*q*k) so the clamp stays exact integers.
    L_x = jnp.maximum(10 * (E_x - S_x), q)            # units 1/(10q)
    L_y = jnp.maximum(10 * (E_y - S_y), q)

    def axis_masks(S, L, size, offset=None, flat_size=None):
        """(R, k, flat_size or size) membership with Caffe's floor/ceil
        boundaries, exact in units of 1/(10*q*k): lo = (i*L + 10*k*S)
        // (10*k*q), hi = ceil of the same at i+1; clipped to [0, size)
        per-image, then shifted by `offset` rows into the flattened
        batch axis."""
        i = jnp.arange(k, dtype=jnp.int32)
        lo = (i[None, :] * L[:, None] + 10 * k * S[:, None]) \
            // (10 * k * q)
        hi = ((i[None, :] + 1) * L[:, None] + 10 * k * S[:, None]
              + 10 * k * q - 1) // (10 * k * q)
        lo = jnp.clip(lo, 0, size)
        hi = jnp.clip(hi, 0, size)
        if offset is not None:
            lo = jnp.where(pad_roi[:, None], 0, lo + offset[:, None])
            hi = jnp.where(pad_roi[:, None], 0, hi + offset[:, None])
        pos = jnp.arange(flat_size or size, dtype=jnp.int32)
        m = (pos >= lo[..., None]) & (pos < hi[..., None])
        return m.astype(jnp.float32)

    mh = axis_masks(S_y, L_y, H, offset=bidx * H,
                    flat_size=N * H)                  # (R, k, N*H)
    mw = axis_masks(S_x, L_x, W)                      # (R, k, W)
    if node.attrs.get("fuse_ave"):
        # Fused k x k vote average (passes.fuse_psroi_ave): per-bin
        # counts are SEPARABLE — count[r,i,j] = ch[r,i] * cw[r,j] — so
        # row-normalizing the two axis masks folds the per-bin average
        # (empty bins contribute 0 via their all-zero mask row, matching
        # the unfused where(count>0) semantics), and contracting the bin
        # axes away emits (R, C) directly: no (R, k, k, C) intermediate,
        # one einsum instead of einsum + divide + reduce.  Exact to f32
        # rounding (the division moves from k^2*C elements to 2k mask
        # rows).
        ch = mh.sum(-1)                               # (R, k)
        cw = mw.sum(-1)
        mh_n = mh / jnp.maximum(ch, 1.0)[..., None]
        mw_n = mw / jnp.maximum(cw, 1.0)[..., None]
        avg = jnp.einsum("rih,rjw,hwijc->rc", mh_n, mw_n, xs,
                         precision=jax.lax.Precision.HIGHEST)
        return [(avg / (k * k))[:, None, None, :].astype(x.dtype)]
    ssum = jnp.einsum("rih,rjw,hwijc->rijc", mh, mw, xs,
                      precision=jax.lax.Precision.HIGHEST)
    count = (mh.sum(-1)[:, :, None] * mw.sum(-1)[:, None, :])
    out = jnp.where(count[..., None] > 0,
                    ssum / jnp.maximum(count[..., None], 1.0), 0.0)
    return [out.astype(x.dtype)]


@register_lowering("ArgMax")
def _lower_argmax(node, inputs, params, ctx):
    """Caffe ArgMaxLayer.  With `axis`: that dim -> top_k indices (or max
    values under out_max_val).  Without `axis`: per-image flatten in
    Caffe's NCHW order -> (N, 1|2, top_k).  Indices are emitted as f32 —
    Caffe blobs are float, and segmentation consumers treat them as
    labels."""
    x = inputs[0].astype(jnp.float32)
    k = int(node.attrs.get("top_k", 1))
    out_max_val = bool(node.attrs.get("out_max_val"))
    axis = node.attrs.get("axis")
    if axis is not None:
        ax = axis % x.ndim
        if k == 1:
            val = jnp.max(x, axis=ax, keepdims=True)
            idx = jnp.argmax(x, axis=ax, keepdims=True).astype(jnp.float32)
        else:
            xm = jnp.moveaxis(x, ax, -1)
            val, idx = jax.lax.top_k(xm, k)
            val = jnp.moveaxis(val, -1, ax)
            idx = jnp.moveaxis(idx.astype(jnp.float32), -1, ax)
        return [val if out_max_val else idx]
    if x.ndim == 4:   # flatten in NCHW order to match Caffe's flat index
        x = jnp.transpose(x, (0, 3, 1, 2))
    x = x.reshape(x.shape[0], -1)
    val, idx = jax.lax.top_k(x, k)
    idx = idx.astype(jnp.float32)
    if out_max_val:
        return [jnp.stack([idx, val], axis=1)]
    return [idx[:, None, :]]


@register_lowering("Crop")
def _lower_crop(node, inputs, params, ctx):
    """Caffe Crop: slice bottom[0] to bottom[1]'s size on the listed
    NHWC ``axes`` at the parallel ``offsets``.  Static bounds — invalid
    geometry raises (dynamic_slice would silently clamp and return a
    shifted window)."""
    x, ref = inputs
    axes = [d % x.ndim for d in node.attrs.get("axes", [1, 2])]
    offsets = list(node.attrs.get("offsets", [0]))
    starts = [0] * x.ndim
    limits = list(x.shape)
    for i, d in enumerate(axes):
        off = offsets[i] if i < len(offsets) else offsets[-1]
        if off + ref.shape[d] > x.shape[d]:
            raise ValueError(
                f"{node.name}: crop offset {off} + ref size "
                f"{ref.shape[d]} exceeds input size {x.shape[d]} "
                f"on axis {d}")
        starts[d] = off
        limits[d] = off + ref.shape[d]
    return [jax.lax.slice(x, starts, limits)]


def _ring_tp_ok(ctx, k_dim: int, n_dim: int) -> bool:
    """True when a (M, K) @ (K, N) contraction should take the
    ring-pipelined collective matmul (ShardingConfig.ring_overlap):
    channel-TP active, both the contraction and output dims divide the
    model axis, and we're not in spatial mode (H-sharded activations
    would be misdeclared by the ring's K-axis specs)."""
    mesh = getattr(ctx, "mesh", None)
    scfg = getattr(ctx.config, "sharding", None)
    return (mesh is not None and scfg is not None
            and getattr(scfg, "ring_overlap", False)
            and scfg.shard_weights and not scfg.shard_spatial
            and mesh.shape[scfg.model_axis] > 1
            and k_dim % mesh.shape[scfg.model_axis] == 0
            and n_dim % mesh.shape[scfg.model_axis] == 0)


def _ring_tp_matmul(ctx, xm, wm, bias):
    """(M, K) @ (K, N) via parallel/overlap.allgather_matmul in the
    Megatron column-parallel (w_sharded_out) form: xm is constrained
    onto its K axis (the previous column-parallel layer's output
    sharding) so the K-chunk ring replaces GSPMD's blocking all-gather;
    y returns sharded on N.  M's major dim keeps its DP sharding via
    batch_axis.  Returns f32 (caller applies activation + dtype)."""
    from jax.sharding import NamedSharding, PartitionSpec
    from ..parallel.overlap import allgather_matmul
    mesh, scfg = ctx.mesh, ctx.config.sharding
    ax = scfg.model_axis
    bax = (scfg.data_axis if scfg.shard_batch
           and mesh.shape[scfg.data_axis] > 1
           and xm.shape[0] % mesh.shape[scfg.data_axis] == 0 else None)
    xs = jax.lax.with_sharding_constraint(
        xm, NamedSharding(mesh, PartitionSpec(bax, ax)))
    b32 = bias.astype(jnp.float32) if bias is not None else None
    return allgather_matmul(mesh, ax, xs.astype(jnp.float32),
                            wm.astype(jnp.float32), bias=b32,
                            w_sharded_out=True, batch_axis=bax)


@register_lowering("InnerProduct")
def _lower_fc(node, inputs, params, ctx):
    x = inputs[0]
    w = params[0]  # (in, out)
    bias = params[1] if node.attrs.get("bias_term", True) and len(params) > 1 else None
    act = node.attrs.get("activation")
    if x.ndim > 2:
        # Caffe flattens NCHW as (N, C*H*W); our activations are NHWC, and
        # the converter pre-permutes FC weights to match NHWC flattening.
        x = x.reshape(x.shape[0], -1)

    if ctx.backend == "pallas":
        from ..kernels import dispatch as kdispatch
        return [kdispatch.fc_forward(node, x, w, bias, ctx)]

    x, w = _dequant_for_oracle(x, w, ctx.qinfo(node), ctx)
    if w.ndim == 2 and _ring_tp_ok(ctx, x.shape[-1], w.shape[-1]):
        # TP FC via the ring-pipelined collective matmul (SURVEY.md
        # §2.5 overlap requirement); see _ring_tp_matmul.
        y = _ring_tp_matmul(ctx, x, w, bias)
        return [apply_activation(y, act).astype(x.dtype)]
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    y = apply_activation(y, act)
    return [y.astype(x.dtype)]


# ----------------------------------------------------------------------
# Pooling — Caffe semantics: ceil-mode output size; AVE divides by the
# window clipped to the *padded* region ([pub] src/layers/pooling_layer.cpp
# behavior, inherited from Caffe).
# ----------------------------------------------------------------------

def _pool_padding(size, k, s, p, ceil_mode):
    out = conv_out_dim(size, k, s, p, 1, ceil_mode=ceil_mode)
    needed = (out - 1) * s + k - size - 2 * p  # extra high-side pad
    return out, max(needed, 0)


@register_lowering("SPP")
def _lower_spp(node, inputs, params, ctx):
    """Caffe SPPLayer: for each pyramid level l, a pooling with
    kernel = ceil(size/bins), stride = kernel, pad = (kernel*bins -
    size + 1) // 2 (bins = 2^l) — which lands exactly on bins x bins
    under Caffe's ceil-mode output arithmetic — then NCHW-order flatten
    and channel concat (the fixed-length output that feeds FC heads
    regardless of input size)."""
    x = inputs[0]
    n, h, w, c = x.shape
    p = int(node.attrs.get("pyramid_height", 1))
    mode = node.attrs.get("pool", "MAX")
    levels = []
    for l in range(p):
        bins = 2 ** l
        kh, kw = -(-h // bins), -(-w // bins)
        ph = (kh * bins - h + 1) // 2
        pw = (kw * bins - w + 1) // 2
        sub = Node(f"{node.name}/pool_{l}", "Pooling",
                   list(node.inputs), [f"{node.name}/pool_{l}"],
                   {"pool": mode, "kernel_h": kh, "kernel_w": kw,
                    "stride_h": kh, "stride_w": kw, "pad_h": ph,
                    "pad_w": pw, "ceil_mode": True})
        (y,) = _lower_pool(sub, [x], [], ctx)
        assert y.shape[1] == bins and y.shape[2] == bins, \
            f"{node.name}: level {l} pooled to {y.shape}, want {bins}"
        y = jnp.transpose(y, (0, 3, 1, 2))      # Caffe NCHW flatten order
        levels.append(y.reshape(n, -1))
    return [jnp.concatenate(levels, axis=-1)]


@register_lowering("SpaceToDepth")
def _lower_s2d(node, inputs, params, ctx):
    """2x2 space-to-depth with edge padding (passes_stem.py); channel
    order (i, j, c) to match the re-packed stem weights."""
    x = inputs[0]
    blk = node.attrs.get("block", 2)
    pad = node.attrs.get("pad", 0)
    n, h, w, c = x.shape
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        h, w = h + 2 * pad, w + 2 * pad
    x = x.reshape(n, h // blk, blk, w // blk, blk, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return [x.reshape(n, h // blk, w // blk, blk * blk * c)]


@register_lowering("FusedBottleneck")
def _lower_fused_block(node, inputs, params, ctx):
    """VMEM-resident bottleneck: a 1-block chain (kernels/fused_chain)."""
    from ..kernels.fused_chain import fused_chain
    x = inputs[0]
    w1, b1, w2, b2, w3, b3 = params
    # Graph weights are HWIO; the chain kernel wants stacked matrices.
    C, Cm = w1.shape[-2], w1.shape[-1]
    w1 = w1.reshape(1, C, Cm)
    w2 = w2.reshape(1, 9 * Cm, Cm)
    w3 = w3.reshape(1, Cm, C)
    b1, b2, b3 = (b.reshape(1, -1) for b in (b1, b2, b3))
    q = ctx.qinfo(node)
    if node.attrs.get("quant") and q is not None:
        s_x = node.attrs["s_x"]
        if x.dtype != jnp.int8:
            x = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                         -127, 127).astype(jnp.int8)
        ws = tuple(jnp.asarray(s).reshape(1, -1) for s in q["w_scales"])
        scales = ((s_x,), (node.attrs["s_y1"],), (node.attrs["s_y2"],),
                  node.attrs.get("s_out"))
        y = fused_chain(x, w1, b1, w2, b2, w3, b3, w_scales=ws,
                        scales=scales, interpret=ctx.config.interpret)
    else:
        cd = x.dtype
        y = fused_chain(x, w1.astype(cd), b1, w2.astype(cd), b2,
                        w3.astype(cd), b3, interpret=ctx.config.interpret)
    return [y]


@register_lowering("FusedChain")
def _lower_fused_chain(node, inputs, params, ctx):
    """Chained bottlenecks in one pallas_call (passes_fusion.fuse_chains
    -> kernels/fused_chain)."""
    from ..kernels.fused_chain import fused_chain
    x = inputs[0]
    w1, b1, w2, b2, w3, b3 = params
    q = ctx.qinfo(node)
    if node.attrs.get("quant") and q is not None:
        sx = node.attrs["sx"]
        if x.dtype != jnp.int8:
            x = jnp.clip(jnp.round(x.astype(jnp.float32) / sx[0]),
                         -127, 127).astype(jnp.int8)
        ws = (jnp.asarray(q["w1s"]), jnp.asarray(q["w2s"]),
              jnp.asarray(q["w3s"]))
        scales = (sx, node.attrs["sy1"], node.attrs["sy2"],
                  node.attrs.get("s_out"))
        y = fused_chain(x, w1, b1, w2, b2, w3, b3, w_scales=ws,
                        scales=scales, interpret=ctx.config.interpret)
    else:
        cd = x.dtype
        y = fused_chain(x, w1.astype(cd), b1, w2.astype(cd), b2,
                        w3.astype(cd), b3, interpret=ctx.config.interpret)
    return [y]


@register_lowering("Pooling")
def _lower_pool(node, inputs, params, ctx):
    x = inputs[0]
    n, h, w, c = x.shape
    # Requantizing AVE pool (quant/rewrite.py): average the raw int8
    # grid values in f32 and fold x_scale/y_scale into one multiply —
    # avg(s*q) = s*avg(q), so the edge stays 1 byte/elem both sides.
    q = ctx.qinfo(node)
    rq = (q or {}).get("requant_int8")

    def _requant(avg_f32):
        # Mirror the Scale/LRN requant guard: x_scale only applies when
        # the producer actually emitted int8 — a sibling consumer that
        # rejects int8 (e.g. grouped conv with int8_grouped=False) can
        # demote the producer to float, in which case the average is
        # already real-valued and only y_scale maps it onto the out grid.
        s = (q["x_scale"] if x.dtype == jnp.int8 else 1.0) / q["y_scale"]
        return jnp.clip(jnp.round(avg_f32 * s), -127, 127).astype(jnp.int8)

    if node.attrs.get("global_pooling", False):
        if node.attrs.get("pool", "MAX") == "AVE":
            m = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
            return [_requant(m) if rq else m.astype(x.dtype)]
        return [jnp.max(x, axis=(1, 2), keepdims=True)]

    kh = node.attrs.get("kernel_h", node.attrs.get("kernel_size"))
    kw = node.attrs.get("kernel_w", node.attrs.get("kernel_size"))
    sh = node.attrs.get("stride_h", node.attrs.get("stride", 1))
    sw = node.attrs.get("stride_w", node.attrs.get("stride", 1))
    ph = node.attrs.get("pad_h", node.attrs.get("pad", 0))
    pw = node.attrs.get("pad_w", node.attrs.get("pad", 0))
    ceil = node.attrs.get("ceil_mode", True)
    mode = node.attrs.get("pool", "MAX")

    oh, extra_h = _pool_padding(h, kh, sh, ph, ceil)
    ow, extra_w = _pool_padding(w, kw, sw, pw, ceil)
    pad_cfg = ((0, 0), (ph, ph + extra_h), (pw, pw + extra_w), (0, 0))

    if mode == "MAX":
        neg = (jnp.finfo(x.dtype).min
               if jnp.issubdtype(x.dtype, jnp.floating)
               else jnp.iinfo(x.dtype).min)
        if (getattr(ctx.config, "maxpool_shift", False)
                and kh <= 5 and kw <= 5):
            # Separable shifted-slice maxima instead of reduce_window:
            # y = max over kh strided h-slices, then kw strided
            # w-slices — pure elementwise maxima XLA fuses into
            # neighbors (GoogLeNet's in-block 3x3 s1 pool measured
            # 0.68 ms at 9.5% SoL through reduce_window in context,
            # bench/results/ceiling_googlenet_4e_layer.json).  Max is
            # order-free: bit-exact vs reduce_window, same -inf pads.
            xp = jnp.pad(x, pad_cfg, constant_values=neg)
            m = None
            for dh in range(kh):
                sl = xp[:, dh:dh + (oh - 1) * sh + 1:sh]
                m = sl if m is None else jnp.maximum(m, sl)
            y = None
            for dw in range(kw):
                sl = m[:, :, dw:dw + (ow - 1) * sw + 1:sw]
                y = sl if y is None else jnp.maximum(y, sl)
            return [y]
        y = jax.lax.reduce_window(
            x, jnp.asarray(neg, x.dtype), jax.lax.max,
            window_dimensions=(1, kh, kw, 1),
            window_strides=(1, sh, sw, 1),
            padding=pad_cfg,
        )
        return [y]

    # AVE: sum over the window (pad contributes zeros), divide by the
    # window size clipped to the padded extent [0, size + pad) — exactly
    # Caffe's pool_size computation.
    def counts(size, k, s, p, out):
        starts = np.arange(out) * s - p
        ends = np.minimum(starts + k, size + p)
        return (ends - starts).astype(np.float32)

    ch = counts(h, kh, sh, ph, oh)
    cw = counts(w, kw, sw, pw, ow)
    denom = jnp.asarray(np.outer(ch, cw))[None, :, :, None]
    if (getattr(ctx.config, "avepool_reshape", False)
            and sh == kh and sw == kw and ph == 0 and pw == 0
            and extra_h == 0 and extra_w == 0
            and h == oh * kh and w == ow * kw):
        # Non-overlapping grid pool: one reshape + axis sum replaces the
        # big-window reduce_window (PSPNet pyramid bins: the k=60 bin
        # measured 1.49 ms at 2.4% SoL in context; a plain reduction
        # reads the tensor once).  Sums are over exactly the same
        # elements; i32 accumulation is order-exact.
        if rq and x.dtype == jnp.int8:
            xr = x.astype(jnp.int32).reshape(n, oh, kh, ow, kw, c)
            ysum = xr.sum(axis=(2, 4))
            s = (q["x_scale"] / q["y_scale"]) / float(kh * kw)
            return [jnp.clip(jnp.round(ysum.astype(jnp.float32) * s),
                             -127, 127).astype(jnp.int8)]
        xr = x.astype(jnp.float32).reshape(n, oh, kh, ow, kw, c)
        y = xr.sum(axis=(2, 4)) / float(kh * kw)
        return [_requant(y) if rq else y.astype(x.dtype)]
    if getattr(ctx.config, "avepool_matmul", False):
        # Window sums as two ones-band matrix contractions on the MXU
        # (cf. lrn_band): P_h is (oh, h) with 1s over each window's
        # in-range rows — pad cells contribute zero exactly like
        # reduce_window's 0 init, and the shared clipped-count denom
        # handles Caffe's pool_size.  i32 accumulation keeps the requant
        # path bit-exact; bench/ppm_ctx_micro.py for the measured case.
        def band(size, k, s, p, out, dt):
            P = np.zeros((out, size), dt)
            for o_ in range(out):
                a_ = max(o_ * s - p, 0)
                b_ = min(o_ * s - p + k, size)
                P[o_, a_:b_] = 1
            return jnp.asarray(P)

        int8_in = rq and x.dtype == jnp.int8
        mdt = np.int8 if int8_in else np.float32
        acc = jnp.int32 if int8_in else jnp.float32
        Ph = band(h, kh, sh, ph, oh, mdt)
        Pw = band(w, kw, sw, pw, ow, mdt)
        xin = x if int8_in else x.astype(jnp.float32)
        y = jnp.einsum("oh,nhwc->nowc", Ph, xin,
                       preferred_element_type=acc)
        y = jnp.einsum("pw,nowc->nopc", Pw, y,
                       preferred_element_type=acc)
        if int8_in:
            s = (q["x_scale"] / q["y_scale"]) / denom
            return [jnp.clip(jnp.round(y.astype(jnp.float32) * s),
                             -127, 127).astype(jnp.int8)]
        y = y / denom
        return [_requant(y) if rq else y.astype(x.dtype)]
    if getattr(ctx.config, "avepool_dwconv", False):
        # same sums via the conv emitter (ones depthwise kernel); pad
        # contributes zeros exactly like reduce_window's 0 init
        c_ = x.shape[-1]
        int8_in = x.dtype == jnp.int8
        ones = jnp.ones((kh, kw, 1, c_),
                        jnp.int8 if int8_in else x.dtype)
        y = jax.lax.conv_general_dilated(
            x, ones, (sh, sw),
            ((ph, ph + extra_h), (pw, pw + extra_w)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c_,
            preferred_element_type=jnp.int32 if int8_in
            else jnp.float32)
        if rq:
            s = ((q["x_scale"] if int8_in else 1.0)
                 / q["y_scale"]) / denom
            return [jnp.clip(jnp.round(y.astype(jnp.float32) * s),
                             -127, 127).astype(jnp.int8)]
        yf = y.astype(jnp.float32) / denom
        if int8_in:
            # unreachable under current marking rules (AVE pools only see
            # int8 when requant-marked) — round+clip rather than silently
            # truncate toward zero if that invariant ever breaks
            return [jnp.clip(jnp.round(yf), -127, 127).astype(jnp.int8)]
        return [yf.astype(x.dtype)]
    if rq and x.dtype == jnp.int8:
        # int8 requant path accumulates in int32 (<=k*k*127 fits with
        # room) and folds x/y scales and the window denominators into
        # ONE f32 multiply — no f32 copy of the big input tensor
        # (ShuffleNet-v1 transition pools, bench/pool_micro.py:
        # exact to f32 rounding — the fused (sx/sy)/denom multiply can
        # differ from the two-step (sum/denom)*(sx/sy) by 1 LSB on exact
        # round-half boundaries; goldens pass.  0.138 -> ~0 ms isolated
        # at (128,28,28,240)).
        y = jax.lax.reduce_window(
            x.astype(jnp.int32), 0, jax.lax.add,
            window_dimensions=(1, kh, kw, 1),
            window_strides=(1, sh, sw, 1),
            padding=pad_cfg,
        )
        s = (q["x_scale"] / q["y_scale"]) / denom
        return [jnp.clip(jnp.round(y.astype(jnp.float32) * s),
                         -127, 127).astype(jnp.int8)]
    y = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=pad_cfg,
    )
    if rq:
        return [_requant(y / denom)]
    return [(y / denom).astype(x.dtype)]


# ----------------------------------------------------------------------
# Elementwise / shape ops
# ----------------------------------------------------------------------

@register_lowering("ReLU")
def _lower_relu(node, inputs, params, ctx):
    slope = node.attrs.get("negative_slope", 0.0)
    x = inputs[0]
    if slope:
        return [jnp.where(x > 0, x, x * jnp.asarray(slope, x.dtype))]
    return [jnp.maximum(x, 0)]


@register_lowering("ReLU6")
def _lower_relu6(node, inputs, params, ctx):
    return [jnp.clip(inputs[0], 0, 6)]


@register_lowering("PReLU")
def _lower_prelu(node, inputs, params, ctx):
    x = inputs[0]
    slope = params[0].astype(x.dtype)  # (C,) or scalar (channel_shared)
    return [jnp.where(x > 0, x, x * slope)]


@register_lowering("Sigmoid")
def _lower_sigmoid(node, inputs, params, ctx):
    return [jax.nn.sigmoid(inputs[0])]


@register_lowering("TanH")
def _lower_tanh(node, inputs, params, ctx):
    return [jnp.tanh(inputs[0])]


@register_lowering("ELU")
def _lower_elu(node, inputs, params, ctx):
    alpha = node.attrs.get("alpha", 1.0)
    return [jax.nn.elu(inputs[0], alpha=alpha)]


@register_lowering("AbsVal")
def _lower_abs(node, inputs, params, ctx):
    return [jnp.abs(inputs[0])]


@register_lowering("Exp")
def _lower_exp(node, inputs, params, ctx):
    return [jnp.exp(inputs[0])]


@register_lowering("Log")
def _lower_log(node, inputs, params, ctx):
    return [jnp.log(inputs[0])]


@register_lowering("BNLL")
def _lower_bnll(node, inputs, params, ctx):
    return [jax.nn.softplus(inputs[0])]


@register_lowering("Power")
def _lower_power(node, inputs, params, ctx):
    a = node.attrs
    x = inputs[0]
    y = x * a.get("scale", 1.0) + a.get("shift", 0.0)
    p = a.get("power", 1.0)
    if p != 1.0:
        y = jnp.power(y, p)
    return [y]


@register_lowering("Scale")
def _lower_scale(node, inputs, params, ctx):
    """Standalone per-channel affine (un-folded Scale/BatchNorm)."""
    x = inputs[0]
    q = ctx.qinfo(node)
    if q is not None and q.get("requant_int8"):
        # int8-edge affine (quant/rewrite.py requant_int8): dequant ->
        # affine -> act -> requant, all in f32 registers, XLA-fused —
        # keeps DenseNet-style Concat->BN->ReLU->Conv chains on int8.
        xf = (x.astype(jnp.float32) * q["x_scale"] if x.dtype == jnp.int8
              else x.astype(jnp.float32))
        y = xf * params[0].astype(jnp.float32)
        if node.attrs.get("bias_term", False) and len(params) > 1:
            y = y + params[1].astype(jnp.float32)
        y = apply_activation(y, node.attrs.get("activation"))
        return [jnp.clip(jnp.round(y / q["y_scale"]), -127, 127)
                .astype(jnp.int8)]
    if len(inputs) > 1:
        # two-bottom Scale (Caffe ScaleLayer with a runtime scaler,
        # e.g. SE gates): broadcast bottom[1] ((N,C) or (N,1,1,C))
        # over bottom[0]'s spatial dims; params[0], when present, is
        # the learned BIAS (Caffe stores only the bias blob in this
        # form — the scale comes from the bottom).
        gamma = inputs[1]
        if gamma.ndim < x.ndim:
            gamma = gamma.reshape((gamma.shape[0],)
                                  + (1,) * (x.ndim - gamma.ndim)
                                  + gamma.shape[1:])
        y = x * gamma.astype(x.dtype)
        if node.attrs.get("bias_term", False) and params:
            y = y + params[0].astype(x.dtype)
        return [apply_activation(y, node.attrs.get("activation"))]
    gamma = params[0].astype(x.dtype)
    y = x * gamma
    if node.attrs.get("bias_term", False) and len(params) > 1:
        y = y + params[1].astype(x.dtype)
    return [apply_activation(y, node.attrs.get("activation"))]


@register_lowering("Axpy")
def _lower_axpy(node, inputs, params, ctx):
    """SENet-Caffe Axpy: out = a*x + y, `a` a per-channel gate from the
    SE squeeze-excite path (global pool -> 1x1 down/up -> sigmoid).
    Accepts `a` as (N, 1, 1, C) or (N, C); fused trailing ReLU via the
    activation epilogue (passes.fuse_activation)."""
    s, x, y = inputs
    if s.ndim < x.ndim:
        s = s.reshape((s.shape[0],) + (1,) * (x.ndim - s.ndim)
                      + s.shape[1:])
    q = ctx.qinfo(node)
    if q is not None and q.get("axpy_int8"):
        # int8-edge form (quant/rewrite.py): x and y arrive int8 at
        # their calibrated scales (or float), the gate stays float;
        # dequant-multiply-accumulate in f32 registers, fused act,
        # requantize to the agreed output scale — the SE residual edge
        # costs 1 byte/elem like a plain ResNet shortcut.
        sx, sy = q["in_scales"]
        xf = (x.astype(jnp.float32) * sx if x.dtype == jnp.int8
              else x.astype(jnp.float32))
        yf = (y.astype(jnp.float32) * sy if y.dtype == jnp.int8
              else y.astype(jnp.float32))
        out = s.astype(jnp.float32) * xf + yf
        out = apply_activation(out, node.attrs.get("activation"))
        return [jnp.clip(jnp.round(out / q["y_scale"]), -127, 127)
                .astype(jnp.int8)]
    out = (s.astype(jnp.float32) * x.astype(jnp.float32)
           + y.astype(jnp.float32))
    out = apply_activation(out, node.attrs.get("activation"))
    return [out.astype(x.dtype)]


@register_lowering("Bias")
def _lower_bias(node, inputs, params, ctx):
    x = inputs[0]
    b = params[0] if params else inputs[1]
    return [x + b.astype(x.dtype)]


@register_lowering("BatchNorm")
def _lower_bn(node, inputs, params, ctx):
    """Inference BN with stored stats; normally rewritten by passes, kept
    for un-optimized graph execution (the oracle path)."""
    x = inputs[0]
    mean, var = params[0], params[1]
    eps = node.attrs.get("eps", 1e-5)
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    y = (x.astype(jnp.float32) - mean.astype(jnp.float32)) * inv
    return [y.astype(x.dtype)]


@register_lowering("Eltwise")
def _lower_eltwise(node, inputs, params, ctx):
    op = node.attrs.get("operation", "SUM")
    q = ctx.qinfo(node)
    if q is not None and q.get("eltwise_int8"):
        # int8-edge residual add: dequant-accumulate in f32 registers,
        # fused relu, requantize to the calibrated output scale.
        acc = None
        for x, s in zip(inputs, q["in_scales"]):
            xf = (x.astype(jnp.float32) * s if x.dtype == jnp.int8
                  else x.astype(jnp.float32))
            acc = xf if acc is None else acc + xf
        acc = apply_activation(acc, node.attrs.get("activation"))
        return [jnp.clip(jnp.round(acc / q["y_scale"]), -127, 127)
                .astype(jnp.int8)]
    if op == "SUM":
        coeffs = node.attrs.get("coeffs")
        if coeffs:
            y = sum(c * x for c, x in zip(coeffs, inputs))
        else:
            y = inputs[0]
            for x in inputs[1:]:
                y = y + x
    elif op == "PROD":
        y = inputs[0]
        for x in inputs[1:]:
            y = y * x
    elif op == "MAX":
        y = inputs[0]
        for x in inputs[1:]:
            y = jnp.maximum(y, x)
    else:
        raise ValueError(f"unknown Eltwise operation {op!r}")
    return [apply_activation(y, node.attrs.get("activation"))]


@register_lowering("Concat")
def _lower_concat(node, inputs, params, ctx):
    axis = node.attrs.get("axis", -1)
    q = ctx.qinfo(node)
    if q is not None and q.get("concat_int8"):
        # requantizing concat (quant/rewrite.py): each operand arrives
        # int8 at its own calibrated scale (rescale) or float (quantize);
        # the output carries ONE scale.  All elementwise — XLA fuses it
        # into the concat write, so the edge costs 1 byte/elem.
        y = q["y_scale"]
        parts = []
        for x, s in zip(inputs, q["in_scales"]):
            if x.dtype == jnp.int8:
                if s is not None and s != y:
                    x = jnp.clip(jnp.round(x.astype(jnp.float32) * (s / y)),
                                 -127, 127).astype(jnp.int8)
                parts.append(x)
            else:
                parts.append(jnp.clip(jnp.round(x.astype(jnp.float32) / y),
                                      -127, 127).astype(jnp.int8))
        return [jnp.concatenate(parts, axis=axis)]
    return [jnp.concatenate(inputs, axis=axis)]


def _ladder_quant_part(x, s, y_scale):
    """Quantize/rescale one ladder part onto the buffer grid (the same
    semantics as the requantizing concat, _lower_concat)."""
    if x.dtype == jnp.int8:
        if s is not None and s != y_scale:
            x = jnp.clip(jnp.round(x.astype(jnp.float32) * (s / y_scale)),
                         -127, 127).astype(jnp.int8)
        return x
    return jnp.clip(jnp.round(x.astype(jnp.float32) / y_scale),
                    -127, 127).astype(jnp.int8)


@register_lowering("LadderInit")
def _lower_ladder_init(node, inputs, params, ctx):
    """Concat-ladder rewrite (passes_ladder.py): materialize the chain's
    FINAL-width buffer once — parts first, zeros after.  int8 ladders
    quantize each part straight onto the single buffer grid."""
    q = ctx.qinfo(node)
    if q is not None and q.get("ladder_int8"):
        parts = [_ladder_quant_part(x, s, q["y_scale"])
                 for x, s in zip(inputs, q["in_scales"])]
    else:
        parts = list(inputs)
    filled = sum(p.shape[-1] for p in parts)
    pad = node.attrs["total"] - filled
    if pad > 0:
        shape = parts[0].shape[:-1] + (pad,)
        parts.append(jnp.zeros(shape, parts[0].dtype))
    return [jnp.concatenate(parts, axis=-1)]


@register_lowering("LadderAppend")
def _lower_ladder_append(node, inputs, params, ctx):
    """Append parts into the ladder buffer via dynamic_update_slice —
    XLA updates in place when buffer liveness allows, so the append
    writes k channels instead of re-materializing the whole prefix."""
    buf = inputs[0]
    q = ctx.qinfo(node)
    if q is not None and q.get("ladder_int8"):
        parts = [_ladder_quant_part(x, s, q["y_scale"])
                 for x, s in zip(inputs[1:], q["in_scales"])]
    else:
        parts = list(inputs[1:])
    off = node.attrs["offset"]
    for p in parts:
        idx = (0,) * (buf.ndim - 1) + (off,)
        buf = jax.lax.dynamic_update_slice(buf, p.astype(buf.dtype), idx)
        off += p.shape[-1]
    return [buf]


@register_lowering("LadderView")
def _lower_ladder_view(node, inputs, params, ctx):
    """Offset-0 prefix slice of the channel-minor axis — contiguous, no
    relayout; identity at the chain's final width."""
    x = inputs[0]
    c = node.attrs["channels"]
    if c == x.shape[-1]:
        return [x]
    return [jax.lax.slice_in_dim(x, 0, c, axis=x.ndim - 1)]


@register_lowering("Slice")
def _lower_slice(node, inputs, params, ctx):
    x = inputs[0]
    axis = node.attrs.get("axis", -1) % x.ndim
    total = x.shape[axis]
    points = list(node.attrs.get("slice_points", []))
    if not points:
        k = len(node.outputs)
        points = [total // k * i for i in range(1, k)]
    if (ctx.config.shuffle_matmul and axis == x.ndim - 1
            and any(p % 128 for p in points)):
        # Channel slices at sub-128-lane offsets relayout (ShuffleNet-
        # v2's half-split at C/2=58); under shuffle_matmul those pieces
        # run as selection matmuls on the MXU instead — exact (one
        # nonzero per column), same as the ShuffleChannel form.  The
        # offset-0 piece keeps the plain (free, contiguous) slice.
        bounds = [0] + points + [total]
        outs = []
        x2 = x.reshape(-1, total)
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            if lo % 128 == 0:
                outs.append(jax.lax.slice_in_dim(x, lo, hi,
                                                 axis=x.ndim - 1))
                continue
            sel = np.zeros((total, hi - lo), np.float32)
            sel[np.arange(lo, hi), np.arange(hi - lo)] = 1.0
            shp = x.shape[:-1] + (hi - lo,)
            if x.dtype == jnp.int8:
                y = jnp.dot(x2.astype(jnp.bfloat16),
                            jnp.asarray(sel, jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                outs.append(y.astype(jnp.int8).reshape(shp))
            else:
                y = jnp.dot(x2, jnp.asarray(sel, x.dtype),
                            precision=jax.lax.Precision.HIGHEST)
                outs.append(y.astype(x.dtype).reshape(shp))
        return outs
    return list(jnp.split(x, points, axis=axis))


@register_lowering("Softmax")
def _lower_softmax(node, inputs, params, ctx):
    axis = node.attrs.get("axis", -1)
    xf = inputs[0].astype(jnp.float32)
    if inputs[0].dtype != jnp.float32:
        # Backend miscompile (measured on the v5e tunnel): when the
        # low-precision->f32 upcast fuses into the softmax, the
        # compiled kernel loses the max-subtraction and exp overflows
        # to inf/inf = NaN for |logits| > ~88 (R-FCN's random-weight
        # vote logits hit ±1e6).  A barrier after the upcast keeps the
        # stable form; pure-f32 inputs compile correctly.
        xf = jax.lax.optimization_barrier(xf)
    return [jax.nn.softmax(xf, axis=axis).astype(inputs[0].dtype)]


@register_lowering("LRN")
def _lower_lrn(node, inputs, params, ctx):
    """Local response normalization across channels (GoogLeNet/AlexNet).
    y = x / (k + alpha/n * sum_{local} x^2)^beta — channel axis is last.

    int8-edge mode (quant/rewrite.py requant_int8): dequant -> LRN ->
    requant, so the big stem-sized edges around the norm stay 1 byte/elem
    instead of 2-4."""
    q = ctx.qinfo(node)
    if q is not None and q.get("requant_int8"):
        xf = (inputs[0].astype(jnp.float32) * q["x_scale"]
              if inputs[0].dtype == jnp.int8
              else inputs[0].astype(jnp.float32))
        inputs = [xf]
    x = inputs[0].astype(jnp.float32)
    n = node.attrs.get("local_size", 5)
    alpha = node.attrs.get("alpha", 1e-4)
    beta = node.attrs.get("beta", 0.75)
    k = node.attrs.get("k", 1.0)
    sq = x * x
    half = n // 2
    C = x.shape[-1]
    if ctx.config.lrn_band and C >= n:
        # Channel-window sum as a banded matmul: the window slides along
        # the 128-lane minor axis, where reduce_window emits one lane
        # rotation per shift (measured 4.5-4.7 ms for ONE LRN at
        # (256,56,56,192) — the dominant cost of GoogLeNet's stem).  The
        # MXU form is a single (M, C) x (C, C) dot against the 0/1 band
        # B[i, j] = [j - half <= i <= j + n - 1 - half]; HIGHEST
        # precision keeps the <=n-term sums exact to f32 rounding.
        i = np.arange(C)
        d = i[:, None] - i[None, :]               # input idx - output idx
        band = ((d >= -half) & (d <= n - 1 - half)).astype(np.float32)
        sq2 = sq.reshape(-1, C)
        if ctx.config.compute_dtype == "bfloat16":
            # production bf16 mode: x arrived bf16, so a 1-pass bf16
            # dot's 2^-9 relative error on ssum matches the rest of the
            # net's precision; the f32-exact alternatives measured WORSE
            # whole-model (paired, GoogLeNet w8a8 b256): an explicit
            # bf16x2 hi/lo split costs ~5 extra HBM passes over the
            # stem-sized tensor (8.4k img/s vs 18.8k reduce_window!),
            # HIGHEST's multi-pass f32 dot keeps only +4.2%.
            ssum = jnp.dot(sq2.astype(jnp.bfloat16),
                           jnp.asarray(band, jnp.bfloat16),
                           preferred_element_type=jnp.float32
                           ).reshape(sq.shape)
        else:
            # f32 mode (CPU oracle/goldens): exact to f32 rounding
            ssum = jnp.dot(sq2, jnp.asarray(band),
                           precision=jax.lax.Precision.HIGHEST
                           ).reshape(sq.shape)
    else:
        # Sliding-window sum over the channel axis via reduce_window.
        ssum = jax.lax.reduce_window(
            sq, 0.0, jax.lax.add,
            window_dimensions=(1,) * (x.ndim - 1) + (n,),
            window_strides=(1,) * x.ndim,
            padding=((0, 0),) * (x.ndim - 1) + ((half, n - 1 - half),),
        )
    b = k + (alpha / n) * ssum
    # b^-beta for the common Caffe betas via rsqrt/sqrt instead of
    # pow = exp(-beta*log(b)): two transcendentals per element on a
    # stem-sized tensor is the dominant VPU cost of this op (GoogLeNet's
    # conv2+LRN ceiling segment measured at 20% of its physics floor).
    if beta == 0.75:
        r = jax.lax.rsqrt(b)
        scl = r * jnp.sqrt(r)                 # b^-1/2 * b^-1/4
    elif beta == 0.5:
        scl = jax.lax.rsqrt(b)
    else:
        scl = jax.lax.pow(b, -beta)
    y = x * scl
    if q is not None and q.get("requant_int8"):
        return [jnp.clip(jnp.round(y / q["y_scale"]), -127, 127)
                .astype(jnp.int8)]
    return [y.astype(inputs[0].dtype)]


@register_lowering("ShuffleChannel")
def _lower_shuffle_channel(node, inputs, params, ctx):
    """ShuffleNet channel shuffle: view channels as (group, c/group),
    transpose, flatten — output channel j*g+i reads input i*(c/g)+j
    (the caffe-ShuffleNet fork's ShuffleChannelLayer semantics).  A pure
    permutation: dtype-agnostic, so int8 edges ride through unchanged
    (quant/rewrite.py lists it scale-transparent)."""
    x = inputs[0]
    g = int(node.attrs.get("group", 1))
    if g == 1:
        return [x]
    lead, c = x.shape[:-1], x.shape[-1]
    if ctx.config.shuffle_matmul:
        # One-hot permutation matmul (EngineConfig.shuffle_matmul): the
        # channel axis is the 128-lane minor dim and ShuffleNet's counts
        # sit UNDER 128 lanes, where the reshape/transpose relayout is
        # lane-shuffle-bound; x @ P runs on the MXU instead.  Exact in
        # every dtype — each output column has exactly one nonzero, so
        # there is no accumulation (int8 values <=127 are exact in bf16;
        # the f32 result is the input value itself).
        perm = np.arange(c).reshape(g, c // g).T.ravel()
        p = np.zeros((c, c), np.float32)
        p[perm, np.arange(c)] = 1.0
        x2 = x.reshape(-1, c)
        if x.dtype == jnp.int8:
            y = jnp.dot(x2.astype(jnp.bfloat16),
                        jnp.asarray(p, jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            return [y.astype(jnp.int8).reshape(lead + (c,))]
        y = jnp.dot(x2, jnp.asarray(p, x.dtype),
                    precision=jax.lax.Precision.HIGHEST)
        return [y.astype(x.dtype).reshape(lead + (c,))]
    x = x.reshape(lead + (g, c // g))
    x = jnp.swapaxes(x, -1, -2)
    return [x.reshape(lead + (c,))]


@register_lowering("MVN")
def _lower_mvn(node, inputs, params, ctx):
    """Caffe MVNLayer: per-image mean (and optionally variance)
    normalization — across_channels picks C+H+W vs per-channel H+W."""
    x = inputs[0].astype(jnp.float32)
    axes = (1, 2, 3) if node.attrs.get("across_channels") else (1, 2)
    if x.ndim == 2:
        axes = (1,)
    mean = jnp.mean(x, axis=axes, keepdims=True)
    y = x - mean
    if node.attrs.get("normalize_variance", True):
        # Caffe divides by stddev + eps (not sqrt(var + eps))
        std = jnp.sqrt(jnp.mean(y * y, axis=axes, keepdims=True))
        y = y / (std + node.attrs.get("eps", 1e-9))
    return [y.astype(inputs[0].dtype)]


@register_lowering("Tile")
def _lower_tile(node, inputs, params, ctx):
    """Caffe TileLayer: whole-block repeat along one axis
    ([A,B] x2 -> [A,B,A,B])."""
    x = inputs[0]
    axis = node.attrs.get("axis", -1) % x.ndim
    tiles = int(node.attrs.get("tiles", 1))
    reps = [1] * x.ndim
    reps[axis] = tiles
    return [jnp.tile(x, reps)]


@register_lowering("Reduction")
def _lower_reduction(node, inputs, params, ctx):
    """Caffe ReductionLayer: SUM/ASUM/SUMSQ/MEAN over all dims >= axis
    (NCHW terms), scaled by coeff.  Rank-4 NHWC inputs transpose to NCHW
    first so the output keeps Caffe's dim order."""
    x = inputs[0].astype(jnp.float32)
    if x.ndim == 4:
        x = jnp.transpose(x, (0, 3, 1, 2))
    axis = int(node.attrs.get("axis", 0))
    op = node.attrs.get("operation", "SUM")
    axes = tuple(range(axis, x.ndim))
    if op == "ASUM":
        y = jnp.sum(jnp.abs(x), axis=axes)
    elif op == "SUMSQ":
        y = jnp.sum(x * x, axis=axes)
    elif op == "MEAN":
        y = jnp.mean(x, axis=axes)
    elif op == "SUM":
        y = jnp.sum(x, axis=axes)
    else:
        raise ValueError(f"unknown Reduction operation {op!r}")
    coeff = node.attrs.get("coeff", 1.0)
    if coeff != 1.0:
        y = y * coeff
    return [y]


@register_lowering("Threshold")
def _lower_threshold(node, inputs, params, ctx):
    """Caffe ThresholdLayer: y = (x > threshold) as 0/1 floats."""
    t = node.attrs.get("threshold", 0.0)
    x = inputs[0]
    return [(x > jnp.asarray(t, x.dtype)).astype(x.dtype)]


@register_lowering("Flatten")
def _lower_flatten(node, inputs, params, ctx):
    x = inputs[0]
    return [x.reshape(x.shape[0], -1)]


@register_lowering("Reshape")
def _lower_reshape(node, inputs, params, ctx):
    shape = list(node.attrs["shape"])
    for i, d in enumerate(shape):
        if d == 0:   # Caffe ReshapeLayer: copy the input dim (batch-safe
            shape[i] = inputs[0].shape[i]  # under run-time retrace)
    return [inputs[0].reshape(shape)]      # jnp resolves a single -1


@register_lowering("Dropout")
def _lower_dropout(node, inputs, params, ctx):
    return [inputs[0]]


@register_lowering("Split")
def _lower_split(node, inputs, params, ctx):
    return [inputs[0] for _ in node.outputs]
