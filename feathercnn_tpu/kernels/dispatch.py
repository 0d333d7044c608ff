"""Per-layer kernel selection — the ConvBooster::SelectAlgo analog.

The reference picks an algorithm per conv layer at Init time from the layer
shape (group==channels -> DEPTHWISE; 3x3 s1 -> WINOGRADF63; else IM2COL)
and binds Init/Forward function pointers ([pub] src/booster/arm/booster.cpp).
Here the choice happens at trace time and emits the corresponding Pallas
call (or an XLA conv where that is measurably faster / more general):

  depthwise      group == C_in           -> kernels/depthwise.py (VPU)
  gemm1x1        1x1 kernel              -> kernels/matmul.py (MXU)
  implicit       kxk, stride 1-2, g=1    -> kernels/conv.py (MXU implicit GEMM)
  winograd       3x3 s1 (fp, large C)    -> kernels/winograd.py F(6x6,3x3)
  xla            dilation/odd groups/tiny C, and all fp convs by default
                 (XLA's own conv emitter wins for fp; Pallas owns the
                 quantized paths XLA has no kernels for)

EngineConfig.algo_overrides forces a choice per layer name, like the
reference's compile-time algo switches.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .conv import conv2d_implicit_gemm
from .depthwise import depthwise_conv2d
from .matmul import matmul_epilogue

__all__ = ["select_algo", "conv_forward", "fc_forward"]


def _hparams(node):
    a = node.attrs
    kh = a.get("kernel_h", a.get("kernel_size", 1))
    kw = a.get("kernel_w", a.get("kernel_size", 1))
    sh = a.get("stride_h", a.get("stride", 1))
    sw = a.get("stride_w", a.get("stride", 1))
    ph = a.get("pad_h", a.get("pad", 0))
    pw = a.get("pad_w", a.get("pad", 0))
    return kh, kw, sh, sw, ph, pw, a.get("dilation", 1), a.get("group", 1)


def select_algo(node, cin: int, quant: bool) -> str:
    kh, kw, sh, sw, ph, pw, dil, group = _hparams(node)
    if group == cin and group > 1:
        return "depthwise"
    if group != 1 or dil != 1 or sh != sw:
        return "xla"
    if kh == 1 and kw == 1:
        return "gemm1x1" if quant else "xla"
    if quant and sh in (1, 2) and cin >= 16:
        return "implicit"
    return "xla"


def _dequant_weight(w, q, dtype):
    if w.dtype == jnp.int8 and q is not None:
        return (w.astype(jnp.float32)
                * q["w_scale"].reshape((1,) * (w.ndim - 1) + (-1,))
                ).astype(dtype)
    return w.astype(dtype)


def _quantize_act(x, x_scale: float):
    if x.dtype == jnp.int8:   # int8 edge: producer already requantized
        return x
    return jnp.clip(jnp.round(x.astype(jnp.float32) / x_scale),
                    -127, 127).astype(jnp.int8)


def _dequant_int8_edge(x, q, ctx):
    """A float conv path handed an int8 tensor dequantizes it: either a
    serving-transferred int8 input into an fp-act stem (input_scale) or,
    defensively, a stray int8 edge (x_scale)."""
    if x.dtype != jnp.int8:
        return x
    xs_scale = (q.get("x_scale") or q.get("input_scale", 1.0)) if q else 1.0
    return (x.astype(jnp.float32) * xs_scale).astype(
        jnp.dtype(ctx.config.compute_dtype))


def _out_spec(x, q):
    """(out_dtype, out_scale) for the epilogue: int8 when the int8-edge
    pass marked this node, else the float compute dtype."""
    if q is not None and q.get("emit_int8"):
        return jnp.int8, 1.0 / q["y_scale"]
    return (jnp.bfloat16 if x.dtype == jnp.int8 else x.dtype), 1.0


def conv_forward(node, x, w, bias, ctx):
    kh, kw, sh, sw, ph, pw, dil, group = _hparams(node)
    act = node.attrs.get("activation")
    segs = node.attrs.get("act_segments")
    q = ctx.qinfo(node)
    cin = x.shape[-1]
    algo = ctx.config.algo_for(node.name) or select_algo(
        node, cin * group if group > 1 else cin, q is not None)
    if segs is not None and algo != "dot1x1":
        # per-channel activation segments (merged sibling convs) are an
        # XLA-epilogue feature; the Pallas kernels take one static act
        # (dot1x1 handles segments itself)
        algo = "xla"
    interpret = ctx.config.interpret

    if x.dtype == jnp.int8 and (q is None or q.get("x_scale") is None):
        # int8-transferred input into an fp-act layer (input_scale) or a
        # stray int8 edge: dequantize ONCE here so every algo branch
        # below sees float input (they key their int8 paths on x_scale)
        x = _dequant_int8_edge(x, q, ctx)

    if algo == "depthwise":
        # The VPU kernel handles the MobileNet/Caffe case: group == C_in,
        # C_out == group (channel multiplier 1), square stride 1-2.
        if group == x.shape[-1] and node.attrs["num_output"] == group \
                and dil == 1 and sh == sw and sh in (1, 2):
            x = _dequant_int8_edge(x, q, ctx)
            wd = _dequant_weight(w, q, jnp.float32)
            y = depthwise_conv2d(x, wd.reshape(kh, kw, -1), bias,
                                 stride=sh, pad_h=ph, pad_w=pw,
                                 activation=act, interpret=interpret)
            return y
        algo = "xla"

    if algo == "gemm1x1" and kh == 1 and kw == 1:
        xs = x
        if ph or pw:  # pad before the stride slice (conv semantics)
            xs = jnp.pad(xs, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
        if sh > 1 or sw > 1:
            xs = xs[:, ::sh, ::sw, :]
        N, OH, OW, C = xs.shape
        x2 = xs.reshape(N * OH * OW, C)
        kwargs = {}
        if q is not None and w.dtype == jnp.int8:
            kwargs["w_scale"] = q["w_scale"]
            if q.get("x_scale") is not None:
                x2 = _quantize_act(x2, q["x_scale"])
                kwargs["x_scale"] = float(q["x_scale"])
        out_dtype, out_scale = _out_spec(x, q)
        y = matmul_epilogue(x2, w.reshape(C, -1), bias, activation=act,
                            out_dtype=out_dtype, out_scale=out_scale,
                            interpret=interpret, **kwargs)
        return y.reshape(N, OH, OW, -1)

    if algo == "dot1x1" and kh == 1 and kw == 1 and group == 1:
        # 1x1 conv expressed as an explicit matmul — probes whether XLA's
        # dot emitter beats its conv emitter for pointwise layers
        # (measurement algo; select via algo_overrides)
        xs = x
        if ph or pw:
            xs = jnp.pad(xs, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
        if sh > 1 or sw > 1:
            xs = xs[:, ::sh, ::sw, :]
        N, OH, OW, C = xs.shape
        x2 = xs.reshape(N * OH * OW, C)
        if q is not None and w.dtype == jnp.int8 \
                and q.get("x_scale") is not None:
            x2 = _quantize_act(x2, q["x_scale"])
            acc = jnp.dot(x2, w.reshape(C, -1),
                          preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * (q["w_scale"] * q["x_scale"])
        else:
            x2 = _dequant_int8_edge(x2, q, ctx)
            wd = _dequant_weight(w, q, x2.dtype).reshape(C, -1)
            y = jnp.dot(x2, wd, preferred_element_type=jnp.float32)
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        if segs is not None:
            from ..ops.lowering import apply_act_segments
            y = apply_act_segments(y, segs)
        elif act == "relu":
            y = jnp.maximum(y, 0)
        elif act == "relu6":
            y = jnp.clip(y, 0, 6)
        out_dtype, out_scale = _out_spec(x, q)
        if out_dtype == jnp.int8:
            y = jnp.clip(jnp.round(y * out_scale), -127, 127)
        return y.astype(out_dtype).reshape(N, OH, OW, -1)

    if algo == "winograd":
        if kh == 3 and kw == 3 and sh == sw == 1 and dil == 1 and group == 1:
            from .winograd import winograd_conv2d
            kwargs = {}
            if q is not None and w.dtype == jnp.int8:
                kwargs["w_scale"] = q["w_scale"]
            out_dtype, _ = _out_spec(x, q)
            if out_dtype == jnp.int8:   # winograd path keeps float edges
                out_dtype = jnp.bfloat16 if x.dtype != jnp.float32 \
                    else jnp.float32
            xs = x if x.dtype != jnp.int8 else (
                x.astype(jnp.float32) * q["x_scale"]).astype(jnp.bfloat16)
            return winograd_conv2d(xs, w, bias, pad_h=ph, pad_w=pw,
                                   activation=act, out_dtype=out_dtype,
                                   **kwargs)
        algo = "xla"

    if algo == "implicit":
        kwargs = {}
        xs = x
        if q is not None and w.dtype == jnp.int8:
            kwargs["w_scale"] = q["w_scale"]
            if q.get("x_scale") is not None:
                xs = _quantize_act(x, q["x_scale"])
                kwargs["x_scale"] = float(q["x_scale"])
            wk = w
        else:
            wk = w.astype(x.dtype)
        out_dtype, out_scale = _out_spec(x, q)
        y = conv2d_implicit_gemm(xs, wk, bias, stride=sh, pad_h=ph,
                                 pad_w=pw, activation=act,
                                 out_dtype=out_dtype, out_scale=out_scale,
                                 interpret=interpret, **kwargs)
        return y

    # XLA fallback (the reference's NAIVE/generic path — except here it is
    # XLA's heavily-optimized conv emitter, used for all fp convs).  With
    # full-int8 quant info the conv itself runs int8 x int8 -> int32 on the
    # MXU and the dequant happens in the (XLA-fused) epilogue.
    if (q is not None and w.dtype == jnp.int8
            and q.get("x_scale") is not None
            and (group == 1 or (ctx.config.int8_grouped and dil == 1))):
        xq = _quantize_act(x, q["x_scale"])
        acc = jax.lax.conv_general_dilated(
            xq, w, (sh, sw), ((ph, ph), (pw, pw)),
            rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=group,
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * (q["w_scale"] * q["x_scale"])
    else:
        x = _dequant_int8_edge(x, q, ctx)
        wd = _dequant_weight(w, q, x.dtype)
        y = jax.lax.conv_general_dilated(
            x, wd, (sh, sw), ((ph, ph), (pw, pw)),
            rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=group,
            preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if segs is not None:
        from ..ops.lowering import apply_act_segments
        y = apply_act_segments(y, segs)
    elif act == "relu":
        y = jnp.maximum(y, 0)
    elif act == "relu6":
        y = jnp.clip(y, 0, 6)
    out_dtype, out_scale = _out_spec(x, q)
    if out_dtype == jnp.int8:
        return jnp.clip(jnp.round(y * out_scale), -127, 127).astype(jnp.int8)
    return y.astype(out_dtype)


def fc_forward(node, x, w, bias, ctx):
    act = node.attrs.get("activation")
    q = ctx.qinfo(node)
    if x.dtype == jnp.int8 and (q is None or q.get("x_scale") is None):
        x = _dequant_int8_edge(x, q, ctx)
    kwargs = {}
    if q is not None and w.dtype == jnp.int8:
        kwargs["w_scale"] = q["w_scale"]
        if q.get("x_scale") is not None:
            x = _quantize_act(x, q["x_scale"])
            kwargs["x_scale"] = float(q["x_scale"])
    else:
        w = w.astype(x.dtype)
    out_dtype = x.dtype if x.dtype != jnp.int8 else jnp.bfloat16
    return matmul_epilogue(x, w, bias, activation=act, out_dtype=out_dtype,
                           interpret=ctx.config.interpret, **kwargs)
