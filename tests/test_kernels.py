"""Pallas kernel unit tests vs jnp reference ops (SURVEY.md §4 item 1).

Run in interpret mode on the CPU backend so CI needs no TPU — the analog
of the reference's AVX tree as a desktop test vehicle.  Tolerances tiered
by dtype: f32 1e-5, bf16 1e-2, int8 exact pre-dequant.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from feathercnn_tpu.kernels.matmul import matmul_epilogue


def _quant_w(w):
    ws = np.abs(w).max(axis=0) / 127.0
    wq = np.clip(np.round(w / ws), -127, 127).astype(np.int8)
    return wq, ws.astype(np.float32)


@pytest.mark.parametrize("shape", [(64, 64, 64), (200, 300, 170),
                                   (1, 131, 1000), (257, 128, 129)])
def test_matmul_f32_bias_relu(shape, rng):
    M, K, N = shape
    x = rng.normal(size=(M, K)).astype(np.float32)
    w = rng.normal(size=(K, N)).astype(np.float32)
    b = rng.normal(size=(N,)).astype(np.float32)
    y = matmul_epilogue(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                        activation="relu", interpret=True)
    ref = np.maximum(x @ w + b, 0)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=2e-5)


def test_matmul_bf16(rng):
    M, K, N = 128, 256, 192
    x = rng.normal(size=(M, K)).astype(np.float32)
    w = rng.normal(size=(K, N)).astype(np.float32)
    y = matmul_epilogue(jnp.asarray(x, jnp.bfloat16),
                        jnp.asarray(w, jnp.bfloat16), interpret=True)
    ref = x.astype(np.float32) @ w
    rel = np.abs(np.asarray(y, np.float32) - ref).max() / np.abs(ref).max()
    assert rel < 1e-2


def test_matmul_weight_only_int8(rng):
    M, K, N = 96, 160, 130
    x = rng.normal(size=(M, K)).astype(np.float32)
    w = rng.normal(size=(K, N)).astype(np.float32)
    b = rng.normal(size=(N,)).astype(np.float32)
    wq, ws = _quant_w(w)
    y = matmul_epilogue(jnp.asarray(x), jnp.asarray(wq), jnp.asarray(b),
                        w_scale=jnp.asarray(ws), activation="relu6",
                        interpret=True)
    ref = np.clip(x @ (wq.astype(np.float32) * ws) + b, 0, 6)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-4)


def test_matmul_full_int8_float_out(rng):
    M, K, N = 64, 96, 72
    x = rng.normal(size=(M, K)).astype(np.float32)
    w = rng.normal(size=(K, N)).astype(np.float32)
    wq, ws = _quant_w(w)
    xs = float(np.abs(x).max() / 127.0)
    xq = np.clip(np.round(x / xs), -127, 127).astype(np.int8)
    y = matmul_epilogue(jnp.asarray(xq), jnp.asarray(wq),
                        w_scale=jnp.asarray(ws), x_scale=xs,
                        out_dtype=jnp.float32, interpret=True)
    ref = (xq.astype(np.int32) @ wq.astype(np.int32)).astype(np.float32) \
        * (ws * xs)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)


def test_matmul_full_int8_requant_exact(rng):
    """int8-in int8-out must match the integer reference bit-exactly."""
    M, K, N = 64, 128, 64
    xq = rng.integers(-127, 128, size=(M, K)).astype(np.int8)
    wq = rng.integers(-127, 128, size=(K, N)).astype(np.int8)
    ws = (rng.random(N).astype(np.float32) + 0.5) * 1e-2
    xs, os = 3e-2, 0.7
    y = matmul_epilogue(jnp.asarray(xq), jnp.asarray(wq),
                        w_scale=jnp.asarray(ws), x_scale=xs,
                        out_dtype=jnp.int8, out_scale=os,
                        activation="relu", interpret=True)
    acc = (xq.astype(np.int32) @ wq.astype(np.int32)).astype(np.float32)
    ref = np.clip(np.round(np.maximum(acc * ws * xs, 0) * os), -127, 127)
    assert (np.asarray(y) == ref.astype(np.int8)).mean() > 0.999


def test_matmul_no_bias_matches(rng):
    """Regression: dummy epilogue vectors must span all N blocks (an
    undersized dummy read out-of-range blocks and hung real hardware)."""
    M, K, N = 64, 64, 2048  # many n-blocks with bn=1024 default
    x = rng.normal(size=(M, K)).astype(np.float32)
    w = rng.normal(size=(K, N)).astype(np.float32)
    y = matmul_epilogue(jnp.asarray(x), jnp.asarray(w), interpret=True)
    np.testing.assert_allclose(np.asarray(y), x @ w, rtol=1e-5, atol=1e-5)


# ----------------------------------------------------------------------
# greedy NMS: fixpoint and blocked forms vs the serial-scan oracle
# ----------------------------------------------------------------------

def _serial_greedy_nms(boxes, valid, thresh, plus_one=0.0):
    """Direct serial greedy scan (the reference semantics both kernel
    forms must reproduce exactly)."""
    def area(b):
        return max(b[2] - b[0] + plus_one, 0) * max(b[3] - b[1] + plus_one, 0)

    keep = []
    out = np.zeros(len(boxes), bool)
    for i, b in enumerate(boxes):
        if not valid[i]:
            continue
        ok = True
        for j in keep:
            a = boxes[j]
            iw = min(a[2], b[2]) - max(a[0], b[0]) + plus_one
            ih = min(a[3], b[3]) - max(a[1], b[1]) + plus_one
            inter = max(iw, 0) * max(ih, 0)
            iou = inter / max(area(a) + area(b) - inter, 1e-10)
            if iou > thresh:
                ok = False
                break
        if ok:
            keep.append(i)
            out[i] = True
    return out


@pytest.mark.parametrize("k,block,plus_one", [
    (37, 8, 0.0),        # K not a multiple of block (nor of 32)
    (64, 16, 1.0),       # pixel convention; K a multiple of 32
    (200, 64, 0.0),
    (200, 512, 0.0),     # block > K: single tile
])
def test_greedy_nms_blocked_matches_serial(rng, k, block, plus_one):
    from feathercnn_tpu.kernels.nms import (greedy_nms_bitpack,
                                            greedy_nms_blocked,
                                            greedy_nms_fixpoint)
    xy = rng.random((k, 2)).astype(np.float32) * 80
    wh = rng.random((k, 2)).astype(np.float32) * 40 + 1
    boxes = np.concatenate([xy, xy + wh], -1)
    valid = rng.random(k) > 0.1
    ref = _serial_greedy_nms(boxes, valid, 0.5, plus_one)
    fx = np.asarray(greedy_nms_fixpoint(jnp.asarray(boxes),
                                        jnp.asarray(valid), 0.5, plus_one))
    bl = np.asarray(greedy_nms_blocked(jnp.asarray(boxes),
                                       jnp.asarray(valid), 0.5, plus_one,
                                       block=block))
    bp = np.asarray(greedy_nms_bitpack(jnp.asarray(boxes),
                                       jnp.asarray(valid), 0.5, plus_one))
    np.testing.assert_array_equal(fx, ref)
    np.testing.assert_array_equal(bl, ref)
    np.testing.assert_array_equal(bp, ref)


def test_greedy_nms_bitpack_score_rank(rng):
    """scores= mode: rows in ARBITRARY order give the same greedy keep
    set as the sorted positional form (rank from scores, ties by
    position) — the contract sort-free candidate selection relies on."""
    from feathercnn_tpu.kernels.nms import greedy_nms_bitpack
    k = 73
    xy = rng.random((k, 2)).astype(np.float32) * 80
    wh = rng.random((k, 2)).astype(np.float32) * 40 + 1
    boxes = np.concatenate([xy, xy + wh], -1)
    scores = np.sort(rng.random(k).astype(np.float32))[::-1].copy()
    valid = rng.random(k) > 0.1
    ref = _serial_greedy_nms(boxes, valid, 0.5)
    # sorted rows + scores  ==  positional form
    got_sorted = np.asarray(greedy_nms_bitpack(
        jnp.asarray(boxes), jnp.asarray(valid), 0.5,
        scores=jnp.asarray(scores)))
    np.testing.assert_array_equal(got_sorted, ref)
    # shuffled rows + scores == unshuffled result
    perm = rng.permutation(k)
    got_shuf = np.asarray(greedy_nms_bitpack(
        jnp.asarray(boxes[perm]), jnp.asarray(valid[perm]), 0.5,
        scores=jnp.asarray(scores[perm])))
    np.testing.assert_array_equal(got_shuf, ref[perm])
    # duplicate scores: ties break by position, deterministically
    scores_t = np.round(scores * 8) / 8
    got_a = np.asarray(greedy_nms_bitpack(
        jnp.asarray(boxes), jnp.asarray(valid), 0.5,
        scores=jnp.asarray(scores_t)))
    assert got_a.dtype == bool and got_a.shape == (k,)


def test_greedy_nms_bitpack_leading_dims(rng):
    """(C, K, 4) batched bitpack form == per-slice serial greedy."""
    from feathercnn_tpu.kernels.nms import greedy_nms_bitpack
    C, K = 3, 50
    xy = rng.random((C, K, 2)).astype(np.float32) * 60
    wh = rng.random((C, K, 2)).astype(np.float32) * 30 + 1
    boxes = np.concatenate([xy, xy + wh], -1)
    valid = rng.random((C, K)) > 0.2
    got = np.asarray(greedy_nms_bitpack(jnp.asarray(boxes),
                                        jnp.asarray(valid), 0.4))
    for c in range(C):
        np.testing.assert_array_equal(
            got[c], _serial_greedy_nms(boxes[c], valid[c], 0.4))


def test_greedy_nms_blocked_leading_dims(rng):
    """(C, K, 4) batched form must equal per-slice serial greedy."""
    from feathercnn_tpu.kernels.nms import greedy_nms_blocked
    C, K = 3, 50
    xy = rng.random((C, K, 2)).astype(np.float32) * 60
    wh = rng.random((C, K, 2)).astype(np.float32) * 30 + 1
    boxes = np.concatenate([xy, xy + wh], -1)
    valid = rng.random((C, K)) > 0.2
    got = np.asarray(greedy_nms_blocked(jnp.asarray(boxes),
                                        jnp.asarray(valid), 0.4,
                                        block=16))
    for c in range(C):
        np.testing.assert_array_equal(
            got[c], _serial_greedy_nms(boxes[c], valid[c], 0.4))


def test_greedy_nms_dispatch_threshold(rng):
    """greedy_nms picks blocked only when K > 2*block; both paths agree."""
    from feathercnn_tpu.kernels import nms as nms_mod
    k = 100
    xy = rng.random((k, 2)).astype(np.float32) * 80
    wh = rng.random((k, 2)).astype(np.float32) * 40 + 1
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    valid = jnp.ones(k, bool)
    a = np.asarray(nms_mod.greedy_nms(boxes, valid, 0.5, block=0))
    b = np.asarray(nms_mod.greedy_nms(boxes, valid, 0.5, block=16))
    np.testing.assert_array_equal(a, b)
