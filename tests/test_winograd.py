"""Winograd F(6x6,3x3) tests: numerics vs direct conv, weight-only int8,
and dispatcher integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feathercnn_tpu import Engine, EngineConfig
from feathercnn_tpu.kernels.winograd import AT, BT, G, winograd_conv2d
from feathercnn_tpu.models.builder import GraphBuilder


def _ref(x, w, b=None, pad=1):
    y = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return np.asarray(y if b is None else y + b)


def test_winograd_identity_1d():
    """F(6,3) algebra: A^T ((G g) * (B^T d)) == 1-D conv for random g, d."""
    rng = np.random.default_rng(3)
    d = rng.normal(size=8)
    g = rng.normal(size=3)
    y = AT @ ((G @ g) * (BT @ d))
    ref = np.convolve(d, g[::-1], mode="valid")
    np.testing.assert_allclose(y, ref, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("shape", [(1, 8, 8, 4, 8, 1), (2, 13, 11, 8, 16, 1),
                                   (1, 6, 6, 3, 5, 0)])
def test_winograd_vs_direct(shape, rng):
    N, H, W, C, Co, p = shape
    x = rng.normal(size=(N, H, W, C)).astype(np.float32)
    w = rng.normal(size=(3, 3, C, Co)).astype(np.float32)
    b = rng.normal(size=(Co,)).astype(np.float32)
    y = np.asarray(winograd_conv2d(jnp.asarray(x), jnp.asarray(w),
                                   jnp.asarray(b), pad_h=p, pad_w=p))
    ref = _ref(x, w, b, pad=p)
    rel = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 1e-4


def test_winograd_int8_weights(rng):
    w = rng.normal(size=(3, 3, 8, 16)).astype(np.float32)
    ws = (np.abs(w).reshape(-1, 16).max(0) / 127).astype(np.float32)
    wq = np.clip(np.round(w / ws), -127, 127).astype(np.int8)
    x = rng.normal(size=(1, 12, 12, 8)).astype(np.float32)
    y = np.asarray(winograd_conv2d(
        jnp.asarray(x), jnp.asarray(wq), w_scale=jnp.asarray(ws),
        pad_h=1, pad_w=1))
    ref = _ref(x, wq.astype(np.float32) * ws, pad=1)
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-4


def test_dispatcher_winograd_algo(rng):
    """algo_overrides routes a 3x3 conv through the winograd kernel and
    matches the default path."""
    b = GraphBuilder("wg", seed=12)
    x = b.input("data", (1, 12, 12, 8))
    y = b.conv("c1", x, 16, 3, pad=1, relu=True)
    g = b.finish([y])
    xv = rng.normal(size=(1, 12, 12, 8)).astype(np.float32)
    ref = np.asarray(Engine(g)(xv))
    eng = Engine(g, EngineConfig(backend="pallas",
                                 algo_overrides=(("c1", "winograd"),)))
    out = np.asarray(eng(xv))
    # F(6,3) transform numerics: a handful of elements land near 5e-4
    # relative on unlucky draws (rng state depends on test order)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)
