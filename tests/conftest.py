"""Test harness config: force the CPU backend with 8 virtual devices.

Tests must run without a TPU (and without the axon tunnel, whose
sitecustomize registers the TPU plugin in every interpreter), so this file
pins jax to CPU *before any backend initialization* and exposes an 8-device
virtual mesh for the distributed/sharding tests — the TPU-native analog of
the reference exercising its kernels on the x86/AVX tree
([pub] src/booster/avx/) to test without an ARM device.
"""

import os

# Must be set before the first jax backend initialization.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Overrides the axon sitecustomize's "axon,cpu" platform list.
jax.config.update("jax_platforms", "cpu")

# 2-process CPU integration harness: test_multihost.py spawns children
# with the FEATHERCNN_* env triple; bring up the distributed control
# plane before any backend use (no-op without the env).
from feathercnn_tpu.parallel import maybe_initialize_distributed  # noqa: E402

maybe_initialize_distributed()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
