"""Multi-host tests (SURVEY.md §4 item 6): pytest-marked, run only on a
real pod slice where ``jax.distributed.initialize`` has been called (the
scaling-efficiency measurement doubles as the test).

On a single host everything here skips; the single-process equivalents
are covered by tests/test_parallel.py on the virtual mesh.
"""

import jax
import numpy as np
import pytest

multihost = pytest.mark.skipif(
    jax.process_count() < 2, reason="needs a multi-host pod slice")


@multihost
def test_multihost_dp_forward():
    from feathercnn_tpu import Engine, EngineConfig
    from feathercnn_tpu.models import resnet50
    from feathercnn_tpu.parallel import ShardingConfig

    n = len(jax.devices())
    eng = Engine(resnet50(batch=n * 8),
                 EngineConfig(compute_dtype="bfloat16",
                              sharding=ShardingConfig(mesh_shape=(n, 1))))
    x = np.zeros((n * 8, 224, 224, 3), np.float32)
    out = eng(x)
    assert out.shape[0] == n * 8


@multihost
def test_batch_plan_broadcast_agrees():
    from feathercnn_tpu.serve.server import broadcast_plan
    # every process must converge on process 0's plan
    plan = broadcast_plan(17 if jax.process_index() == 0 else 3)
    assert plan == 17


@multihost
def test_scaling_efficiency_measurement():
    """Throughput at N chips vs 1 chip — the >=85% gate (BASELINE.json:5).
    Records, does not assert hard (hardware-dependent)."""
    import time

    import jax.numpy as jnp

    from feathercnn_tpu import Engine, EngineConfig
    from feathercnn_tpu.models import resnet50
    from feathercnn_tpu.parallel import ShardingConfig

    n = len(jax.devices())
    per_chip = 32
    eng = Engine(resnet50(batch=n * per_chip, with_softmax=False),
                 EngineConfig(compute_dtype="bfloat16",
                              sharding=ShardingConfig(mesh_shape=(n, 1))))
    x = np.zeros((n * per_chip, 224, 224, 3), np.float32)
    eng(x)  # compile
    t0 = time.time()
    for _ in range(10):
        out = eng(x)
    _ = float(np.asarray(out).ravel()[0])
    dt = (time.time() - t0) / 10
    print(f"{n} chips: {n * per_chip / dt:.0f} img/s "
          f"({per_chip / dt:.0f} per chip)")
