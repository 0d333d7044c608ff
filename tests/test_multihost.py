"""Multi-process tests (SURVEY.md §4 item 6).

Two layers:

1. ``@multihost``-marked cases need ``jax.process_count() >= 2``.  On a
   pod slice the launcher provides that; in CI the spawner test below
   provides it with two REAL processes over a local coordinator
   (``jax.distributed.initialize`` via conftest's env-gated
   ``maybe_initialize_distributed``), 1 CPU device each — so the plan
   broadcast and the multi-process DP forward execute on every run,
   not just on pods (VERDICT round 1 item 3).
2. ``test_two_process_cpu_integration`` is that spawner: it fails if
   plan broadcast or multi-process DP forward breaks.
"""

import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

multihost = pytest.mark.skipif(
    jax.process_count() < 2, reason="needs >=2 processes (pod slice, or "
    "the spawner test provides it)")


@multihost
def test_multihost_dp_forward():
    """DP across processes: the global batch shards over a process-
    spanning mesh; outputs gather back over DCN (process_allgather)."""
    from feathercnn_tpu import Engine, EngineConfig
    from feathercnn_tpu.models import resnet50
    from feathercnn_tpu.parallel import ShardingConfig

    n = jax.device_count()
    cpu = jax.devices()[0].platform == "cpu"
    per_dev = 2 if cpu else 8
    batch = n * per_dev
    eng = Engine(resnet50(batch=batch, with_softmax=False),
                 EngineConfig(compute_dtype="bfloat16",
                              sharding=ShardingConfig(mesh_shape=(n, 1))))
    size = 64 if cpu else 224   # ForwardReshape analog keeps CPU CI fast
    x = np.random.default_rng(7).normal(
        size=(batch, size, size, 3)).astype(np.float32) * 0.1
    out = eng(x)
    assert out.shape == (batch, 1000)
    # gather the (partly non-addressable) global result to every host
    from jax.experimental import multihost_utils
    local = np.asarray(multihost_utils.process_allgather(
        out, tiled=True), np.float32)
    assert local.shape == (batch, 1000)
    assert np.isfinite(local).all()


@multihost
def test_batch_plan_broadcast_agrees():
    from feathercnn_tpu.serve.server import broadcast_plan

    # every process must converge on process 0's plan
    plan = broadcast_plan(17 if jax.process_index() == 0 else 3)
    assert plan == 17


@multihost
def test_scaling_efficiency_measurement():
    """Throughput at N chips vs 1 chip — the >=85% gate (BASELINE.json:5).
    Records, does not assert hard (hardware-dependent); meaningless on
    the CPU harness."""
    if jax.devices()[0].platform == "cpu":
        pytest.skip("scaling numbers are meaningless on the CPU harness")
    import time

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


def test_two_process_cpu_integration():
    """Spawn two real processes with jax.distributed.initialize over a
    local coordinator (1 CPU device each) and run the multihost cases
    above in both — executed coverage for broadcast_plan's multihost
    branch and the multi-process DP forward."""
    if jax.process_count() > 1:
        pytest.skip("already inside the multi-process harness")
    sock = socket.socket()
    sock.bind(("localhost", 0))
    port = sock.getsockname()[1]
    sock.close()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = {**os.environ,
               "FEATHERCNN_COORDINATOR": f"localhost:{port}",
               "FEATHERCNN_NUM_PROCESSES": "2",
               "FEATHERCNN_PROCESS_ID": str(pid),
               "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
               "JAX_PLATFORMS": "cpu",
               "PALLAS_AXON_POOL_IPS": ""}
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "pytest", "-q",
             os.path.join(root, "tests", "test_multihost.py"),
             "-k", "not two_process"],
            env=env, cwd=root, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=560)
            outs.append(out)
    finally:
        for p in procs:           # exact PIDs we started, never patterns
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        # dp_forward + plan broadcast RAN (scaling one skips on CPU)
        assert "2 passed" in out, out
