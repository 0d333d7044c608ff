"""Multi-process (multi-host) bring-up — the DCN control plane.

The reference is single-process ([pub] src/net.cpp); the TPU-native
deployment spans hosts, and JAX's control plane for that is
``jax.distributed.initialize`` (SURVEY.md §2.5 comm-backend row).  This
module is the one place that calls it, env-gated so the same entry
points (serve CLI, pytest) work single- and multi-process:

    FEATHERCNN_COORDINATOR=host:port   enables distributed init
    FEATHERCNN_NUM_PROCESSES=N
    FEATHERCNN_PROCESS_ID=i

On a pod slice the three variables come from the launcher; the
2-process CPU integration test (tests/test_multihost.py) sets them for
spawned children so the multihost branches actually execute in CI.
"""

from __future__ import annotations

import os

__all__ = ["maybe_initialize_distributed"]

_initialized = False


def maybe_initialize_distributed() -> bool:
    """Call ``jax.distributed.initialize`` when the FEATHERCNN_* env
    triple is set.  Must run before the first JAX backend use.  Returns
    True when running distributed (after this call,
    ``jax.process_count() > 1``); False for plain single-process runs.
    Idempotent."""
    global _initialized
    coord = os.environ.get("FEATHERCNN_COORDINATOR")
    if not coord:
        return False
    if _initialized:
        return True
    import jax
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(os.environ["FEATHERCNN_NUM_PROCESSES"]),
        process_id=int(os.environ["FEATHERCNN_PROCESS_ID"]),
    )
    _initialized = True
    return True
