"""Persistent compiled-executable cache (SURVEY.md §5 checkpoint/resume).

The reference's restart path re-parses the .feathermodel and re-runs all
weight pre-transforms ([pub] src/net.cpp InitFromBuffer); the TPU analog's
expensive Init step is XLA/Mosaic compilation — over the axon tunnel a
single Mosaic kernel compile costs 0.5-80 s.  Enabling JAX's persistent
cache makes engine/bench/autotune restarts reuse compiled executables
across processes.
"""

from __future__ import annotations

import os
from typing import Optional

__all__ = ["enable_persistent_cache"]

_DEFAULT = os.path.expanduser("~/.cache/feathercnn_tpu/xla")


def enable_persistent_cache(path: Optional[str] = None) -> str:
    """Idempotently point JAX's compilation cache at ``path``."""
    import jax

    path = path or os.environ.get("FEATHERCNN_TPU_CACHE", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # Cache even when only one process compiles (default excludes some
    # single-host cases).
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return path
