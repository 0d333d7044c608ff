"""Device-side timing utilities.

The axon-tunnel TPU backend makes host-side timing lie twice over:
``block_until_ready`` returns without waiting, and every dispatch costs
~1.5 ms of RPC.  ``device_bench`` therefore times N invocations inside a
single jitted ``lax.fori_loop`` (one dispatch, one true fetch), with the
first operand perturbed per-iteration to defeat loop-invariant hoisting.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

__all__ = ["device_bench"]


def device_bench(fn: Callable, args: Sequence, iters: int = 50,
                 warmup: int = 5) -> float:
    """Return seconds per invocation of ``fn(*args)`` measured device-side.

    ``fn`` must be jit-traceable; args[0] must be a float/int array whose
    values may be perturbed (timing-only)."""
    args = [jnp.asarray(a) if a is not None else None for a in args]

    @jax.jit
    def loop(args, n):
        def body(i, carry):
            a0 = args[0] + jnp.asarray(i % 3, args[0].dtype)
            out = fn(a0, *args[1:])
            if isinstance(out, (tuple, list, dict)):
                out = jax.tree_util.tree_leaves(out)[0]
            return carry + out.ravel()[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(loop(args, jnp.int32(warmup)))   # compile + warmup (fetch-synced)
    t0 = time.time()
    float(loop(args, jnp.int32(iters)))
    return (time.time() - t0) / iters
