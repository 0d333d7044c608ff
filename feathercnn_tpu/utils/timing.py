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

__all__ = ["default_extra_inputs", "device_bench", "engine_loop", "slope_time"]


def default_extra_inputs(graph):
    """name -> array for every graph input AFTER the first: ``im_info``
    gets [h, w, 1] rows from the first (image) input's spec, anything
    else zeros.  Single source for bench.py calibration and the timing
    loop so calibration data always matches what the loop feeds."""
    import numpy as np

    names = list(graph.inputs)
    spec0 = graph.inputs[names[0]]
    out = {}
    for nm in names[1:]:
        sp = graph.inputs[nm]
        if nm == "im_info" and len(spec0.shape) == 4:
            out[nm] = np.tile(np.asarray(
                [[spec0.shape[1], spec0.shape[2], 1.0]], np.float32),
                (sp.shape[0], 1))
        else:
            out[nm] = np.zeros(sp.shape, np.float32)
    return out


def engine_loop(eng, x=None, extras=None, reduce_all=False):
    """Build the canonical whole-model timing loop for an Engine.

    Returns ``(loop, params, x_device)`` where ``loop(params, x, n)``
    runs ``n`` forward passes inside one jitted ``lax.fori_loop`` with a
    per-iteration input perturbation (defeats LICM/CSE) and reduces to a
    single scalar whose fetch is the only true sync point.  Shared by
    bench.py, bench/batch_sweep.py, and tools/autotune.py --flags so the
    timing method lives in exactly one place.

    Multi-input engines: the FIRST graph input is the perturbed tensor;
    the rest come from ``extras`` (name -> array) or default heuristics
    (``im_info`` -> [h, w, 1], else zeros).

    ``reduce_all=True`` sums EVERY graph output into the carry instead of
    just the first — required when the graph's extra outputs keep interior
    nodes alive (bench/ceiling.py's truncated prefixes would otherwise be
    dead-code-eliminated down to the single summed output's cone).
    """
    import numpy as np

    fwd = eng._build_forward()
    params = eng._prepare_params()
    names = list(eng.graph.inputs)
    in_name = names[0]
    first_out = eng.graph.outputs[0]
    spec0 = eng.graph.inputs[in_name]
    if x is None:
        x = np.random.default_rng(0).normal(
            size=spec0.shape).astype(np.float32)
    defaults = default_extra_inputs(eng.graph)
    fixed = {}
    for nm in names[1:]:
        arr = (np.asarray(extras[nm], np.float32)
               if extras and nm in extras else defaults[nm])
        fixed[nm] = jax.device_put(jnp.asarray(arr))

    @jax.jit
    def loop(params, x, n):
        def body(i, carry):
            if x.dtype == jnp.int8:
                xi = x.at[(0,) * x.ndim].add(i.astype(jnp.int8))
            else:
                xi = x + jnp.asarray(i, x.dtype) * jnp.asarray(1e-6,
                                                               x.dtype)
            out = fwd(params, {in_name: xi, **fixed})
            # Reduce over the WHOLE output: a single element can be a
            # data-independent constant (DetectionOutput's img_id column),
            # which lets XLA dead-code the entire network.  The full-sum
            # reduction is <1 us at any output shape here.
            if reduce_all:
                return carry + sum(jnp.sum(v.astype(jnp.float32))
                                   for v in out.values())
            return carry + jnp.sum(out[first_out].astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    return loop, params, jax.device_put(jnp.asarray(x))


def slope_time(loop, params, xd, warm: int = 5, iters: int = 20) -> float:
    """Seconds per iteration from ONE T(long)-T(short) slope pair
    (cancels the tunnel's ~30-50 ms constant dispatch+fetch cost).
    Callers interleave/repeat and take medians — single pairs drift."""
    t0 = time.time()
    float(loop(params, xd, jnp.int32(warm)))
    t_short = time.time() - t0
    t0 = time.time()
    float(loop(params, xd, jnp.int32(warm + iters)))
    t_long = time.time() - t0
    return max(t_long - t_short, 1e-9) / iters


def device_bench(fn: Callable, args: Sequence, iters: int = 50,
                 warmup: int = 5) -> float:
    """Return seconds per invocation of ``fn(*args)`` measured device-side.

    Uses the SLOPE between two loop lengths: every dispatch+fetch through
    the tunnel costs a ~30-50 ms constant, so a single timed loop of N
    iterations overstates per-iteration time by const/N.  Timing
    T(short) and T(long) and dividing the difference cancels the
    constant exactly.

    ``fn`` must be jit-traceable; args[0] must be a float/int array whose
    values may be perturbed (timing-only)."""
    args = [jnp.asarray(a) if a is not None else None for a in args]

    @jax.jit
    def loop(args, n):
        def body(i, carry):
            a0 = args[0] + jnp.asarray(i % 3, args[0].dtype)
            out = fn(a0, *args[1:])
            # Reduce over EVERY output element: a single element can be
            # a data-independent constant (e.g. DetectionOutput's img_id
            # column), which lets XLA dead-code the entire computation
            # under test (measured: the SSD head "ran" in 0.0 ms).  The
            # full-sum reduction costs <1 us at any shape here.
            leaves = (jax.tree_util.tree_leaves(out)
                      if isinstance(out, (tuple, list, dict)) else [out])
            return carry + sum(jnp.sum(v.astype(jnp.float32))
                               for v in leaves)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(loop(args, jnp.int32(warmup)))   # compile + warmup (fetch-synced)
    n_short, n_long = max(1, warmup), max(1, warmup) + iters
    t0 = time.time()
    float(loop(args, jnp.int32(n_short)))
    t_short = time.time() - t0
    t0 = time.time()
    float(loop(args, jnp.int32(n_long)))
    t_long = time.time() - t0
    return max(t_long - t_short, 1e-9) / (n_long - n_short)
