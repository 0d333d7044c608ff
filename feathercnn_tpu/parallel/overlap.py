"""Collective/compute overlap: software-pipelined collective matmuls.

BASELINE.json:5 requires "allgather/reduce-scatter collectives overlapped
with conv compute".  XLA's latency-hiding scheduler overlaps async
collectives with independent compute when the dataflow allows it; these
helpers *restructure* the dataflow so it allows it — the classic
"collective matmul" decomposition (ring-pipelined):

- ``allgather_matmul``: y = all_gather(x, K-axis) @ W without ever
  materializing the gathered x: each ring step matmuls the chunk that
  just arrived while ``ppermute`` forwards it onward.  The permute of
  step s+1 is independent of the matmul of step s, so the scheduler can
  run them concurrently (ICI DMA vs MXU).
- ``matmul_reducescatter``: y_shard = reduce_scatter(x @ W_big) computed
  chunk-by-chunk: partial matmul for the chunk leaving this device first,
  accumulate-and-forward around the ring.

Used between column-parallel and row-parallel layers (parallel/tp.py)
when activations re-gather.  Correctness is mesh-size invariant and
tested on the virtual CPU mesh; wall-clock benefit needs real multi-chip
ICI (future round — single chip available this round).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["allgather_matmul", "matmul_reducescatter"]


def _ring_perm(n, reverse=False):
    if reverse:
        return [((i + 1) % n, i) for i in range(n)]
    return [(i, (i + 1) % n) for i in range(n)]


def allgather_matmul(mesh: Mesh, axis: str, x_sharded, w, bias=None,
                     activation=None, w_sharded_out: bool = False,
                     batch_axis=None):
    """x sharded on its last (K) axis over ``axis``; W (K, N) replicated.
    Returns the full y = x @ W on every device, with the K-chunk matmuls
    pipelined against the ring transfers.

    w_sharded_out=True is the Megatron column-parallel form the engine's
    TP path uses (ShardingConfig.ring_overlap): W arrives sharded on its
    OUTPUT axis (each device holds (K, N/n)), bias sharded likewise, and
    y returns sharded on N — the ring hides the x all-gather that GSPMD
    would otherwise emit as one blocking collective before the dot.

    ``batch_axis``: mesh axis x's LEADING (M) dim is DP-sharded over;
    the ring runs within each data-parallel group and M stays sharded
    (without it, the shard_map specs would silently all-gather the DP
    batch).  The engine passes its data axis whenever shard_batch holds.
    """
    n = mesh.shape[axis]

    def body(x_local, w, b):
        # w rows for the chunk originating at device d: w[d*kc:(d+1)*kc]
        kc = x_local.shape[-1]
        me = jax.lax.axis_index(axis)

        def w_rows(src):
            return jax.lax.dynamic_slice_in_dim(w, src * kc, kc, axis=0)

        acc = jnp.dot(x_local, w_rows(me),
                      preferred_element_type=jnp.float32)
        chunk = x_local
        for s in range(1, n):
            # forward the chunk we hold; receive the next one — the
            # permute is independent of this step's dot, so the
            # latency-hiding scheduler overlaps them.
            chunk = jax.lax.ppermute(chunk, axis, _ring_perm(n))
            src = (me - s) % n
            acc = acc + jnp.dot(chunk, w_rows(src),
                                preferred_element_type=jnp.float32)
        y = acc
        if b is not None:
            y = y + b
        if activation == "relu":
            y = jnp.maximum(y, 0)
        return y.astype(x_local.dtype)

    w_spec = P(None, axis) if w_sharded_out else P()
    b_spec = P(axis) if (w_sharded_out and bias is not None) else P()
    x_spec = P(batch_axis, axis)
    out_spec = P(batch_axis, axis) if w_sharded_out else P(batch_axis)
    return jax.shard_map(
        body, mesh=mesh, check_vma=False,
        in_specs=(x_spec, w_spec, b_spec),
        out_specs=out_spec,
    )(x_sharded, w, bias if bias is not None else jnp.zeros((), jnp.float32))


def matmul_reducescatter(mesh: Mesh, axis: str, x, w_sharded, bias=None):
    """x replicated (M, K); W sharded on N over ``axis`` is the usual
    column-parallel case (no comm).  This is the *row-parallel* closing
    step instead: x sharded on K, W sharded on K, output scattered on N —
    y_shard[d] = (sum_k x_k @ W_k)[:, d-th N chunk], computed as a ring of
    partial matmuls where each device accumulates into the flying chunk.

    Equivalent to psum_scatter(x_local @ w_local) but chunk-pipelined.
    """
    n = mesh.shape[axis]

    def body(x_local, w_local, b):
        # Partial product for ALL N columns, then ring-accumulate chunks.
        part = jnp.dot(x_local, w_local, preferred_element_type=jnp.float32)
        nc = part.shape[-1] // n
        me = jax.lax.axis_index(axis)

        def n_chunk(i):
            return jax.lax.dynamic_slice_in_dim(part, i * nc, nc, axis=-1)

        # Ring reduce-scatter: with forward permutes, device i starts
        # holding chunk (i-1) and at step s adds its contribution to the
        # chunk it just received — chunk (i-1-s) — so after n-1 steps it
        # holds its own fully-reduced chunk i.
        acc = n_chunk((me - 1) % n)
        for s in range(1, n):
            acc = jax.lax.ppermute(acc, axis, _ring_perm(n))
            acc = acc + n_chunk((me - 1 - s) % n)
        y = acc
        if b is not None:
            y = y + b
        return y.astype(x_local.dtype)

    return jax.shard_map(
        body, mesh=mesh, check_vma=False,
        in_specs=(P(None, axis), P(axis, None),
                  P(axis) if bias is not None else P()),
        out_specs=P(None, axis),
    )(x, w_sharded, bias if bias is not None else jnp.zeros((), jnp.float32))
