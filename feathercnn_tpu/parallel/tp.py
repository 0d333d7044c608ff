"""Explicit channel tensor-parallelism via shard_map — the Megatron
column/row-parallel pattern restated for convolutions over ICI.

parallel/mesh.py gives the declarative version (NamedSharding + GSPMD
inserts collectives).  This module is the explicit counterpart for when
XLA's choices need overriding: shard_map bodies with hand-placed
collectives, compiled to ICI DMAs.

The pair (SURVEY.md §2.5):
  - column-parallel ("output-sharded"):  W sharded on C_out; every device
    holds the full input, computes its channel slice; no communication
    until/unless a gather is requested.
  - row-parallel ("input-sharded"): W sharded on C_in, input arrives
    channel-sharded (as produced by a column-parallel layer); partial
    results are combined with psum (or psum_scatter to stay sharded).

The reference has no analog — its only parallelism is OpenMP threads in
one address space ([pub] src/booster/arm/*.cpp pragmas).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["column_parallel_conv", "row_parallel_conv", "tp_conv_pair"]


def _conv_nhwc(x, w, stride, pad):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def column_parallel_conv(mesh: Mesh, axis: str, x, w, bias=None,
                         stride: int = 1, pad: int = 0,
                         gather_output: bool = False):
    """W (KH,KW,Cin,Cout) sharded on Cout over ``axis``; x replicated.
    Output channel-sharded (or all-gathered when gather_output)."""

    def body(x, w, b):
        y = _conv_nhwc(x, w, stride, pad)
        if b is not None:
            y = y + b.astype(y.dtype)
        if gather_output:
            y = jax.lax.all_gather(y, axis, axis=3, tiled=True)
        return y

    out_spec = P() if gather_output else P(None, None, None, axis)
    return jax.shard_map(
        body, mesh=mesh, check_vma=False,
        in_specs=(P(), P(None, None, None, axis),
                  P(axis) if bias is not None else P()),
        out_specs=out_spec,
    )(x, w, bias if bias is not None else jnp.zeros((), x.dtype))


def row_parallel_conv(mesh: Mesh, axis: str, x_sharded, w, bias=None,
                      stride: int = 1, pad: int = 0,
                      scatter_output: bool = False):
    """W sharded on Cin over ``axis``; x arrives channel-sharded (the
    output of a column-parallel layer).  Partial products are summed with
    psum (psum_scatter when the next layer is column-parallel again)."""

    def body(x, w, b):
        part = _conv_nhwc(x, w, stride, pad)
        if scatter_output:
            y = jax.lax.psum_scatter(part, axis, scatter_dimension=3,
                                     tiled=True)
        else:
            y = jax.lax.psum(part, axis)
        if b is not None:
            y = y + b.astype(y.dtype)
        return y

    out_spec = P(None, None, None, axis) if scatter_output else P()
    bias_spec = (P(axis) if scatter_output else P()) if bias is not None \
        else P()
    return jax.shard_map(
        body, mesh=mesh, check_vma=False,
        in_specs=(P(None, None, None, axis), P(None, None, axis, None),
                  bias_spec),
        out_specs=out_spec,
    )(x_sharded, w, bias if bias is not None else jnp.zeros((), jnp.float32))


def tp_conv_pair(mesh: Mesh, axis: str, x, w1, b1, w2, b2,
                 stride1: int = 1, pad1: int = 0,
                 stride2: int = 1, pad2: int = 0):
    """column-parallel conv1 -> ReLU -> row-parallel conv2: one psum total,
    activations stay channel-sharded over ICI in between (the Megatron MLP
    block shape, applied to convs)."""

    def body(x, w1, b1, w2, b2):
        h = _conv_nhwc(x, w1, stride1, pad1) + b1.astype(x.dtype)
        h = jnp.maximum(h, 0)
        part = _conv_nhwc(h, w2, stride2, pad2)
        y = jax.lax.psum(part, axis)
        return y + b2.astype(y.dtype)

    return jax.shard_map(
        body, mesh=mesh, check_vma=False,
        in_specs=(P(), P(None, None, None, axis), P(axis),
                  P(None, None, axis, None), P()),
        out_specs=P(),
    )(x, w1, b1, w2, b2)
