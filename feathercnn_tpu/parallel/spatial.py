"""Spatial partitioning with halo exchange — the CNN analog of sequence /
context parallelism (SURVEY.md §2.5, §5).

Ring attention / Ulysses are N/A for CNNs (no sequences, no attention);
the honest equivalent for inputs too large for one chip is sharding the
feature map's H axis across devices and exchanging kernel_radius boundary
rows (the "halo") with ``jax.lax.ppermute`` before each conv — structurally
identical to ring context-parallelism: neighbor-only traffic over ICI,
overlap-able with compute.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["halo_exchange", "spatial_conv2d"]


def halo_exchange(x_local: jnp.ndarray, axis: str, halo_lo: int,
                  halo_hi: int) -> jnp.ndarray:
    """Inside shard_map: pad the local H-shard with neighbours' boundary
    rows.  Edge devices zero-pad (conv 'SAME' semantics at image borders).

    x_local: (N, H_local, W, C); returns (N, halo_lo+H_local+halo_hi, W, C).
    """
    idx = jax.lax.axis_index(axis)
    n = jax.lax.axis_size(axis)

    parts = []
    if halo_lo:
        # my top halo rows come from my upper neighbour's bottom rows
        from_above = jax.lax.ppermute(
            x_local[:, -halo_lo:], axis,
            perm=[(i, i + 1) for i in range(n - 1)])
        from_above = jnp.where(idx == 0, 0.0, from_above)
        parts.append(from_above)
    parts.append(x_local)
    if halo_hi:
        from_below = jax.lax.ppermute(
            x_local[:, :halo_hi], axis,
            perm=[(i + 1, i) for i in range(n - 1)])
        from_below = jnp.where(idx == n - 1, 0.0, from_below)
        parts.append(from_below)
    return jnp.concatenate(parts, axis=1)


def spatial_conv2d(mesh: Mesh, axis: str, x, w, bias=None,
                   stride: int = 1, pad: int = 0,
                   activation: Optional[str] = None):
    """Conv over an H-sharded input: halo exchange + local valid conv.

    x: (N, H, W, C) logically; sharded (None, axis, None, None).
    H and H/stride must divide the axis size.  Output stays H-sharded.
    """
    KH = w.shape[0]
    n_shards = mesh.shape[axis]
    H = x.shape[1]
    assert H % n_shards == 0, (H, n_shards)
    # Strided phase alignment: each shard's H_local must hold a whole
    # number of stride phases so that shard d's first output row
    # o0 = d*H_local/stride reads exactly from global input row
    # o0*stride - pad = d*H_local - pad — i.e. `pad` halo rows from the
    # neighbour above, and max(KH - stride - pad, 0) from below (the
    # strided window's last read sits stride-1 rows higher than the
    # dense one's).  H_local % stride != 0 would shift every following
    # shard's phase; re-shard or gather instead.
    h_local = H // n_shards
    assert h_local % stride == 0, (
        f"spatial_conv2d: H_local {h_local} must be divisible by "
        f"stride {stride} for per-shard phase alignment")

    def body(x_local, w, b):
        # Halo covers what the local output rows need beyond the shard:
        # with 'SAME'-style pad at the global edges handled by zeros.
        xh = halo_exchange(x_local, axis, pad, max(KH - stride - pad, 0))
        y = jax.lax.conv_general_dilated(
            xh, w, (stride, stride), ((0, 0), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(x_local.dtype)
        # when stride + pad > KH the bottom halo can't go negative, so
        # the valid conv may emit one extra row — crop to the shard's
        # phase-aligned output count
        y = y[:, :h_local // stride]
        if b is not None:
            y = y + b.astype(y.dtype)
        if activation == "relu":
            y = jnp.maximum(y, 0)
        return y

    return jax.shard_map(
        body, mesh=mesh, check_vma=False,
        in_specs=(P(None, axis), P(), P()),
        out_specs=P(None, axis),
    )(x, w, bias if bias is not None else jnp.zeros((), jnp.float32))
