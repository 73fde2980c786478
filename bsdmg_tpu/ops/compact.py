"""On-device stream compaction: mask -> prefix-sum -> scatter.

The reference writes INFINITY/NaN sentinels from the kernel and compacts on
the **CPU** with ``Vec::retain`` after a blocking D2H copy
(src/cuda/mod.rs:184-194, cuda/modules/compute_mesh_generation.cu:53-57).
On TPU we keep everything on device: a boolean mask turns into scatter
destinations via an exclusive prefix sum, and rejected rows are dropped by
XLA's out-of-bounds-scatter drop mode. Only the scalar count ever needs to
reach the host (to size the next stage's static shapes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compact(
    data: jax.Array, mask: jax.Array, capacity: int | None = None, fill=0
):
    """Gather ``data[mask]`` to the front of a fixed-capacity buffer.

    Args:
      data: ``(N, ...)`` rows.
      mask: ``(N,)`` boolean keep-mask.
      capacity: output row count (defaults to ``N``). Rows beyond the kept
        count are ``fill``; if more than ``capacity`` rows are kept, the
        overflow is dropped (callers should check ``count``).
      fill: fill value for unused rows.

    Returns:
      ``(out, count)`` — ``out`` has shape ``(capacity, ...)``; ``count`` is
      the int32 number of kept rows (clipped to capacity in ``out`` but not in
      the returned count, so overflow is detectable).
    """
    n = data.shape[0]
    if capacity is None:
        capacity = n
    mask = mask.astype(jnp.int32)
    positions = jnp.cumsum(mask) - mask  # exclusive prefix sum
    count = positions[-1] + mask[-1] if n > 0 else jnp.int32(0)

    # rejected rows scatter to index `capacity`, which mode='drop' discards
    dest = jnp.where(mask.astype(bool), positions, capacity)
    out = jnp.full((capacity,) + data.shape[1:], fill, dtype=data.dtype)
    out = out.at[dest].set(data, mode="drop")
    return out, count.astype(jnp.int32)


def compact_multi(arrays, mask: jax.Array, capacity: int | None = None):
    """Compact several same-length arrays with one shared mask.

    Shares the prefix sum across arrays. Returns ``(tuple_of_out, count)``.
    """
    n = mask.shape[0]
    if capacity is None:
        capacity = n
    maski = mask.astype(jnp.int32)
    positions = jnp.cumsum(maski) - maski
    count = (positions[-1] + maski[-1]) if n > 0 else jnp.int32(0)
    dest = jnp.where(mask, positions, capacity)

    outs = []
    for data in arrays:
        out = jnp.zeros((capacity,) + data.shape[1:], dtype=data.dtype)
        outs.append(out.at[dest].set(data, mode="drop"))
    return tuple(outs), count.astype(jnp.int32)
