"""Halo exchange between spatial shards via ``jax.lax.ppermute``.

The reference is single-GPU (SURVEY.md section 2.7); spatial tiling across a
device mesh is a new, TPU-native axis of parallelism.  Every stencil stage
(flow smoothing, patch-cost frame-1 taps, tile upsampling) needs a ring of
neighbor rows/cols around its tile; this module exchanges those rings over
ICI with ``ppermute`` inside ``shard_map``.  At the mesh boundary the halo
is filled by edge replication, reproducing the global clamp-to-edge
addressing of the single-chip pipeline (CUDA texture clamp semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["halo_exchange_1d", "halo_exchange_2d"]


def _take(x: jnp.ndarray, start: int, size: int, dim: int) -> jnp.ndarray:
    idx = [slice(None)] * x.ndim
    idx[dim] = slice(start, start + size) if start >= 0 else slice(start, None)
    return x[tuple(idx)]


def _edge_replicate(x: jnp.ndarray, size: int, dim: int, first: bool):
    edge = _take(x, 0, 1, dim) if first else _take(x, -1, 1, dim)
    reps = [1] * x.ndim
    reps[dim] = size
    return jnp.tile(edge, reps)


def halo_exchange_1d(
    tile: jnp.ndarray,
    halo: int,
    axis_name: str,
    dim: int,
    boundary="edge",
) -> jnp.ndarray:
    """Pad ``tile`` with ``halo`` rows/cols along ``dim``, filled from the
    neighboring shards on mesh axis ``axis_name``.  Must run inside
    shard_map.

    ``boundary`` controls the fill at the global image border: "edge"
    replicates the border (CUDA texture clamp semantics, right for image
    data) while a float fills a constant (pass UNKNOWN_FLOW for flow
    fields, whose out-of-image taps the reference *skips* rather than
    clamps, refine_kernel.cu:781-783).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    lo_edge = _take(tile, 0, halo, dim)        # my first rows -> prev's tail
    hi_edge = _take(tile, -halo, halo, dim)    # my last rows  -> next's head
    if n > 1:
        fwd = [(i, i + 1) for i in range(n - 1)]   # i sends to i+1
        bwd = [(i + 1, i) for i in range(n - 1)]   # i+1 sends to i
        from_prev = jax.lax.ppermute(hi_edge, axis_name, fwd)
        from_next = jax.lax.ppermute(lo_edge, axis_name, bwd)
    else:
        from_prev = hi_edge
        from_next = lo_edge
    if boundary == "edge":
        lo_fill = _edge_replicate(tile, halo, dim, first=True)
        hi_fill = _edge_replicate(tile, halo, dim, first=False)
    else:
        lo_fill = jnp.full_like(lo_edge, boundary)
        hi_fill = jnp.full_like(hi_edge, boundary)
    top = jnp.where(idx == 0, lo_fill, from_prev)
    bottom = jnp.where(idx == n - 1, hi_fill, from_next)
    return jnp.concatenate([top, tile, bottom], axis=dim)


def halo_exchange_2d(
    tile: jnp.ndarray,
    halo: int,
    y_axis: str = "y",
    x_axis: str = "x",
    boundary="edge",
) -> jnp.ndarray:
    """Exchange a ``halo``-wide ring in both spatial dims (dims 0 and 1).

    Exchanging y first and then x over the already-extended rows makes the
    corner halos correct (the x-neighbors' y-halos ride along)."""
    tile = halo_exchange_1d(tile, halo, y_axis, dim=0, boundary=boundary)
    return halo_exchange_1d(tile, halo, x_axis, dim=1, boundary=boundary)
