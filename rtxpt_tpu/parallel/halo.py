"""Halo exchange for cross-tile stencil passes under pixel-tile sharding.

SURVEY.md section 5 "distributed communication backend": when the image is
sharded over the mesh by row-slabs, stencil passes (denoiser a-trous, TAA
3x3 neighborhoods, ReSTIR spatial taps) need each chip's slab padded with
its neighbors' border rows. This is a `jax.lax.ppermute` ring exchange over
ICI — the TPU-native replacement for the reference's UAV-barrier "all data
visible to all threads" model (Sample.cpp:2349-2351).

Use inside `shard_map` bodies: arrays are the LOCAL slab (h_local, W, C).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def exchange_row_halo(x, halo: int, axis_name: str):
    """Pad a row-sharded local slab with `halo` rows from the mesh
    neighbors above and below (edge-clamped at the global image border).

    x: (h_local, W, ...) local shard inside shard_map.
    Returns (h_local + 2*halo, W, ...)."""
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)

    # send my TOP rows to the neighbor above (they become its bottom halo)
    up = [(i, (i - 1) % n) for i in range(n)]
    down = [(i, (i + 1) % n) for i in range(n)]
    from_below = jax.lax.ppermute(x[:halo], axis_name, up)
    from_above = jax.lax.ppermute(x[-halo:], axis_name, down)

    # clamp at the global borders: first shard's top halo = its own edge
    top_edge = jnp.repeat(x[:1], halo, axis=0)
    bot_edge = jnp.repeat(x[-1:], halo, axis=0)
    top = jnp.where((idx == 0), top_edge, from_above)
    bottom = jnp.where((idx == n - 1), bot_edge, from_below)
    return jnp.concatenate([top, x, bottom], axis=0)
