"""Multi-chip scaling: pixel-tile data parallelism over a device mesh.

The reference's only parallelism axis is the on-GPU pixel grid
(dispatchRays(width,height), Sample.cpp:2289-2294; SURVEY.md section 2.7).
The TPU-native scaling model replicates scene+BVH in every chip's HBM and
shards pixels over the mesh with `shard_map`: each chip owns a contiguous
slab of the flattened pixel wavefront, paths never migrate, and the only
collectives are:
  * `all_gather` for full-frame readback (display/screenshot/tonemap
    histogram) — the reference's waitForIdle+mapBuffer equivalent
    (Sample.cpp:2195-2225);
  * `ppermute` halo exchange for cross-tile stencils (denoiser a-trous,
    TAA neighborhoods, ReSTIR spatial taps) in parallel/halo.py.
ICI-only; no DCN axis is needed at the v5p-8 target.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .. import config as C
from ..pt import integrator
from ..scene.camera import CameraData

TILE_AXIS = "tiles"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (TILE_AXIS,))


def render_image_sharded(assets: integrator.RenderAssets, cam: CameraData,
                         cfg: C.PTConfig, consts: C.PTConstants,
                         width: int, height: int, mesh: Mesh):
    """Render one sample/pixel with pixels sharded over the mesh.

    Scene/BVH/env/lights are replicated (P()); the pixel wavefront and the
    returned radiance are sharded over the tile axis. Each shard runs its
    own bounce while_loop, so a tile full of sky rays finishes early
    instead of waiting on the worst pixel of the whole frame — divergence
    is bounded per tile, an improvement over the global wavefront."""
    n_dev = mesh.devices.size
    n = width * height
    pad = (-n) % n_dev
    yy, xx = np.mgrid[0:height, 0:width]
    px = np.concatenate([xx.reshape(-1), np.zeros(pad, np.int64)])
    py = np.concatenate([yy.reshape(-1), np.zeros(pad, np.int64)])
    px = jnp.asarray(px.astype(np.uint32))
    py = jnp.asarray(py.astype(np.uint32))

    fn = jax.shard_map(
        functools.partial(integrator.render_wavefront, cfg=cfg),
        mesh=mesh,
        in_specs=(P(), P(), P(TILE_AXIS), P(TILE_AXIS), P()),
        out_specs=P(TILE_AXIS),
        # the bounce while_loop mixes replicated (scene) and sharded (path)
        # carries; skip the varying-mesh-axes strictness check
        check_vma=False,
    )
    radiance = jax.jit(fn)(assets, cam, px, py, consts)
    return radiance[:n].reshape(height, width, 3)
