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


# ---------------------------------------------------------------------------
# Sharded realtime post stage (denoise + TAA) with halo exchange
# ---------------------------------------------------------------------------

_POST_HALO = 34   # >= a-trous reach 2*(1+2+4+8) + variance 3 + TAA 1

# jitted shard_map cache: building jax.jit(shard_map(closure)) per call
# would retrace + recompile EVERY frame (new function identity), which
# the remote-compile TPU tunnel turns into seconds per frame. Keyed on
# everything that changes the traced program; jit handles shape changes
# within an entry.
_POST_SHARD_CACHE: dict = {}


def _pad_rows(img, n_dev):
    h = img.shape[0]
    pad = (-h) % n_dev
    if pad:
        img = jnp.concatenate([img, jnp.repeat(img[-1:], pad, axis=0)],
                              axis=0)
    return img, h


def denoise_taa_sharded(mesh: Mesh, den_state, taa_state, radiance,
                        normal, view_z, motion, roughness=None,
                        iterations: int = 4, use_taa: bool = True):
    """Run the ReLAX denoiser (+ optional TAA) with the image row-sharded
    over the mesh: each chip pads its slab with _POST_HALO neighbor rows
    via the `ppermute` ring (parallel/halo.py), runs the stencil locally,
    and crops — the production consumer of the halo exchange (round-1
    weak #12: tile-edge bias when post ran per-tile without halos).

    Returns (color, den_state', taa_state'). States are (H,W,...) pytrees
    sharded the same way; halo regions are re-derived each frame so the
    cropped interior matches the single-device result wherever motion
    stays within the halo."""
    from ..denoise import relax
    from ..post import taa as taa_mod
    from .halo import exchange_row_halo

    n_dev = mesh.devices.size
    if den_state is None:
        den_state = relax.DenoiserState.create(radiance.shape[0],
                                               radiance.shape[1])
    if taa_state is None and use_taa:
        taa_state = taa_mod.TAAState(history=jnp.zeros_like(radiance),
                                     valid=jnp.asarray(False))

    args = (den_state, taa_state, radiance, normal, view_z, motion,
            roughness)
    h0 = radiance.shape[0]
    # the ring exchange moves at most one full slab per neighbor
    halo = min(_POST_HALO, max(h0 // n_dev - 1, 1))
    padded = jax.tree_util.tree_map(
        lambda a: _pad_rows(a, n_dev)[0] if (hasattr(a, "ndim")
                                             and a.ndim >= 2) else a,
        args)

    spec = lambda a: P(TILE_AXIS) if (hasattr(a, "ndim")
                                      and a.ndim >= 2) else P()
    key = (mesh, halo, iterations, use_taa,
           jax.tree_util.tree_structure(padded))
    if key not in _POST_SHARD_CACHE:
        def local(den_s, taa_s, rad, nrm, z, mot, rough):
            ex = lambda a: exchange_row_halo(a, halo, TILE_AXIS) \
                if (hasattr(a, "ndim") and a.ndim >= 2) else a
            den_p = jax.tree_util.tree_map(ex, den_s)
            rad_p, nrm_p, z_p, mot_p = ex(rad), ex(nrm), ex(z), ex(mot)
            rough_p = ex(rough) if rough is not None else None
            color, den_n = relax.denoise(den_p, rad_p, nrm_p, z_p, mot_p,
                                         roughness=rough_p,
                                         iterations=iterations)
            crop = lambda a: a[halo:-halo] \
                if (hasattr(a, "ndim") and a.ndim >= 2
                    and a.shape[0] > 2 * halo) else a
            if use_taa:
                taa_p = jax.tree_util.tree_map(ex, taa_s)
                color, taa_n = taa_mod.resolve(taa_p, color, mot_p)
                taa_n = jax.tree_util.tree_map(crop, taa_n)
            else:
                taa_n = taa_s
            return (crop(color), jax.tree_util.tree_map(crop, den_n),
                    taa_n)

        in_specs = jax.tree_util.tree_map(spec, padded)
        fn = jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                           out_specs=(P(TILE_AXIS),
                                      jax.tree_util.tree_map(
                                          spec, padded[0]),
                                      jax.tree_util.tree_map(
                                          spec, padded[1])),
                           check_vma=False)
        _POST_SHARD_CACHE[key] = jax.jit(fn)
    color, den_n, taa_n = _POST_SHARD_CACHE[key](*padded)
    crop0 = lambda a: a[:h0] if (hasattr(a, "ndim") and a.ndim >= 2
                                 and a.shape[0] >= h0) else a
    return (crop0(color),
            jax.tree_util.tree_map(crop0, den_n),
            jax.tree_util.tree_map(crop0, taa_n))
