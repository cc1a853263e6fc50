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
# Sharded realtime STAGE 1 (path tracing + ReSTIR) with reservoir halos
# ---------------------------------------------------------------------------

# prev-frame reservoir/G-buffer rows exchanged so temporal reprojection
# survives up to this many rows of vertical motion across a slab seam;
# CURRENT-frame spatial taps clamp to the slab (tap sets differ only
# within tap-radius of a seam — the pairwise-MIS/1/Z estimators stay
# unbiased for any tap set, so this is a correlation detail, not bias)
STAGE1_HALO = 16

_STAGE1_SHARD_CACHE: dict = {}


def pt_frame_sharded(mesh: Mesh, kind: str, cfg, assets, cam, prev_cam,
                     prev_res, prev_gi, prev_gb_normal, prev_gb_z,
                     px, py, consts, *, width: int, height: int,
                     has_prev: bool, halo: int = STAGE1_HALO):
    """Realtime stage 1 row-sharded over the mesh (the other half of
    VERDICT r2 weak #3: ray tracing, ReSTIR DI/GI and — for
    kind="stable" — the full stable-planes BUILD/FILL run per row-slab).

    Scene/BVH/lights replicate; the pixel wavefront, reservoirs and all
    per-pixel outputs shard by rows. Prev-frame temporal buffers get a
    `halo`-row ppermute ring exchange inside the shard so motion-vector
    reprojection reads across slab seams; current-frame spatial taps
    clamp to the slab (restir/window.py). Feedback outputs come back
    sharded and feed the next frame without any gather — a frame's only
    collectives are the two halo rings (stage 1 here, stage 2 in
    denoise_taa_sharded).

    kind: "psr" -> models.realtime._pt_frame, "stable" ->
    _pt_frame_stable. Returns exactly what the underlying fn returns.
    """
    from ..models import realtime as RT
    n_dev = mesh.devices.size
    if height % n_dev:
        raise ValueError(f"height {height} not divisible by mesh size "
                         f"{n_dev}")
    rows = height // n_dev
    halo = min(halo, max(rows - 1, 1))
    fn = RT._pt_frame if kind == "psr" else RT._pt_frame_stable

    args = (assets, cam, prev_cam, prev_res, prev_gi, prev_gb_normal,
            prev_gb_z, px, py, consts)
    # per-pixel args shard by rows; scene/camera/constants replicate
    sharded = (False, False, False, True, True, True, True, True, True,
               False)
    key = (mesh, kind, cfg, width, height, has_prev, halo,
           tuple(jax.tree_util.tree_structure(a) for a in args))
    if key not in _STAGE1_SHARD_CACHE:
        def local(assets, cam, prev_cam, prev_res, prev_gi, gbn, gbz,
                  px_l, py_l, consts):
            from .halo import exchange_row_halo
            y0 = jax.lax.axis_index(TILE_AXIS) * rows

            def pad(a):
                if a is None or not hasattr(a, "ndim"):
                    return a
                img = a.reshape((rows, width) + a.shape[1:])
                ex = exchange_row_halo(img, halo, TILE_AXIS)
                return ex.reshape(((rows + 2 * halo) * width,)
                                  + a.shape[1:])

            tm = jax.tree_util.tree_map
            return fn(assets, cam, prev_cam, tm(pad, prev_res),
                      tm(pad, prev_gi), pad(gbn), pad(gbz),
                      px_l, py_l, consts, y0, cfg=cfg, width=width,
                      height=height, has_prev=has_prev, rows=rows,
                      prev_rows=rows + 2 * halo)

        tm = jax.tree_util.tree_map
        in_specs = tuple(
            tm(lambda _: P(TILE_AXIS), a) if s else tm(lambda _: P(), a)
            for a, s in zip(args, sharded))
        # every frame output is per-pixel with a leading row/pixel dim,
        # so a single P(TILE_AXIS) out_spec shards the whole tree
        fn_sm = jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                              out_specs=P(TILE_AXIS), check_vma=False)
        _STAGE1_SHARD_CACHE[key] = jax.jit(fn_sm)
    return _STAGE1_SHARD_CACHE[key](*args)


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
