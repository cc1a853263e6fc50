"""ReGIR: world-space grid of light reservoirs for local-light sampling.

TPU-native re-design of the reference's in-path light sampling
("RTXDI-mini", RTXPT/PathTracer/LightSampling/LightSamplingLocal.hlsli:
ReGIR cell lookup RTXDI_MINI_CalculateReGIRCellIndex :555, variants
RTXDI_MINI_SampleLocalLightsAllVariants :703, consumed by NEE at
PathTracerNEE.hlsli:216-230).

Per frame, every cell of a regular world-space grid streams `candidates`
power-sampled lights through `per_cell` reservoirs, weighted by the
unshadowed radiance at the (jittered) cell center. At a shading point, NEE
picks one reservoir of the containing cell; the reservoir's contribution
weight W replaces 1/pdf. MIS against BSDF sampling keeps the reference's
half-MIS constant (localPdfEstimateK) since ReGIR pdfs are not evaluable
for arbitrary directions.

The whole grid build is one fused jnp pass over cells x reservoirs lanes
(the "ReGIR grid build kernel" of SURVEY.md section 2.3).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import mathutils as mu
from ..core import rng
from ..scene import lights as LI

EFFECT_REGIR_BUILD = 32
EFFECT_REGIR_PICK = 33


@jax.tree_util.register_pytree_node_class
class ReGIRGrid:
    """Per-cell light reservoirs, SoA over (cells * per_cell,).

    Two cell layouts (LightSamplingLocal.hlsli RTXDI_MINI_
    CalculateReGIRCellIndex :555):
      * "grid": regular dims^3 world-space grid over the scene bounds;
      * "onion": log-spherical shells around `center` — radial layer
        index = floor(log2(r/r0) * LAYERS_PER_OCTAVE) and an octahedral
        (res x res) direction bucket, so cell size scales with camera
        distance like the reference's onion layout.

    dims/per_cell/onion_layers are STATIC (pytree aux): the layout
    branch in sample_regir must resolve at trace time."""

    def __init__(self, light, uv, w, grid_lo, grid_inv_ext, dims: int,
                 per_cell: int, onion_layers: int = 0):
        self.light = light             # (C*R,) i32 light index (-1 bad)
        self.uv = uv                   # (C*R,2) area sample
        self.w = w                     # (C*R,) contribution weight W
        self.grid_lo = grid_lo         # (3,) bounds lo | onion center
        self.grid_inv_ext = grid_inv_ext  # (3,) 1/extent | [1/r0,0,0]
        self.dims = dims
        self.per_cell = per_cell
        self.onion_layers = onion_layers

    def tree_flatten(self):
        return ((self.light, self.uv, self.w, self.grid_lo,
                 self.grid_inv_ext),
                (self.dims, self.per_cell, self.onion_layers))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, dims=aux[0], per_cell=aux[1],
                   onion_layers=aux[2])


ONION_LAYERS_PER_OCTAVE = 2.0


def _cell_centers(lo, hi, dims: int, jitter):
    g = jnp.arange(dims, dtype=jnp.float32)
    zz, yy, xx = jnp.meshgrid(g, g, g, indexing="ij")
    ijk = jnp.stack([xx, yy, zz], -1).reshape(-1, 3)    # (C,3)
    ext = hi - lo
    return lo + (ijk + jitter) / dims * ext


def _onion_cell_positions(center, r0, dims: int, layers: int,
                          per_cell: int, ujit):
    """Jittered representative world positions for onion cells:
    cell (l, i, j) covers radii [r0*2^(l/LPO), r0*2^((l+1)/LPO)) in the
    octahedral direction bucket (i, j)."""
    c = layers * dims * dims
    cell = jnp.repeat(jnp.arange(c), per_cell)           # (n,)
    l = cell // (dims * dims)
    ij = cell % (dims * dims)
    i = ij // dims
    j = ij % dims
    lf = (l.astype(jnp.float32) + ujit[..., 0]) / ONION_LAYERS_PER_OCTAVE
    r = r0 * jnp.exp2(lf)
    f = jnp.stack([(i.astype(jnp.float32) + ujit[..., 1]) / dims,
                   (j.astype(jnp.float32) + ujit[..., 2]) / dims],
                  -1) * 2.0 - 1.0
    d = mu.decode_oct(f)
    return center[None, :] + d * r[..., None]


def build_regir(lt: LI.LightTable, scene_positions, scene_indices,
                scene_lo, scene_hi, frame, dims: int = 8,
                per_cell: int = 8, candidates: int = 16,
                layout: str = "grid", center=None) -> ReGIRGrid:
    """Rebuild the grid for this frame (RtxdiPass BeginFrame ReGIR build,
    RtxdiPass.cpp:268-342). layout="onion" uses log-spherical cells
    around `center` (defaults to the scene center)."""
    if layout == "onion":
        layers = int(np.ceil(ONION_LAYERS_PER_OCTAVE * 6)) + 1  # 6 octaves
        c = layers * dims * dims
    else:
        layers = 0
        c = dims ** 3
    n = c * per_cell
    lane = jnp.arange(n, dtype=jnp.uint32)
    g = rng.make(lane, lane >> 16, jnp.uint32(0), jnp.uint32(frame))
    g = rng.start_effect(g, EFFECT_REGIR_BUILD)

    g, ujit = rng.next_3d(g)
    lo3 = jnp.asarray(scene_lo, jnp.float32)
    hi3 = jnp.asarray(scene_hi, jnp.float32)
    if layout == "onion":
        ctr = (jnp.asarray(center, jnp.float32) if center is not None
               else (lo3 + hi3) * 0.5)
        # r0: the innermost shell radius — 1/64 of the scene diagonal
        r0 = jnp.linalg.norm(hi3 - lo3) / 64.0
        pos = _onion_cell_positions(ctr, r0, dims, layers, per_cell,
                                    ujit)
    else:
        centers = _cell_centers(lo3, hi3, dims, 0.5)
        pos = jnp.repeat(centers, per_cell, axis=0)         # (n,3)
        # jitter the evaluation point within the cell for decorrelation
        ext = (hi3 - lo3) / dims
        pos = pos + (ujit - 0.5) * ext

    best_light = jnp.full((n,), -1, jnp.int32)
    best_uv = jnp.zeros((n, 2), jnp.float32)
    best_target = jnp.zeros((n,), jnp.float32)
    w_sum = jnp.zeros((n,), jnp.float32)

    for _ in range(candidates):
        g, u3 = rng.next_3d(g)
        g, usel = rng.next_1d(g)
        li_idx = LI.pick_light(lt, u3[..., 0])
        pick_pdf = lt.power[li_idx] / jnp.maximum(lt.total_power, 1e-20)
        uv = u3[..., 1:3]
        # target: unshadowed incident radiance at the cell point, with the
        # correct per-kind geometric falloff (point lights carry 1/d^2,
        # area lights cos/d^2; lights.eval_sample_at measure contract)
        _, _, li_eff, inv_area, l_ok = LI.eval_sample_at(
            lt, scene_positions, scene_indices, li_idx, uv, pos)
        target = jnp.where(l_ok, mu.luminance(li_eff), 0.0)
        src_pdf = pick_pdf * inv_area
        wi = jnp.where(src_pdf > 0, target / jnp.maximum(src_pdf, 1e-20),
                       0.0)
        w_sum = w_sum + wi
        take = (usel * w_sum < wi) & (wi > 0.0)
        best_light = jnp.where(take, li_idx, best_light)
        best_uv = jnp.where(take[..., None], uv, best_uv)
        best_target = jnp.where(take, target, best_target)

    w = jnp.where((best_light >= 0) & (best_target > 0.0),
                  w_sum / (candidates * jnp.maximum(best_target, 1e-20)),
                  0.0)
    if layout == "onion":
        return ReGIRGrid(light=best_light, uv=best_uv, w=w, grid_lo=ctr,
                         grid_inv_ext=jnp.stack(
                             [1.0 / jnp.maximum(r0, 1e-9),
                              jnp.zeros(()), jnp.zeros(())]),
                         dims=dims, per_cell=per_cell,
                         onion_layers=layers)
    inv_ext = 1.0 / jnp.maximum(hi3 - lo3, 1e-6)
    return ReGIRGrid(light=best_light, uv=best_uv, w=w, grid_lo=lo3,
                     grid_inv_ext=inv_ext, dims=dims, per_cell=per_cell)


def sample_regir(grid: ReGIRGrid, lt: LI.LightTable, scene_positions,
                 scene_indices, shading_pos, u2) -> LI.LightSample:
    """Cell lookup + uniform reservoir pick; the reservoir W replaces
    1/pdf (RTXDI_MINI_SampleLocalLightsFromWorldSpace)."""
    d = grid.dims
    if grid.onion_layers:
        rel = shading_pos - grid.grid_lo                  # center-based
        r = jnp.linalg.norm(rel, axis=-1)
        dirn = rel / jnp.maximum(r[..., None], 1e-9)
        l = jnp.clip((jnp.log2(jnp.maximum(r * grid.grid_inv_ext[0],
                                           1.0))
                      * ONION_LAYERS_PER_OCTAVE).astype(jnp.int32),
                     0, grid.onion_layers - 1)
        f = (mu.encode_oct(dirn) + 1.0) * 0.5             # [0,1)^2
        i = jnp.clip((f[..., 0] * d).astype(jnp.int32), 0, d - 1)
        j = jnp.clip((f[..., 1] * d).astype(jnp.int32), 0, d - 1)
        cell = (l * d + i) * d + j
    else:
        ijk = jnp.clip(((shading_pos - grid.grid_lo)
                        * grid.grid_inv_ext * d)
                       .astype(jnp.int32), 0, d - 1)
        cell = (ijk[..., 2] * d + ijk[..., 1]) * d + ijk[..., 0]
    slot = jnp.clip((u2[..., 0] * grid.per_cell).astype(jnp.int32), 0,
                    grid.per_cell - 1)
    lane = cell * grid.per_cell + slot
    li_idx = grid.light[lane]
    uv = grid.uv[lane]
    w = grid.w[lane]

    kidx = jnp.maximum(li_idx, 0)
    # per-kind direction/distance/falloff (triangle/sphere area samples,
    # point 1/d^2, directional fixed-direction) — the round-1 version
    # routed every kind through the triangle path, mislighting analytic
    # lights stored in the grid
    direction, dist, li_eff, _, l_ok = LI.eval_sample_at(
        lt, scene_positions, scene_indices, kidx, uv, shading_pos)
    # li_eff * W  (W plays 1/pdf in the build's area measure)
    li = li_eff * w[..., None]
    valid = (li_idx >= 0) & (w > 0.0) & l_ok
    # pdf for firefly heuristics: ~1/W converted to solid-angle-ish terms
    kind = lt.kind[kidx]
    is_delta = ((kind == LI.LIGHT_POINT) | (kind == LI.LIGHT_SPOT)
                | (kind == LI.LIGHT_DIRECTIONAL))
    pdf = jnp.where(w > 0,
                    jnp.where(is_delta, 1.0, dist * dist)
                    / jnp.maximum(w, 1e-20), 0.0)
    return LI.LightSample(direction=direction, distance=dist, li=li,
                          pdf=pdf, valid=valid, delta=is_delta)
