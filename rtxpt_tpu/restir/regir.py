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

import jax.numpy as jnp
import numpy as np

from ..core import mathutils as mu
from ..core import rng
from ..scene import lights as LI

EFFECT_REGIR_BUILD = 32
EFFECT_REGIR_PICK = 33


class ReGIRGrid(NamedTuple):
    """Per-cell light reservoirs, SoA over (cells * per_cell,)."""
    light: jnp.ndarray     # (C*R,) i32 light index (-1 invalid)
    uv: jnp.ndarray        # (C*R,2) area sample
    w: jnp.ndarray         # (C*R,) contribution weight W
    grid_lo: jnp.ndarray   # (3,)
    grid_inv_ext: jnp.ndarray  # (3,) 1/extent
    dims: int              # static cells per axis
    per_cell: int          # static reservoirs per cell


def _cell_centers(lo, hi, dims: int, jitter):
    g = jnp.arange(dims, dtype=jnp.float32)
    zz, yy, xx = jnp.meshgrid(g, g, g, indexing="ij")
    ijk = jnp.stack([xx, yy, zz], -1).reshape(-1, 3)    # (C,3)
    ext = hi - lo
    return lo + (ijk + jitter) / dims * ext


def build_regir(lt: LI.LightTable, scene_positions, scene_indices,
                scene_lo, scene_hi, frame, dims: int = 8,
                per_cell: int = 8, candidates: int = 16) -> ReGIRGrid:
    """Rebuild the grid for this frame (RtxdiPass BeginFrame ReGIR build,
    RtxdiPass.cpp:268-342)."""
    c = dims ** 3
    n = c * per_cell
    lane = jnp.arange(n, dtype=jnp.uint32)
    g = rng.make(lane, lane >> 16, jnp.uint32(0), jnp.uint32(frame))
    g = rng.start_effect(g, EFFECT_REGIR_BUILD)

    g, ujit = rng.next_3d(g)
    centers = _cell_centers(jnp.asarray(scene_lo), jnp.asarray(scene_hi),
                            dims, 0.5)
    pos = jnp.repeat(centers, per_cell, axis=0)         # (n,3)
    # jitter the evaluation point within the cell for decorrelation
    ext = (jnp.asarray(scene_hi) - jnp.asarray(scene_lo)) / dims
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
    lo = jnp.asarray(scene_lo, jnp.float32)
    inv_ext = 1.0 / jnp.maximum(jnp.asarray(scene_hi, jnp.float32) - lo,
                                1e-6)
    return ReGIRGrid(light=best_light, uv=best_uv, w=w, grid_lo=lo,
                     grid_inv_ext=inv_ext, dims=dims, per_cell=per_cell)


def sample_regir(grid: ReGIRGrid, lt: LI.LightTable, scene_positions,
                 scene_indices, shading_pos, u2) -> LI.LightSample:
    """Cell lookup + uniform reservoir pick; the reservoir W replaces
    1/pdf (RTXDI_MINI_SampleLocalLightsFromWorldSpace)."""
    d = grid.dims
    ijk = jnp.clip(((shading_pos - grid.grid_lo) * grid.grid_inv_ext * d)
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
    is_delta = (kind == LI.LIGHT_POINT) | (kind == LI.LIGHT_DIRECTIONAL)
    pdf = jnp.where(w > 0,
                    jnp.where(is_delta, 1.0, dist * dist)
                    / jnp.maximum(w, 1e-20), 0.0)
    return LI.LightSample(direction=direction, distance=dist, li=li,
                          pdf=pdf, valid=valid)
