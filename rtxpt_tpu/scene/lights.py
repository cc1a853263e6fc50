"""Local light sampling: emissive triangles + analytic lights.

Equivalent of the reference's light preparation + polymorphic light types:
  - RTXPT/RTXDI/PrepareLightsPass.* (pack scene emissives + analytic lights
    into one polymorphic light buffer, power-weighted)
  - RTXPT/RTXDI/PolymorphicLight.hlsli (triangle/sphere/point/directional
    sample + pdf)
  - consumed by NEE local sampling (PathTracerNEE.hlsli:216-230) — the
    reference samples via ReGIR/RIS; this module provides the flat
    power-CDF sampler used as the candidate distribution (ReGIR grid on top
    lives in restir/regir.py).

The light table is rebuilt host-side when the scene changes (like
PrepareLightsPass::Process, RTXDI/PrepareLightsPass.cpp:367).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..core import mathutils as mu

LIGHT_TRIANGLE = 0
LIGHT_POINT = 1
LIGHT_DIRECTIONAL = 2
LIGHT_SPHERE = 3


class LightTable(NamedTuple):
    """Polymorphic light SoA. Triangle lights reference scene triangles;
    analytic lights carry their own data."""
    kind: jnp.ndarray        # (L,) i32
    tri: jnp.ndarray         # (L,) i32 scene triangle id (triangle lights)
    position: jnp.ndarray    # (L,3) point/sphere center or direction (dir.)
    radius: jnp.ndarray      # (L,) sphere radius
    radiance: jnp.ndarray    # (L,3) emitted radiance (tri/sphere) or
    #                        #       intensity (point) or radiance (dir)
    power: jnp.ndarray       # (L,) scalar power used for selection
    cdf: jnp.ndarray         # (L,) inclusive normalized CDF over power
    total_power: jnp.ndarray  # ()

    @property
    def count(self) -> int:
        return self.kind.shape[0]


def build_light_table(host_scene: dict, analytic: Optional[list] = None
                      ) -> Optional[LightTable]:
    """Host-side (numpy) light table build (PrepareLightsPass::Process).
    analytic: list of dicts {kind, position/direction, radiance, radius}."""
    pos = host_scene["positions"]
    idx = host_scene["indices"]
    tri_mat = host_scene["tri_mat"]
    mats = host_scene["materials"]
    emissive = mats["emissive"]
    excluded = mats["excluded_from_nee"]

    kinds, tris, positions, radii, radiances, powers = [], [], [], [], [], []

    em_lum = (0.2126 * emissive[:, 0] + 0.7152 * emissive[:, 1]
              + 0.0722 * emissive[:, 2])
    is_emissive_mat = (em_lum > 0) & (~excluded)
    emissive_tris = np.nonzero(is_emissive_mat[tri_mat])[0]
    for t in emissive_tris:
        p0, p1, p2 = pos[idx[t, 0]], pos[idx[t, 1]], pos[idx[t, 2]]
        area = 0.5 * np.linalg.norm(np.cross(p1 - p0, p2 - p0))
        rad = emissive[tri_mat[t]]
        kinds.append(LIGHT_TRIANGLE)
        tris.append(t)
        positions.append((p0 + p1 + p2) / 3.0)
        radii.append(0.0)
        radiances.append(rad)
        # single-sided emissive: power = L * area * pi
        powers.append(float(em_lum[tri_mat[t]] * area * np.pi))

    for a in (analytic or []):
        kinds.append(a["kind"])
        tris.append(-1)
        positions.append(np.asarray(a.get("position",
                                          a.get("direction", (0, 1, 0))),
                                    np.float32))
        radii.append(a.get("radius", 0.0))
        radiances.append(np.asarray(a["radiance"], np.float32))
        lum = float(mu.luminance(jnp.asarray(a["radiance"], jnp.float32)))
        if a["kind"] == LIGHT_POINT:
            powers.append(lum * 4.0 * np.pi)
        elif a["kind"] == LIGHT_SPHERE:
            r = a.get("radius", 0.1)
            powers.append(lum * 4.0 * np.pi * np.pi * r * r)
        else:  # directional handled by env-map bake in the reference
            powers.append(lum)

    if not kinds:
        return None
    power = np.asarray(powers, np.float32)
    cdf = np.cumsum(power)
    total = float(cdf[-1])
    cdf = (cdf / max(total, 1e-20)).astype(np.float32)
    return LightTable(
        kind=jnp.asarray(np.asarray(kinds, np.int32)),
        tri=jnp.asarray(np.asarray(tris, np.int32)),
        position=jnp.asarray(np.stack(positions).astype(np.float32)),
        radius=jnp.asarray(np.asarray(radii, np.float32)),
        radiance=jnp.asarray(np.stack(radiances).astype(np.float32)),
        power=jnp.asarray(power),
        cdf=jnp.asarray(cdf),
        total_power=jnp.asarray(total, jnp.float32),
    )


class LightSample(NamedTuple):
    """PathLightSample (PathTracerTypes.hlsli): radiance already divided by
    pdf lives in li; pdf kept for MIS."""
    direction: jnp.ndarray   # (N,3)
    distance: jnp.ndarray    # (N,)
    li: jnp.ndarray          # (N,3) radiance / pdf
    pdf: jnp.ndarray         # (N,) solid-angle pdf at the shading point
    valid: jnp.ndarray       # (N,)


def sample_local_lights(lt: LightTable, scene_positions, scene_indices,
                        shading_pos, u3) -> LightSample:
    """Power-weighted light pick + per-light solid-angle sample
    (PolymorphicLight.hlsli calcSample equivalents).

    u3: (N,3) -> [light select, area sample x2]."""
    n = shading_pos.shape[0]
    # pick light by power CDF
    li_idx = jnp.searchsorted(lt.cdf, u3[..., 0], side="left")
    li_idx = jnp.clip(li_idx, 0, lt.count - 1).astype(jnp.int32)
    pick_pdf = lt.power[li_idx] / jnp.maximum(lt.total_power, 1e-20)

    kind = lt.kind[li_idx]
    # --- triangle lights: uniform area sample
    t = jnp.maximum(lt.tri[li_idx], 0)
    tri = scene_indices[t]
    p0 = scene_positions[tri[..., 0]]
    p1 = scene_positions[tri[..., 1]]
    p2 = scene_positions[tri[..., 2]]
    bary = mu.sample_triangle_uniform(u3[..., 1:3])
    lp = bary[..., 0:1] * p0 + bary[..., 1:2] * p1 + bary[..., 2:3] * p2
    fn = jnp.cross(p1 - p0, p2 - p0)
    area = 0.5 * jnp.linalg.norm(fn, axis=-1)
    fn = mu.safe_normalize(fn)

    to_l = lp - shading_pos
    dist_sq = jnp.maximum(jnp.sum(to_l * to_l, axis=-1), 1e-12)
    dist = jnp.sqrt(dist_sq)
    dir_ = to_l / dist[..., None]
    cos_l = jnp.sum(fn * (-dir_), axis=-1)   # light faces its +normal side
    # area pdf -> solid angle pdf
    pdf_tri = dist_sq / jnp.maximum(cos_l * area, 1e-12)
    tri_visible = cos_l > 1e-6
    tri_rad = lt.radiance[li_idx]

    # --- point lights (radiance = intensity [W/sr])
    pl = lt.position[li_idx]
    to_p = pl - shading_pos
    dist_p_sq = jnp.maximum(jnp.sum(to_p * to_p, axis=-1), 1e-12)
    dist_p = jnp.sqrt(dist_p_sq)
    dir_p = to_p / dist_p[..., None]

    # --- directional: fixed direction, infinite distance
    dir_d = -mu.safe_normalize(lt.position[li_idx])

    is_tri = kind == LIGHT_TRIANGLE
    is_pt = kind == LIGHT_POINT
    is_dir = kind == LIGHT_DIRECTIONAL

    direction = jnp.where(is_tri[..., None], dir_,
                          jnp.where(is_pt[..., None], dir_p, dir_d))
    distance = jnp.where(is_tri, dist,
                         jnp.where(is_pt, dist_p, mu.K_MAX_RAY_TRAVEL))
    # pdf in solid angle; point/dir are delta lights -> encode pdf as the
    # selection pdf only and fold the geometric term into li
    pdf = jnp.where(is_tri, pdf_tri * pick_pdf, pick_pdf)
    li = jnp.where(
        is_tri[..., None], tri_rad / jnp.maximum(pdf, 1e-20)[..., None],
        jnp.where(is_pt[..., None],
                  lt.radiance[li_idx] / dist_p_sq[..., None]
                  / jnp.maximum(pick_pdf, 1e-20)[..., None],
                  lt.radiance[li_idx]
                  / jnp.maximum(pick_pdf, 1e-20)[..., None]))
    valid = jnp.where(is_tri, tri_visible, is_pt | is_dir) & (lt.count > 0)
    return LightSample(direction=direction, distance=distance, li=li,
                       pdf=pdf, valid=valid)
