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
    if emissive_tris.size:
        # vectorized (Bistro-class scenes have tens of thousands of
        # emissive triangles; a per-triangle Python loop took minutes)
        et = emissive_tris
        p0 = pos[idx[et, 0]]
        p1 = pos[idx[et, 1]]
        p2 = pos[idx[et, 2]]
        area = 0.5 * np.linalg.norm(np.cross(p1 - p0, p2 - p0), axis=-1)
        mids = tri_mat[et]
        kinds.extend([LIGHT_TRIANGLE] * et.size)
        tris.extend(et.tolist())
        positions.extend(((p0 + p1 + p2) / 3.0).astype(np.float32))
        radii.extend([0.0] * et.size)
        radiances.extend(emissive[mids].astype(np.float32))
        # single-sided emissive: power = L * area * pi
        powers.extend((em_lum[mids] * area * np.pi).tolist())

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


def _sphere_point(lt: LightTable, li_idx, uv):
    """Uniform point on the sphere surface from a 2D sample (receiver-
    independent, so (light, uv) pairs are reusable across pixels like
    RTXDI reservoir samples). Returns (point, outward normal)."""
    z = 1.0 - 2.0 * uv[..., 0]
    s = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * jnp.pi * uv[..., 1]
    n_s = jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), z], -1)
    c = lt.position[li_idx]
    r = lt.radius[li_idx]
    return c + r[..., None] * n_s, n_s


def eval_sample_at(lt: LightTable, scene_positions, scene_indices,
                   li_idx, uv, shading_pos):
    """Re-evaluate a polymorphic light sample (light index + 2D uv) at a
    shading point (PolymorphicLight.hlsli calcSample re-evaluation, used
    by ReSTIR target functions and ReGIR).

    Measure contract: for area lights (triangle/sphere) `li` is
    radiance * cos_l / dist^2 — the solid-angle-measure incident radiance
    of an area-measure sample — and `inv_area` is 1/area so that
    src_pdf = pick_pdf * inv_area lives in the matching area measure; for
    delta lights (point: intensity/dist^2, directional: radiance)
    inv_area = 1. Returns (direction, distance, li, inv_area, valid)."""
    kind = lt.kind[li_idx]
    rad = lt.radiance[li_idx]

    # --- triangle
    tri = scene_indices[jnp.maximum(lt.tri[li_idx], 0)]
    p0 = scene_positions[tri[..., 0]]
    p1 = scene_positions[tri[..., 1]]
    p2 = scene_positions[tri[..., 2]]
    bary = mu.sample_triangle_uniform(uv)
    lp_t = bary[..., 0:1] * p0 + bary[..., 1:2] * p1 + bary[..., 2:3] * p2
    fn = jnp.cross(p1 - p0, p2 - p0)
    area2 = jnp.linalg.norm(fn, axis=-1)
    n_t = mu.safe_normalize(fn)

    # --- sphere (uniform area sample; fixed surface point)
    lp_s, n_s = _sphere_point(lt, li_idx, uv)
    r_s = lt.radius[li_idx]

    is_tri = kind == LIGHT_TRIANGLE
    is_sph = kind == LIGHT_SPHERE
    is_pt = kind == LIGHT_POINT
    is_area = is_tri | is_sph

    lp = jnp.where(is_tri[..., None], lp_t,
                   jnp.where(is_sph[..., None], lp_s,
                             lt.position[li_idx]))
    nrm = jnp.where(is_tri[..., None], n_t, n_s)

    to_l = lp - shading_pos
    dist_sq = jnp.maximum(jnp.sum(to_l * to_l, -1), 1e-9)
    dist = jnp.sqrt(dist_sq)
    dir_l = to_l / dist[..., None]
    cos_l = jnp.sum(nrm * (-dir_l), -1)

    dir_d = -mu.safe_normalize(lt.position[li_idx])
    direction = jnp.where(is_area[..., None] | is_pt[..., None], dir_l,
                          dir_d)
    distance = jnp.where(is_area | is_pt, dist, mu.K_MAX_RAY_TRAVEL)

    li_area = rad * (jnp.maximum(cos_l, 0.0) / dist_sq)[..., None]
    li_point = rad / dist_sq[..., None]
    li = jnp.where(is_area[..., None], li_area,
                   jnp.where(is_pt[..., None], li_point, rad))

    inv_area = jnp.where(
        is_tri, 1.0 / jnp.maximum(0.5 * area2, 1e-9),
        jnp.where(is_sph,
                  1.0 / jnp.maximum(4.0 * jnp.pi * r_s * r_s, 1e-9), 1.0))
    valid = jnp.where(is_area, cos_l > 1e-6, True)
    return direction, distance, li, inv_area, valid


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

    # --- sphere: uniform area sample over the surface (PolymorphicLight
    # sphere calcSample; area measure keeps (light, uv) reservoir samples
    # receiver-independent)
    lp_s, n_s = _sphere_point(lt, li_idx, u3[..., 1:3])
    r_s = lt.radius[li_idx]
    to_s = lp_s - shading_pos
    dist_s_sq = jnp.maximum(jnp.sum(to_s * to_s, axis=-1), 1e-12)
    dist_s = jnp.sqrt(dist_s_sq)
    dir_s = to_s / dist_s[..., None]
    cos_s = jnp.sum(n_s * (-dir_s), axis=-1)
    area_s = jnp.maximum(4.0 * jnp.pi * r_s * r_s, 1e-9)
    pdf_sph = dist_s_sq / jnp.maximum(cos_s * area_s, 1e-12)
    sph_visible = cos_s > 1e-6

    # --- directional: fixed direction, infinite distance
    dir_d = -mu.safe_normalize(lt.position[li_idx])

    is_tri = kind == LIGHT_TRIANGLE
    is_sph = kind == LIGHT_SPHERE
    is_pt = kind == LIGHT_POINT
    is_dir = kind == LIGHT_DIRECTIONAL

    direction = jnp.where(
        is_tri[..., None], dir_,
        jnp.where(is_sph[..., None], dir_s,
                  jnp.where(is_pt[..., None], dir_p, dir_d)))
    distance = jnp.where(
        is_tri, dist,
        jnp.where(is_sph, dist_s,
                  jnp.where(is_pt, dist_p, mu.K_MAX_RAY_TRAVEL)))
    # pdf in solid angle; point/dir are delta lights -> encode pdf as the
    # selection pdf only and fold the geometric term into li
    pdf = jnp.where(is_tri, pdf_tri * pick_pdf,
                    jnp.where(is_sph, pdf_sph * pick_pdf, pick_pdf))
    li = jnp.where(
        is_tri[..., None] | is_sph[..., None],
        lt.radiance[li_idx] / jnp.maximum(pdf, 1e-20)[..., None],
        jnp.where(is_pt[..., None],
                  lt.radiance[li_idx] / dist_p_sq[..., None]
                  / jnp.maximum(pick_pdf, 1e-20)[..., None],
                  lt.radiance[li_idx]
                  / jnp.maximum(pick_pdf, 1e-20)[..., None]))
    valid = jnp.where(is_tri, tri_visible,
                      jnp.where(is_sph, sph_visible, is_pt | is_dir)) \
        & (lt.count > 0)
    return LightSample(direction=direction, distance=distance, li=li,
                       pdf=pdf, valid=valid)
