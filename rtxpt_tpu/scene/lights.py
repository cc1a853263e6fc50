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
LIGHT_SPOT = 4      # point light + cone shaping (PolymorphicLight.hlsli
#                     kSpot; LightShaping.hlsli:67-85 evaluateLightShaping)


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
    # packed per-light row [kind, p0(3), e1(3), e2(3), pos(3), radius,
    # rad(3), inv_area] — ONE fetch per sampled light instead of ~8
    # narrow gathers (XLA TPU gathers cost ~1.4 ms each at wavefront
    # width regardless of row width). Triangle verts are BAKED; call
    # refresh_pack after skinning moves emissive geometry.
    pack: jnp.ndarray = None  # (L, LP_COLS) f32
    pack_gp: object = None    # gather_pallas.GatherPlanes of pack (TPU);
    #   dropped (None) after a device-side refresh_pack
    axis: jnp.ndarray = None  # (L,3) spot primary axis (unit)
    cone: jnp.ndarray = None  # (L,2) [cosConeAngle, cosConeSoftness]

    @property
    def count(self) -> int:
        return self.kind.shape[0]


LP_KIND = 0
LP_P0 = 1           # 1:4
LP_E1 = 4           # 4:7
LP_E2 = 7           # 7:10
LP_POS = 10         # 10:13
LP_RADIUS = 13
LP_RAD = 14         # 14:17
LP_INV_AREA = 17
LP_POWER = 18
LP_AXIS = 19        # 19:22 spot primary axis
LP_COS_CONE = 22    # cos(outer cone angle)
LP_SOFT = 23        # cone softness (cosine-space smoothstep width)
LP_COLS = 24


def shaping_factor(xp, axis, cos_cone, softness, light_to_surface):
    """LightShaping.hlsli:67-85 evaluateLightShaping: smoothstep of the
    angle between the shaping axis and the light->surface direction.
    softness is the COSINE-space width, exactly as the reference packs
    cosConeAngleAndSoftness (PrepareLightsPass.cpp:268-277)."""
    cos_theta = xp.sum(axis * light_to_surface, -1)
    t = xp.clip((cos_theta - cos_cone) / xp.maximum(softness, 1e-6),
                0.0, 1.0)
    return xp.where(softness > 1e-6, t * t * (3.0 - 2.0 * t),
                    (cos_theta >= cos_cone).astype(xp.float32))


def shaping_flux_factor(cos_cone, softness):
    """getShapingFluxFactor (LightShaping.hlsli:151-165): approximate
    flux ratio of a shaped vs omnidirectional source."""
    sa_over_2pi = (1.0 - cos_cone) * (1.0 - 0.5 * softness)
    return sa_over_2pi * 0.5


def _build_pack(xp, kind, tri, position, radius, radiance, positions,
                indices, power=None, axis=None, cone=None):
    """Assemble the packed light rows (numpy at build, jnp on refresh)."""
    t = xp.clip(tri, 0, indices.shape[0] - 1)
    tri_idx = indices[t]
    p0 = positions[tri_idx[:, 0]]
    e1 = positions[tri_idx[:, 1]] - p0
    e2 = positions[tri_idx[:, 2]] - p0
    area = 0.5 * xp.linalg.norm(xp.cross(e1, e2), axis=-1)
    inv_area = xp.where(
        kind == LIGHT_TRIANGLE,
        1.0 / xp.maximum(area, 1e-9),
        xp.where(kind == LIGHT_SPHERE,
                 1.0 / xp.maximum(4.0 * np.pi * radius * radius, 1e-9),
                 1.0))
    if power is None:
        power = xp.zeros_like(radius)
    if axis is None:
        axis = xp.zeros_like(position)
    if cone is None:
        cone = xp.concatenate([xp.full_like(radius, -1.0)[:, None],
                               xp.zeros_like(radius)[:, None]], axis=-1)
    return xp.concatenate([
        kind[:, None].astype(xp.float32), p0, e1, e2, position,
        radius[:, None], radiance, inv_area[:, None], power[:, None],
        axis, cone], axis=-1).astype(xp.float32)


def refresh_pack(lt: LightTable, positions, indices) -> LightTable:
    """Re-bake packed triangle verts from (possibly skinned) device
    positions — the light-side piece of Scene::Refresh."""
    if lt is None or lt.pack is None:
        return lt
    return lt._replace(pack=_build_pack(
        jnp, lt.kind, lt.tri, lt.position, lt.radius, lt.radiance,
        positions, indices, power=lt.power, axis=lt.axis, cone=lt.cone),
        pack_gp=None)


def build_light_table(host_scene: dict, analytic: Optional[list] = None
                      ) -> Optional[LightTable]:
    from ..ops import gather_pallas as _gp
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

    axes, cones = [[0.0, 0.0, -1.0]] * len(kinds), \
        [[-1.0, 0.0]] * len(kinds)
    for a in (analytic or []):
        kinds.append(a["kind"])
        tris.append(-1)
        positions.append(np.asarray(a.get("position",
                                          a.get("direction", (0, 1, 0))),
                                    np.float32))
        radii.append(a.get("radius", 0.0))
        radiances.append(np.asarray(a["radiance"], np.float32))
        lum = float(mu.luminance(jnp.asarray(a["radiance"], jnp.float32)))
        # spot shaping (PrepareLightsPass.cpp:249-277): cos(outer) +
        # cosine-space softness = saturate(1 - inner/outer)
        if a["kind"] == LIGHT_SPOT:
            outer = float(a.get("outer_angle", np.pi / 4))
            inner = float(a.get("inner_angle", 0.0))
            soft = float(np.clip(1.0 - inner / max(outer, 1e-6), 0, 1))
            ax = np.asarray(a.get("axis", (0, 0, -1)), np.float32)
            ax = ax / max(np.linalg.norm(ax), 1e-9)
            axes.append(ax.tolist())
            cones.append([float(np.cos(outer)), soft])
        else:
            axes.append([0.0, 0.0, -1.0])
            cones.append([-1.0, 0.0])
        if a["kind"] == LIGHT_POINT:
            powers.append(lum * 4.0 * np.pi)
        elif a["kind"] == LIGHT_SPOT:
            powers.append(lum * 4.0 * np.pi * float(shaping_flux_factor(
                cones[-1][0], cones[-1][1])))
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
    kind_np = np.asarray(kinds, np.int32)
    tri_np = np.asarray(tris, np.int32)
    pos_np = np.stack(positions).astype(np.float32)
    rad_np = np.asarray(radii, np.float32)
    rdn_np = np.stack(radiances).astype(np.float32)
    axis_np = np.asarray(axes, np.float32)
    cone_np = np.asarray(cones, np.float32)
    pack = _build_pack(np, kind_np, tri_np, pos_np, rad_np, rdn_np,
                       np.asarray(pos, np.float32),
                       np.asarray(idx, np.int64), power=power,
                       axis=axis_np, cone=cone_np)
    return LightTable(
        kind=jnp.asarray(kind_np),
        tri=jnp.asarray(tri_np),
        position=jnp.asarray(pos_np),
        radius=jnp.asarray(rad_np),
        radiance=jnp.asarray(rdn_np),
        power=jnp.asarray(power),
        cdf=jnp.asarray(cdf),
        total_power=jnp.asarray(total, jnp.float32),
        pack=jnp.asarray(pack),
        pack_gp=(_gp.pack_f32(pack)
                 if _gp.supported(pack.shape[0]) else None),
        axis=jnp.asarray(axis_np),
        cone=jnp.asarray(cone_np),
    )


def pick_light(lt: LightTable, u):
    """Power-CDF selection. For small tables the searchsorted (a
    log-L chain of slow TPU gathers) becomes one fused broadcast
    compare + row-sum (reduction-fused by XLA, no materialization)."""
    L = lt.count
    if L <= 1024:
        idx = jnp.sum((lt.cdf[None, :] < u[..., None]).astype(jnp.int32),
                      axis=-1)
    else:
        idx = jnp.searchsorted(lt.cdf, u, side="left")
    return jnp.clip(idx, 0, L - 1).astype(jnp.int32)


def fetch_rows(lt: LightTable, idx):
    """(N, LP_COLS) packed light rows: MXU one-hot gather on TPU
    (ops/gather_pallas), one wide XLA row gather elsewhere."""
    from ..ops import gather_pallas as GPL
    from ..ops.traverse import _use_pallas
    if lt.pack_gp is not None and _use_pallas():
        return GPL.gather_rows(lt.pack_gp, idx)
    return lt.pack[idx]


class LightSample(NamedTuple):
    """PathLightSample (PathTracerTypes.hlsli): radiance already divided by
    pdf lives in li; pdf kept for MIS."""
    direction: jnp.ndarray   # (N,3)
    distance: jnp.ndarray    # (N,)
    li: jnp.ndarray          # (N,3) radiance / pdf
    pdf: jnp.ndarray         # (N,) solid-angle pdf at the shading point
    valid: jnp.ndarray       # (N,)
    delta: jnp.ndarray       # (N,) bool: point/spot/directional — a BSDF
    #                          ray can never hit these, so NEE MIS weight
    #                          must be 1 (down-weighting loses energy that
    #                          the scatter-ray strategy can never recover)


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
    inv_area = 1. Returns (direction, distance, li, inv_area, valid).

    ONE packed-row fetch per light (LightTable.pack) replaces the ~8
    narrow gathers of the round-2 version; scene_positions/indices kept
    for API compatibility (verts are baked into the pack and refreshed
    by refresh_pack after skinning)."""
    row = fetch_rows(lt, li_idx)
    kind = row[..., LP_KIND].astype(jnp.int32)
    rad = row[..., LP_RAD:LP_RAD + 3]
    p0 = row[..., LP_P0:LP_P0 + 3]
    e1 = row[..., LP_E1:LP_E1 + 3]
    e2 = row[..., LP_E2:LP_E2 + 3]
    pos_l = row[..., LP_POS:LP_POS + 3]
    r_s = row[..., LP_RADIUS]
    inv_area = row[..., LP_INV_AREA]

    # --- triangle
    bary = mu.sample_triangle_uniform(uv)
    lp_t = p0 + bary[..., 1:2] * e1 + bary[..., 2:3] * e2
    n_t = mu.safe_normalize(jnp.cross(e1, e2))

    # --- sphere (uniform point on surface; receiver-independent so
    # (light, uv) pairs are reusable across pixels like RTXDI samples)
    z = 1.0 - 2.0 * uv[..., 0]
    s_ = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * jnp.pi * uv[..., 1]
    n_s = jnp.stack([s_ * jnp.cos(phi), s_ * jnp.sin(phi), z], -1)
    lp_s = pos_l + r_s[..., None] * n_s

    is_tri = kind == LIGHT_TRIANGLE
    is_sph = kind == LIGHT_SPHERE
    is_pt = (kind == LIGHT_POINT) | (kind == LIGHT_SPOT)
    is_area = is_tri | is_sph

    lp = jnp.where(is_tri[..., None], lp_t,
                   jnp.where(is_sph[..., None], lp_s, pos_l))
    nrm = jnp.where(is_tri[..., None], n_t, n_s)

    to_l = lp - shading_pos
    dist_sq = jnp.maximum(jnp.sum(to_l * to_l, -1), 1e-9)
    dist = jnp.sqrt(dist_sq)
    dir_l = to_l / dist[..., None]
    cos_l = jnp.sum(nrm * (-dir_l), -1)

    dir_d = -mu.safe_normalize(pos_l)
    direction = jnp.where(is_area[..., None] | is_pt[..., None], dir_l,
                          dir_d)
    distance = jnp.where(is_area | is_pt, dist, mu.K_MAX_RAY_TRAVEL)

    li_area = rad * (jnp.maximum(cos_l, 0.0) / dist_sq)[..., None]
    li_point = rad / dist_sq[..., None]
    # spot cone shaping (evaluateLightShaping): attenuate by the
    # smoothstep cone factor of the light->surface direction
    shape = jnp.where(
        kind == LIGHT_SPOT,
        shaping_factor(jnp, row[..., LP_AXIS:LP_AXIS + 3],
                       row[..., LP_COS_CONE], row[..., LP_SOFT], -dir_l),
        1.0)
    li_point = li_point * shape[..., None]
    li = jnp.where(is_area[..., None], li_area,
                   jnp.where(is_pt[..., None], li_point, rad))
    valid = jnp.where(is_area, cos_l > 1e-6, True)
    return direction, distance, li, inv_area, valid


def sample_local_lights(lt: LightTable, scene_positions, scene_indices,
                        shading_pos, u3) -> LightSample:
    """Power-weighted light pick + per-light solid-angle sample
    (PolymorphicLight.hlsli calcSample equivalents).

    u3: (N,3) -> [light select, area sample x2]. One fused CDF pick
    (pick_light) + ONE packed-row fetch per lane (round-2 version paid
    a searchsorted gather chain + ~8 narrow field gathers)."""
    li_idx = pick_light(lt, u3[..., 0])
    row = fetch_rows(lt, li_idx)
    kind = row[..., LP_KIND].astype(jnp.int32)
    pick_pdf = row[..., LP_POWER] / jnp.maximum(lt.total_power, 1e-20)
    p0 = row[..., LP_P0:LP_P0 + 3]
    e1 = row[..., LP_E1:LP_E1 + 3]
    e2 = row[..., LP_E2:LP_E2 + 3]
    pos_l = row[..., LP_POS:LP_POS + 3]
    r_s = row[..., LP_RADIUS]
    rad = row[..., LP_RAD:LP_RAD + 3]
    inv_area = row[..., LP_INV_AREA]

    # --- triangle lights: uniform area sample
    bary = mu.sample_triangle_uniform(u3[..., 1:3])
    lp = p0 + bary[..., 1:2] * e1 + bary[..., 2:3] * e2
    fn = mu.safe_normalize(jnp.cross(e1, e2))
    to_l = lp - shading_pos
    dist_sq = jnp.maximum(jnp.sum(to_l * to_l, axis=-1), 1e-12)
    dist = jnp.sqrt(dist_sq)
    dir_ = to_l / dist[..., None]
    cos_l = jnp.sum(fn * (-dir_), axis=-1)   # light faces its +normal side
    # area pdf -> solid angle pdf (inv_area = 1/area for triangles)
    pdf_tri = dist_sq * inv_area / jnp.maximum(cos_l, 1e-12)
    tri_visible = cos_l > 1e-6

    # --- point lights (radiance = intensity [W/sr])
    to_p = pos_l - shading_pos
    dist_p_sq = jnp.maximum(jnp.sum(to_p * to_p, axis=-1), 1e-12)
    dist_p = jnp.sqrt(dist_p_sq)
    dir_p = to_p / dist_p[..., None]

    # --- sphere: uniform area sample over the surface
    z = 1.0 - 2.0 * u3[..., 1]
    s_ = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * jnp.pi * u3[..., 2]
    n_s = jnp.stack([s_ * jnp.cos(phi), s_ * jnp.sin(phi), z], -1)
    lp_s = pos_l + r_s[..., None] * n_s
    to_s = lp_s - shading_pos
    dist_s_sq = jnp.maximum(jnp.sum(to_s * to_s, axis=-1), 1e-12)
    dist_s = jnp.sqrt(dist_s_sq)
    dir_s = to_s / dist_s[..., None]
    cos_s = jnp.sum(n_s * (-dir_s), axis=-1)
    pdf_sph = dist_s_sq * inv_area / jnp.maximum(cos_s, 1e-12)
    sph_visible = cos_s > 1e-6

    # --- directional: fixed direction, infinite distance
    dir_d = -mu.safe_normalize(pos_l)

    is_tri = kind == LIGHT_TRIANGLE
    is_sph = kind == LIGHT_SPHERE
    is_spot = kind == LIGHT_SPOT
    is_pt = (kind == LIGHT_POINT) | is_spot
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
    # spot cone shaping (evaluateLightShaping; light->surface = -dir_p)
    shape = jnp.where(
        is_spot,
        shaping_factor(jnp, row[..., LP_AXIS:LP_AXIS + 3],
                       row[..., LP_COS_CONE], row[..., LP_SOFT], -dir_p),
        1.0)
    li = jnp.where(
        is_tri[..., None] | is_sph[..., None],
        rad / jnp.maximum(pdf, 1e-20)[..., None],
        jnp.where(is_pt[..., None],
                  rad * shape[..., None] / dist_p_sq[..., None]
                  / jnp.maximum(pick_pdf, 1e-20)[..., None],
                  rad / jnp.maximum(pick_pdf, 1e-20)[..., None]))
    valid = jnp.where(is_tri, tri_visible,
                      jnp.where(is_sph, sph_visible, is_pt | is_dir)) \
        & (lt.count > 0)
    return LightSample(direction=direction, distance=distance, li=li,
                       pdf=pdf, valid=valid, delta=is_pt | is_dir)
