"""Surface loading + shading frame: the Bridge::loadSurface equivalent.

TPU-native port of:
  - RTXPT/PathTracerBridgeDonut.hlsli:364-528 (loadSurface: vertex fetch,
    interpolation, tangent space, material -> StandardBSDFData conversion)
  - RTXPT/PathTracer/Scene/ShadingData.hlsli (frame transforms,
    computeNewRayOrigin)
  - RTXPT/PathTracer/Scene/Material/ShadingUtils.hlsli (computeTangentSpace,
    adjustShadingNormal)

Operates on a whole wavefront of hits at once: every "fetch" is a gather
from the flat SoA scene arrays, every per-lane branch a masked select.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import mathutils as mu
from ..scene.types import SceneArrays
from . import bsdf as B

K_MAX_NESTED_PRIORITY = 14  # InteriorList.hlsli kMaxNestedPriority


class ShadingData(NamedTuple):
    """ShadingData SoA (ShadingData.hlsli:20-127)."""
    pos: jnp.ndarray            # (N,3) world hit position
    v: jnp.ndarray              # (N,3) toward viewer (= -rayDir)
    n: jnp.ndarray              # (N,3) shading normal (view-side corrected)
    t: jnp.ndarray              # (N,3) tangent
    b: jnp.ndarray              # (N,3) bitangent
    uv: jnp.ndarray             # (N,2)
    face_n: jnp.ndarray         # (N,3) triangle normal (winding side)
    vertex_n: jnp.ndarray       # (N,3) interpolated normal (view side)
    front_facing: jnp.ndarray   # (N,) bool
    material_id: jnp.ndarray    # (N,) i32
    opacity: jnp.ndarray        # (N,)
    ior: jnp.ndarray            # (N,) outside IoR (1.0 unless nested)
    shadow_nol_fadeout: jnp.ndarray  # (N,)
    thin_surface: jnp.ndarray   # (N,) bool
    nested_priority: jnp.ndarray  # (N,) i32 in [1, kMaxNestedPriority]

    def to_local(self, v):
        return mu.to_local(v, self.t, self.b, self.n)

    def from_local(self, v):
        return mu.from_local(v, self.t, self.b, self.n)

    def oriented_face_normal(self):
        return jnp.where(self.front_facing[..., None], self.face_n,
                         -self.face_n)

    def compute_new_ray_origin(self, viewside):
        """ShadingData::computeNewRayOrigin (ShadingData.hlsli:95-98)."""
        side = (self.front_facing == viewside)
        fn = jnp.where(side[..., None], self.face_n, -self.face_n)
        return mu.compute_ray_origin(self.pos, fn)


class SurfaceData(NamedTuple):
    """Bridge::loadSurface output: shading data + BSDF + emission
    (PathTracerTypes.hlsli SurfaceData)."""
    sd: ShadingData
    bsdf_data: B.BSDFData
    emission: jnp.ndarray       # (N,3)
    interior_ior: jnp.ndarray   # (N,) the material's own IoR
    alpha_mode: jnp.ndarray = None     # (N,) i32 (0 opaque/1 mask/2 blend)
    alpha_cutoff: jnp.ndarray = None   # (N,)
    double_sided: jnp.ndarray = None   # (N,) bool


def _compute_tangent_space(n, tangent_w):
    """computeTangentSpace (ShadingUtils.hlsli:110-138)."""
    txyz = tangent_w[..., :3]
    tw = tangent_w[..., 3]
    n_dot_t = jnp.sum(txyz * n, axis=-1)
    non_parallel = jnp.abs(n_dot_t) < 0.9999
    non_zero = jnp.sum(txyz * txyz, axis=-1) > 0.0
    valid = (tw != 0.0) & non_zero & non_parallel
    t_ortho = mu.safe_normalize(txyz - n * n_dot_t[..., None])
    b_ortho = jnp.cross(n, t_ortho) * tw[..., None]
    t_fallback = mu.safe_normalize(mu.perp_stark(n))
    b_fallback = jnp.cross(n, t_fallback)
    t = jnp.where(valid[..., None], t_ortho, t_fallback)
    b = jnp.where(valid[..., None], b_ortho, b_fallback)
    return t, b


def _adjust_shading_normal(n, v, oriented_face_n, tangent_w):
    """adjustShadingNormal (ShadingUtils.hlsli:144-165): blend shading
    normal toward the geometric normal at grazing angles."""
    ng = oriented_face_n
    sign_n = jnp.where(jnp.sum(n * ng, axis=-1) >= 0.0, 1.0, -1.0)
    ns = sign_n[..., None] * n
    k = 0.1
    cos_theta = jnp.sum(v * ns, axis=-1)
    t_blend = mu.saturate(cos_theta * (1.0 / k))
    blended = sign_n[..., None] * mu.safe_normalize(
        mu.lerp(ng, ns, t_blend[..., None]))
    n2 = jnp.where((cos_theta <= k)[..., None], blended, n)
    t, b = _compute_tangent_space(n2, tangent_w)
    return n2, t, b


def load_surface(scene: SceneArrays, prim, bary, ray_dir,
                 outside_ior=None, cone_width=None) -> SurfaceData:
    """Gather + interpolate surface attributes for a wavefront of hits and
    build StandardBSDFData exactly like the bridge
    (PathTracerBridgeDonut.hlsli:364-528).

    prim: (N,) triangle ids (must be valid; mask invalid lanes downstream).
    bary: (N,2) barycentrics (u=vert1, v=vert2).
    ray_dir: (N,3); outside_ior: (N,) or None (vacuum).
    """
    prim = jnp.maximum(prim, 0)
    # packed fetches: ONE row gather per table (tri_pack/vert_pack/
    # mat_pack; scene/types.py pack_gather_planes). On TPU the rows are
    # fetched with MXU one-hot matmuls (ops/gather_pallas) — XLA row
    # gathers sustain only ~1.5 GB/s on the target chip
    from ..ops import gather_pallas as GPL
    from ..ops.traverse import _use_pallas
    # round-3 in-loop A/B: MXU gathers save ~6 ms/bounce at 480k lanes
    # (729 vs 769 ms/sample full render), so they are the TPU default
    # now; RTXPT_MXU_GATHER=0 opts out
    import os as _os
    use_mxu = scene.tri_gp is not None and _use_pallas() and \
        _os.environ.get("RTXPT_MXU_GATHER", "1") == "1"
    if use_mxu:
        tp = GPL.gather_rows(scene.tri_gp, prim).astype(jnp.int32)
    else:
        tp = scene.tri_pack[prim]                   # (N,4) i32
    tri = tp[..., :3]
    mid = tp[..., 3]
    w = jnp.stack([1.0 - bary[..., 0] - bary[..., 1],
                   bary[..., 0], bary[..., 1]], axis=-1)  # (N,3)

    if use_mxu and scene.tri_geom_gp is not None:
        # fused barycentric gather: one kernel produces the interpolated
        # attribute row; the per-triangle constants (face normal, uv /
        # world areas) come from the tri_geom table instead of raw
        # vertex rows (round-3 device trace: the gather(3n rows) ->
        # transpose -> reshape -> mul -> reduce chain was ~12 ms/bounce)
        vi = GPL.gather_rows_interp(scene.vert_gp, tri, w)   # (N,12)
        geom = GPL.gather_rows(scene.tri_geom_gp, prim)      # (N,5)
        face_n = geom[..., 0:3]
        uv_area_raw = geom[..., 3]
        world_area = geom[..., 4]
        vp = None
    else:
        vp = scene.vert_pack[tri]                   # (N,3,12)
        vi = jnp.sum(vp * w[..., None], axis=-2)    # interpolated (N,12)
        p0 = vp[:, 0, 0:3]
        p1 = vp[:, 1, 0:3]
        p2 = vp[:, 2, 0:3]
        cr = jnp.cross(p1 - p0, p2 - p0)
        face_n = mu.safe_normalize(cr)
        world_area = 0.5 * jnp.linalg.norm(cr, axis=-1)
        uv_area_raw = None                          # from raw uvs below

    pos = vi[..., 0:3]
    nrm = mu.safe_normalize(vi[..., 3:6])
    tan = vi[..., 6:10]
    uv = vi[..., 10:12]

    v = -ray_dir
    front_facing = jnp.sum(face_n * v, axis=-1) >= 0.0

    # vertexN oriented to the view side (BridgeDonut:404)
    vertex_n = jnp.where(front_facing[..., None], nrm, -nrm)
    # all surfaces double-sided: flip shading normal for back hits (:535)
    n = jnp.where(front_facing[..., None], nrm, -nrm)
    oriented_ng = jnp.where(front_facing[..., None], face_n, -face_n)
    n, t, b = _adjust_shading_normal(n, v, oriented_ng, tan)

    # ---- material fetch + conversion (BridgeDonut:444-521)
    from ..scene import types as ST
    if use_mxu:
        mrow = GPL.gather_rows(scene.mat_gp, mid)   # (N,20)
    else:
        mrow = scene.mat_pack[mid]                  # (N,20)
    base_color = mrow[..., ST.MP_BASE:ST.MP_BASE + 3]
    metalness = mrow[..., ST.MP_METAL]
    roughness = mrow[..., ST.MP_ROUGH]
    mat_ior = mrow[..., ST.MP_IOR]
    transmission = mrow[..., ST.MP_TRANS]
    diffuse_transmission = mrow[..., ST.MP_DIFF_TRANS]
    thin = mrow[..., ST.MP_THIN] != 0.0
    emissive = mrow[..., ST.MP_EMISSIVE:ST.MP_EMISSIVE + 3]
    shadow_fade = mrow[..., ST.MP_SHADOW_FADE]
    opacity = jnp.ones_like(roughness)
    nested_priority = jnp.minimum(
        K_MAX_NESTED_PRIORITY,
        1 + mrow[..., ST.MP_NESTED_PRIO].astype(jnp.int32)
    ).astype(jnp.int32)

    # ---- texture taps with ray-cone LOD (sampleGeometryMaterial +
    # createTextureSampler, BridgeDonut:337-352,411)
    if scene.textures is not None:
        from ..scene import textures as TX
        # KHR_texture_transform: per-SLOT affine (offset + rotation +
        # scale), matching donut's per-texture transform support
        def slot_uv(uv_in, s):
            a = mrow[..., ST.MP_UV_AFFINE + 6 * s:
                     ST.MP_UV_AFFINE + 6 * s + 6]
            return jnp.stack(
                [a[..., 0] * uv_in[..., 0] + a[..., 1] * uv_in[..., 1]
                 + a[..., 4],
                 a[..., 2] * uv_in[..., 0] + a[..., 3] * uv_in[..., 1]
                 + a[..., 5]], axis=-1)

        uv_base = slot_uv(uv, ST.UV_SLOT_BASE)
        uv_nm = slot_uv(uv, ST.UV_SLOT_NORMAL)
        uv_mr = slot_uv(uv, ST.UV_SLOT_MR)
        uv_em = slot_uv(uv, ST.UV_SLOT_EMISSIVE)
        if uv_area_raw is None:
            u0 = vp[:, 0, 10:12]
            e1uv = vp[:, 1, 10:12] - u0
            e2uv = vp[:, 2, 10:12] - u0
            uv_area_raw = 0.5 * jnp.abs(e1uv[..., 0] * e2uv[..., 1]
                                        - e1uv[..., 1] * e2uv[..., 0])
        # the base-slot affine scales uv areas by |det| (translation
        # drops out), so the raw per-tri area is pose/slot-invariant
        ab = mrow[..., ST.MP_UV_AFFINE:ST.MP_UV_AFFINE + 4]
        uv_area = uv_area_raw * jnp.abs(ab[..., 0] * ab[..., 3]
                                        - ab[..., 1] * ab[..., 2])
        if cone_width is not None:
            cos_t = jnp.sum(face_n * v, axis=-1)
            lod = TX.ray_cone_lod(cone_width, cos_t, uv_area, world_area)
        else:
            lod = None
        base_tex = mrow[..., ST.MP_BASE_TEX].astype(jnp.int32)
        mr_tex = mrow[..., ST.MP_MR_TEX].astype(jnp.int32)
        em_tex = mrow[..., ST.MP_EMISSIVE_TEX].astype(jnp.int32)
        base_tap = TX.sample_stack(scene.textures, base_tex, uv_base, lod)
        base_color = base_color * base_tap[..., :3]
        opacity = base_tap[..., 3]
        mr = TX.sample_stack(scene.textures, mr_tex, uv_mr, lod)
        has_mr = mr_tex >= 0
        roughness = jnp.where(has_mr, roughness * mr[..., 1], roughness)
        metalness = jnp.where(has_mr, metalness * mr[..., 2], metalness)
        em_tap = TX.sample_stack(scene.textures, em_tex, uv_em, lod)
        emissive = emissive * em_tap[..., :3]
        nm = mrow[..., ST.MP_NORMAL_TEX].astype(jnp.int32)
        has_nm = nm >= 0
        nm_tap = TX.sample_stack(scene.textures, nm, uv_nm, lod)
        n_mapped = TX.perturb_normal(n, t, b, nm_tap)
        n = jnp.where(has_nm[..., None], n_mapped, n)
        n, t, b = _adjust_shading_normal(n, v, oriented_ng, tan)

    spec_trans = transmission * (1.0 - metalness)
    diff_trans = diffuse_transmission * (1.0 - metalness)
    f = (mat_ior - 1.0) / (mat_ior + 1.0)
    # KHR_materials_specular: scales the dielectric F0
    f0 = f * f * mrow[..., ST.MP_SPECULAR_FACTOR]
    diffuse = base_color * (1.0 - metalness)[..., None]
    specular = mu.lerp(f0[..., None] * jnp.ones_like(base_color),
                       base_color, metalness[..., None])

    if outside_ior is None:
        outside_ior = jnp.ones_like(mat_ior)
    eta = jnp.where(front_facing, outside_ior / mat_ior,
                    mat_ior / outside_ior)

    data = B.BSDFData(
        diffuse=diffuse, specular=specular, roughness=roughness,
        metallic=metalness, eta=eta, transmission=base_color,
        diffuse_transmission=diff_trans, specular_transmission=spec_trans)

    # single-sided emission (BridgeDonut:517)
    emission = jnp.where(front_facing[..., None], emissive, 0.0)

    sd = ShadingData(
        pos=pos, v=v, n=n, t=t, b=b, uv=uv, face_n=face_n,
        vertex_n=vertex_n, front_facing=front_facing, material_id=mid,
        opacity=opacity, ior=outside_ior,
        shadow_nol_fadeout=shadow_fade,
        thin_surface=thin, nested_priority=nested_priority)
    return SurfaceData(sd=sd, bsdf_data=data, emission=emission,
                       interior_ior=mat_ior,
                       alpha_mode=mrow[..., ST.MP_ALPHA_MODE].astype(
                           jnp.int32),
                       alpha_cutoff=mrow[..., ST.MP_ALPHA_CUTOFF],
                       double_sided=mrow[..., ST.MP_DOUBLE_SIDED] != 0.0)


def update_outside_ior(surface: SurfaceData, outside_ior) -> SurfaceData:
    """Bridge::updateOutsideIoR (BridgeDonut:530-536): recompute eta after
    the nested-dielectric resolve changed the outside IoR."""
    sd = surface.sd._replace(ior=outside_ior)
    eta = jnp.where(sd.front_facing, outside_ior / surface.interior_ior,
                    surface.interior_ior / outside_ior)
    data = surface.bsdf_data._replace(eta=eta)
    return SurfaceData(sd=sd, bsdf_data=data, emission=surface.emission,
                       interior_ior=surface.interior_ior,
                       alpha_mode=surface.alpha_mode,
                       alpha_cutoff=surface.alpha_cutoff,
                       double_sided=surface.double_sided)


def make_wavefront_bsdf(surface: SurfaceData,
                        active_lobes=None) -> B.FalcorBSDF:
    """FalcorBSDF::make over a wavefront; cos_v = dot(V,N) in world space."""
    cos_v = jnp.sum(surface.sd.v * surface.sd.n, axis=-1)
    return B.make_bsdf(surface.bsdf_data, cos_v, surface.sd.thin_surface,
                       active_lobes)
