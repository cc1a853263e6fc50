"""Flat SoA scene representation resident in HBM.

TPU-native equivalent of the reference's GPU scene residency layer
(donut/src/engine/Scene.cpp CreateMeshBuffers; donut/include/donut/shaders/
bindless.h InstanceData/GeometryData; material_cb.h MaterialConstants).

Bindless access is free on TPU: every buffer is just an array and every
"descriptor index" is an integer index. Geometry is stored as one global
vertex/index pool with per-triangle material/instance ids (instances are
pre-transformed to world space on (re)build — the TLAS/BLAS split collapses
to a single world-space LBVH; skinned/animated instances re-transform their
vertex range per frame, which is a bandwidth-bound jnp op).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


class MaterialTable(NamedTuple):
    """Per-material constants, SoA over M materials.

    Mirrors donut's MaterialConstants as consumed by
    PathTracerBridgeDonut.hlsli:444-521 (the StandardBSDFData conversion
    happens at shading time in pt/shading.py, exactly as in the reference).
    """
    base_color: jnp.ndarray            # (M,3) linear albedo
    metalness: jnp.ndarray             # (M,)
    roughness: jnp.ndarray             # (M,) linear (pre-remap) roughness
    ior: jnp.ndarray                   # (M,) interior index of refraction
    transmission: jnp.ndarray          # (M,) specular transmission factor
    diffuse_transmission: jnp.ndarray  # (M,)
    emissive: jnp.ndarray              # (M,3) radiance (already x intensity)
    thin_surface: jnp.ndarray          # (M,) bool
    nested_priority: jnp.ndarray       # (M,) int32, 0 -> max priority
    volume_absorption: jnp.ndarray     # (M,3) sigma_a for Beer-Lambert
    excluded_from_nee: jnp.ndarray     # (M,) bool
    shadow_nol_fadeout: jnp.ndarray    # (M,) low-grazing shadow fade
    # texture indices into the scene texture stack; -1 = constant
    base_tex: jnp.ndarray              # (M,) int32
    emissive_tex: jnp.ndarray          # (M,) int32
    metal_rough_tex: jnp.ndarray       # (M,) int32
    normal_tex: jnp.ndarray            # (M,) int32
    transmission_tex: jnp.ndarray      # (M,) int32
    alpha_mode: jnp.ndarray            # (M,) int32: 0 opaque, 1 mask, 2 blend
    alpha_cutoff: jnp.ndarray          # (M,)
    double_sided: jnp.ndarray          # (M,) bool (glTF doubleSided)
    uv_offset: jnp.ndarray             # (M,2) legacy single transform
    uv_scale: jnp.ndarray              # (M,2) (folded into uv_affine)
    uv_affine: jnp.ndarray             # (M,24) KHR_texture_transform per
    #   slot [base, normal, mr, emissive] x [m00,m01,m10,m11,tx,ty]
    #   (full offset+ROTATION+scale, composed per the KHR spec)
    specular_factor: jnp.ndarray       # (M,) KHR_materials_specular

    @property
    def count(self) -> int:
        return self.base_color.shape[0]


class TextureStack(NamedTuple):
    """All mips of all scene textures packed into one flat (P, 4) f32
    texel pool, with per-texture (offset, size) tables — every texture
    keeps its own power-of-two resolution and a trilinear tap is 8 row
    gathers. Mirrors the bindless texture table (t_BindlessTextures)."""
    pool: jnp.ndarray                  # (P, 4) f32 texels
    mip_offset: jnp.ndarray            # (K, L) i32 flat offset of mip l
    mip_size: jnp.ndarray              # (K, L) i32 edge size of mip l
    n_mips: jnp.ndarray                # (K,) i32 mip count per texture


class SceneArrays(NamedTuple):
    """The whole scene as a pytree of device arrays (world space)."""
    # geometry pool
    positions: jnp.ndarray       # (V,3) f32 world-space
    normals: jnp.ndarray         # (V,3) f32
    tangents: jnp.ndarray        # (V,4) f32 (xyz tangent, w bitangent sign)
    uvs: jnp.ndarray             # (V,2) f32
    indices: jnp.ndarray         # (T,3) i32
    tri_mat: jnp.ndarray         # (T,)  i32 material id per triangle
    tri_instance: jnp.ndarray    # (T,)  i32 instance id (motion vectors)
    materials: MaterialTable
    textures: Optional[TextureStack]
    # NEE local lights: emissive triangle ids + analytic lights live in
    # scene/lights.py LightTable (built host-side per frame)
    #
    # ---- packed gather planes (derived; see pack_gather_planes) --------
    # XLA row gathers on the target TPU cost ~1.4 ms each at 480k lanes
    # regardless of width, so load_surface fetches ONE packed row per
    # table instead of ~20 narrow gathers (ROADMAP item 4).
    vert_pack: Optional[jnp.ndarray] = None   # (V,12) pos3 nrm3 tan4 uv2
    tri_pack: Optional[jnp.ndarray] = None    # (T,4) i32 idx0..2, mat
    tri_geom_pack: Optional[jnp.ndarray] = None  # (T,5) f32 face_n3,
    #   raw uv_area, world_area (constants the interp gather can't blend)
    mat_pack: Optional[jnp.ndarray] = None    # (M,20) f32, see layout
    # MXU one-hot gather planes of the packed tables (ops/gather_pallas):
    # on TPU, XLA row gathers run at ~1.5 GB/s, so load_surface fetches
    # rows via one-hot matmuls against these instead
    vert_gp: Optional[object] = None          # GatherPlanes of vert_pack
    tri_gp: Optional[object] = None           # GatherPlanes of tri_pack
    tri_geom_gp: Optional[object] = None      # GatherPlanes of tri_geom
    mat_gp: Optional[object] = None           # GatherPlanes of mat_pack

    @property
    def num_triangles(self) -> int:
        return self.indices.shape[0]

    @property
    def num_vertices(self) -> int:
        return self.positions.shape[0]


# mat_pack column layout (all f32; texture ids / modes as exact floats)
MP_BASE = 0            # 0:3 base_color
MP_METAL = 3
MP_ROUGH = 4
MP_IOR = 5
MP_TRANS = 6
MP_DIFF_TRANS = 7
MP_EMISSIVE = 8        # 8:11
MP_THIN = 11
MP_NESTED_PRIO = 12
MP_SHADOW_FADE = 13
MP_BASE_TEX = 14
MP_EMISSIVE_TEX = 15
MP_MR_TEX = 16
MP_NORMAL_TEX = 17
MP_ALPHA_MODE = 18
MP_ALPHA_CUTOFF = 19
MP_DOUBLE_SIDED = 20
MP_UV_AFFINE = 21      # 21:45 — 4 slots x 6 affine coefficients
MP_SPECULAR_FACTOR = 45
MP_COLS = 46
UV_SLOT_BASE, UV_SLOT_NORMAL, UV_SLOT_MR, UV_SLOT_EMISSIVE = 0, 1, 2, 3


def pack_gather_planes(positions, normals, tangents, uvs, indices, tri_mat,
                       materials: MaterialTable):
    """Derive (vert_pack, tri_pack, mat_pack) from the SoA arrays.
    Works on numpy inputs (host cold path, no eager device dispatches)
    and on jnp/tracers (device re-pack after skinning)."""
    xp = np if isinstance(positions, np.ndarray) else jnp
    vert_pack = xp.concatenate(
        [positions, normals, tangents, uvs], axis=-1)        # (V,12)
    tri_pack = xp.concatenate(
        [indices, tri_mat[:, None]], axis=-1)                # (T,4)
    tri_geom = tri_geom_pack(positions, uvs, indices, xp)
    m = materials
    mat_pack = xp.concatenate([
        m.base_color,
        m.metalness[:, None], m.roughness[:, None], m.ior[:, None],
        m.transmission[:, None], m.diffuse_transmission[:, None],
        m.emissive,
        m.thin_surface[:, None].astype(jnp.float32),
        m.nested_priority[:, None].astype(jnp.float32),
        m.shadow_nol_fadeout[:, None],
        m.base_tex[:, None].astype(jnp.float32),
        m.emissive_tex[:, None].astype(jnp.float32),
        m.metal_rough_tex[:, None].astype(jnp.float32),
        m.normal_tex[:, None].astype(jnp.float32),
        m.alpha_mode[:, None].astype(jnp.float32),
        m.alpha_cutoff[:, None],
        m.double_sided[:, None].astype(jnp.float32),
        _effective_uv_affine(m, xp),
        m.specular_factor[:, None],
    ], axis=-1)                                              # (M,46)
    return vert_pack, tri_pack, tri_geom, mat_pack


def tri_geom_pack(positions, uvs, indices, xp=None):
    """(T,5) per-triangle constants [face_n(3), raw uv_area,
    world_area]: what load_surface needs beyond barycentric-blendable
    vertex attributes. Recomputed on device after skinning (face
    normal/area follow the pose; uv_area is pose-invariant)."""
    if xp is None:
        xp = np if isinstance(positions, np.ndarray) else jnp
    p0 = positions[indices[:, 0]]
    p1 = positions[indices[:, 1]]
    p2 = positions[indices[:, 2]]
    cr = xp.cross(p1 - p0, p2 - p0)
    ln = xp.linalg.norm(cr, axis=-1, keepdims=True)
    fn = cr / xp.maximum(ln, 1e-20)
    world_area = 0.5 * ln[:, 0]
    u0 = uvs[indices[:, 0]]
    e1 = uvs[indices[:, 1]] - u0
    e2 = uvs[indices[:, 2]] - u0
    uv_area = 0.5 * xp.abs(e1[..., 0] * e2[..., 1]
                           - e1[..., 1] * e2[..., 0])
    return xp.concatenate([fn, uv_area[:, None], world_area[:, None]],
                          axis=-1)


def _effective_uv_affine(m, xp):
    """(M,24): per-slot affine composed with the legacy single
    offset+scale (uv' = A_slot @ (S_legacy uv + o_legacy) + t_slot)."""
    a = m.uv_affine.reshape(-1, 4, 6)
    s = m.uv_scale[:, None, :]                   # (M,1,2)
    o = m.uv_offset[:, None, :]
    m00 = a[..., 0] * s[..., 0]
    m01 = a[..., 1] * s[..., 1]
    m10 = a[..., 2] * s[..., 0]
    m11 = a[..., 3] * s[..., 1]
    tx = a[..., 0] * o[..., 0] + a[..., 1] * o[..., 1] + a[..., 4]
    ty = a[..., 2] * o[..., 0] + a[..., 3] * o[..., 1] + a[..., 5]
    return xp.stack([m00, m01, m10, m11, tx, ty],
                    axis=-1).reshape(-1, 24)


def default_material_table(n: int = 1) -> dict:
    """Host-side (numpy) dict of default material fields, length n."""
    return dict(
        base_color=np.full((n, 3), 0.8, np.float32),
        metalness=np.zeros((n,), np.float32),
        roughness=np.full((n,), 0.5, np.float32),
        ior=np.full((n,), 1.5, np.float32),
        transmission=np.zeros((n,), np.float32),
        diffuse_transmission=np.zeros((n,), np.float32),
        emissive=np.zeros((n, 3), np.float32),
        thin_surface=np.zeros((n,), bool),
        nested_priority=np.zeros((n,), np.int32),
        volume_absorption=np.zeros((n, 3), np.float32),
        excluded_from_nee=np.zeros((n,), bool),
        shadow_nol_fadeout=np.zeros((n,), np.float32),
        base_tex=np.full((n,), -1, np.int32),
        emissive_tex=np.full((n,), -1, np.int32),
        metal_rough_tex=np.full((n,), -1, np.int32),
        normal_tex=np.full((n,), -1, np.int32),
        transmission_tex=np.full((n,), -1, np.int32),
        alpha_mode=np.zeros((n,), np.int32),
        alpha_cutoff=np.full((n,), 0.5, np.float32),
        double_sided=np.ones((n,), bool),
        uv_offset=np.zeros((n, 2), np.float32),
        uv_scale=np.ones((n, 2), np.float32),
        uv_affine=np.tile(np.asarray([1, 0, 0, 1, 0, 0] * 4,
                                     np.float32), (n, 1)),
        specular_factor=np.ones((n,), np.float32),
    )
