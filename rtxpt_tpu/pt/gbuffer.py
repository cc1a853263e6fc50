"""Primary-surface pass: V-buffer + denoiser guide buffers + motion vectors.

TPU-native equivalent of the reference's BUILD-pass outputs consumed by
ReSTIR and the denoiser:
  - ExportVisibilityBuffer.hlsl (depth / motion vectors / packed surface
    for RTXDI, Sample.cpp:2316-2325)
  - RTXDI/SurfaceData.hlsli PathTracerSurfaceData (:23-80)
  - stable-plane guide buffers (normal/roughness/diffuse+specular albedo)

This is the 1-plane core of the stable-planes decomposition (plane 0 =
primary surface); pt/stableplanes.py builds the delta-tree planes on top.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import mathutils as mu
from ..ops import traverse
from ..scene.camera import CameraData, compute_rays
from . import bsdf as B
from . import nested
from . import shading


class GBuffer(NamedTuple):
    """Primary-surface SoA over pixels (flattened)."""
    valid: jnp.ndarray        # (N,) bool hit anything
    prim: jnp.ndarray         # (N,) i32
    bary: jnp.ndarray         # (N,2)
    t: jnp.ndarray            # (N,) hit distance
    pos: jnp.ndarray          # (N,3) world position
    normal: jnp.ndarray       # (N,3) shading normal
    face_normal: jnp.ndarray  # (N,3)
    view_z: jnp.ndarray       # (N,) linear depth along camera forward
    roughness: jnp.ndarray    # (N,)
    diffuse_albedo: jnp.ndarray   # (N,3)
    specular_albedo: jnp.ndarray  # (N,3)
    emission: jnp.ndarray     # (N,3)
    motion: jnp.ndarray       # (N,2) screen-space motion (prev - cur), px
    view_dir: jnp.ndarray     # (N,3) unit, camera->surface (post-PSR)
    psr_thp: jnp.ndarray      # (N,3) throughput through the delta chain
    interior: jnp.ndarray     # (N,2) u32 nested stack after the chain
    surface: shading.SurfaceData  # full surface data for shading reuse


def project_to_screen(cam: CameraData, pos):
    """World position -> pixel coordinates for the given camera (U, V, W
    are mutually orthogonal by construction in make_camera)."""
    d = pos - cam.pos
    du = mu.dot(d, cam.u, False) / jnp.maximum(
        mu.dot(cam.u, cam.u, False), 1e-20)
    dv = mu.dot(d, cam.v, False) / jnp.maximum(
        mu.dot(cam.v, cam.v, False), 1e-20)
    dw = mu.dot(d, cam.w, False) / jnp.maximum(
        mu.dot(cam.w, cam.w, False), 1e-20)
    ndc_x = du / jnp.where(jnp.abs(dw) < 1e-9, 1e-9, dw)
    ndc_y = dv / jnp.where(jnp.abs(dw) < 1e-9, 1e-9, dw)
    px = (ndc_x + 1.0) * 0.5 * cam.viewport[0] - 0.5
    py = (1.0 - ndc_y) * 0.5 * cam.viewport[1] - 0.5
    return jnp.stack([px, py], axis=-1), dw


def trace_gbuffer(assets, cam: CameraData, prev_cam: CameraData,
                  px, py, psr_depth: int = 2) -> GBuffer:
    """Trace primary rays (no jitter for the stable pass, like the
    reference's BUILD pass using stable sequences) and export guide
    buffers + motion vectors.

    Primary Surface Replacement: pure-delta surfaces (mirror / smooth
    glass) are followed along their DOMINANT delta branch for up to
    `psr_depth` extra segments, so ReSTIR and the denoiser operate on the
    reflected/refracted surface -- the single-branch core of the
    reference's stable-planes delta tree (StablePlanes.hlsli BUILD pass,
    PSD dominant-lobe selection)."""
    n = px.shape[0]
    origin, direction = compute_rays(cam, px, py)
    hit = traverse.trace_closest(assets.bvh, assets.soup, origin,
                                 direction, dense=assets.dense)
    valid = hit.valid
    surf = shading.load_surface(assets.scene, jnp.maximum(hit.prim, 0),
                                hit.bary, direction)
    sd = surf.sd
    psr_thp = jnp.ones((n, 3), jnp.float32)
    interior = nested.empty(n)
    emission_acc = jnp.zeros((n, 3), jnp.float32)
    total_t = hit.t

    for _ in range(psr_depth):
        bsdf_i = shading.make_wavefront_bsdf(surf)
        # pure delta surface: no diffuse mass, zero GGX alpha on the
        # active specular lobes
        pure_delta = valid & \
            (bsdf_i.p_diffuse + bsdf_i.p_diffuse_t < 1e-4) & \
            (bsdf_i.alpha == 0.0) & (bsdf_i.alpha_t == 0.0) & \
            (bsdf_i.p_specular + bsdf_i.p_specular_t > 0.0)
        if psr_depth == 0:
            break
        sdi = surf.sd
        cos_i = jnp.sum(sdi.v * sdi.n, -1)
        f, cos_t = B.fresnel_dielectric(bsdf_i.eta, cos_i)
        has_trans = bsdf_i.p_specular_t > 0.0
        # dominant branch: refraction when transmissive and F < 0.5
        take_refr = has_trans & (f < 0.5)
        refl_dir = mu.reflect(-sdi.v, sdi.n)
        refr_dir = mu.safe_normalize(
            (bsdf_i.eta * cos_i - cos_t)[..., None] * sdi.n
            - bsdf_i.eta[..., None] * sdi.v)
        new_dir = jnp.where(take_refr[..., None], refr_dir, refl_dir)
        # branch throughput: metals use colored Schlick, dielectrics F/1-F
        metal_w = B.fresnel_schlick(bsdf_i.spec_albedo, 1.0,
                                    cos_i[..., None])
        diel_w = jnp.where(take_refr[..., None],
                           ((1.0 - f)[..., None] * bsdf_i.trans_albedo),
                           f[..., None] * jnp.ones((n, 3)))
        is_metal_delta = (bsdf_i.p_specular > bsdf_i.p_specular_t)
        step_thp = jnp.where(is_metal_delta[..., None], metal_w, diel_w)

        step = pure_delta & (mu.luminance(step_thp) > 1e-4)
        if not isinstance(step, jnp.ndarray):
            break
        new_origin = sdi.compute_new_ray_origin(~take_refr)
        interior2 = jnp.where(
            (step & take_refr & ~sdi.thin_surface)[..., None],
            nested.handle_intersection(interior, sdi.material_id,
                                       sdi.nested_priority,
                                       sdi.front_facing), interior)
        hit2 = traverse.trace_closest(assets.bvh, assets.soup, new_origin,
                                      new_dir, active=step,
                                      dense=assets.dense)
        emission_acc = emission_acc + jnp.where(
            step[..., None], psr_thp * surf.emission, 0.0)
        surf2 = shading.load_surface(assets.scene,
                                     jnp.maximum(hit2.prim, 0), hit2.bary,
                                     new_dir)
        # lanes that stepped: replace surface; missed chains become sky
        moved = step
        hit_ok = moved & hit2.valid
        sky = moved & ~hit2.valid
        psr_thp = jnp.where(moved[..., None], psr_thp * step_thp, psr_thp)
        interior = jnp.where(moved[..., None], interior2, interior)
        valid = jnp.where(moved, hit_ok, valid)
        total_t = jnp.where(hit_ok, total_t + hit2.t, total_t)
        direction = jnp.where(moved[..., None], new_dir, direction)

        def _sel(a, b2, m=moved):
            return jnp.where(m.reshape(m.shape + (1,) * (a.ndim - 1)), a,
                             b2)
        surf = jax.tree_util.tree_map(lambda a, b2: _sel(a, b2), surf2,
                                      surf)
        hit = hit._replace(prim=jnp.where(moved, hit2.prim, hit.prim),
                           bary=jnp.where(moved[..., None], hit2.bary,
                                          hit.bary))
        sd = surf.sd

    bsdf = shading.make_wavefront_bsdf(surf)

    # denoiser guide albedos (BSDFProperties approximation,
    # StandardBSDF.hlsli:116-121)
    d = surf.bsdf_data
    diff_albedo = (1.0 - d.diffuse_transmission[..., None]) * \
        (1.0 - d.specular_transmission[..., None]) * d.diffuse
    # specular guide includes the transmission albedo so demodulation
    # does not null out glass (specularReflection + specularTransmission
    # albedos, StandardBSDF.hlsli:120-121)
    spec_albedo = (1.0 - d.specular_transmission[..., None]) * d.specular \
        + d.specular_transmission[..., None] * d.transmission
    rough = jnp.where(bsdf.alpha < B.K_MIN_GGX_ALPHA, 0.0, d.roughness)

    # motion: static geometry -> reproject world pos with the prev camera
    cur_xy = jnp.stack([px.astype(jnp.float32), py.astype(jnp.float32)],
                       -1)
    prev_xy, _ = project_to_screen(prev_cam, sd.pos)
    motion = jnp.where(valid[..., None], prev_xy - cur_xy, 0.0)

    _, view_z = project_to_screen(cam, sd.pos)
    big = mu.K_MAX_RAY_TRAVEL
    emission_out = emission_acc + jnp.where(
        valid[..., None], psr_thp * surf.emission, 0.0)
    return GBuffer(
        valid=valid, prim=hit.prim, bary=hit.bary,
        t=jnp.where(valid, total_t, big),
        pos=sd.pos, normal=sd.n, face_normal=sd.face_n,
        view_z=jnp.where(valid, view_z, big),
        roughness=rough,
        diffuse_albedo=jnp.where(valid[..., None], diff_albedo, 0.0),
        specular_albedo=jnp.where(valid[..., None], spec_albedo, 0.0),
        emission=emission_out,
        motion=motion, view_dir=direction, psr_thp=psr_thp,
        interior=interior, surface=surf)
