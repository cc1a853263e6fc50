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

import jax.numpy as jnp

from ..core import mathutils as mu
from ..ops import traverse
from ..scene.camera import CameraData, compute_rays
from . import bsdf as B
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
    view_dir: jnp.ndarray     # (N,3) unit, camera->surface
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
                  px, py) -> GBuffer:
    """Trace primary rays (no jitter for the stable pass, like the
    reference's BUILD pass using stable sequences) and export guide
    buffers + motion vectors."""
    origin, direction = compute_rays(cam, px, py)
    hit = traverse.trace_closest(assets.bvh, assets.soup, origin, direction)
    valid = hit.valid
    surf = shading.load_surface(assets.scene, jnp.maximum(hit.prim, 0),
                                hit.bary, direction)
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
    return GBuffer(
        valid=valid, prim=hit.prim, bary=hit.bary,
        t=jnp.where(valid, hit.t, big),
        pos=sd.pos, normal=sd.n, face_normal=sd.face_n,
        view_z=jnp.where(valid, view_z, big),
        roughness=rough,
        diffuse_albedo=jnp.where(valid[..., None], diff_albedo, 0.0),
        specular_albedo=jnp.where(valid[..., None], spec_albedo, 0.0),
        emission=jnp.where(valid[..., None], surf.emission, 0.0),
        motion=motion, view_dir=direction, surface=surf)
