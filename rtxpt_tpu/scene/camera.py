"""Camera model: pinhole + thin lens with per-frame jitter.

Bit-faithful port of the reference's camera math:
  - BridgeCamera (RTXPT/PathTracer/PathTracerShared.h:101-133)
  - ComputeRayPinhole / ComputeRayThinlens
    (RTXPT/PathTracer/PathTracerHelpers.hlsli:76-153)
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core import mathutils as mu


class CameraData(NamedTuple):
    """PathTracerCameraData equivalent; scalars stored as 0-d arrays so the
    whole struct is a jit-traceable pytree."""
    pos: jnp.ndarray            # (3,)
    direction: jnp.ndarray      # (3,) normalized
    u: jnp.ndarray              # (3,) scaled right vector
    v: jnp.ndarray              # (3,) scaled up vector
    w: jnp.ndarray              # (3,) dir * focalDistance
    viewport: jnp.ndarray       # (2,) f32 (width, height)
    jitter: jnp.ndarray         # (2,)
    aperture_radius: jnp.ndarray
    near_z: jnp.ndarray
    far_z: jnp.ndarray
    pixel_cone_spread_angle: jnp.ndarray


def make_camera(width: int, height: int, pos, look_dir, up=(0.0, 1.0, 0.0),
                fov_y: float = math.radians(60.0), near_z: float = 0.001,
                far_z: float = 1e7, focal_distance: float = 1.0,
                aperture_radius: float = 0.0,
                jitter=(0.0, 0.0)) -> CameraData:
    """BridgeCamera (PathTracerShared.h:101-133)."""
    pos = np.asarray(pos, np.float32)
    d = np.asarray(look_dir, np.float32)
    d = d / np.linalg.norm(d)
    up = np.asarray(up, np.float32)
    aspect = width / float(height)
    w = d * focal_distance
    u = np.cross(w, up)
    u = u / np.linalg.norm(u)
    v = np.cross(u, w)
    v = v / np.linalg.norm(v)
    ulen = focal_distance * math.tan(fov_y * 0.5) * aspect
    vlen = focal_distance * math.tan(fov_y * 0.5)
    spread = math.atan(2.0 * math.tan(fov_y * 0.5) / height)
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return CameraData(
        pos=f32(pos), direction=f32(d), u=f32(u * ulen), v=f32(v * vlen),
        w=f32(w), viewport=f32([width, height]), jitter=f32(jitter),
        aperture_radius=f32(aperture_radius), near_z=f32(near_z),
        far_z=f32(far_z), pixel_cone_spread_angle=f32(spread))


def look_at(width, height, eye, target, up=(0.0, 1.0, 0.0), **kw):
    eye = np.asarray(eye, np.float32)
    target = np.asarray(target, np.float32)
    return make_camera(width, height, eye, target - eye, up, **kw)


def compute_ray_pinhole(cam: CameraData, pixel_x, pixel_y):
    """Primary ray for pixel centers + jitter (PathTracerHelpers.hlsli:97).
    pixel_* are float or int arrays of any shape; returns (origin, dir)."""
    px = pixel_x.astype(jnp.float32) + 0.5 + cam.jitter[0]
    py = pixel_y.astype(jnp.float32) + 0.5 + cam.jitter[1]
    p = jnp.stack([px / cam.viewport[0], py / cam.viewport[1]], axis=-1)
    ndc = jnp.stack([2.0 * p[..., 0] - 1.0, -2.0 * p[..., 1] + 1.0], axis=-1)
    d = (ndc[..., 0:1] * cam.u + ndc[..., 1:2] * cam.v + cam.w)
    d = mu.normalize(d)
    origin = jnp.broadcast_to(cam.pos, d.shape)
    # reference moves the origin to the near plane (Helpers:109-113)
    inv_cos = 1.0 / mu.dot(mu.normalize(cam.w[None]), d)
    origin = origin + d * (cam.near_z * inv_cos)
    return origin, d


def compute_ray_thinlens(cam: CameraData, pixel_x, pixel_y, u2):
    """Thin-lens ray with defocus (PathTracerHelpers.hlsli:126-153).
    u2: uniform 2D samples, shape (...,2). Note the reference flips the
    jitter sign in the thin-lens path."""
    px = pixel_x.astype(jnp.float32) + 0.5 - cam.jitter[0]
    py = pixel_y.astype(jnp.float32) + 0.5 + cam.jitter[1]
    p = jnp.stack([px / cam.viewport[0], py / cam.viewport[1]], axis=-1)
    ndc = jnp.stack([2.0 * p[..., 0] - 1.0, -2.0 * p[..., 1] + 1.0], axis=-1)
    d = ndc[..., 0:1] * cam.u + ndc[..., 1:2] * cam.v + cam.w
    origin = jnp.broadcast_to(cam.pos, d.shape)
    ap = mu.sample_disk_concentric(u2)
    target = origin + d
    un = mu.normalize(cam.u[None])
    vn = mu.normalize(cam.v[None])
    origin = origin + cam.aperture_radius * (
        ap[..., 0:1] * un + ap[..., 1:2] * vn)
    d = mu.normalize(target - origin)
    inv_cos = 1.0 / mu.dot(mu.normalize(cam.w[None]), d)
    origin = origin + d * (cam.near_z * inv_cos)
    return origin, d


def compute_rays(cam: CameraData, pixel_x, pixel_y, u2=None):
    """Dispatch thin-lens vs pinhole on aperture (Bridge::computeCameraRay,
    PathTracerBridgeDonut.hlsli:309)."""
    if u2 is None:
        return compute_ray_pinhole(cam, pixel_x, pixel_y)
    o_t, d_t = compute_ray_thinlens(cam, pixel_x, pixel_y, u2)
    o_p, d_p = compute_ray_pinhole(cam, pixel_x, pixel_y)
    use_tl = cam.aperture_radius > 0.0
    return (jnp.where(use_tl, o_t, o_p), jnp.where(use_tl, d_t, d_p))
