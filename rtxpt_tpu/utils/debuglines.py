"""Debug line rendering: the reference's DebugLines system re-done
array-native.

TPU-native equivalent of RTXPT/DebugLines.hlsl + ShaderDebug.hlsli's
DebugDrawLine/DebugDrawAABB (device line buffer appended from shaders,
rasterized over the frame). Here the "buffer" is a fixed-capacity SoA
pytree; emitters are pure functions returning new buffers, and the
overlay is a parametric-sample scatter into the image — no rasterizer
needed.

Main uses mirrored from the reference:
  * pick-pixel path visualization: trace one pixel's bounce chain and
    draw each segment (Sample.cpp pick-pixel + DebugLinesPass);
  * AABB wireframes (BVH/cluster boxes, DebugDrawAABB);
  * normal glyphs at the primary hit.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

CAPACITY = 4096


class LineBuffer(NamedTuple):
    """Fixed-capacity line SoA (DebugLines.hlsl t_DebugLines)."""
    a: jnp.ndarray        # (K,3) world start
    b: jnp.ndarray        # (K,3) world end
    color: jnp.ndarray    # (K,3)
    count: jnp.ndarray    # () i32 valid prefix

    @staticmethod
    def empty(capacity: int = CAPACITY) -> "LineBuffer":
        return LineBuffer(jnp.zeros((capacity, 3)),
                          jnp.zeros((capacity, 3)),
                          jnp.zeros((capacity, 3)),
                          jnp.zeros((), jnp.int32))


def add_lines(buf: LineBuffer, a, b, color) -> LineBuffer:
    """Append a batch of segments (masked at capacity)."""
    a = jnp.atleast_2d(jnp.asarray(a, jnp.float32))
    b = jnp.atleast_2d(jnp.asarray(b, jnp.float32))
    color = jnp.broadcast_to(jnp.asarray(color, jnp.float32), a.shape)
    k = a.shape[0]
    idx = buf.count + jnp.arange(k)
    ok = idx < buf.a.shape[0]
    idx = jnp.where(ok, idx, buf.a.shape[0] - 1)
    put = lambda arr, val: arr.at[idx].set(
        jnp.where(ok[:, None], val, arr[idx]))
    return LineBuffer(put(buf.a, a), put(buf.b, b),
                      put(buf.color, color),
                      jnp.minimum(buf.count + k, buf.a.shape[0]))


def add_aabb(buf: LineBuffer, lo, hi, color=(1.0, 0.8, 0.1)
             ) -> LineBuffer:
    """12-edge wireframe of an axis-aligned box (DebugDrawAABB)."""
    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)
    c = np.stack([lo, hi])
    corners = np.asarray([[c[i][0], c[j][1], c[k][2]]
                          for i in range(2) for j in range(2)
                          for k in range(2)], np.float32)
    edges = [(0, 1), (0, 2), (0, 4), (1, 3), (1, 5), (2, 3), (2, 6),
             (3, 7), (4, 5), (4, 6), (5, 7), (6, 7)]
    a = corners[[e[0] for e in edges]]
    b = corners[[e[1] for e in edges]]
    return add_lines(buf, a, b, color)


def lines_for_path(assets, cam, x: int, y: int, *, max_bounces: int = 6,
                   buf: LineBuffer = None) -> LineBuffer:
    """Trace pixel (x, y)'s deterministic bounce chain and emit one
    segment per path vertex — the reference's pick-pixel path
    visualization (DebugLinesPass fed from the path tracer's
    DebugDrawLine calls). Color fades white->red with bounce depth;
    miss segments are drawn dim blue to the horizon."""
    from .. import config as C
    from ..models.renderer import reference_config
    from ..ops import traverse
    from ..pt import integrator, shading

    if buf is None:
        buf = LineBuffer.empty()
    px = jnp.asarray([x], jnp.uint32)
    py = jnp.asarray([y], jnp.uint32)
    cfg = reference_config(max_bounces=max_bounces)
    consts = C.default_constants(0)
    p = integrator.init_paths(cam, px, py, cfg, consts, 0)
    origin, direction = p.origin, p.direction
    active = p.active
    for depth in range(max_bounces + 1):
        hit = traverse.trace_closest(assets.bvh, assets.soup, origin,
                                     direction, active=active,
                                     dense=assets.dense)
        t = jnp.where(hit.valid, hit.t, 25.0)
        end = origin + direction * t[:, None]
        fade = depth / max(max_bounces, 1)
        col = jnp.where(hit.valid[:, None],
                        jnp.asarray([[1.0, 1.0 - fade, 1.0 - fade]]),
                        jnp.asarray([[0.2, 0.3, 0.8]]))
        buf = add_lines(buf, jnp.where(active[:, None], origin, 0.0),
                        jnp.where(active[:, None], end, 0.0),
                        jnp.where(active[:, None], col, 0.0))
        if depth == max_bounces:
            break
        # deterministic mirror continuation around the shading normal:
        # the glyph shows the geometry chain, not a stochastic path
        surf = shading.load_surface(assets.scene,
                                    jnp.maximum(hit.prim, 0), hit.bary,
                                    direction)
        sd = surf.sd
        d_new = direction - 2.0 * jnp.sum(
            direction * sd.n, -1, keepdims=True) * sd.n
        origin = sd.compute_new_ray_origin(jnp.ones(1, bool))
        direction = d_new / jnp.maximum(
            jnp.linalg.norm(d_new, axis=-1, keepdims=True), 1e-9)
        active = active & hit.valid
    return buf


def rasterize_overlay(image, buf: LineBuffer, cam, *,
                      samples_per_line: int = 128):
    """Scatter-paint the line buffer over an (H,W,3) image using
    parametric sampling + screen projection (replaces the reference's
    line rasterization draw call)."""
    from ..pt.gbuffer import project_to_screen

    h, w = image.shape[0], image.shape[1]
    k = buf.a.shape[0]
    ts = jnp.linspace(0.0, 1.0, samples_per_line)
    pts = buf.a[:, None, :] + (buf.b - buf.a)[:, None, :] * \
        ts[None, :, None]                                # (K,S,3)
    xy, z = project_to_screen(cam, pts.reshape(-1, 3))
    xi = jnp.round(xy[:, 0]).astype(jnp.int32)
    yi = jnp.round(xy[:, 1]).astype(jnp.int32)
    live = (jnp.arange(k)[:, None] < buf.count)
    live = jnp.broadcast_to(live, (k, samples_per_line)).reshape(-1)
    ok = live & (z.reshape(-1) > 0.0) & (xi >= 0) & (xi < w) & \
        (yi >= 0) & (yi < h)
    xi = jnp.where(ok, xi, 0)
    yi = jnp.where(ok, yi, 0)
    col = jnp.repeat(buf.color, samples_per_line, axis=0)
    col = jnp.where(ok[:, None], col, 0.0)
    return image.at[yi, xi].max(col)      # painter: max blend, no z-test
