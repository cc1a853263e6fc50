"""Texture system: host decode -> device texel pool -> sampled fetch.

TPU-native equivalent of:
  - donut TextureCache (donut/src/engine/TextureCache.cpp async DDS/stb/EXR
    load, sRGB handling, mips, bindless registration) -> float32 decode +
    box-filtered mip chain, packed into one flat texel pool
  - bindless texture table (t_BindlessTextures, Sample.cpp:168-176) ->
    per-texture (offset, size) tables; a "descriptor index" is the slot
  - ray-cone texture LOD (Bridge::createTextureSampler,
    PathTracerBridgeDonut.hlsli:337-352; TexLODHelpers
    computeRayConeTriangleLODValue) -> analytic UV-space lambda; the
    per-texture log2(size) term is added inside the fetch

Design: every mip of every texture lives contiguously in ONE (P, 4) f32
pool, so a trilinear tap is 8 row gathers at computed flat offsets —
independent of texture count, per-texture resolution, or mip count
(the round-1 version forced 256^2, re-quantized through uint8, applied
sRGB to data maps, and evaluated EVERY mip level per tap).
"""
from __future__ import annotations

import math
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..core import mathutils as mu
from .types import TextureStack


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


def _resize_bilinear(arr: np.ndarray, size: int) -> np.ndarray:
    """Float32 bilinear resample to (size, size, C) — no uint8 roundtrip."""
    h, w = arr.shape[:2]
    if h == size and w == size:
        return arr
    ys = (np.arange(size, dtype=np.float32) + 0.5) * (h / size) - 0.5
    xs = (np.arange(size, dtype=np.float32) + 0.5) * (w / size) - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    fx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    a = arr[y0][:, x0] * (1 - fx) + arr[y0][:, x1] * fx
    b = arr[y1][:, x0] * (1 - fx) + arr[y1][:, x1] * fx
    return (a * (1 - fy) + b * fy).astype(np.float32)


def _to_float_rgba(img: np.ndarray, srgb: bool) -> np.ndarray:
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[..., None]
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    elif arr.dtype == np.uint16:
        arr = arr.astype(np.float32) / 65535.0
    else:
        arr = arr.astype(np.float32)
    if arr.shape[-1] == 1:
        arr = np.repeat(arr, 3, axis=-1)
    if arr.shape[-1] == 3:
        arr = np.concatenate([arr, np.ones_like(arr[..., :1])], -1)
    if srgb:
        # sRGB -> linear on COLOR channels only (alpha stays linear);
        # applied before mip build so filtering happens in linear space
        arr = np.concatenate([arr[..., :3] ** 2.2, arr[..., 3:4]], -1)
    return arr


def build_texture_stack(images: List[np.ndarray],
                        srgb: Optional[Sequence[bool]] = None,
                        max_size: int = 1024,
                        size: Optional[int] = None
                        ) -> Optional[TextureStack]:
    """images: list of (h,w,1|3|4) uint8/uint16/float arrays. Each is
    resampled to its own power-of-two size (capped at max_size), mipped
    down to 1x1, and packed into the flat texel pool.

    srgb: per-texture flag — True for color maps (baseColor/emissive)
    needing sRGB->linear on uint decode; data maps (normal, metal-rough,
    transmission) must pass False. Defaults to all-True for integer
    inputs (color-map assumption for plain callers)."""
    if not images:
        return None
    from .texcache import resolve_images
    images = resolve_images(images)    # join async decode futures here
    if size is not None:
        max_size = size
    k = len(images)
    if srgb is None:
        srgb = [True] * k

    pool_parts: List[np.ndarray] = []
    l_max = int(math.log2(max_size)) + 1
    mip_offset = np.zeros((k, l_max), np.int64)
    mip_size = np.zeros((k, l_max), np.int32)
    n_mips = np.zeros((k,), np.int32)
    cursor = 0
    for ti, img in enumerate(images):
        # sRGB decode applies to integer-encoded images only; float inputs
        # (HDR/EXR-style) are already linear
        arr = _to_float_rgba(img, bool(srgb[ti]) and np.issubdtype(
            np.asarray(img).dtype, np.integer))
        s = min(max_size, _next_pow2(max(arr.shape[0], arr.shape[1])))
        s = max(s, 1)
        m = _resize_bilinear(arr, s)
        level = 0
        while True:
            mip_offset[ti, level] = cursor
            mip_size[ti, level] = m.shape[0]
            pool_parts.append(m.reshape(-1, 4))
            cursor += m.shape[0] * m.shape[0]
            level += 1
            if m.shape[0] == 1:
                break
            m = 0.25 * (m[0::2, 0::2] + m[0::2, 1::2]
                        + m[1::2, 0::2] + m[1::2, 1::2])
        n_mips[ti] = level
    pool = np.concatenate(pool_parts, axis=0)
    return TextureStack(pool=jnp.asarray(pool),
                        mip_offset=jnp.asarray(mip_offset.astype(np.int32)),
                        mip_size=jnp.asarray(mip_size),
                        n_mips=jnp.asarray(n_mips))


def sample_stack(stack: TextureStack, tex, uv, lod=None,
                 trilinear: bool = True):
    """Trilinear fetch from the texel pool; tex: (N,) slot index
    (-1 -> white), uv (N,2) wrapped, lod (N,) UV-SPACE log2 footprint
    (the per-texture log2(size) term is added here) or None for mip 0.
    Returns (N,4)."""
    slot = jnp.maximum(tex, 0)
    nm = stack.n_mips[slot]
    size0 = stack.mip_size[slot, 0].astype(jnp.float32)
    if lod is None:
        lf = jnp.zeros(slot.shape, jnp.float32)
    else:
        lf = lod + jnp.log2(jnp.maximum(size0, 1.0))
    lf = jnp.clip(lf, 0.0, (nm - 1).astype(jnp.float32))
    l0 = lf.astype(jnp.int32)

    u = uv[..., 0] - jnp.floor(uv[..., 0])
    v = uv[..., 1] - jnp.floor(uv[..., 1])

    def fetch(level):
        off = stack.mip_offset[slot, level]
        s = stack.mip_size[slot, level]
        sf = s.astype(jnp.float32)
        x = u * sf - 0.5
        y = v * sf - 0.5
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx = (x - x0)[..., None]
        fy = (y - y0)[..., None]
        x0 = x0 % s
        y0 = y0 % s
        x1 = (x0 + 1) % s
        y1 = (y0 + 1) % s
        base = off + y0 * s
        base1 = off + y1 * s
        a = stack.pool[base + x0] * (1 - fx) + stack.pool[base + x1] * fx
        b = stack.pool[base1 + x0] * (1 - fx) + stack.pool[base1 + x1] * fx
        return a * (1 - fy) + b * fy

    out = fetch(l0)
    if trilinear and lod is not None:
        l1 = jnp.minimum(l0 + 1, nm - 1)
        frac = (lf - l0.astype(jnp.float32))[..., None]
        out = out * (1 - frac) + fetch(l1) * frac
    white = jnp.ones(slot.shape + (4,), jnp.float32)
    return jnp.where((tex >= 0)[..., None], out, white)


def ray_cone_lod(cone_width, cos_theta, uv_area, world_area):
    """UV-space texture lambda from ray cones ("Improved Shader and
    Texture LOD Using Ray Cones", as used via TexLODHelpers
    computeRayConeTriangleLOD): cone footprint over projected area. The
    per-texture log2(size) term is added by sample_stack."""
    ta = jnp.sqrt(jnp.maximum(uv_area, 1e-20)
                  / jnp.maximum(world_area, 1e-20))
    footprint = cone_width * ta / jnp.maximum(jnp.abs(cos_theta), 0.05)
    return jnp.log2(jnp.maximum(footprint, 1e-10))


def perturb_normal(n, t, b, normal_sample):
    """Apply a tangent-space normal map sample (donut MaterialSample
    shadingNormal path)."""
    ts = normal_sample[..., :3] * 2.0 - 1.0
    out = (ts[..., 0:1] * t + ts[..., 1:2] * b + ts[..., 2:3] * n)
    return mu.safe_normalize(out, n)
