"""Texture system: host decode -> device texture stack -> sampled fetch.

TPU-native equivalent of:
  - donut TextureCache (donut/src/engine/TextureCache.cpp async DDS/stb/EXR
    load, mips, bindless registration) -> PIL decode + jnp mip chain
  - bindless texture table (t_BindlessTextures, Sample.cpp:168-176) ->
    one (K, S, S, 4) array stack per mip level; a "descriptor index" is
    just the slot index
  - ray-cone texture LOD (Bridge::createTextureSampler,
    PathTracerBridgeDonut.hlsli:337-352; TexLODHelpers
    computeRayConeTriangleLODValue) -> analytic lambda from cone width +
    per-triangle UV/world area ratio

All textures are resampled to one power-of-two size so a fetch is plain
array indexing (bilinear = 4 gathers; mip level chosen per-lane).
"""
from __future__ import annotations

import math
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..core import mathutils as mu
from .types import TextureStack


def build_texture_stack(images: List[np.ndarray],
                        size: int = 256) -> Optional[TextureStack]:
    """images: list of (h,w,3|4) uint8/float arrays; resampled to
    (size,size,4) and stacked with a full mip chain."""
    if not images:
        return None
    from PIL import Image
    stack = []
    for img in images:
        arr = np.asarray(img)
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 255.0
            # sRGB -> linear for color channels
            arr = np.concatenate([arr[..., :3] ** 2.2,
                                  arr[..., 3:4] if arr.shape[-1] == 4
                                  else np.ones_like(arr[..., :1])], -1)
        if arr.shape[-1] == 3:
            arr = np.concatenate([arr, np.ones_like(arr[..., :1])], -1)
        im = Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8))
        im = im.resize((size, size), Image.LANCZOS)
        stack.append(np.asarray(im).astype(np.float32) / 255.0)
    base = jnp.asarray(np.stack(stack))            # (K, S, S, 4)
    mips = [base]
    m = base
    while m.shape[1] > 1:
        m = 0.25 * (m[:, 0::2, 0::2] + m[:, 0::2, 1::2]
                    + m[:, 1::2, 0::2] + m[:, 1::2, 1::2])
        mips.append(m)
    sizes = jnp.asarray(np.tile([[size, size]], (len(stack), 1)),
                        jnp.int32)
    return TextureStack(mips=tuple(mips), sizes=sizes)


def sample_stack(stack: TextureStack, tex, uv, lod=None):
    """Bilinear fetch at the nearest mip level; tex: (N,) slot index
    (-1 -> white), uv (N,2), lod (N,) or None. Returns (N,4)."""
    n_levels = len(stack.mips)
    if lod is None:
        lvl = jnp.zeros(tex.shape, jnp.int32)
    else:
        lvl = jnp.clip(lod.astype(jnp.int32), 0, n_levels - 1)
    slot = jnp.maximum(tex, 0)
    u = uv[..., 0] - jnp.floor(uv[..., 0])
    v = uv[..., 1] - jnp.floor(uv[..., 1])

    out = jnp.zeros(tex.shape + (4,), jnp.float32)
    for li, mip in enumerate(stack.mips):
        s = mip.shape[1]
        x = u * s - 0.5
        y = v * s - 0.5
        x0 = jnp.floor(x).astype(jnp.int32) % s
        y0 = jnp.floor(y).astype(jnp.int32) % s
        x1 = (x0 + 1) % s
        y1 = (y0 + 1) % s
        fx = (x - jnp.floor(x))[..., None]
        fy = (y - jnp.floor(y))[..., None]
        a = mip[slot, y0, x0] * (1 - fx) + mip[slot, y0, x1] * fx
        b = mip[slot, y1, x0] * (1 - fx) + mip[slot, y1, x1] * fx
        val = a * (1 - fy) + b * fy
        out = jnp.where((lvl == li)[..., None], val, out)
    white = jnp.ones(tex.shape + (4,), jnp.float32)
    return jnp.where((tex >= 0)[..., None], out, white)


def ray_cone_lod(cone_width, cos_theta, uv_area, world_area,
                 tex_size: int):
    """Texture lambda from ray cones ("Improved Shader and Texture LOD
    Using Ray Cones", as used via TexLODHelpers computeRayConeTriangleLOD):
    base triangle term + cone footprint over projected area."""
    ta = jnp.sqrt(jnp.maximum(uv_area, 1e-20)
                  / jnp.maximum(world_area, 1e-20))
    footprint = cone_width * ta * tex_size \
        / jnp.maximum(jnp.abs(cos_theta), 0.05)
    return jnp.log2(jnp.maximum(footprint, 1e-10))


def perturb_normal(n, t, b, normal_sample):
    """Apply a tangent-space normal map sample (donut MaterialSample
    shadingNormal path)."""
    ts = normal_sample[..., :3] * 2.0 - 1.0
    out = (ts[..., 0:1] * t + ts[..., 1:2] * b + ts[..., 2:3] * n)
    return mu.safe_normalize(out, n)
