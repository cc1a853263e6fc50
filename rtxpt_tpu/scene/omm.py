"""Opacity micro-masks: the OMM (Opacity Micro-Map) equivalent.

The reference bakes per-triangle opacity micromaps from alpha textures on
the GPU (RTXPT/OpacityMicroMap/OmmBuildQueue.cpp:149-477) and attaches
them to the BLAS so any-hit work is short-circuited
(RTXPT/Sample.hlsl:408-413 AnyHit alpha test). TPU-native equivalent:

  * at scene build, every triangle gets a 16-bit mask over a 4x4
    barycentric grid: bit set = that region can be opaque (conservative:
    a bit is only CLEAR when the MAX alpha over the cell's entire UV
    footprint is below the material cutoff, so skipping a cleared cell
    can never lose a true hit);
  * conservativeness is guaranteed by a max-filter pyramid: each cell's
    UV bounding box is tested against a max-pooled mip whose texels
    cover the box, an upper bound on every alpha texel the cell can
    sample — not a sparse point probe (tiny opaque features like wires
    or stems cannot slip between samples);
  * traversal consults the mask at the hit's barycentric cell
    (ops/traverse.py / traverse_pallas.py): visibility rays treat a set
    bit as an occluder (the OMM "force opaque" approximation), and the
    closest-hit path uses cleared bits to skip certain-transparent hits
    before the exact texture re-test in the integrator.

Triangles of non-MASK materials bake to all-ones (always opaque for
any-hit; the closest path shades them normally).
"""
from __future__ import annotations

import numpy as np

GRID = 4                 # 4x4 barycentric cells -> 16-bit mask


def _max_pyramid(alpha: np.ndarray):
    """Conservative max-filter mip chain; level k texel (i,j) bounds the
    max alpha over the 2^k x 2^k source region it covers."""
    levels = [alpha]
    cur = alpha
    while cur.shape[0] > 1 or cur.shape[1] > 1:
        h, w = cur.shape
        ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
        if (ph, pw) != (h, w):
            cur = np.pad(cur, ((0, ph - h), (0, pw - w)), mode="edge")
        cur = cur.reshape(ph // 2, 2, pw // 2, 2).max(axis=(1, 3))
        levels.append(cur)
    return levels


def _footprint_max(levels, x0, x1, y0, y1) -> float:
    """Max alpha over the texel bbox [x0,x1]x[y0,y1] (float texel coords,
    may exceed [0,size) — wrap addressing), via the coarsest pyramid
    level whose covered index range stays <= 3 texels per axis."""
    h, w = levels[0].shape
    span = max(x1 - x0, y1 - y0, 1.0)
    lv = min(int(np.ceil(np.log2(max(span / 2.0, 1.0)))), len(levels) - 1)
    a = levels[lv]
    lh, lw = a.shape
    sx0 = int(np.floor(x0)) >> lv
    sx1 = int(np.floor(max(x1 - 1e-6, x0))) >> lv
    sy0 = int(np.floor(y0)) >> lv
    sy1 = int(np.floor(max(y1 - 1e-6, y0))) >> lv
    if sx1 - sx0 >= lw or sy1 - sy0 >= lh:
        return float(a.max())
    m = 0.0
    for iy in range(sy0, sy1 + 1):
        for ix in range(sx0, sx1 + 1):
            m = max(m, float(a[iy % lh, ix % lw]))
    return m


def bake_opacity_masks(host: dict) -> np.ndarray:
    """Returns (T,) int32 of 16-bit masks in ORIGINAL triangle order.

    host: SceneBuilder.finish() dict (uvs/indices/tri_mat/materials +
    optional texture_images)."""
    indices = np.asarray(host["indices"])
    t = indices.shape[0]
    masks = np.full((t,), 0xFFFF, np.int32)
    mats = host["materials"]
    alpha_mode = np.asarray(mats["alpha_mode"])
    if (alpha_mode != 1).all() or not host.get("texture_images"):
        return masks
    uvs = np.asarray(host["uvs"])
    tri_mat = np.asarray(host["tri_mat"])
    base_tex = np.asarray(mats["base_tex"])
    cutoff = np.asarray(mats["alpha_cutoff"])
    images = host["texture_images"]

    pyramids = {}
    masked_tris = np.where(alpha_mode[tri_mat] == 1)[0]
    for ti in masked_tris:
        mid = tri_mat[ti]
        tex = base_tex[mid]
        if tex < 0 or tex >= len(images):
            continue
        from .texcache import resolve_image
        img = np.asarray(resolve_image(images[tex]))
        if img.ndim != 3 or img.shape[2] < 4:
            continue  # no alpha channel -> opaque
        if tex not in pyramids:
            alpha = img[..., 3]
            if alpha.dtype == np.uint8:
                alpha = alpha.astype(np.float32) / 255.0
            pyramids[tex] = _max_pyramid(np.asarray(alpha, np.float32))
        levels = pyramids[tex]
        h, w = levels[0].shape
        uv0, uv1, uv2 = uvs[indices[ti]]
        e1, e2 = uv1 - uv0, uv2 - uv0
        m = 0
        for ci in range(GRID):
            for cj in range(GRID):
                if ci + cj >= GRID:
                    continue  # outside the barycentric triangle
                bit = ci * GRID + cj
                # the cell's barycentric square maps to a UV
                # parallelogram; its bbox (over the 4 mapped corners)
                # conservatively contains the full cell footprint
                us = np.array([ci, ci + 1, ci, ci + 1]) / GRID
                vs = np.array([cj, cj, cj + 1, cj + 1]) / GRID
                pts = uv0[None] + us[:, None] * e1[None] \
                    + vs[:, None] * e2[None]
                x0, y0 = pts[:, 0].min() * w, pts[:, 1].min() * h
                x1, y1 = pts[:, 0].max() * w, pts[:, 1].max() * h
                if _footprint_max(levels, x0, x1, y0, y1) \
                        >= cutoff[mid] - 1e-3:
                    m |= 1 << bit
        masks[ti] = m
    return masks


def mask_bit_index(u, v):
    """Barycentric (u, v) -> cell bit index (jnp-friendly)."""
    import jax.numpy as jnp
    i = jnp.clip((u * GRID).astype(jnp.int32), 0, GRID - 1)
    j = jnp.clip((v * GRID).astype(jnp.int32), 0, GRID - 1)
    return i * GRID + j
