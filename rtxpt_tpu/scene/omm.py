"""Opacity micro-masks: the OMM (Opacity Micro-Map) equivalent.

The reference bakes per-triangle opacity micromaps from alpha textures on
the GPU (RTXPT/OpacityMicroMap/OmmBuildQueue.cpp:149-477) and attaches
them to the BLAS so any-hit work is short-circuited
(RTXPT/Sample.hlsl:408-413 AnyHit alpha test). TPU-native equivalent:

  * at scene build, every triangle gets a 16-bit mask over a 4x4
    barycentric grid: bit set = that region can be opaque (conservative:
    a bit is only CLEAR when every alpha sample inside its cell is below
    the material cutoff, so skipping a cleared cell can never lose a
    true hit);
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
SAMPLES_PER_CELL = 3     # subdivision samples per cell edge (conservative)


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

    # subdivision sample points per cell (barycentric u,v in cell space)
    s = SAMPLES_PER_CELL
    fu, fv = np.meshgrid((np.arange(s) + 0.5) / s, (np.arange(s) + 0.5) / s)
    fu = fu.reshape(-1)
    fv = fv.reshape(-1)

    masked_tris = np.where(alpha_mode[tri_mat] == 1)[0]
    for ti in masked_tris:
        mid = tri_mat[ti]
        tex = base_tex[mid]
        if tex < 0 or tex >= len(images):
            continue
        img = np.asarray(images[tex])
        if img.ndim != 3 or img.shape[2] < 4:
            continue  # no alpha channel -> opaque
        alpha = img[..., 3]
        if alpha.dtype == np.uint8:
            alpha = alpha.astype(np.float32) / 255.0
        h, w = alpha.shape
        uv0, uv1, uv2 = uvs[indices[ti]]
        m = 0
        for ci in range(GRID):
            for cj in range(GRID):
                if ci + cj >= GRID:
                    continue  # outside the barycentric triangle
                bit = ci * GRID + cj
                # sample alpha over the cell; conservative: opaque if ANY
                # sample reaches the cutoff
                u = (ci + fu) / GRID
                v = (cj + fv) / GRID
                keep = u + v <= 1.0
                if not keep.any():
                    continue
                uu = u[keep]
                vv = v[keep]
                uv = (uv0[None, :] * (1 - uu - vv)[:, None]
                      + uv1[None, :] * uu[:, None]
                      + uv2[None, :] * vv[:, None])
                x = np.clip((uv[:, 0] % 1.0) * w, 0, w - 1).astype(int)
                y = np.clip((uv[:, 1] % 1.0) * h, 0, h - 1).astype(int)
                if (alpha[y, x] >= cutoff[mid] - 1e-3).any():
                    m |= 1 << bit
        masks[ti] = m
    return masks


def mask_bit_index(u, v):
    """Barycentric (u, v) -> cell bit index (jnp-friendly)."""
    import jax.numpy as jnp
    i = jnp.clip((u * GRID).astype(jnp.int32), 0, GRID - 1)
    j = jnp.clip((v * GRID).astype(jnp.int32), 0, GRID - 1)
    return i * GRID + j
