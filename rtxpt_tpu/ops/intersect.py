"""Ray-triangle intersection kernels.

TPU-native replacement for the DXR hardware intersection stage
(Bridge::traceScatterRay / traceVisibilityRay inline RayQuery,
RTXPT/PathTracerBridgeDonut.hlsli:703,657). Möller-Trumbore over
pre-expanded (p0, e1, e2) triangle SoA; two-sided (no backface culling,
matching the reference's default instance flags).

`bruteforce_*` variants test every ray against every triangle in blocks —
they are the correctness oracle for the BVH path and remain the fastest
option for very small scenes (dense VPU work, zero divergence).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

INVALID = np.int32(-1)


class TriSoup(NamedTuple):
    """Pre-expanded triangle geometry for intersection: p0, e1=p1-p0,
    e2=p2-p0 packed (T,9); prim id maps back to scene triangle index."""
    verts: jnp.ndarray     # (T, 9) f32 [p0, e1, e2]
    prim_id: jnp.ndarray   # (T,) i32 original triangle index

    @staticmethod
    def build(positions, indices, order=None) -> "TriSoup":
        import numpy as np
        import jax
        if not isinstance(positions, jax.core.Tracer):
            # host numpy fast path: eager device ops each trigger a
            # remote compile on the TPU tunnel (cold scene loads took
            # minutes)
            p = np.asarray(positions)
            i = np.asarray(indices)
            p0 = p[i[:, 0]]
            verts = np.concatenate([p0, p[i[:, 1]] - p0,
                                    p[i[:, 2]] - p0], axis=-1)
            prim = np.arange(i.shape[0], dtype=np.int32)
            if order is not None:
                o = np.asarray(order)
                verts = verts[o]
                prim = prim[o]
            return TriSoup(jnp.asarray(verts), jnp.asarray(prim))
        p0 = positions[indices[:, 0]]
        e1 = positions[indices[:, 1]] - p0
        e2 = positions[indices[:, 2]] - p0
        verts = jnp.concatenate([p0, e1, e2], axis=-1)
        prim = jnp.arange(indices.shape[0], dtype=jnp.int32)
        if order is not None:
            verts = verts[order]
            prim = prim[order]
        return TriSoup(verts, prim)


class Hit(NamedTuple):
    """Closest-hit record, SoA over rays (HitInfo equivalent,
    RTXPT/PathTracer/Scene/HitInfo.hlsli)."""
    t: jnp.ndarray        # (N,) f32 hit distance (tmax if miss)
    prim: jnp.ndarray     # (N,) i32 original triangle id (-1 = miss)
    bary: jnp.ndarray     # (N,2) f32 (u, v) barycentrics of verts 1,2

    @property
    def valid(self):
        return self.prim >= 0


def _moller_trumbore(o, d, tri_verts, t_min, t_max):
    """Batched intersection: o,d (...,3); tri_verts (...,9).
    Returns (hit_mask, t, u, v)."""
    p0 = tri_verts[..., 0:3]
    e1 = tri_verts[..., 3:6]
    e2 = tri_verts[..., 6:9]
    h = jnp.cross(d, e2)
    a = jnp.sum(e1 * h, axis=-1)
    # two-sided: just guard near-parallel
    f = 1.0 / jnp.where(jnp.abs(a) < 1e-12, 1e-12, a)
    s = o - p0
    u = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, e1)
    v = f * jnp.sum(d * q, axis=-1)
    t = f * jnp.sum(e2 * q, axis=-1)
    hit = ((jnp.abs(a) > 1e-12) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
           & (t > t_min) & (t < t_max))
    return hit, t, u, v


def bruteforce_closest(soup: TriSoup, origins, dirs, t_min=0.0,
                       t_max=1e30, block: int = 2048) -> Hit:
    """O(N_rays * N_tris) closest hit, blocked over triangles to bound
    memory. Dense, divergence-free — the oracle for BVH traversal."""
    n = origins.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    nt = soup.verts.shape[0]
    nblk = (nt + block - 1) // block
    pad = nblk * block - nt
    verts = jnp.pad(soup.verts, ((0, pad), (0, 0)))
    prim = jnp.pad(soup.prim_id, (0, pad), constant_values=INVALID)
    verts = verts.reshape(nblk, block, 9)
    prim = prim.reshape(nblk, block)

    def body(i, state):
        best_t, best_prim, best_uv = state
        tv = verts[i]                       # (B,9)
        hit, t, u, v = _moller_trumbore(
            origins[:, None, :], dirs[:, None, :], tv[None, :, :],
            t_min, best_t[:, None])
        hit &= (prim[i] >= 0)[None, :]
        t = jnp.where(hit, t, jnp.inf)
        j = jnp.argmin(t, axis=-1)
        tj = jnp.take_along_axis(t, j[:, None], axis=-1)[:, 0]
        got = jnp.isfinite(tj)
        best_prim = jnp.where(got, prim[i][j], best_prim)
        uj = jnp.take_along_axis(jnp.where(hit, u, 0.0), j[:, None], -1)[:, 0]
        vj = jnp.take_along_axis(jnp.where(hit, v, 0.0), j[:, None], -1)[:, 0]
        best_uv = jnp.where(got[:, None], jnp.stack([uj, vj], -1), best_uv)
        best_t = jnp.where(got, tj, best_t)
        return best_t, best_prim, best_uv

    init = (t_max, jnp.full((n,), INVALID),
            jnp.zeros((n, 2), jnp.float32))
    best_t, best_prim, best_uv = jax.lax.fori_loop(0, nblk, body, init)
    return Hit(best_t, best_prim, best_uv)


def bruteforce_anyhit(soup: TriSoup, origins, dirs, t_min=0.0, t_max=1e30,
                      block: int = 2048):
    """Visibility query: True where the segment is occluded."""
    hit = bruteforce_closest(soup, origins, dirs, t_min, t_max, block)
    return hit.valid


def ray_aabb(o, inv_d, bmin, bmax, t_min, t_max):
    """Slab test; broadcasts over leading dims. Returns (hit, t_near)."""
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tsmall = jnp.minimum(t0, t1)
    tbig = jnp.maximum(t0, t1)
    tnear = jnp.maximum(jnp.max(tsmall, axis=-1), t_min)
    tfar = jnp.minimum(jnp.min(tbig, axis=-1), t_max)
    return tnear <= tfar, tnear
