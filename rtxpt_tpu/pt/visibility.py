"""Visibility rays with exact alpha-test fallback.

The baked opacity micro-masks (scene/omm.py) let traversal skip
CERTAIN-transparent cells of alpha-MASK triangles, but a SET mask bit
only means "may be opaque": treating it as a definite occluder
over-darkens partially-masked geometry (foliage, grates) relative to the
reference's exact per-hit texture alpha test
(RTXPT/PathTracerBridgeDonut.hlsli:605-637 Bridge::AlphaTest inside the
visibility RayQuery loop).

TPU-native equivalent: a bounded re-queue loop. Visibility rays run a
CLOSEST trace; hits on MASK materials whose sampled texture alpha falls
below the cutoff are transparent — those (rare) lanes advance past the
hit and re-trace. Non-mask scenes take the plain any-hit path untouched.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops import traverse

MAX_ALPHA_ITERS = 4


def sample_opacity(scene, prim, bary):
    """(alpha_mode, cutoff, opacity) of a hit — the minimal subset of
    shading.load_surface needed for the alpha test (base texture alpha
    with KHR_texture_transform)."""
    from ..scene import types as ST
    prim = jnp.maximum(prim, 0)
    tp = scene.tri_pack[prim]
    tri = tp[..., :3]
    mid = tp[..., 3]
    mrow = scene.mat_pack[mid]
    alpha_mode = mrow[..., ST.MP_ALPHA_MODE].astype(jnp.int32)
    cutoff = mrow[..., ST.MP_ALPHA_CUTOFF]
    opacity = jnp.ones_like(cutoff)
    if scene.textures is not None:
        from ..scene import textures as TX
        vp = scene.vert_pack[tri]
        w = jnp.stack([1.0 - bary[..., 0] - bary[..., 1],
                       bary[..., 0], bary[..., 1]], axis=-1)
        uv = jnp.sum(vp[..., 10:12] * w[..., None], axis=-2)
        a = mrow[..., ST.MP_UV_AFFINE:ST.MP_UV_AFFINE + 6]
        uv = jnp.stack(
            [a[..., 0] * uv[..., 0] + a[..., 1] * uv[..., 1] + a[..., 4],
             a[..., 2] * uv[..., 0] + a[..., 3] * uv[..., 1]
             + a[..., 5]], axis=-1)
        base_tex = mrow[..., ST.MP_BASE_TEX].astype(jnp.int32)
        tap = TX.sample_stack(scene.textures, base_tex, uv, None)
        opacity = tap[..., 3]
    return alpha_mode, cutoff, opacity


# max lanes per trace dispatch: the dense-MT kernel's scalar-prefetched
# per-tile worklists scale with the lane count; a 1080p FILL tile's 4x
# NEE batch (2M lanes) exhausts the scoped/SMEM budget (register-spill
# OOM in _trace_dense) — bigger batches split into sequential dispatches
MAX_TRACE_LANES = int(__import__("os").environ.get(
    "RTXPT_MAX_TRACE_LANES", str(1 << 20)))


def trace_visibility(assets, origins, dirs, t_min=0.0, t_max=1e30,
                     active=None, exact: bool = False):
    """True where the segment is occluded. exact=True enables the
    alpha-aware re-queue; callers gate it statically on the scene
    actually containing MASK materials (PTConfig.exact_alpha_test,
    cleared by Renderer for mask-free scenes)."""
    n = origins.shape[0]
    if active is None:
        active = jnp.ones((n,), bool)
    if n > MAX_TRACE_LANES:
        k = -(-n // MAX_TRACE_LANES)          # ceil
        step = -(-n // k)
        outs = []
        for c in range(0, n, step):
            sl = slice(c, min(c + step, n))
            tm = t_max[sl] if hasattr(t_max, "shape") and \
                getattr(t_max, "ndim", 0) > 0 else t_max
            outs.append(trace_visibility(
                assets, origins[sl], dirs[sl], t_min=t_min, t_max=tm,
                active=active[sl], exact=exact))
        return jnp.concatenate(outs, axis=0)
    if not exact:
        return traverse.trace_anyhit(assets.bvh, assets.soup, origins,
                                     dirs, t_min=t_min, t_max=t_max,
                                     active=active, dense=assets.dense)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    occluded = jnp.zeros((n,), bool)
    live = active
    o = origins
    remaining = t_max
    for _ in range(MAX_ALPHA_ITERS):
        hit = traverse.trace_closest(assets.bvh, assets.soup, o, dirs,
                                     t_min=t_min, t_max=remaining,
                                     active=live, dense=assets.dense)
        got = live & hit.valid
        alpha_mode, cutoff, opacity = sample_opacity(assets.scene,
                                                     hit.prim, hit.bary)
        transparent = got & (alpha_mode == 1) & (opacity < cutoff)
        occluded = occluded | (got & ~transparent)
        live = transparent
        adv = hit.t * (1.0 + 1e-4) + 1e-4
        o = jnp.where(live[..., None], o + dirs * adv[..., None], o)
        remaining = jnp.where(live, remaining - adv, remaining)
        live = live & (remaining > 1e-4)
    # unresolved after the bounded re-queue -> conservative occlusion
    return occluded | live
