"""BVH traversal kernels (the DXR TraceRay / RayQuery replacement).

Wavefront closest-hit and any-hit traversal over the BVH2 layout from
ops/bvh.py: every ray runs an ordered stack-based descent inside one
`lax.while_loop`, vectorized over the whole wavefront (one "thread" per ray,
like dispatchRays, but lane-synchronous). Nodes store both children's
AABBs so each step is one 12-float gather + two slab tests; leaves
(<= leaf_size tris) are intersected with a statically unrolled masked loop.

Divergence note: all lanes iterate until the slowest ray finishes; rays that
terminate early become masked no-ops. Wavefront compaction between bounces
(pt/integrator.py) keeps wavefronts dense; in-traversal compaction is a
later optimization (see SURVEY.md section 7 "hard parts").
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .bvh import BVH2, LEAF_MAX
from .intersect import Hit, TriSoup, _moller_trumbore, ray_aabb

STACK_DEPTH = 64
MAX_ITERS = 500_000

_use_pallas_cache = None


def _dense_interpret() -> bool:
    """Test hook: run the dense-MT kernel in Pallas interpret mode on
    CPU backends (RTXPT_DENSE_INTERPRET=1) so the full dense trace path
    can be validated without a TPU."""
    import os
    return os.environ.get("RTXPT_DENSE_INTERPRET", "0") == "1"


def _use_pallas() -> bool:
    """Pallas kernels need a real TPU backend; CPU tests use the XLA
    path. Override with RTXPT_FORCE_XLA_TRAVERSAL=1."""
    global _use_pallas_cache
    if _use_pallas_cache is None:
        import os
        import jax as _jax
        _use_pallas_cache = (
            os.environ.get("RTXPT_FORCE_XLA_TRAVERSAL", "0") != "1"
            and _jax.devices()[0].platform != "cpu")
    return _use_pallas_cache


class _TraceState(NamedTuple):
    stack: jnp.ndarray     # (N, STACK_DEPTH) i32
    sp: jnp.ndarray        # (N,) i32
    best_t: jnp.ndarray    # (N,)
    best_prim: jnp.ndarray  # (N,) i32 (leaf-order index; -1 miss)
    best_uv: jnp.ndarray   # (N,2)
    iters: jnp.ndarray     # () i32


def _safe_inv(d):
    return 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                           jnp.where(d < 0, -1e-12, 1e-12), d)


@partial(jax.jit, static_argnames=("leaf_size", "any_hit"))
def _trace(child_bounds, child_idx, verts, origins, dirs, t_min, t_max,
           active, leaf_size: int = 4, any_hit: bool = False):
    n = origins.shape[0]
    inv_d = _safe_inv(dirs)
    lanes = jnp.arange(n)

    stack = jnp.zeros((n, STACK_DEPTH), jnp.int32)  # root node = 0
    sp = jnp.where(active, 1, 0).astype(jnp.int32)

    init = _TraceState(
        stack=stack, sp=sp,
        best_t=jnp.broadcast_to(t_max, (n,)).astype(jnp.float32),
        best_prim=jnp.full((n,), -1, jnp.int32),
        best_uv=jnp.zeros((n, 2), jnp.float32),
        iters=jnp.asarray(0, jnp.int32),
    )

    def cond(st: _TraceState):
        return jnp.any(st.sp > 0) & (st.iters < MAX_ITERS)

    def body(st: _TraceState):
        has = st.sp > 0
        top_i = jnp.maximum(st.sp - 1, 0)
        top = st.stack[lanes, top_i]
        sp = jnp.where(has, st.sp - 1, st.sp)
        is_leaf = top < 0
        do_node = has & ~is_leaf
        do_leaf = has & is_leaf

        # ---- internal node step
        node = jnp.where(do_node, top, 0)
        cb = child_bounds[node]              # (N,12)
        ci = child_idx[node]                 # (N,2)
        hit_l, t_l = ray_aabb(origins, inv_d, cb[:, 0:3], cb[:, 3:6],
                              t_min, st.best_t)
        hit_r, t_r = ray_aabb(origins, inv_d, cb[:, 6:9], cb[:, 9:12],
                              t_min, st.best_t)
        near_l = t_l <= t_r
        first = jnp.where(near_l, ci[:, 0], ci[:, 1])
        second = jnp.where(near_l, ci[:, 1], ci[:, 0])
        hit_first = jnp.where(near_l, hit_l, hit_r)
        hit_second = jnp.where(near_l, hit_r, hit_l)
        # empty-leaf code -1 encodes start=0,count=0; cheap to skip here
        push2 = do_node & hit_second & (second != -1)
        stack = st.stack.at[lanes, jnp.minimum(sp, STACK_DEPTH - 1)].set(
            jnp.where(push2, second, st.stack[lanes,
                                              jnp.minimum(sp,
                                                          STACK_DEPTH - 1)]))
        sp = sp + push2.astype(jnp.int32)
        push1 = do_node & hit_first & (first != -1)
        stack = stack.at[lanes, jnp.minimum(sp, STACK_DEPTH - 1)].set(
            jnp.where(push1, first, stack[lanes,
                                          jnp.minimum(sp, STACK_DEPTH - 1)]))
        sp = sp + push1.astype(jnp.int32)

        # ---- leaf step: unrolled masked triangle tests
        v = -jnp.where(do_leaf, top, -1) - 1
        start = v >> 5
        count = v & LEAF_MAX
        best_t, best_prim, best_uv = st.best_t, st.best_prim, st.best_uv
        for k in range(leaf_size):
            m = do_leaf & (k < count)
            tri = jnp.clip(start + k, 0, verts.shape[0] - 1)
            tv = verts[tri]
            h, t, u, vv = _moller_trumbore(origins, dirs, tv, t_min, best_t)
            h = h & m
            best_prim = jnp.where(h, tri, best_prim)
            best_uv = jnp.where(h[:, None], jnp.stack([u, vv], -1), best_uv)
            best_t = jnp.where(h, t, best_t)
        if any_hit:
            # terminate rays that found any intersection
            found = best_prim >= 0
            sp = jnp.where(found, 0, sp)

        return _TraceState(stack, sp, best_t, best_prim, best_uv,
                           st.iters + 1)

    st = jax.lax.while_loop(cond, body, init)
    return st.best_t, st.best_prim, st.best_uv, st.iters


@partial(jax.jit, static_argnames=("leaf_size", "any_hit"))
def _trace8(table, origins, dirs, t_min, t_max,
            active, leaf_size: int = 16, any_hit: bool = False,
            leaf_omm=None):
    """Unified 8-wide traversal: exactly ONE table gather per iteration
    (the dominant cost on the target TPU is per-gather-op, ~independent of
    row width). A popped row is either a node (8 child AABBs + codes) or a
    leaf (<= leaf_size inlined triangles tested as one wide vector op).
    best_prim returns the leaf SLOT code (row*leaf_size + k); callers remap
    to original triangle ids via BVH8.leaf_tris."""
    n = origins.shape[0]
    inv_d = _safe_inv(dirs)
    lanes = jnp.arange(n)

    stack = jnp.zeros((n, STACK_DEPTH), jnp.int32)  # root node = 0
    sp = jnp.where(active, 1, 0).astype(jnp.int32)

    init = _TraceState(
        stack=stack, sp=sp,
        best_t=jnp.broadcast_to(t_max, (n,)).astype(jnp.float32),
        best_prim=jnp.full((n,), -1, jnp.int32),
        best_uv=jnp.zeros((n, 2), jnp.float32),
        iters=jnp.asarray(0, jnp.int32),
    )

    def cond(st: _TraceState):
        return jnp.any(st.sp > 0) & (st.iters < MAX_ITERS)

    def body(st: _TraceState):
        has = st.sp > 0
        top_i = jnp.maximum(st.sp - 1, 0)
        top = st.stack[lanes, top_i]
        sp = jnp.where(has, st.sp - 1, st.sp)
        is_leaf = top < 0
        do_node = has & ~is_leaf
        do_leaf = has & is_leaf

        v = -jnp.where(do_leaf, top, -1) - 1
        leaf_row = v >> 5
        lcount = v & LEAF_MAX
        fetch = jnp.where(do_leaf, leaf_row, jnp.where(do_node, top, 0))
        row = table[fetch]                          # THE gather (N, W)

        # ---- node interpretation: 8 AABBs + codes
        cb = row[:, :48].reshape(n, 8, 6)
        ci = row[:, 48:56].astype(jnp.int32)  # codes are exact float values
        hit8, t8 = ray_aabb(origins[:, None, :], inv_d[:, None, :],
                            cb[..., 0:3], cb[..., 3:6], t_min,
                            st.best_t[:, None])
        hit8 = hit8 & (ci != -1) & do_node[:, None]
        # order children far-to-near with a branch-free 19-comparator
        # sorting network (descending t; misses sink as -inf), then push
        # all eight with ONE scatter via exclusive-cumsum slots.
        ts = jnp.where(hit8, t8, -jnp.inf)
        cs = ci
        for a, b in ((0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3),
                     (4, 6), (5, 7), (1, 2), (5, 6), (0, 4), (3, 7),
                     (1, 5), (2, 6), (1, 4), (3, 6), (2, 4), (3, 5),
                     (3, 4)):
            swap = ts[:, a] < ts[:, b]
            ta = jnp.where(swap, ts[:, b], ts[:, a])
            tb = jnp.where(swap, ts[:, a], ts[:, b])
            ca = jnp.where(swap, cs[:, b], cs[:, a])
            cb2_ = jnp.where(swap, cs[:, a], cs[:, b])
            ts = ts.at[:, a].set(ta).at[:, b].set(tb)
            cs = cs.at[:, a].set(ca).at[:, b].set(cb2_)
        valid8 = ts > -jnp.inf
        offs = jnp.cumsum(valid8.astype(jnp.int32), axis=-1) - \
            valid8.astype(jnp.int32)
        # invalid entries target an out-of-bounds slot and are dropped
        slots = jnp.where(valid8,
                          jnp.minimum(sp[:, None] + offs, STACK_DEPTH - 1),
                          STACK_DEPTH)
        stack = st.stack.at[lanes[:, None], slots].set(cs, mode="drop")
        sp = sp + jnp.sum(valid8, axis=-1).astype(jnp.int32)

        # ---- leaf interpretation: wide vector Moller-Trumbore over all
        # inlined triangles at once (no extra gather)
        tris = row[:, :9 * leaf_size].reshape(n, leaf_size, 9)
        h, t, u, vv = _moller_trumbore(origins[:, None, :],
                                       dirs[:, None, :], tris, t_min,
                                       st.best_t[:, None])
        kmask = jnp.arange(leaf_size)[None, :] < lcount[:, None]
        h = h & kmask & do_leaf[:, None]
        if leaf_omm is not None:
            # OMM cell test (scene/omm.py): certain-transparent regions
            # of alpha-MASK triangles never register a hit
            omm_tab = leaf_omm.reshape(-1, leaf_size)
            masks = omm_tab[jnp.clip(leaf_row, 0,
                                     omm_tab.shape[0] - 1)]   # (N, ls)
            ci = jnp.clip((u * 4.0).astype(jnp.int32), 0, 3)
            cj = jnp.clip((vv * 4.0).astype(jnp.int32), 0, 3)
            bit = (masks >> (ci * 4 + cj)) & 1
            h = h & (bit != 0)
        t = jnp.where(h, t, jnp.inf)
        k = jnp.argmin(t, axis=-1)
        tk = jnp.take_along_axis(t, k[:, None], -1)[:, 0]
        found = jnp.isfinite(tk)
        uk = jnp.take_along_axis(jnp.where(h, u, 0.0), k[:, None], -1)[:, 0]
        vk = jnp.take_along_axis(jnp.where(h, vv, 0.0), k[:, None],
                                 -1)[:, 0]
        best_prim = jnp.where(found, leaf_row * leaf_size + k,
                              st.best_prim)
        best_uv = jnp.where(found[:, None], jnp.stack([uk, vk], -1),
                            st.best_uv)
        best_t = jnp.where(found, tk, st.best_t)
        if any_hit:
            sp = jnp.where(best_prim >= 0, 0, sp)

        return _TraceState(stack, sp, best_t, best_prim, best_uv,
                           st.iters + 1)

    st = jax.lax.while_loop(cond, body, init)
    return st.best_t, st.best_prim, st.best_uv, st.iters


def trace_closest(bvh: BVH2, soup: TriSoup, origins, dirs, t_min=0.0,
                  t_max=1e30, active=None, leaf_size: int = 4,
                  dense=None) -> Hit:
    """Closest-hit trace (Bridge::traceScatterRay equivalent). Returns Hit
    with prim mapped back to original scene triangle indices.

    dense: optional ops.mt_dense.DenseMT — the matmul-MT path for
    small/medium scenes (preferred on TPU when present)."""
    n = origins.shape[0]
    if active is None:
        active = jnp.ones((n,), bool)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    if dense is not None and (_use_pallas() or _dense_interpret()):
        from . import mt_dense
        return mt_dense.trace_closest(dense, origins, dirs, t_min, t_max,
                                      active, interpret=_dense_interpret())
    if hasattr(bvh, "inst_aabb"):  # instanced TLAS-over-BLAS
        from . import instanced
        return instanced.trace_closest(bvh, origins, dirs, t_min, t_max,
                                       active)
    if hasattr(bvh, "sub_aabb"):  # two-level (Bistro-scale)
        from . import bvh2l
        return bvh2l.trace_closest(bvh, origins, dirs, t_min, t_max,
                                   active)
    if hasattr(bvh, "table"):  # unified BVH8
        from . import traverse_pallas as TP
        if _use_pallas() and TP.pallas_supported(bvh):
            return TP.trace_closest(bvh, origins, dirs, t_min, t_max,
                                    active)
        t, prim, uv, _ = _trace8(bvh.table, origins, dirs,
                                 jnp.asarray(t_min, jnp.float32), t_max,
                                 active, leaf_size=bvh.leaf_size,
                                 any_hit=False, leaf_omm=bvh.leaf_omm)
        orig = jnp.where(prim >= 0, bvh.leaf_tris[jnp.maximum(prim, 0)], -1)
        return Hit(t, orig, uv)
    t, prim, uv, _ = _trace(bvh.child_bounds, bvh.child_idx, soup.verts,
                            origins, dirs, jnp.asarray(t_min, jnp.float32),
                            t_max, active, leaf_size=leaf_size,
                            any_hit=False)
    orig = jnp.where(prim >= 0, soup.prim_id[jnp.maximum(prim, 0)], -1)
    return Hit(t, orig, uv)


def trace_anyhit(bvh: BVH2, soup: TriSoup, origins, dirs, t_min=0.0,
                 t_max=1e30, active=None, leaf_size: int = 4,
                 dense=None):
    """Visibility trace (Bridge::traceVisibilityRay equivalent): True where
    occluded. Inactive rays report unoccluded."""
    n = origins.shape[0]
    if active is None:
        active = jnp.ones((n,), bool)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    if dense is not None and (_use_pallas() or _dense_interpret()):
        from . import mt_dense
        return mt_dense.trace_anyhit(dense, origins, dirs, t_min, t_max,
                                     active, interpret=_dense_interpret())
    if hasattr(bvh, "inst_aabb"):  # instanced TLAS-over-BLAS
        from . import instanced
        return instanced.trace_anyhit(bvh, origins, dirs, t_min, t_max,
                                      active)
    if hasattr(bvh, "sub_aabb"):  # two-level (Bistro-scale)
        from . import bvh2l
        return bvh2l.trace_anyhit(bvh, origins, dirs, t_min, t_max,
                                  active)
    if hasattr(bvh, "table"):  # unified BVH8
        from . import traverse_pallas as TP
        if _use_pallas() and TP.pallas_supported(bvh):
            return TP.trace_anyhit(bvh, origins, dirs, t_min, t_max,
                                   active)
        _, prim, _, _ = _trace8(bvh.table, origins, dirs,
                                jnp.asarray(t_min, jnp.float32), t_max,
                                active, leaf_size=bvh.leaf_size,
                                any_hit=True, leaf_omm=bvh.leaf_omm)
        return prim >= 0
    _, prim, _, _ = _trace(bvh.child_bounds, bvh.child_idx, soup.verts,
                           origins, dirs, jnp.asarray(t_min, jnp.float32),
                           t_max, active, leaf_size=leaf_size,
                           any_hit=True)
    return prim >= 0
