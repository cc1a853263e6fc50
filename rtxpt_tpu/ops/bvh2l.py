"""Two-level BVH8: the TLAS/BLAS-scale acceleration structure.

The single-table MXU traversal (ops/traverse_pallas.py) pins the whole
BVH8 in VMEM, which caps it at ~4096 rows (~50k triangles). For
Bistro-class scenes the tree is split in two levels, mirroring the
reference's TLAS-over-BLAS shape (RTXPT/Sample.cpp:1353-1421) but cut by
occupancy rather than by instance:

  * the scene BVH2 is partitioned into K spatial SUBTREES of bounded
    size (a cut through the SAH tree, so subtrees are tight and
    disjoint in primitive ranges);
  * each subtree collapses into an independent BVH8 (own bf16 planes),
    padded to a common row count S and stacked (K, ...);
  * the TOP level is just the K subtree AABBs: a trace slab-tests all K
    boxes per ray in one fused XLA pass (K is small, 8-64), then
    lax.scan's over subtrees running the SAME single-table Pallas
    kernel per subtree with `t_max = best-so-far` (distance-culled) and
    per-ray active masks — all-dead tiles exit in one iteration, so the
    sweep costs roughly one traversal of the subtrees a ray actually
    overlaps.

This keeps one battle-tested kernel for both scales instead of a
separate two-level traversal program.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .bvh import BVH2, LEAF_MAX, build_bvh, collapse_bvh8
from .intersect import Hit


@jax.tree_util.register_pytree_node_class
class BVH8TwoLevel:
    def __init__(self, sub_nodes_t, sub_leaves_t, sub_tables,
                 sub_leaf_tris, sub_leaf_omm, sub_aabb, leaf_size: int,
                 rows: int):
        self.sub_nodes_t = sub_nodes_t     # (K, 72, S) bf16
        self.sub_leaves_t = sub_leaves_t   # (K, 29*ls, S) bf16
        self.sub_tables = sub_tables       # (K, S, W) f32 (XLA fallback)
        self.sub_leaf_tris = sub_leaf_tris  # (K, S*ls) i32 global tri ids
        self.sub_leaf_omm = sub_leaf_omm   # (K, S*ls) i32 opacity masks
        self.sub_aabb = sub_aabb           # (K, 6) f32 min.xyz max.xyz
        self.leaf_size = leaf_size
        self.rows = rows                   # S (static)

    @property
    def num_subtrees(self) -> int:
        return self.sub_aabb.shape[0]

    def tree_flatten(self):
        return ((self.sub_nodes_t, self.sub_leaves_t, self.sub_tables,
                 self.sub_leaf_tris, self.sub_leaf_omm, self.sub_aabb),
                (self.leaf_size, self.rows))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, leaf_size=aux[0], rows=aux[1])


def _node_tri_ranges(bvh: BVH2):
    """Per-BVH2-node [start, end) into the leaf order (bottom-up)."""
    ci = np.asarray(bvh.child_idx)
    n = ci.shape[0]
    start = np.zeros(n, np.int64)
    end = np.zeros(n, np.int64)
    ranges = {}
    for level in bvh.levels[::-1]:
        for nid in level:
            bounds = []
            for code in ci[nid]:
                if code < 0:
                    v = -int(code) - 1
                    s = v >> 5
                    bounds.append((s, s + (v & LEAF_MAX)))
                else:
                    bounds.append(ranges[code])
            lo = min(b[0] for b in bounds)
            hi = max(b[1] for b in bounds)
            ranges[nid] = (lo, hi)
            start[nid], end[nid] = lo, hi
    return start, end


def build_two_level(positions, indices, *, leaf_size: int = 4,
                    leaf_collapse: int = 16, tri_omm=None,
                    max_rows: int = 4096,
                    cap_tris: int = None) -> BVH8TwoLevel:
    """Partition the scene along a SAH-tree cut and build per-subtree
    BVH8s. cap_tris defaults to a conservative estimate that keeps each
    collapsed subtree under max_rows; subtrees exceeding the cap are
    re-split."""
    positions = np.asarray(positions, np.float32)
    indices = np.asarray(indices, np.int32)
    top = build_bvh(positions, indices, leaf_size=leaf_size)
    start, end = _node_tri_ranges(top)
    ci = np.asarray(top.child_idx)
    order = np.asarray(top.order)
    if cap_tris is None:
        cap_tris = max_rows * leaf_collapse // 3   # conservative fill

    # DFS cut: a node becomes a subtree root when its range fits the cap
    roots = []

    def cut(code):
        if code < 0:
            v = -int(code) - 1
            roots.append((v >> 5, (v >> 5) + (v & LEAF_MAX)))
            return
        lo, hi = int(start[code]), int(end[code])
        if hi - lo <= cap_tris:
            roots.append((lo, hi))
            return
        for c in ci[code]:
            if c != -1:
                cut(int(c))

    import sys
    sys.setrecursionlimit(100000)
    cut(0)
    # merge adjacent tiny ranges so K stays small
    roots.sort()
    merged = []
    for lo, hi in roots:
        if merged and hi - merged[-1][0] <= cap_tris and \
                merged[-1][1] == lo:
            merged[-1] = (merged[-1][0], hi)
        else:
            merged.append((lo, hi))

    subs = []
    for lo, hi in merged:
        tri_ids = order[lo:hi]
        sub_idx = indices[tri_ids]
        sub_omm = None if tri_omm is None else np.asarray(tri_omm)[tri_ids]
        b2 = build_bvh(positions, sub_idx, leaf_size=leaf_size)
        b8 = collapse_bvh8(b2, positions, sub_idx,
                           leaf_collapse=leaf_collapse, tri_omm=sub_omm)
        if b8.table.shape[0] > max_rows:
            raise ValueError(
                f"subtree rows {b8.table.shape[0]} > {max_rows}; lower "
                "cap_tris")
        # remap local tri ids -> global
        lt = np.asarray(b8.leaf_tris)
        gl = np.where(lt >= 0, tri_ids[np.maximum(lt, 0)], -1)
        p = positions[sub_idx.reshape(-1)]
        aabb = np.concatenate([p.min(0), p.max(0)])
        subs.append((b8, gl.astype(np.int32), aabb))

    k = len(subs)
    s_rows = max(b8.table.shape[0] for b8, _, _ in subs)
    width = subs[0][0].table.shape[1]
    ls = leaf_collapse
    nodes_t = np.zeros((k, 72, s_rows), np.float32)
    leaves_t = np.zeros((k, 29 * ls, s_rows), np.float32)
    tables = np.zeros((k, s_rows, width), np.float32)
    leaf_tris = np.full((k, s_rows * ls), -1, np.int32)
    leaf_omms = np.full((k, s_rows * ls), 0xFFFF, np.int32)
    aabbs = np.zeros((k, 6), np.float32)
    import ml_dtypes
    bf = np.dtype(ml_dtypes.bfloat16)
    nodes_bf = np.zeros((k, 72, s_rows), bf)
    leaves_bf = np.zeros((k, 29 * ls, s_rows), bf)
    for i, (b8, gl, aabb) in enumerate(subs):
        r = b8.table.shape[0]
        tables[i, :r] = np.asarray(b8.table)
        nodes_bf[i, :, :r] = np.asarray(b8.nodes_t)
        leaves_bf[i, :, :r] = np.asarray(b8.leaves_t)
        leaf_tris[i, :r * ls] = gl
        leaf_omms[i, :r * ls] = np.asarray(b8.leaf_omm)
        aabbs[i] = aabb
    return BVH8TwoLevel(
        sub_nodes_t=jnp.asarray(nodes_bf),
        sub_leaves_t=jnp.asarray(leaves_bf),
        sub_tables=jnp.asarray(tables),
        sub_leaf_tris=jnp.asarray(leaf_tris),
        sub_leaf_omm=jnp.asarray(leaf_omms),
        sub_aabb=jnp.asarray(aabbs),
        leaf_size=ls, rows=s_rows)


def _top_slabs(tl: BVH8TwoLevel, origins, dirs, t_min, t_max):
    """(N,K) hit mask + entry t for the K subtree AABBs."""
    inv = 1.0 / jnp.where(jnp.abs(dirs) < 1e-12,
                          jnp.where(dirs < 0, -1e-12, 1e-12), dirs)
    bmin = tl.sub_aabb[:, 0:3]                    # (K,3)
    bmax = tl.sub_aabb[:, 3:6]
    t0 = (bmin[None] - origins[:, None]) * inv[:, None]    # (N,K,3)
    t1 = (bmax[None] - origins[:, None]) * inv[:, None]
    tn = jnp.maximum(jnp.max(jnp.minimum(t0, t1), -1), t_min)
    tf = jnp.minimum(jnp.min(jnp.maximum(t0, t1), -1),
                     jnp.broadcast_to(t_max[:, None], tn.shape))
    return tn <= tf, tn


def _use_pallas():
    from .traverse import _use_pallas as up
    return up()


def _bucketed_interpret() -> bool:
    """Test hook: run the bucketed-probe kernel in Pallas interpret mode
    on CPU backends (RTXPT_BVH2L_INTERPRET=1)."""
    import os
    return os.environ.get("RTXPT_BVH2L_INTERPRET", "0") == "1"


def trace_closest(tl: BVH8TwoLevel, origins, dirs, t_min=0.0, t_max=1e30,
                  active=None) -> Hit:
    n = origins.shape[0]
    if active is None:
        active = jnp.ones((n,), bool)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    use_pallas = _use_pallas()
    # probe+sweep only pays off when the sweep has many subtrees to cull
    use_probe = tl.num_subtrees >= 8

    perm = None
    probed = None
    interpret = _bucketed_interpret()
    if use_probe and (use_pallas or interpret):
        # BUCKETED nearest-first probe: ONE dispatch in which each ray
        # tile traverses its own nearest overlapped subtree (planes
        # DMA'd per tile via scalar prefetch). Rays are grouped by
        # nearest-subtree id first so tiles are (nearly) pure and
        # consecutive tiles reuse the same planes; the handful of lanes
        # straddling a group boundary skip the probe and are picked up
        # by the sweep. best_t is then tight and `entry_t < best_t`
        # culls almost every sweep dispatch — the t-ordered visit the
        # reference gets per-thread from DXR recursion order.
        from .traverse_pallas import (_kernel_tile, _trace_pallas_bucketed)
        hit_k0, tn_k0 = _top_slabs(tl, origins, dirs, jnp.float32(t_min),
                                   t_max)
        near0 = jnp.argmin(jnp.where(hit_k0, tn_k0, jnp.inf), axis=1)
        overlapped = hit_k0.any(axis=1)
        # dead / non-overlapping rays sort to the back
        perm = jnp.argsort(jnp.where(active & overlapped, near0,
                                     tl.num_subtrees), stable=True)
        origins = jnp.take(origins, perm, axis=0)
        dirs = jnp.take(dirs, perm, axis=0)
        t_max = jnp.take(t_max, perm, axis=0)
        active = jnp.take(active, perm, axis=0)
        near = jnp.take(near0, perm, axis=0)
        ovl = jnp.take(overlapped, perm, axis=0)

        tile = _kernel_tile(tl.rows)
        n_pad = (max(n, tile) + tile - 1) // tile * tile
        near_p = jnp.pad(near, (0, n_pad - n))
        tile_sub = jnp.clip(near_p.reshape(-1, tile)[:, tile // 2],
                            0, tl.num_subtrees - 1).astype(jnp.int32)
        lane_sub = jnp.repeat(tile_sub, tile)[:n]
        probe_act = active & ovl & (near == lane_sub)
        t_p, prim_p, uv_p = _trace_pallas_bucketed(
            tl.sub_nodes_t, tl.sub_leaves_t, tile_sub, origins, dirs,
            t_max, probe_act, rows=tl.rows, leaf_size=tl.leaf_size,
            any_hit=False, interpret=interpret and not use_pallas)
        # subtree-local leaf slot -> global triangle id
        flat_lt = tl.sub_leaf_tris.reshape(-1)
        stride = tl.rows * tl.leaf_size
        gl = flat_lt[lane_sub * stride + jnp.maximum(prim_p, 0)]
        found_p = prim_p >= 0
        init = (jnp.where(found_p, t_p, t_max),
                jnp.where(found_p, gl, -1),
                jnp.where(found_p, uv_p[..., 0], 0.0),
                jnp.where(found_p, uv_p[..., 1], 0.0))
        probed = probe_act  # these rays already visited `near`
        hit_k, tn_k = _top_slabs(tl, origins, dirs, jnp.float32(t_min),
                                 t_max)
    else:
        hit_k, tn_k = _top_slabs(tl, origins, dirs, jnp.float32(t_min),
                                 t_max)
        near = jnp.argmin(jnp.where(hit_k, tn_k, jnp.inf), axis=1)
        init = (t_max, jnp.full((n,), -1, jnp.int32),
                jnp.zeros((n,)), jnp.zeros((n,)))

    def body(carry, s_probe):
        s, probe = s_probe
        best_t, best_prim, best_u, best_v = carry
        want = active & jnp.take(hit_k, s, axis=1) & \
            (jnp.take(tn_k, s, axis=1) < best_t)
        if probed is not None:
            want = want & ~(probed & (near == s))
        elif use_probe:
            want = want & jnp.where(probe, near == s, near != s)
        if use_pallas:
            from .traverse_pallas import _trace_pallas
            nodes_s = jax.lax.dynamic_index_in_dim(
                tl.sub_nodes_t, s, 0, keepdims=False)
            leaves_s = jax.lax.dynamic_index_in_dim(
                tl.sub_leaves_t, s, 0, keepdims=False)
            t, prim, uv = _trace_pallas(
                nodes_s, leaves_s, origins, dirs, best_t, want,
                rows=tl.rows, leaf_size=tl.leaf_size, any_hit=False)
            u, v = uv[..., 0], uv[..., 1]
        else:
            from .traverse import _trace8
            table_s = jax.lax.dynamic_index_in_dim(
                tl.sub_tables, s, 0, keepdims=False)
            omm_s = jax.lax.dynamic_index_in_dim(
                tl.sub_leaf_omm, s, 0, keepdims=False)
            t, prim, uv, _ = _trace8(
                table_s, origins, dirs, jnp.float32(t_min), best_t, want,
                leaf_size=tl.leaf_size, any_hit=False, leaf_omm=omm_s)
            u, v = uv[..., 0], uv[..., 1]
        lt_s = jax.lax.dynamic_index_in_dim(tl.sub_leaf_tris, s, 0,
                                            keepdims=False)
        orig = jnp.where(prim >= 0, lt_s[jnp.maximum(prim, 0)], -1)
        found = (prim >= 0) & (t < best_t)
        best_prim = jnp.where(found, orig, best_prim)
        best_u = jnp.where(found, u, best_u)
        best_v = jnp.where(found, v, best_v)
        best_t = jnp.where(found, t, best_t)
        return (best_t, best_prim, best_u, best_v), None

    k = tl.num_subtrees
    if use_probe and probed is None:
        # XLA fallback: masked probe + sweep (2K dispatches)
        ss = jnp.concatenate([jnp.arange(k), jnp.arange(k)])
        probe = jnp.concatenate([jnp.ones(k, bool), jnp.zeros(k, bool)])
    else:
        # bucketed probe already ran (or few subtrees): sweep only
        ss = jnp.arange(k)
        probe = jnp.zeros(k, bool)
    (bt, bp, bu, bv), _ = jax.lax.scan(body, init, (ss, probe))
    if perm is not None:
        # back to caller ray order
        bt = jnp.zeros_like(bt).at[perm].set(bt)
        bp = jnp.zeros_like(bp).at[perm].set(bp)
        bu = jnp.zeros_like(bu).at[perm].set(bu)
        bv = jnp.zeros_like(bv).at[perm].set(bv)
    return Hit(bt, bp, jnp.stack([bu, bv], -1))


def trace_anyhit(tl: BVH8TwoLevel, origins, dirs, t_min=0.0, t_max=1e30,
                 active=None):
    n = origins.shape[0]
    if active is None:
        active = jnp.ones((n,), bool)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    use_pallas = _use_pallas()
    interpret = _bucketed_interpret()
    use_probe = tl.num_subtrees >= 8 and (use_pallas or interpret)

    perm = None
    probed = None
    if use_probe:
        # bucketed occluder probe: most shadow rays find their blocker
        # in the nearest overlapped subtree, so one scalar-prefetch
        # dispatch (sorted-ray tiles, per-tile planes) settles them and
        # the sweep only runs the unresolved remainder with coherent
        # (mostly dead) tiles.
        from .traverse_pallas import (_kernel_tile, _trace_pallas_bucketed)
        hit_k0, tn_k0 = _top_slabs(tl, origins, dirs, jnp.float32(t_min),
                                   t_max)
        near0 = jnp.argmin(jnp.where(hit_k0, tn_k0, jnp.inf), axis=1)
        overlapped = hit_k0.any(axis=1)
        perm = jnp.argsort(jnp.where(active & overlapped, near0,
                                     tl.num_subtrees), stable=True)
        origins = jnp.take(origins, perm, axis=0)
        dirs = jnp.take(dirs, perm, axis=0)
        t_max = jnp.take(t_max, perm, axis=0)
        active = jnp.take(active, perm, axis=0)
        near = jnp.take(near0, perm, axis=0)
        ovl = jnp.take(overlapped, perm, axis=0)

        tile = _kernel_tile(tl.rows)
        n_pad = (max(n, tile) + tile - 1) // tile * tile
        near_p = jnp.pad(near, (0, n_pad - n))
        tile_sub = jnp.clip(near_p.reshape(-1, tile)[:, tile // 2],
                            0, tl.num_subtrees - 1).astype(jnp.int32)
        lane_sub = jnp.repeat(tile_sub, tile)[:n]
        probe_act = active & ovl & (near == lane_sub)
        _, prim_p, _ = _trace_pallas_bucketed(
            tl.sub_nodes_t, tl.sub_leaves_t, tile_sub, origins, dirs,
            t_max, probe_act, rows=tl.rows, leaf_size=tl.leaf_size,
            any_hit=True, interpret=interpret and not use_pallas)
        found0 = prim_p >= 0
        probed = probe_act
    else:
        found0 = jnp.zeros((n,), bool)
    hit_k, tn_k = _top_slabs(tl, origins, dirs, jnp.float32(t_min), t_max)

    def body(found, s):
        want = active & ~found & jnp.take(hit_k, s, axis=1)
        if probed is not None:
            want = want & ~(probed & (near == s))
        if use_pallas:
            from .traverse_pallas import _trace_pallas
            nodes_s = jax.lax.dynamic_index_in_dim(
                tl.sub_nodes_t, s, 0, keepdims=False)
            leaves_s = jax.lax.dynamic_index_in_dim(
                tl.sub_leaves_t, s, 0, keepdims=False)
            _, prim, _ = _trace_pallas(
                nodes_s, leaves_s, origins, dirs, t_max, want,
                rows=tl.rows, leaf_size=tl.leaf_size, any_hit=True)
        else:
            from .traverse import _trace8
            table_s = jax.lax.dynamic_index_in_dim(
                tl.sub_tables, s, 0, keepdims=False)
            omm_s = jax.lax.dynamic_index_in_dim(
                tl.sub_leaf_omm, s, 0, keepdims=False)
            _, prim, _, _ = _trace8(
                table_s, origins, dirs, jnp.float32(t_min), t_max, want,
                leaf_size=tl.leaf_size, any_hit=True, leaf_omm=omm_s)
        return found | (prim >= 0), None

    found, _ = jax.lax.scan(body, found0, jnp.arange(tl.num_subtrees))
    if perm is not None:
        found = jnp.zeros_like(found).at[perm].set(found)
    return found
