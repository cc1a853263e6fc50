"""BVH build for TPU traversal.

TPU-native replacement for the DXR BLAS/TLAS hardware builder
(RTXPT/Sample.cpp:1215-1421 CreateBlases/CreateTlas/BuildTLAS;
RTXPT/AccelerationStructureUtil.h). Because instances are flattened to world
space at scene build (scene/build.py), the two-level TLAS/BLAS structure
collapses into a single world-space binary BVH whose layout is chosen for
TPU traversal:

  * each internal node stores BOTH children's AABBs, so a traversal step is
    ONE node gather + two slab tests (child_bounds (N,12) f32 +
    child_idx (N,2) i32);
  * leaves are encoded in the child index: idx < 0 means leaf with
    start = (-idx-1) >> 5 and count = (-idx-1) & 31 into the leaf-ordered
    triangle soup (ops/intersect.TriSoup built with `order`).

The builder is host-side numpy (cold path, like the reference's
command-list BLAS builds); a refit pass (`refit`) updates bounds bottom-up
in jnp for animated geometry, mirroring the per-frame skinned BLAS refit
(Sample.cpp:1355-1380).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

LEAF_MAX = 31  # count bits in the leaf encoding
EMPTY_LEAF = np.int32(-1)  # start=0, count=0


def encode_leaf(start: int, count: int) -> int:
    assert 0 <= count <= LEAF_MAX
    return -((start << 5) | count) - 1


def decode_leaf(code):
    v = -(code) - 1
    return v >> 5, v & LEAF_MAX


class BVH2(NamedTuple):
    child_bounds: jnp.ndarray   # (N,12) f32 [lmin, lmax, rmin, rmax]
    child_idx: jnp.ndarray      # (N,2) i32 (>=0 node, <0 leaf code)
    order: jnp.ndarray          # (T,) i32 leaf-order -> original tri index
    # refit topology: nodes listed by depth so bottom-up refit is level-sweeps
    levels: tuple               # tuple of np arrays of node ids, deepest last

    @property
    def num_nodes(self) -> int:
        return self.child_bounds.shape[0]


def build_bvh(positions: np.ndarray, indices: np.ndarray,
              leaf_size: int = 4) -> BVH2:
    """Median-split (on centroid, largest axis) binary BVH. Balanced depth
    ~log2(T/leaf): recursion-safe and fully deterministic."""
    positions = np.asarray(positions, np.float32)
    indices = np.asarray(indices, np.int64)
    t = indices.shape[0]
    if t == 0:
        return BVH2(jnp.zeros((1, 12), jnp.float32),
                    jnp.asarray([[EMPTY_LEAF, EMPTY_LEAF]], jnp.int32),
                    jnp.zeros((0,), jnp.int32), (np.asarray([0]),))

    p = positions[indices]                      # (T,3,3)
    tmin = p.min(axis=1)
    tmax = p.max(axis=1)
    cent = (tmin + tmax) * 0.5
    order = np.arange(t, dtype=np.int64)

    bounds_l: list = []
    idx_l: list = []
    depth_l: list = []

    def new_node(depth):
        bounds_l.append(np.zeros(12, np.float32))
        idx_l.append(np.zeros(2, np.int32))
        depth_l.append(depth)
        return len(bounds_l) - 1

    import sys
    sys.setrecursionlimit(100000)

    def range_bounds(sel):
        return tmin[sel].min(axis=0), tmax[sel].max(axis=0)

    def build(sel: np.ndarray, depth: int) -> int:
        """Returns child code for the range `sel` (view into order)."""
        n = sel.shape[0]
        if n <= leaf_size:
            start = build.cursor
            out_order[start:start + n] = sel
            build.cursor += n
            return encode_leaf(start, n)
        c = cent[sel]
        lo, hi = c.min(axis=0), c.max(axis=0)
        axis = int(np.argmax(hi - lo))
        if hi[axis] - lo[axis] < 1e-12:
            mid = n // 2
            part = np.argsort(c[:, axis], kind="stable")
        else:
            part = np.argsort(c[:, axis], kind="stable")
            mid = n // 2
        left_sel = sel[part[:mid]]
        right_sel = sel[part[mid:]]
        node = new_node(depth)
        lcode = build(left_sel, depth + 1)
        rcode = build(right_sel, depth + 1)
        lmin, lmax = range_bounds(left_sel)
        rmin, rmax = range_bounds(right_sel)
        bounds_l[node] = np.concatenate([lmin, lmax, rmin, rmax]).astype(
            np.float32)
        idx_l[node] = np.asarray([lcode, rcode], np.int32)
        return node

    out_order = np.zeros(t, np.int64)
    build.cursor = 0

    if t <= leaf_size:
        # single leaf under a pseudo-root
        node = new_node(0)
        out_order[:] = order
        lmin, lmax = range_bounds(order)
        bounds_l[node] = np.concatenate(
            [lmin, lmax, lmin, lmax]).astype(np.float32)
        idx_l[node] = np.asarray([encode_leaf(0, t), EMPTY_LEAF], np.int32)
    else:
        root = build(order, 0)
        assert root == 0

    depths = np.asarray(depth_l)
    levels = tuple(np.where(depths == dd)[0]
                   for dd in range(depths.max() + 1))
    return BVH2(
        child_bounds=jnp.asarray(np.stack(bounds_l)),
        child_idx=jnp.asarray(np.stack(idx_l)),
        order=jnp.asarray(out_order.astype(np.int32)),
        levels=levels,
    )


def refit(bvh: BVH2, positions: jnp.ndarray, indices: jnp.ndarray) -> BVH2:
    """Bottom-up AABB refit after vertex animation (topology unchanged).
    Level-sweep: deepest level first, all nodes in a level in parallel
    (mirrors per-frame skinned BLAS update, Sample.cpp:1355-1380)."""
    tri = positions[indices[bvh.order]]          # (T,3,3) leaf order
    tmin = tri.min(axis=1)
    tmax = tri.max(axis=1)
    # prefix sums over leaf ranges via cumulative min/max would be complex;
    # instead compute per-leaf bounds with a segment gather below.
    cb = bvh.child_bounds
    ci = bvh.child_idx

    def leaf_bounds(code):
        v = -code - 1
        start = v >> 5
        count = v & LEAF_MAX
        ks = jnp.arange(LEAF_MAX if False else 8)  # builder leaf_size <= 8
        idxs = start[:, None] + ks[None, :]
        valid = ks[None, :] < count[:, None]
        idxs = jnp.clip(idxs, 0, tmin.shape[0] - 1)
        lo = jnp.where(valid[..., None], tmin[idxs], jnp.inf).min(axis=1)
        hi = jnp.where(valid[..., None], tmax[idxs], -jnp.inf).max(axis=1)
        return lo, hi

    for level in bvh.levels[::-1]:
        ids = jnp.asarray(level)
        codes = ci[ids]                           # (L,2)
        new_b = []
        for side in range(2):
            c = codes[:, side]
            is_leaf = c < 0
            llo, lhi = leaf_bounds(jnp.where(is_leaf, c, -1))
            node = jnp.clip(jnp.where(is_leaf, 0, c), 0, cb.shape[0] - 1)
            nb = cb[node]
            nlo = jnp.minimum(nb[:, 0:3], nb[:, 6:9])
            nhi = jnp.maximum(nb[:, 3:6], nb[:, 9:12])
            lo = jnp.where(is_leaf[:, None], llo, nlo)
            hi = jnp.where(is_leaf[:, None], lhi, nhi)
            new_b += [lo, hi]
        cb = cb.at[ids].set(jnp.concatenate(new_b, axis=-1))
    return BVH2(cb, ci, bvh.order, bvh.levels)
