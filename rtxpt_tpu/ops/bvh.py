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
              leaf_size: int = 4, use_native: bool = True) -> BVH2:
    """BVH2 build. Prefers the native C++ binned-SAH builder
    (rtxpt_tpu/native/bvh_builder.cpp) — the equivalent of the reference's
    driver-side BLAS build — and falls back to the numpy median-split
    builder when the native library is unavailable."""
    positions = np.asarray(positions, np.float32)
    indices = np.asarray(indices, np.int64)
    t = indices.shape[0]
    if use_native and t > 0:
        try:
            from .. import native
            res = native.build_bvh_native(positions,
                                          indices.astype(np.int32),
                                          leaf_size)
        except Exception:
            res = None
        if res is not None:
            bounds, child, depth, order = res
            levels = tuple(np.where(depth == d)[0]
                           for d in range(int(depth.max()) + 1))
            return BVH2(child_bounds=jnp.asarray(bounds),
                        child_idx=jnp.asarray(child),
                        order=jnp.asarray(order.astype(np.int32)),
                        levels=levels)
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


import jax


# ---- bf16 gather planes -----------------------------------------------------
# The Pallas traversal fetches rows as table_T @ onehot on the MXU. An f32
# fetch needs Precision.HIGHEST (6 bf16 passes, measured 6.4x the cost of a
# single bf16 pass on v5e — tools/kernel_lab.py). Instead the table is
# re-packed into bf16 "planes" whose values reconstruct exactly from
# single-pass DEFAULT matmuls:
#   * node bounds: bf16 rounded conservatively (min down / max up), so the
#     slab test stays correct (at worst visits a few extra nodes);
#   * child codes: biased integers split into 3x8-bit digits (each digit
#     < 256 is exactly representable in bf16, and a one-hot matmul
#     reproduces it exactly);
#   * leaf triangle data: 3-way bf16 residual split (h1+h2+h3 carries the
#     full 24-bit f32 mantissa), summed after the gather.
CODE_BIAS = 1 << 23  # codes in (-2^23, 2^23) -> biased to [0, 2^24)


def _bf16_round_dir(x, up: bool):
    """bf16 value <= x (up=False) or >= x (up=True), elementwise f32->bf16.
    Truncating the low 16 bits always shrinks the magnitude; bump one ulp
    when the shrink went the wrong way for the requested direction."""
    u = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    t = u & jnp.uint32(0xFFFF0000)
    exact = t == u
    neg = x < 0
    bump = ((~neg) if up else neg) & ~exact
    t = t + jnp.where(bump, jnp.uint32(0x10000),
                      jnp.uint32(0)).astype(jnp.uint32)
    y = jax.lax.bitcast_convert_type(t, jnp.float32)
    return y.astype(jnp.bfloat16)


def _split3(x):
    """3-way bf16 residual split: h1+h2+h3 ~= x to full f32 precision."""
    x = x.astype(jnp.float32)
    h1 = x.astype(jnp.bfloat16)
    r1 = x - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    r2 = r1 - h2.astype(jnp.float32)
    h3 = r2.astype(jnp.bfloat16)
    return h1, h2, h3


def _pack_tpu_planes_np(table, leaf_size: int, leaf_omm=None):
    """Host numpy variant of pack_tpu_planes (construction cold path;
    avoids ~45 s of eager per-op dispatches through the TPU tunnel)."""
    import ml_dtypes
    table = np.asarray(table, np.float32)
    bf = np.dtype(ml_dtypes.bfloat16)

    def round_dir(x, up):
        u = x.view(np.uint32)
        t = u & np.uint32(0xFFFF0000)
        exact = t == u
        neg = x < 0
        bump = ((~neg) if up else neg) & ~exact
        t = t + np.where(bump, np.uint32(0x10000), np.uint32(0))
        return t.view(np.float32).astype(bf)

    bounds = table[:, :48]
    is_min = (np.arange(48) % 6) < 3
    b = np.where(is_min[None, :], round_dir(bounds, False),
                 round_dir(bounds, True))
    codes = np.round(table[:, 48:56]).astype(np.int64) + CODE_BIAS
    codes = np.clip(codes, 0, (1 << 24) - 1)
    digits = np.stack([(codes >> 16), (codes >> 8) & 255, codes & 255],
                      axis=-1).reshape(-1, 24).astype(bf)
    nodes = np.concatenate([b.astype(bf), digits], axis=-1)

    lv = table[:, :9 * leaf_size]
    h1 = lv.astype(bf)
    r1 = lv - h1.astype(np.float32)
    h2 = r1.astype(bf)
    r2 = r1 - h2.astype(np.float32)
    h3 = r2.astype(bf)
    leaves = np.stack([h1, h2, h3], axis=-1).reshape(
        table.shape[0], 27 * leaf_size)
    rows = table.shape[0]
    if leaf_omm is None:
        omm = np.full((rows, leaf_size), 0xFFFF, np.int64)
    else:
        omm = np.asarray(leaf_omm, np.int64).reshape(rows, leaf_size)
    omm_cols = np.stack([(omm >> 8) & 255, omm & 255],
                        axis=-1).reshape(rows, 2 * leaf_size).astype(bf)
    leaves = np.concatenate([leaves, omm_cols], axis=-1)
    return (jnp.asarray(np.ascontiguousarray(nodes.T)),
            jnp.asarray(np.ascontiguousarray(leaves.T)))


def pack_tpu_planes(table, leaf_size: int, leaf_omm=None):
    """(rows, W) f32 unified table -> (nodes_t, leaves_t) bf16 planes,
    both transposed to (cols, rows) for the MXU gather.

    nodes_t (72, rows): cols 0:48 conservative bounds (min.xyz down,
    max.xyz up per child slot), cols 48:72 = 8 children x 3 code digits.
    leaves_t (29*leaf_size, rows): cols 0:27*ls = triangle values as
    3-way residual splits; cols 27*ls + 2k = hi/lo bytes of triangle
    k's 16-bit opacity micro-mask (scene/omm.py). jit-friendly (pure
    jnp) so the refit path can re-pack."""
    if not isinstance(table, jax.core.Tracer):
        return _pack_tpu_planes_np(table, leaf_size, leaf_omm)
    bounds = table[:, :48]
    is_min = (jnp.arange(48) % 6) < 3
    b_lo = _bf16_round_dir(bounds, up=False)
    b_hi = _bf16_round_dir(bounds, up=True)
    b = jnp.where(is_min[None, :], b_lo, b_hi)          # (rows, 48)

    codes = jnp.round(table[:, 48:56]).astype(jnp.int32) + CODE_BIAS
    codes = jnp.clip(codes, 0, (1 << 24) - 1)
    d2 = (codes >> 16).astype(jnp.bfloat16)
    d1 = ((codes >> 8) & 255).astype(jnp.bfloat16)
    d0 = (codes & 255).astype(jnp.bfloat16)
    digits = jnp.stack([d2, d1, d0], axis=-1).reshape(-1, 24)  # (rows, 24)

    nodes = jnp.concatenate([b, digits], axis=-1)        # (rows, 72)

    lv = table[:, :9 * leaf_size]
    h1, h2, h3 = _split3(lv)
    leaves = jnp.stack([h1, h2, h3], axis=-1).reshape(
        table.shape[0], 27 * leaf_size)                  # (rows, 27*ls)
    rows = table.shape[0]
    if leaf_omm is None:
        omm = jnp.full((rows, leaf_size), 0xFFFF, jnp.int32)
    else:
        omm = jnp.asarray(leaf_omm, jnp.int32).reshape(rows, leaf_size)
    omm_cols = jnp.stack([(omm >> 8) & 255, omm & 255], axis=-1).reshape(
        rows, 2 * leaf_size).astype(jnp.bfloat16)
    leaves = jnp.concatenate([leaves, omm_cols], axis=-1)
    return nodes.T, leaves.T


@jax.tree_util.register_pytree_node_class
class BVH8:
    """8-wide BVH in a UNIFIED one-row-per-gather layout (the SER/RT-core
    replacement tuned for the TPU memory system).

    Node rows pack 8 child AABBs + 8 child codes (stored as exact float
    VALUES, since MXU gathers flush denormal bit patterns); leaf rows
    inline up to `leaf_size` triangles as (p0, e1, e2) so leaf intersection
    is wide vector math with no extra fetch. Rows are
    `width = max(56, 9*leaf_size)` floats. The whole traversal step costs
    ONE row fetch (XLA gather on CPU, MXU one-hot matmul in the Pallas
    kernel, ops/traverse_pallas.py).

    Child code encoding: >= 0 -> node row index; < 0 -> leaf with
    row = (-code-1) >> 5 and count = (-code-1) & 31; -1 = empty slot.
    leaf_size/num_nodes are static pytree aux data (jit-specializing)."""

    def __init__(self, table, leaf_tris, leaf_size: int, num_nodes: int,
                 refit_info=None, nodes_t=None, leaves_t=None,
                 leaf_omm=None):
        self.table = table          # (R, W) f32 unified node/leaf rows
        self.leaf_tris = leaf_tris  # (R*leaf_size,) i32 original tri ids
        self.leaf_size = leaf_size
        self.num_nodes = num_nodes
        # static host-side topology for device refit: {"codes": (Nn,8)
        # np.int32 child codes per node row, "levels": tuple of np arrays
        # of node-row ids by depth}
        self.refit_info = refit_info
        # (R*leaf_size,) i32 16-bit opacity micro-masks (scene/omm.py)
        if leaf_omm is None:
            leaf_omm = jnp.full_like(leaf_tris, 0xFFFF)
        self.leaf_omm = leaf_omm
        # bf16 gather planes for the Pallas MXU kernel (pack_tpu_planes)
        if nodes_t is None:
            nodes_t, leaves_t = pack_tpu_planes(table, leaf_size,
                                                leaf_omm)
        self.nodes_t = nodes_t      # (72, R) bf16
        self.leaves_t = leaves_t    # (29*leaf_size, R) bf16

    @property
    def num_rows(self) -> int:
        return self.table.shape[0]

    def replace_table(self, table) -> "BVH8":
        return BVH8(table, self.leaf_tris, self.leaf_size, self.num_nodes,
                    self.refit_info, leaf_omm=self.leaf_omm)

    def tree_flatten(self):
        return ((self.table, self.leaf_tris, self.nodes_t, self.leaves_t,
                 self.leaf_omm),
                (self.leaf_size, self.num_nodes,
                 _StaticWrap(self.refit_info)))

    @classmethod
    def tree_unflatten(cls, aux, children):
        # bypass __init__: JAX unflattens with placeholder leaves (None)
        # while matching shard_map specs/avals, and __init__'s derived-
        # field computation (full_like/pack) must not run on those
        obj = object.__new__(cls)
        (obj.table, obj.leaf_tris, obj.nodes_t, obj.leaves_t,
         obj.leaf_omm) = children
        obj.leaf_size, obj.num_nodes = aux[0], aux[1]
        obj.refit_info = aux[2].val
        return obj


class _StaticWrap:
    """Hashable identity wrapper so host-side refit topology can ride in
    pytree aux data without defining array equality."""

    def __init__(self, val):
        self.val = val

    def __hash__(self):
        return id(self.val)

    def __eq__(self, other):
        return isinstance(other, _StaticWrap) and other.val is self.val


def collapse_bvh8(bvh: BVH2, positions, indices,
                  leaf_collapse: int = 16, tri_omm=None) -> BVH8:
    """Collapse a BVH2 into the unified 8-wide layout (host side).

    Subtrees with <= leaf_collapse triangles become single leaves spanning
    their (contiguous) triangle range; otherwise the 8 child slots are
    filled by repeatedly splitting the largest-count internal slot."""
    cb2 = np.asarray(bvh.child_bounds)
    ci2 = np.asarray(bvh.child_idx)
    n2 = cb2.shape[0]
    assert leaf_collapse <= LEAF_MAX

    # per-BVH2-node triangle range [start, end) and bounds
    start = np.zeros(n2, np.int64)
    end = np.zeros(n2, np.int64)

    def code_range(code, node_ranges):
        if code < 0:
            s, c = decode_leaf(code)
            return s, s + c
        return node_ranges[code]

    # compute ranges bottom-up over levels (deepest first)
    node_ranges = {}
    for level in bvh.levels[::-1]:
        for nid in level:
            l, r = ci2[nid]
            ls, le = code_range(l, node_ranges)
            rs, re = code_range(r, node_ranges)
            lo = min(ls, rs)
            hi = max(le, re)
            node_ranges[nid] = (lo, hi)
            start[nid], end[nid] = lo, hi

    def node_bounds(code, parent_slot_bounds):
        return parent_slot_bounds  # bounds always come from the parent slot

    out_bounds: list = []
    out_idx: list = []

    def subtree_count(code):
        if code < 0:
            _, c = decode_leaf(code)
            return c
        return end[code] - start[code]

    def build8(code, bounds) -> int:
        """Returns BVH8 child code for a BVH2 subtree (code) with known
        bounds; appends nodes to out_*."""
        cnt = subtree_count(code)
        if code < 0:
            return int(code)
        if cnt <= leaf_collapse:
            return encode_leaf(int(start[code]), int(cnt))
        # fill up to 8 slots
        slots = [(int(code), bounds)]
        while len(slots) < 8:
            # split the internal slot with the largest triangle count
            best = -1
            best_cnt = leaf_collapse
            for i, (c, _) in enumerate(slots):
                if c >= 0 and subtree_count(c) > best_cnt:
                    cc = subtree_count(c)
                    if best < 0 or cc > subtree_count(slots[best][0]):
                        best = i
            if best < 0:
                break
            c, _ = slots.pop(best)
            lb = cb2[c, 0:6]
            rb = cb2[c, 6:12]
            slots.append((int(ci2[c, 0]), lb))
            slots.append((int(ci2[c, 1]), rb))
        node_id = len(out_bounds)
        out_bounds.append(np.zeros(48, np.float32))
        out_idx.append(np.full(8, EMPTY_LEAF, np.int32))
        for i, (c, b) in enumerate(slots):
            out_bounds[node_id][i * 6:(i + 1) * 6] = b
            out_idx[node_id][i] = build8(c, b)
        # empty slots get inverted bounds so the slab test always misses
        for i in range(len(slots), 8):
            out_bounds[node_id][i * 6:i * 6 + 3] = 1e30
            out_bounds[node_id][i * 6 + 3:i * 6 + 6] = -1e30
        return node_id

    root_bounds = np.concatenate([
        np.minimum(cb2[0, 0:3], cb2[0, 6:9]),
        np.maximum(cb2[0, 3:6], cb2[0, 9:12])])
    import sys
    sys.setrecursionlimit(100000)
    # root: always emit a node (build8 may return a leaf code for tiny
    # scenes -> wrap it)
    root = build8(0, root_bounds)
    if root != 0 or not out_bounds:
        node = np.zeros(48, np.float32)
        node[0:6] = root_bounds
        for i in range(1, 8):
            node[i * 6:i * 6 + 3] = 1e30
            node[i * 6 + 3:i * 6 + 6] = -1e30
        idx = np.full(8, EMPTY_LEAF, np.int32)
        idx[0] = root
        out_bounds.insert(0, node)
        out_idx.insert(0, idx)
        # shift internal references by 1
        for k in range(len(out_idx)):
            row = out_idx[k]
            row[row >= 0] += 1
            out_idx[k] = row

    # ---- pack the unified table ------------------------------------------
    n_nodes = len(out_bounds)
    idx_mat = np.stack(out_idx)                      # (n_nodes, 8)
    # collect distinct leaf (start, count) codes
    leaf_codes = sorted({int(c) for c in idx_mat.reshape(-1)
                         if c < 0 and c != EMPTY_LEAF})
    leaf_row_of = {c: n_nodes + i for i, c in enumerate(leaf_codes)}
    n_leaves = len(leaf_codes)

    width = max(56, 9 * leaf_collapse)
    table = np.zeros((n_nodes + n_leaves, width), np.float32)
    leaf_tris = np.full((n_nodes + n_leaves, leaf_collapse), -1, np.int32)

    order = np.asarray(bvh.order)
    positions = np.asarray(positions)
    indices = np.asarray(indices)

    def remap(code):
        if code >= 0:
            return code
        if code == EMPTY_LEAF:
            return EMPTY_LEAF
        s, c = decode_leaf(int(code))
        row = leaf_row_of[int(code)]
        return encode_leaf(row, c)

    for i in range(n_nodes):
        table[i, 0:48] = out_bounds[i]
        codes = np.asarray([remap(c) for c in idx_mat[i]], np.int32)
        # codes stored as exact float VALUES (not bit patterns): the MXU
        # one-hot gather flushes denormal f32 bit patterns to zero
        table[i, 48:56] = codes.astype(np.float32)

    for code, row in leaf_row_of.items():
        s, c = decode_leaf(code)
        tri_ids = order[s:s + c]                      # original tri indices
        leaf_tris[row, :c] = tri_ids
        p = positions[indices[tri_ids]]               # (c,3,3)
        p0 = p[:, 0]
        e1 = p[:, 1] - p0
        e2 = p[:, 2] - p0
        table[row, :c * 9] = np.concatenate([p0, e1, e2],
                                            axis=1).reshape(-1)

    # refit topology: remapped child codes per node row + depth levels
    codes_mat = np.zeros((n_nodes, 8), np.int32)
    node_depth = np.zeros(n_nodes, np.int32)

    def _depth_fill(row, d):
        node_depth[row] = d
        for c in codes_mat[row]:
            if c >= 0:
                _depth_fill(c, d + 1)

    for i in range(n_nodes):
        codes_mat[i] = np.frombuffer(
            table[i, 48:56].astype(np.float32).tobytes(),
            np.float32).astype(np.int32)
    _depth_fill(0, 0)
    levels = tuple(np.where(node_depth == d)[0]
                   for d in range(int(node_depth.max()) + 1))
    refit_info = {"codes": codes_mat, "levels": levels}
    # Traversal-safety contracts (fail loudly at build time rather than
    # silently corrupting traversal):
    #  - worst-case stack growth is 7 pushes per level + the root, and the
    #    kernels clamp pushes at STACK_DEPTH-1 overwriting the top slot;
    #  - child codes ride the table as f32 VALUES, exact only to 2^24.
    max_stack = 7 * len(levels) + 8
    if max_stack > 48:  # min(Pallas STACK_DEPTH, XLA STACK_DEPTH)
        raise ValueError(
            f"BVH8 depth {len(levels)} needs stack {max_stack} > 48; "
            "increase STACK_DEPTH or leaf_collapse")
    max_code = max((abs(int(c)) for c in idx_mat.reshape(-1)), default=0)
    max_leaf_code = (n_nodes + n_leaves) << 5 | LEAF_MAX
    if max(max_code, max_leaf_code) >= (1 << 24):
        raise ValueError(
            f"BVH8 child code {max(max_code, max_leaf_code)} not exactly "
            "representable in f32 (>= 2^24 rows*32); scene too large for "
            "the unified table")
    leaf_omm = None
    if tri_omm is not None:
        tri_omm = np.asarray(tri_omm, np.int32)
        lo = np.full(leaf_tris.shape, 0xFFFF, np.int32)
        lv = leaf_tris >= 0
        lo[lv] = tri_omm[leaf_tris[lv]]
        leaf_omm = jnp.asarray(lo.reshape(-1))
    return BVH8(table=jnp.asarray(table),
                leaf_tris=jnp.asarray(leaf_tris.reshape(-1)),
                leaf_size=leaf_collapse, num_nodes=n_nodes,
                refit_info=refit_info, leaf_omm=leaf_omm)


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
