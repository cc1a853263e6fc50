"""Pallas TPU traversal kernel: MXU one-hot gathers from VMEM-resident
bf16 BVH8 planes.

The RT-core replacement, designed from measured TPU behavior
(tools/kernel_lab.py on v5e):
  * XLA HBM gathers sustain only ~1.5 GB/s on this chip, so the BVH8
    table is pinned in VMEM and each per-lane row fetch is computed as
    plane_T @ onehot(idx) on the MXU.
  * An f32 fetch needs Precision.HIGHEST = 6 bf16 passes (~6.4x a single
    pass, and ~90% of the whole per-iteration cost). The table is instead
    packed into bf16 planes that reconstruct exactly from single-pass
    DEFAULT matmuls (ops/bvh.py pack_tpu_planes): conservative-rounded
    node bounds, 3x8-bit code digits, 3-way residual-split leaf vertices.
  * Node and leaf fetches are separate matmuls; the leaf plane (the wide
    one, 27*leaf_size cols) is gated behind `lax.cond(any(do_leaf))` so
    node-only iterations skip it. VPU blocks (stack selects, slab tests,
    sort network, Moller-Trumbore) measure ~free next to the matmuls —
    they overlap MXU work.
  * The per-lane traversal stack is a (STACK_DEPTH, TILE) carry — slots on
    SUBLANES, rays on lanes, so every masked push/pop select runs on fully
    packed (8,128) native tiles. Push/pop are masked elementwise row
    selects (iota == slot) — Mosaic needs no scatter/gather support.
  * The while_loop re-checks its cross-lane cond every COND_EVERY bodies:
    a wasted masked iteration is cheaper than the cond's vector->scalar
    sync (measured on v5e).
  * Leaf rows inline up to leaf_size triangles; a leaf pop is leaf_size
    unrolled Moller-Trumbore tests, each pure VPU math on (TILE,) lanes.

Scaling: MXU gather cost is O(rows x rays), so this kernel is used when the
table fits the VMEM/MXU budget (pallas_supported()); larger scenes fall
back to the XLA path in ops/traverse.py (a two-level top/bottom split is
the planned extension for Bistro-scale scenes).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bvh import BVH8, CODE_BIAS, LEAF_MAX
from .intersect import Hit

TILE = 1024
STACK_DEPTH = 48
MAX_ITERS = 100_000
COND_EVERY = int(__import__("os").environ.get("RTXPT_COND_EVERY", "2"))  # bodies per while-cond check
# MXU-gather budget: rows beyond this make onehot matmuls too expensive
_MAX_ROWS = 4096


def _round_up(x, m):
    return (x + m - 1) // m * m


_SORT8 = ((0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6), (5, 7),
          (1, 2), (5, 6), (0, 4), (3, 7), (1, 5), (2, 6), (1, 4), (3, 6),
          (2, 4), (3, 5), (3, 4))


def _mt_scalar(ox, oy, oz, dx, dy, dz, tv, t_min, t_max):
    """Moller-Trumbore, fully component-wise; tv = 9 rows of (TILE,)."""
    p0x, p0y, p0z, e1x, e1y, e1z, e2x, e2y, e2z = tv
    # h = cross(d, e2)
    hx = dy * e2z - dz * e2y
    hy = dz * e2x - dx * e2z
    hz = dx * e2y - dy * e2x
    a = e1x * hx + e1y * hy + e1z * hz
    f = 1.0 / jnp.where(jnp.abs(a) < 1e-12, 1e-12, a)
    sx, sy, sz = ox - p0x, oy - p0y, oz - p0z
    u = f * (sx * hx + sy * hy + sz * hz)
    # q = cross(s, e1)
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = f * (dx * qx + dy * qy + dz * qz)
    t = f * (e2x * qx + e2y * qy + e2z * qz)
    hit = ((jnp.abs(a) > 1e-12) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
           & (t > t_min) & (t < t_max))
    return hit, t, u, v


def _slab(ox, oy, oz, ix, iy, iz, bnds, t_min, t_max):
    """Slab test; bnds = 6 rows of (TILE,): min.xyz, max.xyz."""
    t0x = (bnds[0] - ox) * ix
    t1x = (bnds[3] - ox) * ix
    t0y = (bnds[1] - oy) * iy
    t1y = (bnds[4] - oy) * iy
    t0z = (bnds[2] - oz) * iz
    t1z = (bnds[5] - oz) * iz
    tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                 jnp.minimum(t0y, t1y)),
                     jnp.maximum(jnp.minimum(t0z, t1z), t_min))
    tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                 jnp.maximum(t0y, t1y)),
                     jnp.minimum(jnp.maximum(t0z, t1z), t_max))
    return tn <= tf, tn


def _kernel_tile(rows: int) -> int:
    """Lane-tile size: the onehot intermediate is (rows, TILE) bf16 in
    VMEM; big subtree tables (two-level path) shrink the tile to stay
    under the 16 MB scoped-vmem budget. At rows=4096 the double-buffered
    (72+29*ls, rows) bf16 table blocks plus the onehot already measure
    16.05 MB with TILE=512 (scoped-vmem OOM, round-5 city soup A/B), so
    the 2048< rows tier drops to 256 lanes."""
    if rows <= 1024:
        return 1024
    return 512 if rows <= 2048 else 256


def _kernel_cond_every(rows: int) -> int:
    return COND_EVERY if rows <= 1024 else 1


def _make_kernel(rows: int, leaf_size: int, any_hit: bool,
                 stacked: bool = False):
    TILE = _kernel_tile(rows)
    cond_every = _kernel_cond_every(rows)

    def kernel(nodes_ref, leaves_ref, o_ref, d_ref, tmax_ref, act_ref,
               t_out, prim_out, u_out, v_out):
        if stacked:  # (1, 72, rows) block picked by scalar prefetch
            tab_n = nodes_ref[0]
            tab_l = leaves_ref[0]
        else:
            tab_n = nodes_ref[:]                     # (72, rows) bf16
            tab_l = leaves_ref[:]                    # (27*ls, rows) bf16
        ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]    # (TILE,)
        dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]

        def inv(c):
            return 1.0 / jnp.where(jnp.abs(c) < 1e-12,
                                   jnp.where(c < 0, -1e-12, 1e-12), c)

        ix, iy, iz = inv(dx), inv(dy), inv(dz)
        t_min = jnp.float32(0.0)
        act = act_ref[0] != 0

        slot_rows = jax.lax.broadcasted_iota(jnp.int32,
                                             (STACK_DEPTH, TILE), 0)

        # best-hit state lives in the OUTPUT refs so the gated leaf block
        # can be a side-effecting pl.when (Mosaic's native predication)
        # instead of a value-carrying cond
        t_out[0] = tmax_ref[0]
        prim_out[0] = jnp.full((TILE,), -1, jnp.int32)
        u_out[0] = jnp.zeros((TILE,), jnp.float32)
        v_out[0] = jnp.zeros((TILE,), jnp.float32)

        def cond(carry):
            _, sp, it = carry
            return jnp.any(sp > 0) & (it < MAX_ITERS)

        def step(carry):
            stack, sp, it = carry
            best_t = t_out[0]
            has = sp > 0
            top_row = jnp.maximum(sp - 1, 0)
            top = jnp.sum(jnp.where(slot_rows == top_row[None, :], stack,
                                    0), axis=0)
            sp = jnp.where(has, sp - 1, sp)
            is_leaf = top < 0
            do_node = has & ~is_leaf
            do_leaf = has & is_leaf

            vcode = -jnp.where(do_leaf, top, -1) - 1
            leaf_row = vcode >> 5
            lcount = vcode & LEAF_MAX
            fetch = jnp.where(do_leaf, leaf_row,
                              jnp.where(do_node, top, 0))
            # one-hot shared by both gathers; bf16 0/1 entries are exact
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (rows, TILE), 0)
                      == fetch[None, :]).astype(jnp.bfloat16)

            # ---- node: single-pass bf16 gather of bounds + code digits
            nrow = jnp.dot(tab_n, onehot,
                           preferred_element_type=jnp.float32)  # (72,TILE)
            ts = []
            cs = []
            for k in range(8):
                ck = (nrow[48 + 3 * k] * 65536.0 + nrow[49 + 3 * k] * 256.0
                      + nrow[50 + 3 * k] - float(CODE_BIAS)
                      ).astype(jnp.int32)
                hk, tk_ = _slab(ox, oy, oz, ix, iy, iz,
                                [nrow[k * 6 + j] for j in range(6)],
                                t_min, best_t)
                hk = hk & (ck != -1) & do_node
                ts.append(jnp.where(hk, tk_, -jnp.inf))
                cs.append(ck)
            for a, b in _SORT8:   # far-to-near ordering, branch-free
                swap = ts[a] < ts[b]
                ts[a], ts[b] = (jnp.where(swap, ts[b], ts[a]),
                                jnp.where(swap, ts[a], ts[b]))
                cs[a], cs[b] = (jnp.where(swap, cs[b], cs[a]),
                                jnp.where(swap, cs[a], cs[b]))
            off = jnp.zeros((TILE,), jnp.int32)
            for k in range(8):
                valid = ts[k] > -jnp.inf
                # invalid lanes write to slot -1, which no row matches
                slot = jnp.where(valid,
                                 jnp.minimum(sp + off, STACK_DEPTH - 1), -1)
                wmask = slot_rows == slot[None, :]
                stack = jnp.where(wmask, cs[k][None, :], stack)
                off = off + valid.astype(jnp.int32)
            sp = sp + off

            # ---- leaf: gated wide gather + unrolled Moller-Trumbore.
            # The leaf plane is the expensive matmul (27*ls cols); most
            # iterations pop only nodes, so skip it tile-wide when no
            # lane holds a leaf.
            @pl.when(jnp.any(do_leaf))
            def _():
                bt = t_out[0]
                bp = prim_out[0]
                bu = u_out[0]
                bv = v_out[0]
                lrow = jnp.dot(tab_l, onehot,
                               preferred_element_type=jnp.float32)
                omm0 = 27 * leaf_size
                for k in range(leaf_size):
                    tv = [lrow[27 * k + 3 * j] + lrow[27 * k + 3 * j + 1]
                          + lrow[27 * k + 3 * j + 2] for j in range(9)]
                    h, t, u, vv = _mt_scalar(ox, oy, oz, dx, dy, dz, tv,
                                             t_min, bt)
                    h = h & do_leaf & (k < lcount)
                    # opacity micro-mask (OMM) cell test: certain-
                    # transparent regions never hit (scene/omm.py)
                    mask = (lrow[omm0 + 2 * k] * 256.0
                            + lrow[omm0 + 2 * k + 1]).astype(jnp.int32)
                    ci = jnp.clip((u * 4.0).astype(jnp.int32), 0, 3)
                    cj = jnp.clip((vv * 4.0).astype(jnp.int32), 0, 3)
                    bit = (mask >> (ci * 4 + cj)) & 1
                    h = h & (bit != 0)
                    bp = jnp.where(h, leaf_row * leaf_size + k, bp)
                    bu = jnp.where(h, u, bu)
                    bv = jnp.where(h, vv, bv)
                    bt = jnp.where(h, t, bt)
                t_out[0] = bt
                prim_out[0] = bp
                u_out[0] = bu
                v_out[0] = bv

            if any_hit:
                sp = jnp.where(prim_out[0] >= 0, 0, sp)
            return (stack, sp, it + 1)

        def body(carry):
            for _ in range(cond_every):
                carry = step(carry)
            return carry

        init = (jnp.zeros((STACK_DEPTH, TILE), jnp.int32),
                jnp.where(act, 1, 0).astype(jnp.int32),
                jnp.int32(0))
        jax.lax.while_loop(cond, body, init)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("rows", "leaf_size", "any_hit"))
def _trace_pallas(nodes_t, leaves_t, origins, dirs, t_max, active,
                  rows: int, leaf_size: int, any_hit: bool):
    n = origins.shape[0]
    TILE = _kernel_tile(rows)
    n_pad = _round_up(max(n, TILE), TILE)
    pad = n_pad - n
    o = jnp.pad(origins, ((0, pad), (0, 0))).T            # (3, n_pad)
    d = jnp.pad(dirs, ((0, pad), (0, 0)), constant_values=1.0).T
    tm = jnp.pad(t_max, (0, pad))[None, :]                # (1, n_pad)
    ac = jnp.pad(active.astype(jnp.int32), (0, pad))[None, :]

    kernel = _make_kernel(rows, leaf_size, any_hit)
    grid = (n_pad // TILE,)
    t, prim, u, v = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
                   jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, n_pad), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((72, rows), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((29 * leaf_size, rows), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, TILE), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, TILE), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, TILE), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, TILE), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
    )(nodes_t, leaves_t, o, d, tm, ac)
    uv = jnp.stack([u[0, :n], v[0, :n]], axis=-1)
    return t[0, :n], prim[0, :n], uv


@functools.partial(jax.jit,
                   static_argnames=("rows", "leaf_size", "any_hit",
                                    "interpret"))
def _trace_pallas_bucketed(sub_nodes_t, sub_leaves_t, tile_sub, origins,
                           dirs, t_max, active, rows: int, leaf_size: int,
                           any_hit: bool, interpret: bool = False):
    """One-dispatch per-tile-subtree traversal (the two-level probe).

    sub_nodes_t (K, 72, S) / sub_leaves_t (K, 29*ls, S): stacked
    per-subtree planes. tile_sub (ntiles,) i32: which subtree each
    TILE-wide ray tile traverses, delivered via scalar prefetch so the
    BlockSpec index_map DMAs exactly that subtree's planes into VMEM.
    Rays must arrive pre-sorted/grouped so consecutive tiles share a
    subtree (repeat index -> no re-fetch). Callers mask `active` down
    to lanes whose wanted subtree == their tile's tile_sub; everything
    else is the sweep's job (ops/bvh2l.trace_closest).

    Replaces the K-dispatch nearest-first probe round: the reference
    gets t-ordered traversal per thread from DXR recursion
    (RTXPT/PathTracerBridgeDonut.hlsli:703); here one Pallas dispatch
    visits each ray's nearest subtree first so the sweep's
    `entry_t < best_t` cull kills almost all remaining dispatches.
    """
    n = origins.shape[0]
    TILE = _kernel_tile(rows)
    n_pad = _round_up(max(n, TILE), TILE)
    pad = n_pad - n
    o = jnp.pad(origins, ((0, pad), (0, 0))).T
    d = jnp.pad(dirs, ((0, pad), (0, 0)), constant_values=1.0).T
    tm = jnp.pad(t_max, (0, pad))[None, :]
    ac = jnp.pad(active.astype(jnp.int32), (0, pad))[None, :]

    base = _make_kernel(rows, leaf_size, any_hit, stacked=True)

    def kernel(ts_ref, nodes_ref, leaves_ref, o_ref, d_ref, tmax_ref,
               act_ref, t_out, prim_out, u_out, v_out):
        del ts_ref  # consumed by the index_maps
        base(nodes_ref, leaves_ref, o_ref, d_ref, tmax_ref, act_ref,
             t_out, prim_out, u_out, v_out)

    ls = leaf_size
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // TILE,),
        in_specs=[
            pl.BlockSpec((1, 72, rows), lambda i, ts: (ts[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 29 * ls, rows), lambda i, ts: (ts[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE), lambda i, ts: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE), lambda i, ts: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i, ts: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i, ts: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, TILE), lambda i, ts: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, TILE), lambda i, ts: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, TILE), lambda i, ts: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, TILE), lambda i, ts: (0, i),
                                memory_space=pltpu.VMEM)),
    )
    t, prim, u, v = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
                   jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, n_pad), jnp.float32)),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_sub, sub_nodes_t, sub_leaves_t, o, d, tm, ac)
    uv = jnp.stack([u[0, :n], v[0, :n]], axis=-1)
    return t[0, :n], prim[0, :n], uv


def pallas_supported(bvh: BVH8) -> bool:
    return bvh.table.shape[0] <= _MAX_ROWS


def trace_closest(bvh: BVH8, origins, dirs, t_min=0.0, t_max=1e30,
                  active=None, table_t=None) -> Hit:
    n = origins.shape[0]
    if active is None:
        active = jnp.ones((n,), bool)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    t, prim, uv = _trace_pallas(
        bvh.nodes_t, bvh.leaves_t, origins, dirs, t_max, active,
        rows=bvh.table.shape[0], leaf_size=bvh.leaf_size, any_hit=False)
    orig = jnp.where(prim >= 0, bvh.leaf_tris[jnp.maximum(prim, 0)], -1)
    return Hit(t, orig, uv)


def trace_anyhit(bvh: BVH8, origins, dirs, t_min=0.0, t_max=1e30,
                 active=None, table_t=None):
    n = origins.shape[0]
    if active is None:
        active = jnp.ones((n,), bool)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    _, prim, _ = _trace_pallas(
        bvh.nodes_t, bvh.leaves_t, origins, dirs, t_max, active,
        rows=bvh.table.shape[0], leaf_size=bvh.leaf_size, any_hit=True)
    return prim >= 0
