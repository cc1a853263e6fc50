"""Pallas TPU traversal kernel: MXU one-hot gathers from a VMEM-resident
unified BVH8 table.

The RT-core replacement, designed from measured TPU behavior:
  * XLA HBM gathers sustain only ~1.5 GB/s on this chip, so the whole
    unified node/leaf table (ops/bvh.py BVH8) is pinned in VMEM and each
    per-lane row fetch is computed as table_T @ onehot(idx) on the MXU
    (measured ~30x faster than the XLA gather loop for the same trace).
  * Data is laid out component-wise: the gather result is (width, TILE),
    so extracting "field j of every lane's row" is a cheap sublane slice;
    rays are passed transposed (3, N). No cross-lane shuffles anywhere.
  * The per-lane traversal stack is a (STACK_DEPTH, TILE) carry — slots on
    SUBLANES, rays on lanes, so every masked push/pop select runs on fully
    packed (8,128) native tiles (the round-1 (TILE, STACK_DEPTH) layout
    left 80/128 lanes idle; measured ~10us/iter saved). Push/pop are
    masked elementwise row selects (iota == slot) — Mosaic needs no
    scatter/gather support.
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

from .bvh import BVH8, LEAF_MAX
from .intersect import Hit

TILE = 1024
STACK_DEPTH = 48
MAX_ITERS = 100_000
COND_EVERY = 2   # traversal bodies per while-cond check
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


def _make_kernel(rows: int, width: int, leaf_size: int, any_hit: bool):

    def kernel(table_ref, o_ref, d_ref, tmax_ref, act_ref,
               t_out, prim_out, u_out, v_out):
        tab_t = table_ref[:]                         # (width, rows) VMEM
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

        def cond(carry):
            _, sp, _, _, _, _, it = carry
            return jnp.any(sp > 0) & (it < MAX_ITERS)

        def step(carry):
            stack, sp, best_t, best_prim, best_u, best_v, it = carry
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
            # MXU gather: (width, rows) @ (rows, TILE) -> (width, TILE)
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (rows, TILE), 0)
                      == fetch[None, :]).astype(jnp.float32)
            # HIGHEST precision: default TPU matmul rounds to bf16,
            # which corrupts geometry and child codes (and is NOT faster
            # here — the iteration is VPU/overhead-bound, measured)
            row = jnp.dot(tab_t, onehot,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)

            # ---- node: 8 AABBs + codes
            ci = row[48:56].astype(jnp.int32)   # codes are float values
            ts = []
            cs = []
            for k in range(8):
                hk, tk_ = _slab(ox, oy, oz, ix, iy, iz,
                                [row[k * 6 + j] for j in range(6)],
                                t_min, best_t)
                ck = ci[k]
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

            # ---- leaf: unrolled wide MT over inlined triangles
            for k in range(leaf_size):
                tv = [row[9 * k + j] for j in range(9)]
                h, t, u, vv = _mt_scalar(ox, oy, oz, dx, dy, dz, tv,
                                         t_min, best_t)
                h = h & do_leaf & (k < lcount)
                best_prim = jnp.where(h, leaf_row * leaf_size + k,
                                      best_prim)
                best_u = jnp.where(h, u, best_u)
                best_v = jnp.where(h, vv, best_v)
                best_t = jnp.where(h, t, best_t)
            if any_hit:
                sp = jnp.where(best_prim >= 0, 0, sp)
            return (stack, sp, best_t, best_prim, best_u, best_v, it + 1)

        def body(carry):
            for _ in range(COND_EVERY):
                carry = step(carry)
            return carry

        init = (jnp.zeros((STACK_DEPTH, TILE), jnp.int32),
                jnp.where(act, 1, 0).astype(jnp.int32),
                tmax_ref[0],
                jnp.full((TILE,), -1, jnp.int32),
                jnp.zeros((TILE,), jnp.float32),
                jnp.zeros((TILE,), jnp.float32),
                jnp.int32(0))
        _, _, bt, bp, bu, bv, _ = jax.lax.while_loop(cond, body, init)
        t_out[0] = bt
        prim_out[0] = bp
        u_out[0] = bu
        v_out[0] = bv

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("rows", "width", "leaf_size",
                                    "any_hit"))
def _trace_pallas(table_t, origins, dirs, t_max, active, rows: int,
                  width: int, leaf_size: int, any_hit: bool):
    n = origins.shape[0]
    n_pad = _round_up(max(n, TILE), TILE)
    pad = n_pad - n
    o = jnp.pad(origins, ((0, pad), (0, 0))).T            # (3, n_pad)
    d = jnp.pad(dirs, ((0, pad), (0, 0)), constant_values=1.0).T
    tm = jnp.pad(t_max, (0, pad))[None, :]                # (1, n_pad)
    ac = jnp.pad(active.astype(jnp.int32), (0, pad))[None, :]

    kernel = _make_kernel(rows, width, leaf_size, any_hit)
    grid = (n_pad // TILE,)
    t, prim, u, v = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
                   jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, n_pad), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((width, rows), lambda i: (0, 0),
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
    )(table_t, o, d, tm, ac)
    uv = jnp.stack([u[0, :n], v[0, :n]], axis=-1)
    return t[0, :n], prim[0, :n], uv


def table_transposed(bvh: BVH8):
    """(width, rows) f32 view of the unified table for the MXU gather."""
    return bvh.table.T


def pallas_supported(bvh: BVH8) -> bool:
    return bvh.table.shape[0] <= _MAX_ROWS


def trace_closest(bvh: BVH8, origins, dirs, t_min=0.0, t_max=1e30,
                  active=None, table_t=None) -> Hit:
    n = origins.shape[0]
    if active is None:
        active = jnp.ones((n,), bool)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    tt = table_t if table_t is not None else bvh.table.T
    t, prim, uv = _trace_pallas(
        tt, origins, dirs, t_max, active,
        rows=bvh.table.shape[0], width=bvh.table.shape[1],
        leaf_size=bvh.leaf_size, any_hit=False)
    orig = jnp.where(prim >= 0, bvh.leaf_tris[jnp.maximum(prim, 0)], -1)
    return Hit(t, orig, uv)


def trace_anyhit(bvh: BVH8, origins, dirs, t_min=0.0, t_max=1e30,
                 active=None, table_t=None):
    n = origins.shape[0]
    if active is None:
        active = jnp.ones((n,), bool)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    tt = table_t if table_t is not None else bvh.table.T
    _, prim, _ = _trace_pallas(
        tt, origins, dirs, t_max, active,
        rows=bvh.table.shape[0], width=bvh.table.shape[1],
        leaf_size=bvh.leaf_size, any_hit=True)
    return prim >= 0
