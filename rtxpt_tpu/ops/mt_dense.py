"""Dense MXU ray-triangle intersection: "tensor-core RT" for small/medium
scenes.

The BVH8 one-hot-gather kernel (ops/traverse_pallas.py) is VPU-bound at
small-scene scale: per-lane stack selects + slab tests + the sorting
network cost ~0.8 us/iteration and a tile pays for its worst lane's
~40-60 iterations. This module replaces pointer-chasing entirely for
scenes up to ~8k triangles (the realtime/bench scale): Möller-Trumbore is
refactored into a MATMUL.

For ray (o, d) and triangle (p0, e1, e2), the MT quantities are
polynomials in the ray with per-triangle coefficients:

    a  = d · (e2 x e1)                               (linear in d)
    u' = s · (d x e2) = -o^T [e2]x d + (p0^T [e2]x) · d   (bilinear o(x)d)
    v' = d · (s x e1) = -d^T [e1]x o + d^T ([e1]x p0)     (bilinear o(x)d)
    t' = s · (e1 x e2) = o · n - p0 · n                   (affine in o)
    u = u'/a, v = v'/a, t = t'/a      ([x]x = cross-product matrix)

so with the 16-feature vector x = [o (x) d (9), d (3), o (3), 1] every
(ray, triangle) pair's (a, u', v', t') is ONE row of W @ x — a dense
(4C, 16) @ (16, TILE) matmul on the MXU, with a short VPU epilogue for
the division, validity tests and running closest-hit min. Zero
divergence, zero stack traffic, and the triangle data streams through
the systolic array instead of being gathered.

Triangles are morton-ordered and chunked into CLUSTERS of 64; a cheap
XLA prepass slab-tests every (pixel-tile, cluster) pair and emits a
per-tile NEAR-TO-FAR cluster worklist (scalar-prefetched into SMEM), so
each tile only pays for the clusters its rays can see and best_t
tightens early. Replaces the same DXR TraceRay the BVH kernels replace
(RTXPT/PathTracerBridgeDonut.hlsli:703,657).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import Hit

import os as _os
# rays per kernel dispatch block. Per-ray MXU cost is visits_per_tile x
# const (block-ops per visit scale with TILE, rays too), and
# visits_per_tile is the cluster UNION of the tile's rays -> shrinking
# TILE tightens worklists monotonically until fixed per-tile overheads
# win. Read once at import (baked into jit caches).
TILE = int(_os.environ.get("RTXPT_MT_TILE", "1024"))
assert TILE % 256 == 0, "lane blocks must stay MXU-aligned"
# triangles per cluster (one matmul + epilogue per visit); 64 measured
# best on v5e (32 halves the epilogue block but pays ~2x visits)
CLUSTER = int(_os.environ.get("RTXPT_MT_CLUSTER", "64"))
assert CLUSTER in (32, 64, 128), "packed winner rows use <=7 bits"
# winner-row packing drops log2(CLUSTER) low mantissa bits from the
# packed t (2^-18 rel at 64, 2^-17 at 128); selection-only — exact
# t/u/v are re-solved outside the kernel from the winning triangle
ROW_MASK = CLUSTER - 1
MAX_TRIS = 8192         # beyond this the BVH paths win (VMEM + pair count)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _morton3(q: np.ndarray) -> np.ndarray:
    """(N,3) uint32 10-bit coords -> interleaved 30-bit morton codes."""
    def part(x):
        x = x.astype(np.uint64)
        x = (x | (x << 16)) & np.uint64(0x030000FF)
        x = (x | (x << 8)) & np.uint64(0x0300F00F)
        x = (x | (x << 4)) & np.uint64(0x030C30C3)
        x = (x | (x << 2)) & np.uint64(0x09249249)
        return x
    return (part(q[:, 0]) | (part(q[:, 1]) << np.uint64(1))
            | (part(q[:, 2]) << np.uint64(2)))


def _cross_mat(v):
    x, y, z = v
    return np.array([[0.0, -z, y], [z, 0.0, -x], [-y, x, 0.0]], np.float64)


@jax.tree_util.register_pytree_node_class
class DenseMT:
    """Per-cluster MT weight planes + worklist metadata."""

    def __init__(self, weights, weights48, aabb, tri_ids, tri9, tri9_gp,
                 center, num_clusters: int, has_omm: bool):
        self.weights = weights        # (NC*RC, 16) f32; RC = (4|5)*CLUSTER
        self.weights48 = weights48    # (NC*RC, 48) bf16 [w_hi|w_lo|w_hi]:
        #                               the 3-pass f32-split matmul
        #                               STACKED along K so one MXU pass
        #                               at K=48 replaces three at K=16
        #                               (3x depth utilization; see
        #                               _cluster_matmul)
        self.aabb = aabb              # (NC, 6) f32 cluster min.xyz max.xyz
        self.tri_ids = tri_ids        # (NC*CLUSTER,) i32 original ids
        self.tri9 = tri9              # (NC*CLUSTER, 10) f32 recentered
        #                               (p0, e1, e2, orig_id) for the
        #                               exact post-kernel winner re-solve
        self.tri9_gp = tri9_gp        # GatherPlanes of tri9 (MXU gather)
        self.center = center          # (3,) f32 recenter point
        self.num_clusters = num_clusters
        self.has_omm = has_omm

    @property
    def rc(self) -> int:
        return (5 if self.has_omm else 4) * CLUSTER

    def tree_flatten(self):
        return ((self.weights, self.weights48, self.aabb, self.tri_ids,
                 self.tri9, self.tri9_gp, self.center),
                (self.num_clusters, self.has_omm))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, num_clusters=aux[0], has_omm=aux[1])


def _stack_weights48(w_f32):
    """(R,16) f32 -> (R,48) bf16 [w_hi | w_lo | w_hi] for the stacked-K
    single-pass split matmul (pairs with x rows [x_hi; x_hi; x_lo])."""
    w_hi = w_f32.astype(jnp.bfloat16)
    w_lo = (w_f32 - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([w_hi, w_lo, w_hi], axis=1)


def supported(n_tris: int) -> bool:
    return n_tris <= MAX_TRIS


def build_dense(positions, indices, tri_omm=None) -> DenseMT:
    """Host (numpy) cold-path build of the dense MT planes."""
    p = np.asarray(positions, np.float64)
    idx = np.asarray(indices, np.int64)
    t = idx.shape[0]
    center = (p.min(0) + p.max(0)) * 0.5

    # spatial (morton) triangle order -> tight cluster AABBs
    cent = (p[idx[:, 0]] + p[idx[:, 1]] + p[idx[:, 2]]) / 3.0
    lo, hi = cent.min(0), cent.max(0)
    q = np.clip((cent - lo) / np.maximum(hi - lo, 1e-12) * 1023.0,
                0, 1023).astype(np.uint32)
    order = np.argsort(_morton3(q), kind="stable")

    has_omm = tri_omm is not None and \
        (np.asarray(tri_omm) != 0xFFFF).any()
    chans = 5 if has_omm else 4
    rc = chans * CLUSTER
    nc = max(_round_up(t, CLUSTER) // CLUSTER, 1)
    w = np.zeros((nc * rc, 16), np.float64)
    ids = np.full((nc * CLUSTER,), -1, np.int32)

    # fully vectorized coefficient build (host cold path must stay fast:
    # memory axon-tpu-tunnel-behavior — eager device ops here would each
    # trigger a remote compile)
    p0a = (p[idx[:, 0]] - center)[order]          # (T,3) recentered
    e1a = (p[idx[:, 1]] - p[idx[:, 0]])[order]
    e2a = (p[idx[:, 2]] - p[idx[:, 0]])[order]

    def cross_mats(v):                             # (T,3,3) [v]x
        zero = np.zeros(t)
        return np.stack([
            np.stack([zero, -v[:, 2], v[:, 1]], -1),
            np.stack([v[:, 2], zero, -v[:, 0]], -1),
            np.stack([-v[:, 1], v[:, 0], zero], -1)], 1)

    ce1, ce2 = cross_mats(e1a), cross_mats(e2a)
    nrm = np.cross(e1a, e2a)
    slot = np.arange(t)
    ci = slot // CLUSTER
    ki = slot % CLUSTER
    row0 = ci * rc + ki
    # channel 0: a = d . (e2 x e1)
    w[row0, 9:12] = np.cross(e2a, e1a)
    # channel 1: u' = -o^T[e2]x d + (p0^T[e2]x) . d
    w[row0 + CLUSTER, 0:9] = (-ce2).reshape(t, 9)
    w[row0 + CLUSTER, 9:12] = np.einsum("ti,tij->tj", p0a, ce2)
    # channel 2: v' = -d^T[e1]x o + d . ([e1]x p0)
    w[row0 + 2 * CLUSTER, 0:9] = (-np.swapaxes(ce1, 1, 2)).reshape(t, 9)
    w[row0 + 2 * CLUSTER, 9:12] = np.einsum("tij,tj->ti", ce1, p0a)
    # channel 3: t' = o.n - p0.n
    w[row0 + 3 * CLUSTER, 12:15] = nrm
    w[row0 + 3 * CLUSTER, 15] = -np.einsum("ti,ti->t", p0a, nrm)
    if has_omm:
        w[row0 + 4 * CLUSTER, 15] = \
            np.asarray(tri_omm, np.int64)[order].astype(np.float64)
    ids[slot] = order.astype(np.int32)

    # per-cluster AABBs over all three vertices (world space)
    pts = np.stack([p0a, p0a + e1a, p0a + e2a], 1) + center  # (T,3,3)
    t_pad = nc * CLUSTER
    pts_pad = np.concatenate(
        [pts, np.repeat(pts[-1:], t_pad - t, axis=0)], 0)
    pc = pts_pad.reshape(nc, CLUSTER * 3, 3)
    aabb = np.concatenate([pc.min(1), pc.max(1)], -1).astype(np.float32)

    # recentered (p0, e1, e2) per SLOT for the exact winner re-solve
    # (the kernel only selects the winning triangle; t/u/v come from a
    # full-precision MT solve against this table). Column 9 carries the
    # original triangle id as f32 (exact below 2^24) so the winner
    # remap rides the same MXU gather — the XLA scalar gather it
    # replaces ran at ~1.8 GB/s (round-3 device trace, ~3 ms/bounce)
    tri9 = np.full((t_pad, 10), -1.0, np.float32)
    tri9[:, 0:9] = 0.0
    tri9[slot, 0:3] = p0a
    tri9[slot, 3:6] = e1a
    tri9[slot, 6:9] = e2a
    tri9[slot, 9] = order.astype(np.float32)
    from . import gather_pallas as GPL
    tri9_gp = GPL.pack_f32(tri9) if GPL.supported(t_pad) else None
    w_f32 = jnp.asarray(w.astype(np.float32))
    return DenseMT(
        weights=w_f32,
        weights48=_stack_weights48(w_f32),
        aabb=jnp.asarray(aabb),
        tri_ids=jnp.asarray(ids),
        tri9=jnp.asarray(tri9),
        tri9_gp=tri9_gp,
        center=jnp.asarray(center.astype(np.float32)),
        num_clusters=nc, has_omm=has_omm)


@jax.jit
def refresh_dense(dense: DenseMT, positions, indices) -> DenseMT:
    """Device-side (jnp) refresh of the MT coefficient planes, cluster
    AABBs and re-solve rows from deformed positions — the per-frame
    skinned-BLAS update (RTXPT Sample.cpp:1355-1380). Keeps the
    build-time morton triangle order, padding and recenter origin, so
    only per-triangle numeric content changes."""
    ids = dense.tri_ids                              # (t_pad,) i32
    t_pad = ids.shape[0]
    nc = dense.num_clusters
    rc = dense.rc
    has_omm = dense.has_omm
    center = dense.center
    valid = ids >= 0
    tri = indices[jnp.maximum(ids, 0)]               # (t_pad, 3)
    p0w = positions[tri[:, 0]]
    p0 = jnp.where(valid[:, None], p0w - center, 0.0)
    e1 = jnp.where(valid[:, None], positions[tri[:, 1]] - p0w, 0.0)
    e2 = jnp.where(valid[:, None], positions[tri[:, 2]] - p0w, 0.0)

    def cross_mats(v):                               # (t,3,3) [v]x
        zero = jnp.zeros((t_pad,))
        return jnp.stack([
            jnp.stack([zero, -v[:, 2], v[:, 1]], -1),
            jnp.stack([v[:, 2], zero, -v[:, 0]], -1),
            jnp.stack([-v[:, 1], v[:, 0], zero], -1)], 1)

    ce1, ce2 = cross_mats(e1), cross_mats(e2)
    nrm = jnp.cross(e1, e2)
    # channel rows laid out (nc, chans, CLUSTER, 16) -> (nc*rc, 16)
    chans = 5 if has_omm else 4
    w = jnp.zeros((t_pad, chans, 16))
    w = w.at[:, 0, 9:12].set(jnp.cross(e2, e1))
    w = w.at[:, 1, 0:9].set((-ce2).reshape(t_pad, 9))
    w = w.at[:, 1, 9:12].set(jnp.einsum("ti,tij->tj", p0, ce2))
    w = w.at[:, 2, 0:9].set(
        (-jnp.swapaxes(ce1, 1, 2)).reshape(t_pad, 9))
    w = w.at[:, 2, 9:12].set(jnp.einsum("tij,tj->ti", ce1, p0))
    w = w.at[:, 3, 12:15].set(nrm)
    w = w.at[:, 3, 15].set(-jnp.einsum("ti,ti->t", p0, nrm))
    if has_omm:
        # OMM masks live in the old weights at channel 4 col 15; they
        # are pose-invariant, so copy them through
        old = dense.weights.reshape(nc, chans, CLUSTER, 16)
        w = w.reshape(nc, CLUSTER, chans, 16).swapaxes(1, 2)
        w = w.at[:, 4, :, 15].set(old[:, 4, :, 15])
    else:
        w = w.reshape(nc, CLUSTER, chans, 16).swapaxes(1, 2)
    weights = w.reshape(nc * rc, 16).astype(jnp.float32)

    pts = jnp.stack([p0, p0 + e1, p0 + e2], 1) + center   # (t_pad,3,3)
    # padding lanes repeat the last real triangle like the host build
    last = jnp.max(jnp.where(valid, jnp.arange(t_pad), 0))
    pts = jnp.where(valid[:, None, None], pts, pts[last])
    pc = pts.reshape(nc, CLUSTER * 3, 3)
    aabb = jnp.concatenate([pc.min(1), pc.max(1)], -1).astype(
        jnp.float32)

    tri9 = jnp.concatenate([p0, e1, e2, ids[:, None].astype(jnp.float32)],
                           -1).astype(jnp.float32)
    from . import gather_pallas as GPL
    tri9_gp = GPL.pack_f32_device(tri9) \
        if dense.tri9_gp is not None else None
    return DenseMT(weights=weights, weights48=_stack_weights48(weights),
                   aabb=aabb, tri_ids=ids, tri9=tri9,
                   tri9_gp=tri9_gp, center=center, num_clusters=nc,
                   has_omm=has_omm)


# ---------------------------------------------------------------------------
# XLA prepass: per-pixel-tile near-to-far cluster worklists
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("nc",))
def _tile_worklists_exact(aabb, origins, dirs, t_max, active, nc: int):
    """Per-RAY exact prepass: counts/order from every active ray's slab
    test, O(N*NC). This is the PRODUCTION default: the on-chip full-sample
    A/B (tools/profile_prepass_ab.py, round 4) measured 376-377 ms/sample
    exact vs 394-404 ms/sample for the O(T*NC) interval prepass below —
    the interval version's looser (conservative) worklists cost more
    inside the trace kernel than the cheaper prepass saves, because
    dense-MT scenes are bounded at MAX_TRIS so NC stays small and the
    exact prepass fuses into cheap elementwise+reduce work."""
    n = origins.shape[0]
    tiles = n // TILE
    inv = 1.0 / jnp.where(jnp.abs(dirs) < 1e-12,
                          jnp.where(dirs < 0, -1e-12, 1e-12), dirs)
    o_t = origins.reshape(tiles, TILE, 3)
    i_t = inv.reshape(tiles, TILE, 3)
    tm_t = t_max.reshape(tiles, TILE)
    ac_t = active.reshape(tiles, TILE)

    def per_cluster(box):
        t0 = (box[0:3] - o_t) * i_t
        t1 = (box[3:6] - o_t) * i_t
        tn = jnp.max(jnp.minimum(t0, t1), -1)
        tf = jnp.minimum(jnp.min(jnp.maximum(t0, t1), -1), tm_t)
        hit = (jnp.maximum(tn, 0.0) <= tf) & ac_t
        return hit.any(-1), jnp.min(jnp.where(hit, tn, jnp.inf), -1)

    hit_any, tn_min = jax.lax.map(per_cluster, aabb)    # (NC, T) each
    key = jnp.where(hit_any, tn_min, jnp.inf).T          # (T, NC)
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    counts = hit_any.T.sum(1).astype(jnp.int32)
    return counts, order


@functools.partial(jax.jit, static_argnames=("nc",))
def _tile_worklists_interval(aabb, origins, dirs, t_max, active, nc: int):
    """(counts (T,), order (T, NC)): per-TILE conservative cluster
    worklists, near-to-far. Opt-in via RTXPT_MT_TILE_PREPASS=1 — measured
    SLOWER end-to-end than the exact prepass (see _tile_worklists_exact
    docstring); kept for A/B and for a future much-larger-NC regime.

    Each TILE-lane block is reduced to an origin AABB + per-axis
    direction interval + max t_max over its ACTIVE lanes — O(N) total —
    and the slab test runs on the (T, NC) tile/cluster pair grid with
    interval arithmetic (~38k pairs vs the 39M ray/cluster pairs of the
    exact prepass, which cost more than the trace kernel itself;
    round-4 profile_sort_ab). Conservative: a cluster any active ray
    could enter always passes (axes whose direction interval spans 0
    impose no constraint), so the kernel — which still slab-gates
    per-lane per visited cluster — returns bit-identical hits; tiles
    only ever visit a superset. Coherent (sorted/primary) tiles gate
    nearly as tightly as the exact version."""
    n = origins.shape[0]
    tiles = n // TILE
    big = jnp.float32(1e30)
    o_t = origins.reshape(tiles, TILE, 3)
    d_t = dirs.reshape(tiles, TILE, 3)
    tm_t = t_max.reshape(tiles, TILE)
    ac = active.reshape(tiles, TILE)[..., None]

    o_lo = jnp.min(jnp.where(ac, o_t, big), axis=1)        # (T,3)
    o_hi = jnp.max(jnp.where(ac, o_t, -big), axis=1)
    d_lo = jnp.min(jnp.where(ac, d_t, big), axis=1)
    d_hi = jnp.max(jnp.where(ac, d_t, -big), axis=1)
    tm = jnp.max(jnp.where(ac[..., 0], tm_t, 0.0), axis=1)  # (T,)
    any_act = jnp.any(ac[..., 0], axis=1)

    # interval slab test per (tile, cluster, axis). For a sign-definite
    # direction interval the extreme quotients over (numerator interval)
    # x (divisor endpoints) bound tn/tf; a zero-spanning interval
    # contributes (-inf, +inf) (no constraint).
    lo = aabb[None, :, 0:3]                                 # (1,NC,3)
    hi = aabb[None, :, 3:6]
    nl_lo = lo - o_hi[:, None]                              # (T,NC,3)
    nl_hi = lo - o_lo[:, None]
    nh_lo = hi - o_hi[:, None]
    nh_hi = hi - o_lo[:, None]
    dl = d_lo[:, None]                                      # (T,1,3)
    dh = d_hi[:, None]
    sign_def = (dl > 1e-12) | (dh < -1e-12)
    dl_s = jnp.where(jnp.abs(dl) < 1e-12, 1e-12, dl)
    dh_s = jnp.where(jnp.abs(dh) < 1e-12, 1e-12, dh)

    def qmin(num_lo, num_hi):
        return jnp.minimum(jnp.minimum(num_lo / dl_s, num_lo / dh_s),
                           jnp.minimum(num_hi / dl_s, num_hi / dh_s))

    def qmax(num_lo, num_hi):
        return jnp.maximum(jnp.maximum(num_lo / dl_s, num_lo / dh_s),
                           jnp.maximum(num_hi / dl_s, num_hi / dh_s))

    # per-axis possible [t0,t1] across the tile (either slab side can be
    # the entry plane depending on direction sign — take the envelope)
    ax_lo = jnp.minimum(qmin(nl_lo, nl_hi), qmin(nh_lo, nh_hi))
    ax_hi = jnp.maximum(qmax(nl_lo, nl_hi), qmax(nh_lo, nh_hi))
    ax_lo = jnp.where(sign_def, ax_lo, -big)
    ax_hi = jnp.where(sign_def, ax_hi, big)
    tn = jnp.max(ax_lo, axis=-1)                            # (T,NC)
    tf = jnp.min(ax_hi, axis=-1)
    hit = (jnp.maximum(tn, 0.0) <= jnp.minimum(tf, tm[:, None])) \
        & any_act[:, None]
    # near-to-far key: the interval entry distance degenerates to 0 for
    # direction-incoherent tiles (every axis unconstrained), which made
    # the visit order arbitrary and killed best_t tightening (round-4
    # pixel-order regression). Blend in the distance from the tile's
    # origin centroid to the cluster center as the tiebreak/fallback —
    # it orders visits sensibly for ANY direction mix.
    o_c = jnp.where(any_act[:, None], 0.5 * (o_lo + o_hi), 0.0)  # (T,3)
    c_c = 0.5 * (aabb[:, 0:3] + aabb[:, 3:6])               # (NC,3)
    dist_c = jnp.linalg.norm(c_c[None, :, :] - o_c[:, None, :], axis=-1)
    key = jnp.where(hit, jnp.maximum(tn, 0.0) + dist_c, jnp.inf)
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    counts = hit.sum(1).astype(jnp.int32)
    return counts, order


# Prepass selection is read ONCE at import (like RTXPT_MT_CLUSTER):
# _worklists_fn is called inside jitted _trace_dense, so a post-import
# env toggle would be silently baked into the jit cache. Tests and
# profilers that A/B the prepass set this module global and call
# _trace_dense._clear_cache() (tools/profile_prepass_ab.py pattern).
TILE_PREPASS = _os.environ.get("RTXPT_MT_TILE_PREPASS", "0") == "1"
# Pallas single-pass prepass (round 5): the XLA exact prepass lax.maps
# over NC clusters — NC separate HBM passes over the whole wavefront
# (~4.4 ms at 480k lanes, liveness-independent). The fused kernel reads
# each ray ONCE and keeps all cluster AABBs in SMEM. Same formulas/key;
# bit-identical images. Measured e2e (profile_e2e_lab, 8-round
# interleaved medians on v5e): 213.1 vs 212.1 ms/sample — a wash within
# the tunnel noise floor, so the simpler XLA prepass stays the default.
PALLAS_PREPASS = _os.environ.get("RTXPT_MT_PALLAS_PREPASS", "0") == "1"


def _worklists_fn():
    return _tile_worklists_interval if TILE_PREPASS \
        else _tile_worklists_exact


def _make_prepass_kernel(nc: int, nc_pad: int):
    def kernel(aabb_ref, o_ref, d_ref, tmax_ref, act_ref, key_out):
        i = pl.program_id(0)
        ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]
        dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]

        def inv(c):
            return 1.0 / jnp.where(jnp.abs(c) < 1e-12,
                                   jnp.where(c < 0, -1e-12, 1e-12), c)

        ix, iy, iz = inv(dx), inv(dy), inv(dz)
        tm = tmax_ref[0]
        act = act_ref[0] != 0
        inf = jnp.float32(jnp.inf)
        keys = []
        for c in range(nc_pad):
            if c >= nc:
                keys.append(inf)
                continue
            t0x = (aabb_ref[c, 0] - ox) * ix
            t1x = (aabb_ref[c, 3] - ox) * ix
            t0y = (aabb_ref[c, 1] - oy) * iy
            t1y = (aabb_ref[c, 4] - oy) * iy
            t0z = (aabb_ref[c, 2] - oz) * iz
            t1z = (aabb_ref[c, 5] - oz) * iz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.minimum(jnp.maximum(t0z, t1z), tm))
            hit = (jnp.maximum(tn, 0.0) <= tf) & act
            keys.append(jnp.min(jnp.where(hit, tn, inf)))
        # the whole (tiles, nc_pad) output is block-resident (tiny);
        # each program writes its own row — a (1, nc_pad) block would
        # violate Mosaic's (8,128) block-divisibility rule
        key_out[pl.ds(i, 1)] = jnp.stack(keys)[None]

    return kernel


@functools.partial(jax.jit, static_argnames=("nc", "interpret"))
def _tile_worklists_pallas(aabb, origins, dirs, t_max, active, nc: int,
                           interpret: bool = False):
    """Fused prepass: one Pallas pass emits each tile's per-cluster
    near-entry key row; counts/argsort (tiny (T, NC) tensors) stay in
    XLA. Key semantics identical to _tile_worklists_exact."""
    n = origins.shape[0]
    tiles = n // TILE
    nc_pad = max(_round_up(nc, 128), 128)
    kernel = _make_prepass_kernel(nc, nc_pad)
    key = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((tiles, nc_pad), jnp.float32),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((nc, 6), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((3, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tiles, nc_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(aabb, origins.T, dirs.T, t_max[None, :],
      active.astype(jnp.int32)[None, :])
    key = key[:, :nc]
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    counts = jnp.sum(jnp.isfinite(key), axis=1).astype(jnp.int32)
    return counts, order


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _features(o_ref, d_ref):
    """o_ref holds PRE-RECENTERED origins (o - scene center): the
    bilinear o(x)d features lose ~|o|*ulp absolute precision, so the
    caller subtracts the scene center before the kernel (t/u/v are
    translation-invariant)."""
    ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]
    dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]
    one = jnp.ones_like(dx)
    rows = [ox * dx, ox * dy, ox * dz,
            oy * dx, oy * dy, oy * dz,
            oz * dx, oz * dy, oz * dz,
            dx, dy, dz, ox, oy, oz, one]
    return jnp.stack(rows, axis=0)                       # (16, TILE)


def _pair_test(out, has_omm, t_min, best_t, act, need_t: bool):
    """Epilogue over a cluster's (C, TILE) channel blocks -> per-pair
    validity (+ t when need_t). Signs folded via s = sign(a); validity
    uses MULTIPLY-form tests (st <-> absa*best) so the reciprocal is only
    paid when t itself is needed (closest) or the OMM mask needs u/v."""
    C = CLUSTER
    A = out[0:C]
    U = out[C:2 * C]
    V = out[2 * C:3 * C]
    Tn = out[3 * C:4 * C]
    sgn = jnp.where(A < 0.0, -1.0, 1.0)
    absa = A * sgn
    su = U * sgn
    sv = V * sgn
    st = Tn * sgn
    ok = ((absa > 1e-12) & (su >= 0.0) & (sv >= 0.0)
          & (su + sv <= absa) & (st > absa * t_min)
          & (st < absa * best_t[None, :]) & act[None, :])
    t = None
    rcp = None
    if need_t:
        rcp = 1.0 / jnp.maximum(absa, 1e-30)
        t = st * rcp
    if has_omm:
        if rcp is None:
            rcp = 1.0 / jnp.maximum(absa, 1e-30)
        u = su * rcp
        v = sv * rcp
        mk = out[4 * C:5 * C].astype(jnp.int32)
        ci = jnp.clip((u * 4.0).astype(jnp.int32), 0, 3)
        cj = jnp.clip((v * 4.0).astype(jnp.int32), 0, 3)
        ok = ok & (((mk >> (ci * 4 + cj)) & 1) != 0)
    return ok, t


def _pair_test_sign(out, has_omm, best, act):
    """Sign-bit epilogue variant (RTXPT_MT_EPILOGUE=sign): MT validity
    u'>=0, v'>=0, u'+v'<=a, t'>0 (all sign-folded by a) is equivalent to
    "u', v', w'=a-u'-v', t' all share a's sign bit" — ONE int32 xor/or
    chain replaces the four sign-folding multiplies + select of the
    classic test. Edge semantics differ only on measure-zero boundaries
    (+0.0 numerators against a<0 reject here, accepted there); the
    winner re-solve outside the kernel is exact either way."""
    C = CLUSTER
    A = out[0:C]
    U = out[C:2 * C]
    V = out[2 * C:3 * C]
    T = out[3 * C:4 * C]
    Wc = A - U - V
    bc = lambda z: jax.lax.bitcast_convert_type(z, jnp.int32)
    Ai = bc(A)
    sign_bad = (bc(U) ^ Ai) | (bc(V) ^ Ai) | (bc(Wc) ^ Ai) | (bc(T) ^ Ai)
    absA = jnp.abs(A)
    r = 1.0 / jnp.maximum(absA, 1e-30)
    t = jnp.abs(T) * r
    ok = ((sign_bad >= 0) & (absA > 1e-12) & (t > 0.0)
          & (t < best[None, :]) & act[None, :])
    if has_omm:
        rs = jnp.where(A < 0.0, -r, r)
        u = U * rs
        v = V * rs
        mk = out[4 * C:5 * C].astype(jnp.int32)
        ci = jnp.clip((u * 4.0).astype(jnp.int32), 0, 3)
        cj = jnp.clip((v * 4.0).astype(jnp.int32), 0, 3)
        ok = ok & (((mk >> (ci * 4 + cj)) & 1) != 0)
    return ok, t


# closest-path epilogue + gate selection, read at import like TILE
EPILOGUE = _os.environ.get("RTXPT_MT_EPILOGUE", "classic")
# NOGATE=1 drops the per-visit cluster slab gate + pl.when + the
# vector->scalar any() sync from the CLOSEST kernel: every worklist
# entry pays its matmul+epilogue unconditionally (the prepass already
# culled non-overlapping clusters; best-t still rejects pairs).
NOGATE = _os.environ.get("RTXPT_MT_NOGATE", "0") == "1"
# anyhit early-exit while_loop (vs fixed fori over the worklist);
# default off — the interleaved e2e lab measured 224.9 vs 212.1
# ms/sample: the per-visit vector->scalar cond costs more than the
# skipped tail saves
ANYHIT_EARLY = _os.environ.get("RTXPT_MT_ANYHIT_EARLY", "0") == "1"
# PIPELINE=1: software-pipeline the closest loop — visit j's matmul is
# written to a VMEM scratch and its epilogue runs at j+1, so the MXU
# stream of visit j+1 and the VPU epilogue of visit j are adjacent in
# program order with no data dependency (the gate/pair best is one visit
# stale; the commit re-compares against the live best so results are
# unchanged). Default off — e2e lab measured 245.7 vs 212.1 ms/sample:
# the VMEM scratch round-trip + stale gate extra visits cost more than
# the MXU/VPU overlap recovers (Mosaic already overlaps them in the
# serial loop).
PIPELINE = _os.environ.get("RTXPT_MT_PIPELINE", "0") == "1"


def _matmul_precision():
    import os
    return os.environ.get("RTXPT_MT_PRECISION", "high")


def _cluster_matmul(wc, x, x48, precision: str):
    """Cluster coefficient matmul at the configured precision.

    'highest': (RC,16)f32 @ (16,TILE)f32 via the 6-pass XLA lowering.
    'high' (production): the 3-term f32-split product
    w_hi@x_hi + w_lo@x_hi + w_hi@x_lo STACKED along the contraction:
    ONE bf16 (RC,48) @ (48,TILE) MXU pass with rows [w_hi|w_lo|w_hi]
    against [x_hi;x_hi;x_lo]. Same ~2^-16-relative result (the MXU
    accumulates all three partials in one f32 accumulator), but 3x the
    systolic-depth utilization and a third of the per-visit MXU ops —
    measured 22.1 -> (see ROADMAP round 5) on the 3-pass version this
    replaces. Precision is only consumed by the 6-bit-quantized winner
    SELECTION (exact t/u/v re-solve happens outside the kernel).
    'default': one bf16 K=16 pass (w_hi columns of the stacked buffer).
    """
    dims = (((1,), (0,)), ((), ()))
    if precision == "highest":
        return jax.lax.dot_general(
            wc, x, dims, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    if precision == "default":
        return jax.lax.dot_general(wc[:, 0:16], x48[0:16],
                                   dims,
                                   preferred_element_type=jnp.float32)
    return jax.lax.dot_general(wc, x48, dims,
                               preferred_element_type=jnp.float32)


# perf PROBE (A/B tooling only, tools/profile_mtvariants.py): "noepi"
# replaces the per-visit epilogue with a trivial commit (measures the
# matmul+gate+loop floor), "nomm" replaces the matmul output with a
# broadcast (measures the epilogue+gate+loop floor). Read at import;
# production runs with it unset. Results are intentionally WRONG.
PROBE = _os.environ.get("RTXPT_MT_PROBE", "")


def _variant_tuple():
    """Kernel structure knobs as ONE static jit key: (epilogue, pipeline,
    nogate, anyhit_early, probe, pallas_prepass). Threading this through
    _trace_dense as a static argument lets one process hold compiled
    programs for SEVERAL variants side by side — required for reliable
    A/B, because cross-process timings on the axon tunnel drift by up to
    2x (tools/profile_mtlab.py interleaves variants within one
    process)."""
    return (EPILOGUE, PIPELINE, NOGATE, ANYHIT_EARLY, PROBE,
            PALLAS_PREPASS)


def _make_kernel(nc: int, has_omm: bool, any_hit: bool, variant=None):
    EPILOGUE, PIPELINE, NOGATE, ANYHIT_EARLY, PROBE = \
        (variant if variant is not None else _variant_tuple())[:5]
    RC = (5 if has_omm else 4) * CLUSTER
    precision = _matmul_precision()
    INF_BITS = 0x7F800000  # python int: jnp scalars would be captured
    #                        as pallas_call constants

    def kernel(counts_ref, clist_ref, aabb_ref, w_ref, o_ref, d_ref,
               tmax_ref, act_ref, t_out, prim_out, *scratch):
        i = pl.program_id(0)
        cnt = counts_ref[i]
        x = _features(o_ref, d_ref)
        if precision == "highest":
            x48 = None
        else:
            x_hi = x.astype(jnp.bfloat16)
            x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            x48 = jnp.concatenate([x_hi, x_hi, x_lo], axis=0)
        act = act_ref[0] != 0
        t_min = jnp.float32(0.0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (CLUSTER, TILE), 0)
        ox, oy, oz = x[12], x[13], x[14]     # recentered origins
        dx, dy, dz = x[9], x[10], x[11]

        def inv(c):
            return 1.0 / jnp.where(jnp.abs(c) < 1e-12,
                                   jnp.where(c < 0, -1e-12, 1e-12), c)

        ix, iy, iz = inv(dx), inv(dy), inv(dz)

        t_out[0] = tmax_ref[0]
        prim_out[0] = jnp.full((TILE,), -1, jnp.int32)

        def cluster_gate(c, live, best):
            """Per-lane slab test vs the cluster AABB (recentered SMEM
            scalars) -> which live lanes can still improve in it."""
            t0x = (aabb_ref[c, 0] - ox) * ix
            t1x = (aabb_ref[c, 3] - ox) * ix
            t0y = (aabb_ref[c, 1] - oy) * iy
            t1y = (aabb_ref[c, 4] - oy) * iy
            t0z = (aabb_ref[c, 2] - oz) * iz
            t1z = (aabb_ref[c, 5] - oz) * iz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.maximum(jnp.minimum(t0z, t1z), t_min))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.minimum(jnp.maximum(t0z, t1z), best))
            return live & (tn <= tf)

        if any_hit:
            # NOTE: no vector while-carry here — Mosaic fails to
            # legalize (TILE,) i1 carries and the worklist bounds the
            # loop; the early-exit is the pl.when gate (skips the matmul
            # + epilogue once every lane found an occluder or the
            # cluster is beyond every live lane's range).
            def body(j, _):
                c = clist_ref[i, j]
                live = cluster_gate(c, act & (prim_out[0] < 0),
                                    tmax_ref[0])

                @pl.when(jnp.any(live))
                def _():
                    if PROBE == "nomm":
                        out = jnp.broadcast_to(x[0] + jnp.float32(c),
                                               (RC, TILE))
                    else:
                        wc = w_ref[pl.ds(c * RC, RC), :]
                        out = _cluster_matmul(wc, x, x48, precision)
                    if PROBE == "noepi":
                        prim_out[0] = jnp.where(
                            out[0] < -1e30, 0, prim_out[0])
                        return
                    ok, _ = _pair_test(out, has_omm, t_min,
                                       tmax_ref[0], live, need_t=False)
                    # f32 min-reduction instead of jnp.any over i1
                    # sublanes (Mosaic miscompiled the boolean reduce)
                    found = jnp.min(jnp.where(ok, 0.0, 1.0), axis=0) \
                        < 0.5
                    prim_out[0] = jnp.where(found, 0, prim_out[0])

                return 0

            if ANYHIT_EARLY:
                # early exit once every live lane has an occluder:
                # shadow rays in contact-shadow regions find one in the
                # first (nearest) clusters, and the remaining worklist
                # is pure gate/any overhead. One vector->scalar sync
                # per visit buys skipping the rest of the list.
                def w_cond(j):
                    return (j < cnt) & jnp.any(act & (prim_out[0] < 0))

                def w_body(j):
                    body(j, 0)
                    return j + 1

                jax.lax.while_loop(w_cond, w_body, jnp.int32(0))
            else:
                jax.lax.fori_loop(0, cnt, body, 0)
        else:
            def mm(c):
                if PROBE == "nomm":
                    return jnp.broadcast_to(x[0] + jnp.float32(c),
                                            (RC, TILE))
                wc = w_ref[pl.ds(c * RC, RC), :]
                return _cluster_matmul(wc, x, x48, precision)

            def epilogue(out, c):
                if PROBE == "noepi":
                    t_out[0] = jnp.minimum(t_out[0], out[0])
                    return
                best = t_out[0]
                if EPILOGUE == "sign":
                    ok, t = _pair_test_sign(out, has_omm, best, act)
                else:
                    ok, t = _pair_test(out, has_omm, t_min, best, act,
                                       need_t=True)
                # winner row via ONE min-reduction: positive-f32
                # bitcast ordering is monotone, so (t_bits & ~ROW_MASK)
                # | row packs the distance and the 6-bit row index
                # into one sortable int (ties -> lowest row); the
                # ~2^-18 relative t quantization only affects
                # winner SELECTION — exact t/u/v are re-solved
                # outside the kernel from the winning triangle
                tt = jnp.where(ok, t, jnp.inf)
                tbits = jax.lax.bitcast_convert_type(tt, jnp.int32)
                packed = (tbits & ~ROW_MASK) | rows
                pmin = jnp.min(packed, axis=0)           # (TILE,)
                imp = pmin < INF_BITS
                t_new = jax.lax.bitcast_convert_type(
                    pmin & ~ROW_MASK, jnp.float32)
                t_out[0] = jnp.where(imp, t_new, best)
                prim_out[0] = jnp.where(imp,
                                        c * CLUSTER + (pmin & ROW_MASK),
                                        prim_out[0])

            def visit(c):
                epilogue(mm(c), c)

            if PIPELINE:
                # deferred-epilogue software pipeline: visit j issues its
                # matmul into the VMEM scratch; its epilogue runs at
                # j+1 AFTER j+1's matmul is issued, so the MXU stream
                # and the VPU epilogue are adjacent independent work.
                # The pair test sees best-through-j-2 — exactly what the
                # serial loop's pair test for j-1 saw — so results are
                # IDENTICAL, only the gate is one commit stale
                # (conservative: may run a matmul the serial loop
                # skipped).
                smm, pend = scratch

                def body(j, _):
                    par = j & 1
                    c = clist_ref[i, j]
                    live = cluster_gate(c, act, t_out[0])
                    al = jnp.any(live)

                    @pl.when(al)
                    def _():
                        smm[pl.ds(par, 1)] = mm(c)[None]

                    cp = pend[1 - par]

                    @pl.when(cp >= 0)
                    def _():
                        epilogue(smm[pl.ds(1 - par, 1)][0], cp)

                    pend[par] = jnp.where(al, c, -1)
                    return 0

                pend[0] = jnp.int32(-1)
                pend[1] = jnp.int32(-1)
                jax.lax.fori_loop(0, cnt, body, 0)
                lastp = (cnt - 1) & 1

                @pl.when((cnt > 0) & (pend[0] >= 0) & (lastp == 0))
                def _():
                    epilogue(smm[0], pend[0])

                @pl.when((cnt > 0) & (pend[1] >= 0) & (lastp == 1))
                def _():
                    epilogue(smm[1], pend[1])

            elif NOGATE:
                def body(j, _):
                    visit(clist_ref[i, j])
                    return 0

                jax.lax.fori_loop(0, cnt, body, 0)
            else:
                def body(j, _):
                    c = clist_ref[i, j]
                    live = cluster_gate(c, act, t_out[0])

                    @pl.when(jnp.any(live))
                    def _():
                        visit(c)

                    return 0

                jax.lax.fori_loop(0, cnt, body, 0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("nc", "has_omm", "any_hit",
                                    "interpret", "variant"))
def _trace_dense(weights, aabb, center, origins, dirs, t_max, active,
                 nc: int, has_omm: bool, any_hit: bool,
                 interpret: bool = False, variant=None):
    if variant is None:
        variant = _variant_tuple()
    pipeline = variant[1]
    use_pallas_prepass = variant[5] if len(variant) > 5 else PALLAS_PREPASS
    n = origins.shape[0]
    n_pad = _round_up(max(n, TILE), TILE)
    pad = n_pad - n
    o = jnp.pad(origins, ((0, pad), (0, 0)))
    d = jnp.pad(dirs, ((0, pad), (0, 0)), constant_values=1.0)
    tm = jnp.pad(t_max, (0, pad))
    ac = jnp.pad(active, (0, pad))
    if TILE_PREPASS:
        counts, order = _tile_worklists_interval(aabb, o, d, tm, ac,
                                                 nc=nc)
    elif use_pallas_prepass:
        counts, order = _tile_worklists_pallas(aabb, o, d, tm, ac,
                                               nc=nc, interpret=interpret)
    else:
        counts, order = _tile_worklists_exact(aabb, o, d, tm, ac, nc=nc)

    RC = (5 if has_omm else 4) * CLUSTER
    # `weights` is precision-matched by the caller: (NC*RC,48) bf16
    # stacked-K planes for high/default, (NC*RC,16) f32 for highest
    wcols = weights.shape[1]
    kernel = _make_kernel(nc, has_omm, any_hit, variant=variant)
    # cluster AABBs as SMEM scalars, recentered like the ray origins so
    # the in-kernel slab gate works in the same frame
    aabb_c = aabb - jnp.concatenate([center, center])[None, :]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_pad // TILE,),
        in_specs=[
            pl.BlockSpec((nc, 6), lambda i, *_: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((nc * RC, wcols), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, TILE), lambda i, *_: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, TILE), lambda i, *_: (0, i),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=(
            [pltpu.VMEM((2, RC, TILE), jnp.float32),
             pltpu.SMEM((2,), jnp.int32)]
            if (pipeline and not any_hit) else []),
    )
    t, prim = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, n_pad), jnp.int32)),
        grid_spec=grid_spec,
        interpret=interpret,
    )(counts, order,
      aabb_c, weights,
      (o - center[None, :]).T, d.T, tm[None, :],
      ac.astype(jnp.int32)[None, :])
    return t[0, :n], prim[0, :n]


def trace_closest(dmt: DenseMT, origins, dirs, t_min=0.0, t_max=1e30,
                  active=None, interpret: bool = False,
                  variant=None) -> Hit:
    n = origins.shape[0]
    if active is None:
        active = jnp.ones((n,), bool)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    w = dmt.weights if _matmul_precision() == "highest" \
        else dmt.weights48
    t_q, slot, = _trace_dense(w, dmt.aabb, dmt.center,
                              origins, dirs, t_max, active,
                              nc=dmt.num_clusters, has_omm=dmt.has_omm,
                              any_hit=False, interpret=interpret,
                              variant=variant or _variant_tuple())
    found = slot >= 0
    # exact winner re-solve: the kernel picks the triangle; t/u/v come
    # from one full-precision MT solve per lane against the recentered
    # (p0, e1, e2) table (MXU one-hot gather on TPU; plain indexing in
    # interpret/CPU runs)
    safe = jnp.maximum(slot, 0)
    if dmt.tri9_gp is not None and not interpret:
        from . import gather_pallas as GPL
        tri9 = GPL.gather_rows(dmt.tri9_gp, safe)       # (N,10) f32
    else:
        tri9 = dmt.tri9[safe]
    oc = origins - dmt.center[None, :]
    p0 = tri9[..., 0:3]
    e1 = tri9[..., 3:6]
    e2 = tri9[..., 6:9]
    h = jnp.cross(dirs, e2)
    a = jnp.sum(e1 * h, axis=-1)
    f = 1.0 / jnp.where(jnp.abs(a) < 1e-30,
                        jnp.where(a < 0, -1e-30, 1e-30), a)
    s = oc - p0
    u = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, e1)
    v = f * jnp.sum(dirs * q, axis=-1)
    t_e = f * jnp.sum(e2 * q, axis=-1)
    t = jnp.where(found, t_e, t_q)
    uv = jnp.where(found[..., None],
                   jnp.stack([u, v], axis=-1), 0.0)
    # winner id from the gathered row (f32-exact below 2^24)
    prim = jnp.where(found,
                     jnp.round(tri9[..., 9]).astype(jnp.int32), -1)
    return Hit(t, prim, uv)


def trace_anyhit(dmt: DenseMT, origins, dirs, t_min=0.0, t_max=1e30,
                 active=None, interpret: bool = False, variant=None):
    n = origins.shape[0]
    if active is None:
        active = jnp.ones((n,), bool)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    w = dmt.weights if _matmul_precision() == "highest" \
        else dmt.weights48
    _, slot = _trace_dense(w, dmt.aabb, dmt.center,
                           origins, dirs, t_max, active,
                           nc=dmt.num_clusters, has_omm=dmt.has_omm,
                           any_hit=True, interpret=interpret,
                           variant=variant or _variant_tuple())
    return slot >= 0
