"""Decompose the dense-MT trace kernel's per-visit cost on the chip.

Times the production closest/anyhit kernels on REAL primary rays
(programmer-art, 800x600), then ablated kernel variants built from the
same pieces (matmul-only, no-epilogue-reduce, gate-only), plus the
prepass alone and the worklist statistics (visits/tile). Drives the
"which term dominates a visit" decision for ops/mt_dense.py (ROADMAP
round-4 item 1: trace kernels are ~60 of ~70 ms/bounce).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, reps=8):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / reps


def make_ablated(nc, has_omm, mode: str):
    """Variant kernels sharing mt_dense's structure; `mode` selects the
    body: full | matmul | matmul1 | gate | epilogue_noreduce."""
    from rtxpt_tpu.ops import mt_dense as M
    CLUSTER, TILE = M.CLUSTER, M.TILE
    RC = (5 if has_omm else 4) * CLUSTER
    INF_BITS = 0x7F800000

    def kernel(counts_ref, clist_ref, aabb_ref, w_ref, o_ref, d_ref,
               tmax_ref, act_ref, t_out, prim_out):
        i = pl.program_id(0)
        cnt = counts_ref[i]
        x = M._features(o_ref, d_ref)
        x_hi = x.astype(jnp.bfloat16)
        x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        act = act_ref[0] != 0
        t_min = jnp.float32(0.0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (CLUSTER, TILE), 0)
        ox, oy, oz = x[12], x[13], x[14]
        dx, dy, dz = x[9], x[10], x[11]

        def inv(c):
            return 1.0 / jnp.where(jnp.abs(c) < 1e-12,
                                   jnp.where(c < 0, -1e-12, 1e-12), c)

        ix, iy, iz = inv(dx), inv(dy), inv(dz)
        t_out[0] = tmax_ref[0]
        prim_out[0] = jnp.full((TILE,), -1, jnp.int32)

        def cluster_gate(c, live, best):
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

        def body(j, _):
            c = clist_ref[i, j]
            best0 = t_out[0]
            live = cluster_gate(c, act, best0) \
                if mode not in ("nogate", "nowhen_nogate") else act

            always = mode in ("nowhen", "nogate", "nowhen_nogate")

            def _inner():
                wc = w_ref[pl.ds(c * RC, RC), :]
                if mode == "gate":
                    # charge only the gate + worklist walk: fold a row
                    # of wc in so the load isn't DCE'd
                    t_out[0] = t_out[0] + wc[0, 0] * 1e-30
                    return
                if mode == "matmul1":
                    dims = (((1,), (0,)), ((), ()))
                    out = jax.lax.dot_general(
                        wc.astype(jnp.bfloat16), x_hi, dims,
                        preferred_element_type=jnp.float32)
                else:
                    out = M._cluster_matmul(wc, x, x_hi, x_lo, "high")
                if mode in ("matmul", "matmul1"):
                    # cheapest non-DCE use of the full out block
                    t_out[0] = jnp.minimum(t_out[0], jnp.min(out, 0))
                    return
                best = t_out[0]
                ok, t = M._pair_test(out, has_omm, t_min, best, act,
                                     need_t=True)
                tt = jnp.where(ok, t, jnp.inf)
                if mode == "epilogue_noreduce":
                    t_out[0] = jnp.minimum(t_out[0], tt[0])
                    return
                tbits = jax.lax.bitcast_convert_type(tt, jnp.int32)
                packed = (tbits & ~63) | rows
                pmin = jnp.min(packed, axis=0)
                imp = pmin < INF_BITS
                t_new = jax.lax.bitcast_convert_type(pmin & ~63,
                                                     jnp.float32)
                t_out[0] = jnp.where(imp, t_new, best)
                prim_out[0] = jnp.where(imp, c * CLUSTER + (pmin & 63),
                                        prim_out[0])

            if always:
                _inner()
            else:
                pl.when(jnp.any(live))(_inner)
            return 0

        jax.lax.fori_loop(0, cnt, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("nc", "has_omm", "mode"))
def trace_ablated(weights, aabb, center, origins, dirs, t_max, active,
                  nc, has_omm, mode):
    from rtxpt_tpu.ops import mt_dense as M
    TILE = M.TILE
    n = origins.shape[0]
    n_pad = M._round_up(max(n, TILE), TILE)
    pad = n_pad - n
    o = jnp.pad(origins, ((0, pad), (0, 0)))
    d = jnp.pad(dirs, ((0, pad), (0, 0)), constant_values=1.0)
    tm = jnp.pad(t_max, (0, pad))
    ac = jnp.pad(active, (0, pad))
    counts, order = M._tile_worklists_exact(aabb, o, d, tm, ac, nc=nc)
    RC = (5 if has_omm else 4) * M.CLUSTER
    kernel = make_ablated(nc, has_omm, mode)
    aabb_c = aabb - jnp.concatenate([center, center])[None, :]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_pad // TILE,),
        in_specs=[
            pl.BlockSpec((nc, 6), lambda i, *_: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((nc * RC, 16), lambda i, *_: (0, 0),
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
    )
    t, prim = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, n_pad), jnp.int32)),
        grid_spec=grid_spec,
    )(counts, order, aabb_c, weights, (o - center[None, :]).T, d.T,
      tm[None, :], ac.astype(jnp.int32)[None, :])
    return t[0, :n], prim[0, :n]


def main():
    print("devices:", jax.devices(), flush=True)
    from rtxpt_tpu import config as C
    from rtxpt_tpu.models.renderer import Renderer, reference_config
    from rtxpt_tpu.ops import mt_dense as M
    from rtxpt_tpu.pt import integrator
    from rtxpt_tpu.scene import envmap as EM, procedural

    W, H = 800, 600
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(W, H)
    cfg = reference_config(max_bounces=6, max_diffuse_bounces=4)
    r = Renderer(host, cam, cfg,
                 env_radiance=EM.bake_procedural_sky(height=64))
    dmt = r.dense
    nc, has_omm = dmt.num_clusters, dmt.has_omm
    print(f"clusters={nc} omm={has_omm} CLUSTER={M.CLUSTER} "
          f"TILE={M.TILE}", flush=True)

    yy, xx = np.mgrid[0:H, 0:W]
    px = jnp.asarray(xx.reshape(-1).astype(np.uint32))
    py = jnp.asarray(yy.reshape(-1).astype(np.uint32))
    consts = C.default_constants(0)
    p0 = integrator.init_paths(cam, px, py, cfg, consts, 0)
    o, d, ac = p0.origin, p0.direction, p0.active
    # pad to a tile multiple like _trace_dense does (prepass needs it)
    n_pad = M._round_up(o.shape[0], M.TILE)
    pad = n_pad - o.shape[0]
    o = jnp.pad(o, ((0, pad), (0, 0)))
    d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
    ac = jnp.pad(ac, (0, pad))
    tm = jnp.full((n_pad,), 1e30, jnp.float32)

    # worklist statistics from the exact prepass
    counts, _ = M._tile_worklists_exact(dmt.aabb, o, d, tm, ac, nc=nc)
    cn = np.asarray(counts)
    print(f"visits/tile: mean {cn.mean():.1f} max {cn.max()} "
          f"(x {len(cn)} tiles = {cn.sum()} visits)", flush=True)

    t_pre = timeit(jax.jit(functools.partial(
        M._tile_worklists_exact, nc=nc)), dmt.aabb, o, d, tm, ac)
    print(f"{'prepass (exact)':28s} {t_pre*1e3:7.2f} ms", flush=True)

    t_full = timeit(jax.jit(lambda o, d, a: M.trace_closest(
        dmt, o, d, active=a).t), o, d, ac)
    print(f"{'closest full (prod)':28s} {t_full*1e3:7.2f} ms", flush=True)

    for mode in ("full", "nowhen", "nowhen_nogate", "epilogue_noreduce",
                 "matmul", "matmul1", "gate"):
        tt = timeit(lambda o, d: trace_ablated(
            dmt.weights, dmt.aabb, dmt.center, o, d, tm, ac,
            nc=nc, has_omm=has_omm, mode=mode), o, d)
        per_visit = (tt - t_pre) / max(cn.sum(), 1) * 1e6
        print(f"{'ablate ' + mode:28s} {tt*1e3:7.2f} ms "
              f"({per_visit:6.3f} us/visit incl. fixed)", flush=True)

    t_any = timeit(jax.jit(lambda o, d, a: jnp.sum(M.trace_anyhit(
        dmt, o, d, t_max=100.0, active=a))), o, d, ac)
    print(f"{'anyhit full (prod)':28s} {t_any*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
