"""A/B: does sorting bounce rays shrink dense-MT per-tile cluster
worklists (and trace time)?

Generates realistic bounce-1 rays (primary trace -> cosine-hemisphere
scatter at hit points), then times trace_closest on (a) pixel order,
(b) random permutation (worst case), (c) sorted by direction-octant +
origin-morton key. Also reports the mean per-tile worklist length each
way — the quantity the trace cost is linear in."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def morton_key(o, d, lo, hi):
    """(N,) uint32 sort key: 3-bit direction octant high, 21-bit origin
    morton low (7 bits/axis)."""
    q = np.clip((o - lo) / np.maximum(hi - lo, 1e-9) * 127.0,
                0, 127).astype(np.uint32)

    def part7(x):
        x = x.astype(np.uint32)
        x = (x | (x << 8)) & np.uint32(0x0100F00F)
        x = (x | (x << 4)) & np.uint32(0x010C30C3)
        x = (x | (x << 2)) & np.uint32(0x09249249)
        return x
    m = part7(q[:, 0]) | (part7(q[:, 1]) << np.uint32(1)) \
        | (part7(q[:, 2]) << np.uint32(2))
    octant = ((d[:, 0] > 0).astype(np.uint32)
              | ((d[:, 1] > 0).astype(np.uint32) << np.uint32(1))
              | ((d[:, 2] > 0).astype(np.uint32) << np.uint32(2)))
    return (octant << np.uint32(21)) | m


def main():
    import jax
    import jax.numpy as jnp
    print("devices:", jax.devices(), flush=True)

    from rtxpt_tpu.models.renderer import Renderer, reference_config
    from rtxpt_tpu.ops import traverse, mt_dense
    from rtxpt_tpu.scene import envmap as EM, procedural

    W, H = 800, 600
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(W, H)
    cfg = reference_config()
    r = Renderer(host, cam, cfg, env_radiance=EM.bake_procedural_sky(64))
    assets = r.assets

    # primary rays
    from rtxpt_tpu.scene.camera import compute_rays
    px, py = r._pixel_grid(W, H)
    cam_j = r.camera._replace(viewport=np.asarray([W, H], np.float32))
    o0, d0 = compute_rays(cam_j, px.astype(jnp.float32) + 0.5,
                          py.astype(jnp.float32) + 0.5)
    hit = traverse.trace_closest(assets.bvh, assets.soup, o0, d0,
                                 dense=assets.dense)
    hit_t = np.asarray(hit.t)
    prim = np.asarray(hit.prim)
    o0n, d0n = np.asarray(o0), np.asarray(d0)
    found = prim >= 0
    pos = o0n + d0n * hit_t[:, None]

    # cosine-hemisphere scatter about the geometric normal
    verts = np.asarray(assets.scene.positions)
    idx = np.asarray(assets.scene.indices)
    tri = idx[np.maximum(prim, 0)]
    n = np.cross(verts[tri[:, 1]] - verts[tri[:, 0]],
                 verts[tri[:, 2]] - verts[tri[:, 0]])
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    n = np.where((np.sum(n * d0n, -1) < 0)[:, None], n, -n)
    rng_np = np.random.default_rng(7)
    u1, u2 = rng_np.random(prim.shape[0]), rng_np.random(prim.shape[0])
    rad = np.sqrt(u1)
    phi = 2 * np.pi * u2
    t_axis = np.cross(n, np.where(np.abs(n[:, 2:3]) < 0.9,
                                  [[0., 0., 1.]], [[1., 0., 0.]]))
    t_axis /= np.maximum(np.linalg.norm(t_axis, -1, keepdims=True), 1e-12)
    b_axis = np.cross(n, t_axis)
    local = np.stack([rad * np.cos(phi), rad * np.sin(phi),
                      np.sqrt(np.maximum(1 - u1, 0))], -1)
    d1 = local[:, 0:1] * t_axis + local[:, 1:2] * b_axis + local[:, 2:3] * n
    o1 = pos + n * 1e-4
    act = found

    lo, hi = verts.min(0), verts.max(0)
    key = morton_key(o1, d1, lo, hi)
    order = np.argsort(key, kind="stable")
    perm = rng_np.permutation(prim.shape[0])

    dmt = assets.dense
    nc = dmt.num_clusters
    print(f"n={prim.shape[0]} live={act.sum()} clusters={nc}", flush=True)

    def run(tag, o, d, a):
        o = jnp.asarray(o, jnp.float32)
        d = jnp.asarray(d, jnp.float32)
        a = jnp.asarray(a)
        # worklist stats (pad to TILE like the trace wrapper does)
        npad = (o.shape[0] + 1023) // 1024 * 1024 - o.shape[0]
        tmax = jnp.full((o.shape[0] + npad,), 1e30, jnp.float32)
        counts, _ = mt_dense._tile_worklists_exact(
            dmt.aabb, jnp.pad(o, ((0, npad), (0, 0))),
            jnp.pad(d, ((0, npad), (0, 0)), constant_values=1.0),
            tmax, jnp.pad(a, (0, npad)), nc=nc)
        counts = np.asarray(counts)
        h = traverse.trace_closest(assets.bvh, assets.soup, o, d,
                                   active=a, dense=dmt)
        np.asarray(h.t)
        best = 1e9
        for _ in range(4):                 # min-of-rounds: tunnel noise
            t0 = time.time()
            for _ in range(8):
                h = traverse.trace_closest(assets.bvh, assets.soup, o, d,
                                           active=a, dense=dmt)
            np.asarray(h.t)
            best = min(best, (time.time() - t0) / 8)
        print(f"{tag:22s} {best*1e3:7.2f} ms  worklist mean="
              f"{counts.mean():6.1f}"
              f" p90={np.percentile(counts, 90):6.1f}", flush=True)
        return h

    run("primary (coherent)", o0n, d0n, np.ones(prim.shape[0], bool))
    h_a = run("bounce pixel-order", o1, d1, act)
    run("bounce shuffled", o1[perm], d1[perm], act[perm])
    h_c = run("bounce sorted", o1[order], d1[order], act[order])
    # correctness: sorted results must match pixel-order after unpermute
    t_a = np.asarray(h_a.t)
    t_c = np.empty_like(t_a)
    t_c[order] = np.asarray(h_c.t)
    print("sorted == unsorted:", np.allclose(t_a[act], t_c[act]), flush=True)

    # anyhit variant (shadow-ray style: same origins, light directions)
    ld = np.array([0.3, 0.8, 0.5])
    ld /= np.linalg.norm(ld)
    d_sh = np.broadcast_to(ld, d1.shape).copy()
    key_sh = morton_key(o1, d_sh, lo, hi)
    order_sh = np.argsort(key_sh, kind="stable")

    def run_ah(tag, o, d, a):
        o = jnp.asarray(o, jnp.float32)
        d = jnp.asarray(d, jnp.float32)
        a = jnp.asarray(a)
        occ = traverse.trace_anyhit(assets.bvh, assets.soup, o, d,
                                    active=a, dense=dmt)
        np.asarray(occ)
        best = 1e9
        for _ in range(4):
            t0 = time.time()
            for _ in range(8):
                occ = traverse.trace_anyhit(assets.bvh, assets.soup, o, d,
                                            active=a, dense=dmt)
            np.asarray(occ)
            best = min(best, (time.time() - t0) / 8)
        print(f"{tag:22s} {best*1e3:7.2f} ms", flush=True)

    run_ah("anyhit pixel-order", o1, d_sh, act)
    run_ah("anyhit sorted", o1[order_sh], d_sh[order_sh], act[order_sh])


if __name__ == "__main__":
    main()
