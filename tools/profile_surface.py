"""Microprofile of load_surface internals at production lane width.

The r5 rest-attribution lab (tools/profile_rest_lab.py) measured
load_surface at ~119 of 213 ms/sample — more than either trace kernel.
This times its pieces separately at 480k lanes on the programmer-art
tables: each MXU one-hot gather (ops/gather_pallas), the fused
barycentric interp gather, and the full load_surface (gathers + frame
math) so the non-gather math falls out by subtraction.

    python tools/profile_surface.py [n_lanes]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def timeit(fn, *args, iters=20):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 480_000
    import jax
    import jax.numpy as jnp
    print("devices:", jax.devices(), flush=True)
    from rtxpt_tpu.models.renderer import Renderer, reference_config
    from rtxpt_tpu.ops import gather_pallas as GPL
    from rtxpt_tpu.pt import shading
    from rtxpt_tpu.scene import envmap as EM, procedural

    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(800, 600)
    r = Renderer(host, cam, reference_config(),
                 env_radiance=EM.bake_procedural_sky(height=32))
    sc = r.scene
    n_tris = int(sc.indices.shape[0])
    n_verts = int(sc.positions.shape[0])
    print(f"tris={n_tris} verts={n_verts} lanes={n}")
    for name, gp in (("tri_gp", sc.tri_gp), ("tri_geom_gp", sc.tri_geom_gp),
                     ("vert_gp", sc.vert_gp), ("mat_gp", sc.mat_gp)):
        if gp is None:
            print(f"{name}: None")
        else:
            print(f"{name}: rows={gp.rows} width={gp.width}")

    rng = np.random.RandomState(0)
    prim = jnp.asarray(rng.randint(0, n_tris, size=n), jnp.int32)
    bary = jnp.asarray(rng.rand(n, 2).astype(np.float32) * 0.5)
    rdir = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    rdir = rdir / jnp.linalg.norm(rdir, axis=-1, keepdims=True)
    cone = jnp.full((n,), 1e-3)

    tp = GPL.gather_rows(sc.tri_gp, prim).astype(jnp.int32)
    tri = tp[..., :3]
    w = jnp.stack([1.0 - bary[..., 0] - bary[..., 1],
                   bary[..., 0], bary[..., 1]], -1)

    t_tri = timeit(jax.jit(lambda p: GPL.gather_rows(sc.tri_gp, p)), prim)
    t_geom = timeit(jax.jit(lambda p: GPL.gather_rows(sc.tri_geom_gp, p)),
                    prim)
    t_interp = timeit(jax.jit(
        lambda t, ww: GPL.gather_rows_interp(sc.vert_gp, t, ww)), tri, w)
    mid = tp[..., 3]
    t_mat = timeit(jax.jit(lambda m: GPL.gather_rows(sc.mat_gp, m)), mid)

    t_full = timeit(jax.jit(lambda p, b, d, c: shading.load_surface(
        sc, p, b, d, cone_width=c)), prim, bary, rdir, cone)

    gsum = t_tri + t_geom + t_interp + t_mat
    print(f"gather tri_pack   (W=4):  {t_tri:7.2f} ms")
    print(f"gather tri_geom   (W=5):  {t_geom:7.2f} ms")
    print(f"gather vert interp(W=12): {t_interp:7.2f} ms")
    print(f"gather mat rows   (W=20): {t_mat:7.2f} ms")
    print(f"gathers total:            {gsum:7.2f} ms")
    print(f"load_surface full:        {t_full:7.2f} ms")
    print(f"non-gather math:          {t_full - gsum:7.2f} ms")


if __name__ == "__main__":
    main()
