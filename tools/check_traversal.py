"""TPU traversal A/B: Pallas bf16-plane kernel vs the XLA f32 reference
path, on real scene rays. Reports mismatch rates and timings."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=5):
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / n


def main():
    from rtxpt_tpu.models.renderer import Renderer, reference_config
    from rtxpt_tpu.ops import traverse, traverse_pallas as TP
    from rtxpt_tpu.pt import integrator
    from rtxpt_tpu.scene import envmap as EM, procedural
    from rtxpt_tpu import config as C
    from rtxpt_tpu.core import mathutils as mu

    W, H = 800, 600
    n = W * H
    cfg = reference_config()
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(W, H)
    r = Renderer(host, cam, cfg,
                 env_radiance=EM.bake_procedural_sky(height=64))
    bvh = r.assets.bvh
    yy, xx = np.mgrid[0:H, 0:W]
    px = jnp.asarray(xx.reshape(-1).astype(np.uint32))
    py = jnp.asarray(yy.reshape(-1).astype(np.uint32))
    consts = C.default_constants(0)
    p0 = integrator.init_paths(cam, px, py, cfg, consts, 0)

    f_pal = jax.jit(lambda o, d, a: TP.trace_closest(
        bvh, o, d, t_max=mu.K_MAX_RAY_TRAVEL, active=a))
    f_xla = jax.jit(lambda o, d, a: traverse._trace8(
        bvh.table, o, d, jnp.float32(0.0),
        jnp.full((n,), mu.K_MAX_RAY_TRAVEL), a,
        leaf_size=bvh.leaf_size, any_hit=False))

    hp = f_pal(p0.origin, p0.direction, p0.active)
    tx, px_, uvx, _ = f_xla(p0.origin, p0.direction, p0.active)
    prim_x = np.where(np.asarray(px_) >= 0,
                      np.asarray(bvh.leaf_tris)[np.maximum(
                          np.asarray(px_), 0)], -1)
    prim_p = np.asarray(hp.prim)
    t_p = np.asarray(hp.t)
    t_x = np.asarray(tx)
    mism = (prim_p != prim_x)
    print(f"prim mismatch: {mism.mean()*100:.4f}%  ({mism.sum()}/{n})")
    both = (prim_p >= 0) & (prim_x >= 0)
    dt_rel = np.abs(t_p[both] - t_x[both]) / np.maximum(t_x[both], 1e-6)
    print(f"t rel err: median {np.median(dt_rel):.2e} "
          f"max {dt_rel.max():.2e}")

    d1 = timeit(f_pal, p0.origin, p0.direction, p0.active)
    print(f"pallas closest: {d1*1e3:.2f} ms ({n/d1/1e6:.1f} Mrays/s)")

    # anyhit
    fa = jax.jit(lambda o, d, a: TP.trace_anyhit(
        bvh, o, d, t_max=100.0, active=a))
    act2 = jnp.arange(n) % 2 == 0
    d2 = timeit(fa, p0.origin, p0.direction, act2)
    print(f"pallas anyhit 50%: {d2*1e3:.2f} ms")


if __name__ == "__main__":
    main()
