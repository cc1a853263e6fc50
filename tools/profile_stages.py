"""Per-stage wall-clock profile of the reference-mode frame on the real
chip: trace_closest, trace_anyhit, load_surface, BSDF sample/eval, NEE,
full frame. Guides the optimization order (ROADMAP items 0-5)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    return jax.block_until_ready(x)


def timeit(fn, *args, iters=5, warmup=2, **kw):
    for _ in range(warmup):
        sync(fn(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = sync(fn(*args, **kw))
    dt = (time.perf_counter() - t0) / iters
    return dt, out


def main():
    from rtxpt_tpu import config as C
    from rtxpt_tpu.models.renderer import Renderer, reference_config
    from rtxpt_tpu.ops import traverse
    from rtxpt_tpu.pt import bsdf as B, integrator, shading
    from rtxpt_tpu.scene import envmap as EM, procedural
    from rtxpt_tpu.core import mathutils as mu

    W, H = 800, 600
    n = W * H
    cfg = reference_config(max_bounces=6, max_diffuse_bounces=4,
                           nee_distant_samples=1, nee_local_samples=1)
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(W, H)
    r = Renderer(host, cam, cfg,
                 env_radiance=EM.bake_procedural_sky(height=64))
    assets = r.assets
    print(f"bvh rows={assets.bvh.table.shape[0]} "
          f"width={assets.bvh.table.shape[1]} "
          f"tris={assets.scene.indices.shape[0]}")

    yy, xx = np.mgrid[0:H, 0:W]
    px = jnp.asarray(xx.reshape(-1).astype(np.uint32))
    py = jnp.asarray(yy.reshape(-1).astype(np.uint32))
    consts = C.default_constants(0)
    path0 = integrator.init_paths(cam, px, py, cfg, consts, 0)

    # --- primary trace
    tr = jax.jit(lambda o, d, a: traverse.trace_closest(
        assets.bvh, assets.soup, o, d, t_min=0.0,
        t_max=mu.K_MAX_RAY_TRAVEL, active=a, leaf_size=cfg.leaf_size))
    dt, hit = timeit(tr, path0.origin, path0.direction, path0.active)
    print(f"trace_closest primary ({n} rays): {dt*1e3:.2f} ms "
          f"({n/dt/1e6:.1f} Mrays/s)")

    # --- anyhit with ~50% active
    act2 = jnp.arange(n) % 2 == 0
    ah = jax.jit(lambda o, d, a: traverse.trace_anyhit(
        assets.bvh, assets.soup, o, d, t_min=0.0, t_max=100.0, active=a,
        leaf_size=cfg.leaf_size))
    dt2, _ = timeit(ah, path0.origin, path0.direction, act2)
    print(f"trace_anyhit 50% active: {dt2*1e3:.2f} ms")

    # --- load_surface
    ls = jax.jit(lambda p, b, d, cw: shading.load_surface(
        assets.scene, p, b, d, cone_width=cw))
    cw = jnp.full((n,), 0.01, jnp.float32)
    dt3, surf = timeit(ls, hit.prim, hit.bary, path0.direction, cw)
    print(f"load_surface: {dt3*1e3:.2f} ms")

    # --- bsdf sample + split eval
    def bs_fn(surf_, d):
        bsdf = shading.make_wavefront_bsdf(surf_)
        wi = surf_.sd.to_local(surf_.sd.v)
        bs = B.bsdf_sample(bsdf, wi, jnp.full((n, 3), 0.5))
        fd, fs = B.bsdf_eval_split(bsdf, wi, surf_.sd.to_local(d))
        return bs.weight, fd, fs
    dt4, _ = timeit(jax.jit(bs_fn), surf, path0.direction)
    print(f"bsdf sample+eval_split: {dt4*1e3:.2f} ms")

    # --- one full bounce-loop sample
    rw = jax.jit(lambda: integrator.render_wavefront(
        assets, cam, px, py, consts, cfg=cfg, sub_sample_index=0))
    dt5, _ = timeit(rw, iters=3)
    print(f"render_wavefront 1 sample: {dt5*1e3:.2f} ms "
          f"({n/dt5/1e6:.3f} Mpaths/s)")


if __name__ == "__main__":
    main()
