"""Reliable (np.asarray-synced, scalar-sunk) timing of the NEE
ingredients — NEE is 57% of the frame (tools/profile_bisect.py)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=10):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / reps


def main():
    from rtxpt_tpu import config as C
    from rtxpt_tpu.models.renderer import Renderer, reference_config
    from rtxpt_tpu.ops import traverse
    from rtxpt_tpu.pt import bsdf as B, integrator, shading
    from rtxpt_tpu.scene import envmap as EM, lights as LI, procedural
    from rtxpt_tpu.core import mathutils as mu, rng

    W, H = 800, 600
    n = W * H
    cfg = reference_config(max_bounces=6, max_diffuse_bounces=4,
                           nee_distant_samples=1, nee_local_samples=1)
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(W, H)
    r = Renderer(host, cam, cfg,
                 env_radiance=EM.bake_procedural_sky(height=64))
    assets = r.assets
    yy, xx = np.mgrid[0:H, 0:W]
    px = jnp.asarray(xx.reshape(-1).astype(np.uint32))
    py = jnp.asarray(yy.reshape(-1).astype(np.uint32))
    consts = C.default_constants(0)
    p0 = integrator.init_paths(cam, px, py, cfg, consts, 0)
    hit = traverse.trace_closest(assets.bvh, assets.soup, p0.origin,
                                 p0.direction)
    surf = shading.load_surface(assets.scene, jnp.maximum(hit.prim, 0),
                                hit.bary, p0.direction)
    u2 = jnp.tile(jnp.asarray([[0.3, 0.7]], jnp.float32), (n, 1))
    u3 = jnp.concatenate([u2, jnp.full((n, 1), 0.4)], -1)

    def sink(x):
        return sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(x)
                   if jnp.issubdtype(v.dtype, jnp.floating))

    t = timeit(jax.jit(lambda u: sink(EM.sample_mip_descent(assets.env,
                                                            u))), u2)
    print(f"env sample_mip_descent:   {t*1e3:8.2f} ms", flush=True)
    d = surf.sd.v
    t = timeit(jax.jit(lambda dd: sink(EM.pdf_mip_descent(assets.env,
                                                          dd))), d)
    print(f"env pdf_mip_descent:      {t*1e3:8.2f} ms", flush=True)
    t = timeit(jax.jit(lambda dd: sink(EM.eval_dir(assets.env, dd))), d)
    print(f"env eval_dir:             {t*1e3:8.2f} ms", flush=True)
    t = timeit(jax.jit(lambda u: sink(LI.sample_local_lights(
        assets.lights, assets.scene.positions, assets.scene.indices,
        surf.sd.pos, u))), u3)
    print(f"sample_local_lights:      {t*1e3:8.2f} ms", flush=True)

    bsdf = shading.make_wavefront_bsdf(surf)
    wi = surf.sd.to_local(surf.sd.v)
    wo = surf.sd.to_local(p0.direction)
    t = timeit(jax.jit(lambda a, b: sink(B.bsdf_eval_split(bsdf, a, b))),
               wi, wo)
    print(f"bsdf_eval_split:          {t*1e3:8.2f} ms", flush=True)
    t = timeit(jax.jit(lambda a, b: sink(B.bsdf_eval_pdf(bsdf, a, b))),
               wi, wo)
    print(f"bsdf_eval_pdf:            {t*1e3:8.2f} ms", flush=True)
    t = timeit(jax.jit(lambda a, b: sink(B.bsdf_sample(bsdf, a,
                                                       jnp.concatenate(
                                                           [b[..., :1],
                                                            b[..., :2]],
                                                           -1)))),
               wi, wo)
    print(f"bsdf_sample:              {t*1e3:8.2f} ms", flush=True)

    t = timeit(jax.jit(lambda p, b, dd: sink(shading.load_surface(
        assets.scene, p, b, dd).sd.pos)), hit.prim, hit.bary, p0.direction)
    print(f"load_surface:             {t*1e3:8.2f} ms", flush=True)

    t = timeit(jax.jit(lambda o, dd, a: jnp.sum(traverse.trace_anyhit(
        assets.bvh, assets.soup, o, dd, t_max=100.0, active=a))),
        jnp.tile(p0.origin, (2, 1)), jnp.tile(p0.direction, (2, 1)),
        jnp.tile(p0.active, 2))
    print(f"anyhit 2n lanes:          {t*1e3:8.2f} ms", flush=True)
    t = timeit(jax.jit(lambda o, dd, a: jnp.sum(traverse.trace_closest(
        assets.bvh, assets.soup, o, dd, active=a).t)),
        p0.origin, p0.direction, p0.active)
    print(f"closest n lanes:          {t*1e3:8.2f} ms", flush=True)

    g = rng.make(px, py, jnp.uint32(1), jnp.uint32(0))
    t = timeit(jax.jit(lambda gg: sink(rng.next_3d(gg)[1])), g)
    print(f"rng next_3d:              {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
