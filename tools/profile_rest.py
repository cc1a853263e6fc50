"""Rank the NON-trace per-iteration costs of the regen loop (the ~88
ms/sample "rest" from tools/profile_r5split.py): load_surface, env
eval_dir, RNG stream setup, the fused shade+NEE megakernel step, and
texture taps, each timed standalone at full wavefront width on the real
chip."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

W, H = 800, 600
N = W * H


def timeit(fn, *args, reps=8):
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    print("devices:", jax.devices(), flush=True)
    from rtxpt_tpu import config as C
    from rtxpt_tpu.core import rng
    from rtxpt_tpu.models.renderer import Renderer, reference_config
    from rtxpt_tpu.ops import traverse
    from rtxpt_tpu.pt import integrator, shading
    from rtxpt_tpu.scene import envmap as EM, procedural

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
                                 p0.direction, dense=assets.dense)
    cw = jnp.full((N,), 0.01, jnp.float32)

    t = timeit(jax.jit(lambda p, b, d: shading.load_surface(
        assets.scene, jnp.maximum(p, 0), b, d, cone_width=cw)),
        hit.prim, hit.bary, p0.direction)
    print(f"load_surface (full):      {t:7.2f} ms", flush=True)

    os.environ["RTXPT_TEXTURES_OFF_PROBE"] = "1"
    try:
        sc_nt = assets.scene._replace(textures=None)
        t = timeit(jax.jit(lambda p, b, d: shading.load_surface(
            sc_nt, jnp.maximum(p, 0), b, d, cone_width=cw)),
            hit.prim, hit.bary, p0.direction)
        print(f"load_surface (no tex):    {t:7.2f} ms", flush=True)
    except Exception as e:
        print("no-tex probe failed:", repr(e)[:120], flush=True)
    os.environ.pop("RTXPT_TEXTURES_OFF_PROBE", None)

    t = timeit(jax.jit(lambda d: EM.eval_dir(assets.env, d)),
               p0.direction)
    print(f"env eval_dir:             {t:7.2f} ms", flush=True)

    t = timeit(jax.jit(lambda p: rng.make(
        p.px, p.py, p.vertex_index.astype(jnp.uint32), jnp.uint32(0))),
        p0)
    print(f"rng make:                 {t:7.2f} ms", flush=True)

    # fused shade+NEE step exactly as the loop calls it (visibility
    # stubbed to all-visible so only the megakernel + glue is timed)
    from rtxpt_tpu.pt import visibility as VIS
    orig = VIS.trace_visibility
    VIS.trace_visibility = lambda *a, **k: jnp.zeros((a[1].shape[0],),
                                                     bool)
    try:
        surf = shading.load_surface(assets.scene,
                                    jnp.maximum(hit.prim, 0), hit.bary,
                                    p0.direction, cone_width=cw)
        shade = hit.prim >= 0
        thp = jnp.ones((N, 3))
        rad = jnp.zeros((N, 3))
        rays = jnp.zeros((2,))

        def sample_gen(path, s_arr=None):
            return rng.make(path.px, path.py,
                            path.vertex_index.astype(jnp.uint32),
                            jnp.uint32(0))

        def step():
            return integrator._kernel_shade_step(
                assets, cfg, consts, cam, p0, surf, shade, thp, rad,
                p0.origin, p0.interior, p0.vertex_index + 1, None, rays,
                1, 1, sample_gen)
        t = timeit(jax.jit(step))
        print(f"shade megakernel step:    {t:7.2f} ms  "
              f"(vis stubbed; incl light pick + env sample + packing)",
              flush=True)
    finally:
        VIS.trace_visibility = orig

    from rtxpt_tpu.scene import lights as LI
    u1 = jnp.linspace(0, 1, N)
    t = timeit(jax.jit(lambda u: LI.fetch_rows(
        assets.lights, LI.pick_light(assets.lights, u))), u1)
    print(f"light pick+fetch:         {t:7.2f} ms", flush=True)

    u2 = jnp.stack([u1, 1.0 - u1], -1)
    t = timeit(jax.jit(lambda u: EM.sample_mip_descent(assets.env, u)),
               u2)
    print(f"env sample_mip_descent:   {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
