"""Round-3 perf matrix on the real chip, in ONE process (tunnel rule:
never two TPU processes; full-frame compiles are minutes each).

Measures (np.asarray-synced):
  1. standalone trace kernels: dense-MT vs BVH8 pallas, closest + anyhit
  2. full reference-mode render: dense + no-sort (new default)
  3. optional variants via argv: "bvh" (RTXPT_NO_DENSE equivalent),
     "octant" (round-2 sort), both full-frame compiles.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def timeit(fn, *args, reps=8):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / reps


def main():
    variants = set(sys.argv[1:])
    import jax
    import jax.numpy as jnp
    t0 = time.time()
    print("devices:", jax.devices(), f"({time.time()-t0:.1f}s)", flush=True)

    import dataclasses
    from rtxpt_tpu.models.renderer import Renderer, reference_config
    from rtxpt_tpu.ops import traverse, mt_dense
    from rtxpt_tpu.ops import traverse_pallas as TP
    from rtxpt_tpu.pt import integrator
    from rtxpt_tpu.scene import envmap as EM, procedural
    from rtxpt_tpu import config as C

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

    # ---- standalone kernels
    if assets.dense is not None:
        t = timeit(jax.jit(lambda o, d, a: mt_dense.trace_closest(
            assets.dense, o, d, active=a).t),
            p0.origin, p0.direction, p0.active)
        print(f"dense closest  n lanes:  {t*1e3:8.2f} ms", flush=True)
        t = timeit(jax.jit(lambda o, d, a: jnp.sum(mt_dense.trace_anyhit(
            assets.dense, o, d, t_max=100.0, active=a))),
            jnp.tile(p0.origin, (2, 1)), jnp.tile(p0.direction, (2, 1)),
            jnp.tile(p0.active, 2))
        print(f"dense anyhit  2n lanes:  {t*1e3:8.2f} ms", flush=True)
    t = timeit(jax.jit(lambda o, d, a: TP.trace_closest(
        assets.bvh, o, d, active=a).t),
        p0.origin, p0.direction, p0.active)
    print(f"bvh8  closest  n lanes:  {t*1e3:8.2f} ms", flush=True)
    t = timeit(jax.jit(lambda o, d, a: jnp.sum(TP.trace_anyhit(
        assets.bvh, o, d, t_max=100.0, active=a))),
        jnp.tile(p0.origin, (2, 1)), jnp.tile(p0.direction, (2, 1)),
        jnp.tile(p0.active, 2))
    print(f"bvh8  anyhit  2n lanes:  {t*1e3:8.2f} ms", flush=True)

    # ---- full renders (pipelined batch like bench.py)
    def bench_renderer(rr, tag, iters=8):
        t0 = time.time()
        np.asarray(rr.render(W, H, 1))
        print(f"{tag}: compile+1 {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        np.asarray(rr.render(W, H, iters))
        dt = (time.time() - t0) / iters
        print(f"{tag}: {dt*1e3:.0f} ms/sample = "
              f"{n/dt/1e6:.3f} Mpaths/s", flush=True)

    bench_renderer(r, "dense+nosort")

    if "octant" in variants:
        cfg2 = dataclasses.replace(cfg, wavefront_sort="octant")
        r2 = Renderer(host, cam, cfg2,
                      env_radiance=EM.bake_procedural_sky(height=64))
        bench_renderer(r2, "dense+octant")
    if "bvh" in variants:
        os.environ["RTXPT_NO_DENSE"] = "1"
        r3 = Renderer(host, cam, cfg,
                      env_radiance=EM.bake_procedural_sky(height=64))
        os.environ.pop("RTXPT_NO_DENSE")
        bench_renderer(r3, "bvh+nosort")


if __name__ == "__main__":
    main()
