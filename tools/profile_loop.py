"""In-loop cost decomposition on the chip: full renders under config
variants. Standalone kernel timings include the tunnel's per-dispatch
overhead, so deltas between full renders are the ground truth for where
the bounce loop's time goes."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    import dataclasses
    import jax
    import jax.numpy as jnp
    print("devices:", jax.devices(), flush=True)

    from rtxpt_tpu.models.renderer import Renderer, reference_config
    from rtxpt_tpu.ops import mt_dense
    from rtxpt_tpu.pt import integrator
    from rtxpt_tpu.scene import envmap as EM, procedural
    from rtxpt_tpu import config as C

    W, H = 800, 600
    n = W * H
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(W, H)

    base = reference_config(max_bounces=6, max_diffuse_bounces=4,
                            nee_distant_samples=1, nee_local_samples=1)

    # ---- standalone gated kernels first (shared Renderer assets)
    r0 = Renderer(host, cam, base,
                  env_radiance=EM.bake_procedural_sky(height=64))
    yy, xx = np.mgrid[0:H, 0:W]
    px = jnp.asarray(xx.reshape(-1).astype(np.uint32))
    py = jnp.asarray(yy.reshape(-1).astype(np.uint32))
    consts = C.default_constants(0)
    p0 = integrator.init_paths(cam, px, py, base, consts, 0)

    def timeit(fn, *args, reps=8):
        np.asarray(fn(*args))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        np.asarray(out)
        return (time.perf_counter() - t0) / reps

    t = timeit(jax.jit(lambda o, d, a: mt_dense.trace_closest(
        r0.dense, o, d, active=a).t), p0.origin, p0.direction, p0.active)
    print(f"dense closest (gated)  n lanes: {t*1e3:8.2f} ms", flush=True)
    t = timeit(jax.jit(lambda o, d, a: jnp.sum(mt_dense.trace_anyhit(
        r0.dense, o, d, t_max=100.0, active=a))),
        jnp.tile(p0.origin, (2, 1)), jnp.tile(p0.direction, (2, 1)),
        jnp.tile(p0.active, 2))
    print(f"dense anyhit  (gated) 2n lanes: {t*1e3:8.2f} ms", flush=True)

    def bench_cfg(tag, cfg, iters=6):
        r = Renderer(host, cam, cfg,
                     env_radiance=EM.bake_procedural_sky(height=64))
        # warm with the SAME call shape as the timed run: render(iters)
        # compiles the regen-chunk variant, which render(1) does not —
        # timing a cold regen chunk would charge its ~50 s compile to
        # the steady state
        t0 = time.time()
        np.asarray(r.render(W, H, iters))
        c = time.time() - t0
        r.accum = None
        t0 = time.time()
        np.asarray(r.render(W, H, iters))
        dt = (time.time() - t0) / iters
        print(f"{tag}: {dt*1e3:7.0f} ms/sample ({n/dt/1e6:.3f} Mpaths/s)"
              f"  [compile+1 {c:.0f}s]", flush=True)
        return dt

    full = bench_cfg("full 6-bounce        ", base)
    bench_cfg("no-NEE               ",
              dataclasses.replace(base, nee_enabled=False))
    bench_cfg("distant-only NEE     ",
              dataclasses.replace(base, nee_local_samples=0))
    bench_cfg("bounces=1            ",
              dataclasses.replace(base, max_bounces=1))
    bench_cfg("bounces=3            ",
              dataclasses.replace(base, max_bounces=3))


if __name__ == "__main__":
    main()
