"""Bisect the full-frame cost by toggling config pieces: NEE on/off,
bounce count, RR on/off. Times render_wavefront on the real chip."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, n=4):
    np.asarray(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    np.asarray(out)
    return (time.perf_counter() - t0) / n


def main():
    from rtxpt_tpu import config as C
    from rtxpt_tpu.models.renderer import Renderer, reference_config
    from rtxpt_tpu.pt import integrator
    from rtxpt_tpu.scene import envmap as EM, procedural

    W, H = 800, 600
    n = W * H
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(W, H)
    env = EM.bake_procedural_sky(height=64)
    yy, xx = np.mgrid[0:H, 0:W]
    px = jnp.asarray(xx.reshape(-1).astype(np.uint32))
    py = jnp.asarray(yy.reshape(-1).astype(np.uint32))
    consts = C.default_constants(0)

    def run(tag, **cfg_over):
        cfg = reference_config(max_bounces=6, max_diffuse_bounces=4,
                               nee_distant_samples=1, nee_local_samples=1,
                               **cfg_over)
        r = Renderer(host, cam, cfg, env_radiance=env)
        import functools
        f = jax.jit(functools.partial(
            integrator.render_wavefront, cfg=cfg))
        dt = timeit(lambda: f(r.assets, cam, px, py, consts))
        print(f"{tag:44s} {dt*1e3:8.1f} ms/sample "
              f"({n/dt/1e6:.3f} Mpaths/s)", flush=True)
        return dt

    run("full (baseline)")
    run("nee off", nee_enabled=False)
    run("nee distant only", nee_local_samples=0)
    run("nee local only", nee_distant_samples=0)
    run("max_bounces=1", max_bounces=1, max_diffuse_bounces=1)
    run("max_bounces=3", max_bounces=3)
    run("no russian roulette", enable_russian_roulette=False)


if __name__ == "__main__":
    main()
