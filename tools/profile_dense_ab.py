"""Chip A/B for the dense-MT epilogue rewrite: kernel timings at both
matmul precisions, oracle exactness, and the full-render number."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    print("devices:", jax.devices(), flush=True)

    from rtxpt_tpu.models.renderer import Renderer, reference_config
    from rtxpt_tpu.ops import mt_dense
    from rtxpt_tpu.ops.intersect import bruteforce_closest
    from rtxpt_tpu.pt import integrator
    from rtxpt_tpu.scene import envmap as EM, procedural
    from rtxpt_tpu import config as C

    W, H = 800, 600
    n = W * H
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(W, H)
    base = reference_config(max_bounces=6, max_diffuse_bounces=4,
                            nee_distant_samples=1, nee_local_samples=1)
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

    for prec in ("high", "highest", "default"):
        os.environ["RTXPT_MT_PRECISION"] = prec
        mt_dense._trace_dense._clear_cache()
        t = timeit(jax.jit(lambda o, d, a: mt_dense.trace_closest(
            r0.dense, o, d, active=a).t),
            p0.origin, p0.direction, p0.active)
        t2 = timeit(jax.jit(lambda o, d, a: jnp.sum(mt_dense.trace_anyhit(
            r0.dense, o, d, t_max=100.0, active=a))),
            jnp.tile(p0.origin, (2, 1)), jnp.tile(p0.direction, (2, 1)),
            jnp.tile(p0.active, 2))
        # oracle check at this precision (64k rays to keep it quick)
        k = 65536
        hit = mt_dense.trace_closest(r0.dense, p0.origin[:k],
                                     p0.direction[:k])
        ref = bruteforce_closest(r0.soup, p0.origin[:k], p0.direction[:k])
        hm = np.asarray(hit.prim >= 0)
        rm = np.asarray(ref.prim >= 0)
        match = (hm == rm).mean()
        both = hm & rm
        trel = np.abs(np.asarray(hit.t)[both] - np.asarray(ref.t)[both]) \
            / np.maximum(np.asarray(ref.t)[both], 1e-6)
        print(f"prec={prec:8s} closest {t*1e3:6.2f} ms  anyhit(2n) "
              f"{t2*1e3:6.2f} ms  hitmask match {match:.6f}  "
              f"max t rel err {trel.max() if both.any() else 0:.2e}",
              flush=True)

    os.environ["RTXPT_MT_PRECISION"] = "high"
    mt_dense._trace_dense._clear_cache()
    r = Renderer(host, cam, base,
                 env_radiance=EM.bake_procedural_sky(height=64))
    t0 = time.time()
    np.asarray(r.render(W, H, 6))
    c = time.time() - t0
    r.accum = None
    t0 = time.time()
    np.asarray(r.render(W, H, 6))
    dt = (time.time() - t0) / 6
    print(f"full 6-bounce (high): {dt*1e3:7.0f} ms/sample "
          f"({n/dt/1e6:.3f} Mpaths/s)  [compile+1 {c:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
