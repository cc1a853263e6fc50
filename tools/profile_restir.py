"""ReSTIR DI/GI stage costs on the chip at realtime scale (640x360):
presample / candidates / temporal / spatial / fused final, each timed
as its own jit over a REAL dominant-plane G-buffer. Drives the ReSTIR
share of the realtime frame (~317 ms of 1122 ms at 360p, round-4
profile_realtime)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=8):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / reps


def main():
    from rtxpt_tpu import config as C
    from rtxpt_tpu.models.renderer import Renderer, realtime_config
    from rtxpt_tpu.pt import gbuffer as GB
    from rtxpt_tpu.restir import di, gi
    from rtxpt_tpu.scene import envmap as EM, procedural

    W, H = 640, 360
    n = W * H
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(W, H)
    cfg = realtime_config(use_restir_di=True, use_restir_gi=True)
    r = Renderer(host, cam, cfg,
                 env_radiance=EM.bake_procedural_sky(height=64))
    yy, xx = np.mgrid[0:H, 0:W]
    px = jnp.asarray(xx.reshape(-1).astype(np.uint32))
    py = jnp.asarray(yy.reshape(-1).astype(np.uint32))

    gb = jax.jit(GB.trace_gbuffer)(r.assets, cam, cam, px, py)
    np.asarray(gb.view_z)

    t = timeit(jax.jit(lambda a: di.presample_lights(a, 1)), r.assets)
    print(f"presample_lights:     {t*1e3:8.2f} ms", flush=True)
    ris = di.presample_lights(r.assets, 1)

    f_cand = jax.jit(lambda a, g, rs: di.generate_candidates(
        a, g, px, py, 1, ris=rs))
    t = timeit(f_cand, r.assets, gb, ris)
    print(f"generate_candidates:  {t*1e3:8.2f} ms", flush=True)
    res = f_cand(r.assets, gb, ris)

    t = timeit(jax.jit(lambda a, g, cur, prev: di.temporal_resample(
        a, g, cur, prev, g, px, py, W, H, 1)), r.assets, gb, res, res)
    print(f"temporal_resample:    {t*1e3:8.2f} ms", flush=True)

    f_spat = jax.jit(lambda a, g, cur: di.spatial_resample(
        a, g, cur, px, py, W, H, 1))
    t = timeit(f_spat, r.assets, gb, res)
    print(f"spatial_resample:     {t*1e3:8.2f} ms", flush=True)

    gr = gi.GIReservoir.empty(n)
    t = timeit(jax.jit(lambda a, g, rr_, gg: di.fused_final_shade(
        a, g, rr_, gg, exact_alpha=False)), r.assets, gb, res, gr)
    print(f"fused_final_shade:    {t*1e3:8.2f} ms", flush=True)

    t = timeit(jax.jit(lambda g, cur: gi.spatial_resample(
        g, cur, px, py, W, H, 1)), gb, gr)
    print(f"gi spatial_resample:  {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
