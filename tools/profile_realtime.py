"""Realtime frame cost decomposition on the chip.

Times the full stable-planes realtime frame at 640x360, then config
variants (no ReSTIR DI / no GI / no denoise+TAA / 1 plane) — full-render
deltas are the trustworthy signal through the tunnel (memory:
axon-tpu-tunnel-behavior). Optionally attempts a jax.profiler device
trace (RTXPT_TRY_TRACE=1)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    import dataclasses
    import jax
    print("devices:", jax.devices(), flush=True)

    from rtxpt_tpu import config as C
    from rtxpt_tpu.models.realtime import RealtimeRenderer
    from rtxpt_tpu.models.renderer import realtime_config
    from rtxpt_tpu.scene import envmap as EM, procedural

    W, H = 640, 360
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(W, H)
    env = EM.bake_procedural_sky(height=64)

    def bench(tag, cfg, frames=6):
        r = RealtimeRenderer(host, cam, cfg, env_radiance=env)
        t0 = time.time()
        np.asarray(r.render_frame(W, H))      # compile + frame 0
        np.asarray(r.render_frame(W, H))      # has_prev variant compile
        c = time.time() - t0
        t0 = time.time()
        for _ in range(frames):
            out = r.render_frame(W, H)
        np.asarray(out)
        dt = (time.time() - t0) / frames
        print(f"{tag:34s} {dt*1e3:7.0f} ms/frame  [compile+2 {c:.0f}s]",
              flush=True)
        return r, dt

    base = realtime_config(use_restir_di=True, use_restir_gi=True,
                           denoiser_enabled=True, use_stable_planes=True)
    r, dt = bench("full (3 planes, DI+GI, den+TAA)", base)

    if os.environ.get("RTXPT_TRY_TRACE") == "1":
        try:
            with jax.profiler.trace("/tmp/jaxtrace"):
                np.asarray(r.render_frame(W, H))
            print("trace written to /tmp/jaxtrace", flush=True)
        except Exception as e:
            print("trace failed:", repr(e)[:200], flush=True)

    # NOTE: each stable-frame variant costs a multi-minute tunnel
    # compile on a cold cache — keep the variant list short
    bench("no denoiser/TAA (stage2 off)  ",
          dataclasses.replace(base, denoiser_enabled=False))
    bench("no DI, no GI                  ",
          dataclasses.replace(base, use_restir_di=False,
                              use_restir_gi=False))
    bench("1 stable plane                ",
          dataclasses.replace(base, stable_plane_count=1))


if __name__ == "__main__":
    main()
