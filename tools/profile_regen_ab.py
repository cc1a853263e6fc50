"""A/B the round-5 staged regen compaction on the real chip.

Three variants of the 800x600 reference render, ONE process (tunnel
rule), compile and steady state timed separately:
  A. regen chunk spp=8 + staged compaction (round-5 default)
  B. regen chunk spp=8, compaction OFF (round-4 behavior)
  C. no regen: pipelined per-sample dispatches
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

W, H = 800, 600
SPP = 8


def bench(r, tag):
    t0 = time.time()
    np.asarray(r.render(W, H, SPP))
    print(f"{tag}: compile+{SPP}spp {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    np.asarray(r.render(W, H, SPP))
    dt = (time.time() - t0) / SPP
    print(f"{tag}: {dt * 1e3:.0f} ms/sample = "
          f"{W * H / dt / 1e6:.3f} Mpaths/s", flush=True)


def main():
    import jax
    print("devices:", jax.devices(), flush=True)
    from rtxpt_tpu.models.renderer import Renderer, reference_config
    from rtxpt_tpu.scene import envmap as EM, procedural

    cfg = reference_config(max_bounces=6, max_diffuse_bounces=4,
                           nee_distant_samples=1, nee_local_samples=1)
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(W, H)
    env = EM.bake_procedural_sky(height=64)
    variants = set(sys.argv[1:]) or {"a", "b", "c"}

    if "a" in variants:
        bench(Renderer(host, cam, cfg, env_radiance=env),
              "A regen+staged-compaction")
    if "b" in variants:
        cfg_b = dataclasses.replace(cfg, wavefront_compaction=False)
        bench(Renderer(host, cam, cfg_b, env_radiance=env),
              "B regen, compaction off")
    if "c" in variants:
        os.environ["RTXPT_NO_REGEN"] = "1"
        bench(Renderer(host, cam, cfg, env_radiance=env),
              "C per-sample, no regen")
        os.environ.pop("RTXPT_NO_REGEN")


if __name__ == "__main__":
    main()
