"""City (404k tris) 1080p reference-mode timing on the chip: the
two-level soup path with the nearest-first probe round (bvh2l)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    import jax
    print("devices:", jax.devices(), flush=True)

    from rtxpt_tpu.models.renderer import Renderer, reference_config
    from rtxpt_tpu.scene import envmap as EM, procedural

    W, H = int(os.environ.get("CITY_W", "1920")), \
        int(os.environ.get("CITY_H", "1080"))
    os.environ.setdefault("RTXPT_INSTANCED", "0")   # soup/bvh2l path
    host = procedural.build_city().finish()
    cam = procedural.city_camera(W, H)
    cfg = reference_config(max_bounces=6, max_diffuse_bounces=4,
                           nee_distant_samples=1, nee_local_samples=1)
    t0 = time.time()
    r = Renderer(host, cam, cfg,
                 env_radiance=EM.bake_procedural_sky(height=64))
    print(f"build {time.time()-t0:.1f}s  bvh={type(r.bvh).__name__} "
          f"tris={host['indices'].shape[0]}", flush=True)
    t0 = time.time()
    np.asarray(r.render(W, H, 1))
    print(f"compile+1 {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    np.asarray(r.render(W, H, 2))
    dt = (time.time() - t0) / 2
    print(f"city {W}x{H}: {dt:.2f} s/sample = "
          f"{W*H/dt/1e6:.3f} Mpaths/s", flush=True)


if __name__ == "__main__":
    main()
