"""Full-sample A/B: exact O(N*NC) worklist prepass vs the O(T*NC)
tile-interval prepass, same process, min-of-rounds (tunnel noise)."""
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
    from rtxpt_tpu.ops import mt_dense
    from rtxpt_tpu.scene import envmap as EM, procedural

    W, H = 800, 600
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(W, H)
    base = reference_config(max_bounces=6, max_diffuse_bounces=4,
                            nee_distant_samples=1, nee_local_samples=1)

    def run(tag):
        mt_dense._trace_dense._clear_cache()
        r = Renderer(host, cam, base,
                     env_radiance=EM.bake_procedural_sky(height=64))
        img0 = np.asarray(r.render(W, H, 8))
        best = 1e9
        for _ in range(3):
            r.accum = None
            t0 = time.time()
            np.asarray(r.render(W, H, 8))
            best = min(best, (time.time() - t0) / 8)
        print(f"{tag:10s} {best*1e3:7.1f} ms/sample "
              f"({W*H/best/1e6:.3f} Mpaths/s)  mean={img0.mean():.6f}",
              flush=True)

    mt_dense.TILE_PREPASS = False
    run("exact")  # default
    mt_dense.TILE_PREPASS = True
    run("tile")
    mt_dense.TILE_PREPASS = False
    run("exact2")
    mt_dense.TILE_PREPASS = True
    run("tile2")


if __name__ == "__main__":
    main()
