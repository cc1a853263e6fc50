"""SER material-sort A/B (VERDICT r4 next #7): does reordering the
wavefront by a material key before the next bounce pay on TPU?

The reference's SER half #2 is a 16-bit material/sub-instance sort key
fed to NvReorderThread (RTXPT/Sample.cpp:1087-1113, Sample.hlsl:122-131).
On TPU the shade megakernel is branch-free (materials are data, not
control flow), so the only possible win is gather/worklist coherence —
this harness measures it end-to-end on the city scene (3.2k instances,
divergent materials) against sort=none and sort=octant.

Usage: python tools/profile_matsort_ab.py [spp]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    import dataclasses
    from rtxpt_tpu.models.renderer import Renderer, reference_config
    from rtxpt_tpu.scene import envmap as EM, procedural

    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    W, H = int(os.environ.get("AB_W", "800")), \
        int(os.environ.get("AB_H", "450"))
    host = procedural.build_city().finish()
    cam = procedural.city_camera(W, H)
    env = EM.bake_procedural_sky(height=64)
    base = reference_config(max_bounces=4, max_diffuse_bounces=3,
                            nee_distant_samples=1, nee_local_samples=1)

    means = {}
    for sort in ("none", "octant", "material"):
        cfg = dataclasses.replace(base, wavefront_sort=sort,
                                  wavefront_compaction=(sort == "none"))
        r = Renderer(host, cam, cfg, env_radiance=env)
        img = np.asarray(r.render(W, H, spp))       # compile + warm
        means[sort] = float(img.mean())
        best = 1e9
        for _ in range(2):
            r.accum = None
            t0 = time.time()
            np.asarray(r.render(W, H, spp))
            best = min(best, (time.time() - t0) / spp)
        print(f"{sort:9s} {best*1e3:8.1f} ms/sample "
              f"({W*H/best/1e6:.3f} Mpaths/s)  mean={means[sort]:.5f}",
              flush=True)
    # all sorts compute the same estimator
    vals = list(means.values())
    assert max(vals) - min(vals) < 0.02 * max(vals), means


if __name__ == "__main__":
    main()
