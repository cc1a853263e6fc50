"""Raystream re-sort A/B (round 5): does a per-bounce
morton3d(origin-cell)+octant wavefront sort pay on the dense-MT path?

Motivation (ROADMAP r5 microprofile): incoherent secondary bounces cost
57.5 cluster visits/tile vs 14.1 for coherent primaries — a tile's
traversal cost is the cluster UNION of its rays, so regrouping lanes by
scatter-origin cell shrinks every union. Cost side: one int32 argsort
(~7-10 ms at 480k) + a full-PathState gather per bounce.

Measures the reference regen render end-to-end (programmer-art, the
bench config) for sort in {none(+compaction), raystream(+/-)}.

Usage: python tools/profile_raysort_ab.py [spp]
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

    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    W, H = int(os.environ.get("AB_W", "800")), \
        int(os.environ.get("AB_H", "600"))
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(W, H)
    env = EM.bake_procedural_sky(height=64)
    base = reference_config(max_bounces=6, max_diffuse_bounces=4,
                            nee_distant_samples=1, nee_local_samples=1)

    means = {}
    variants = (("none+compact", "none", True),
                ("none", "none", False),
                ("raystream", "raystream", False))
    for name, sort, compact in variants:
        cfg = dataclasses.replace(base, wavefront_sort=sort,
                                  wavefront_compaction=compact)
        r = Renderer(host, cam, cfg, env_radiance=env)
        img = np.asarray(r.render(W, H, spp))       # compile + warm
        means[name] = float(img.mean())
        best = 1e9
        for _ in range(2):
            r.accum = None
            t0 = time.time()
            np.asarray(r.render(W, H, spp))
            best = min(best, (time.time() - t0) / spp)
        print(f"{name:13s} {best*1e3:8.1f} ms/sample "
              f"({W*H/best/1e6:.3f} Mpaths/s)  mean={means[name]:.5f}",
              flush=True)
    vals = list(means.values())
    assert max(vals) - min(vals) < 0.02 * max(vals), means


if __name__ == "__main__":
    main()
