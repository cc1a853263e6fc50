"""In-process INTERLEAVED end-to-end A/B of dense-MT kernel variants on
the production 800x600 8spp regen render.

Each variant gets its own Renderer (per-instance jit closures), with the
mt_dense module globals set around its first (tracing) render so the
variant bakes into that renderer's program. Timed batches then interleave
round-robin — the only reliable protocol on the axon tunnel, where both
cross-process and across-minutes timings drift up to 2x.

    python tools/profile_e2e_lab.py [rounds]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

W, H, SPP = 800, 600, 8

# tag -> dict of mt_dense module globals
VARIANTS = [
    ("old", dict(PALLAS_PREPASS=False, ANYHIT_EARLY=False,
                 PIPELINE=False)),
    ("pprep", dict(PALLAS_PREPASS=True, ANYHIT_EARLY=False,
                   PIPELINE=False)),
    ("pprep_early", dict(PALLAS_PREPASS=True, ANYHIT_EARLY=True,
                         PIPELINE=False)),
    ("pprep_pipe", dict(PALLAS_PREPASS=True, ANYHIT_EARLY=False,
                        PIPELINE=True)),
]


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    names = set(sys.argv[2:]) or {t for t, _ in VARIANTS}
    import jax
    print("devices:", jax.devices(), flush=True)
    from rtxpt_tpu.models.renderer import Renderer, reference_config
    from rtxpt_tpu.ops import mt_dense
    from rtxpt_tpu.scene import envmap as EM, procedural

    cfg = reference_config(max_bounces=6, max_diffuse_bounces=4,
                           nee_distant_samples=1, nee_local_samples=1)
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(W, H)
    env = EM.bake_procedural_sky(height=64)

    rends = []
    ref_mean = None
    for tag, glob in VARIANTS:
        if tag not in names:
            continue
        for k, v in glob.items():
            setattr(mt_dense, k, v)
        r = Renderer(host, cam, cfg, env_radiance=env)
        t0 = time.time()
        img = np.asarray(r.render(W, H, SPP))   # trace+compile HERE
        print(f"{tag}: compile+first {time.time()-t0:.0f}s "
              f"mean={img.mean():.6f}", flush=True)
        if ref_mean is None:
            ref_mean = img.mean()
        elif abs(img.mean() - ref_mean) / ref_mean > 1e-5:
            print(f"  WARNING image drift vs first: {img.mean():.6f} "
                  f"vs {ref_mean:.6f}", flush=True)
        rends.append((tag, r))

    res = {t: [] for t, _ in rends}
    for rd in range(rounds):
        for tag, r in rends:
            t0 = time.time()
            np.asarray(r.render(W, H, SPP))
            res[tag].append((time.time() - t0) / SPP * 1e3)
        print(f"round {rd}: " + " | ".join(
            f"{t}={res[t][-1]:.0f}" for t, _ in rends), flush=True)

    print("---- medians", flush=True)
    for tag, _ in rends:
        m = float(np.median(res[tag]))
        print(f"{tag:12s} {m:7.1f} ms/sample = "
              f"{W*H/m*1e3/1e6:6.3f} Mpaths/s", flush=True)


if __name__ == "__main__":
    main()
