"""End-to-end A/B of env-baked kernel variants on the production
reference render (800x600, 8spp regen batch). Each variant runs in a
subprocess so import-time env constants re-bake.

    python tools/profile_e2e_ab.py                 # sweep
    python tools/profile_e2e_ab.py --one           # child mode
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

W, H, SPP = 800, 600, 8


def child():
    import numpy as np
    from rtxpt_tpu.models.renderer import Renderer, reference_config
    from rtxpt_tpu.scene import envmap as EM, procedural

    cfg = reference_config(max_bounces=6, max_diffuse_bounces=4,
                           nee_distant_samples=1, nee_local_samples=1)
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(W, H)
    r = Renderer(host, cam, cfg,
                 env_radiance=EM.bake_procedural_sky(height=64))
    t0 = time.time()
    img = np.asarray(r.render(W, H, SPP))
    compile_s = time.time() - t0
    t0 = time.time()
    img = np.asarray(r.render(W, H, SPP))
    dt = (time.time() - t0) / SPP
    print("RESULT " + json.dumps({
        "ms_per_sample": round(dt * 1e3, 1),
        "mpaths": round(W * H / dt / 1e6, 3),
        "compile_s": round(compile_s, 1),
        "img_mean": float(img.mean()),
    }), flush=True)


VARIANTS = [
    ("base", {"RTXPT_MT_ANYHIT_EARLY": "0"}),
    ("anyearly", {"RTXPT_MT_ANYHIT_EARLY": "1"}),
    ("sign_anyearly", {"RTXPT_MT_EPILOGUE": "sign",
                       "RTXPT_MT_ANYHIT_EARLY": "1"}),
    ("sign_nogate_anyearly", {"RTXPT_MT_EPILOGUE": "sign",
                              "RTXPT_MT_NOGATE": "1",
                              "RTXPT_MT_ANYHIT_EARLY": "1"}),
]


def main():
    if "--one" in sys.argv:
        child()
        return
    names = sys.argv[1:] or [v[0] for v in VARIANTS]
    base_mean = None
    for tag, env in VARIANTS:
        if tag not in names:
            continue
        e = dict(os.environ, **env)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one"],
            env=e, capture_output=True, text=True, timeout=1800)
        line = [l for l in p.stdout.splitlines()
                if l.startswith("RESULT ")]
        if not line:
            print(f"{tag}: FAILED\n{p.stdout[-500:]}\n{p.stderr[-500:]}")
            continue
        r = json.loads(line[0][7:])
        if base_mean is None:
            base_mean = r["img_mean"]
        drift = abs(r["img_mean"] - base_mean) / max(base_mean, 1e-9)
        print(f"{tag:22s} {r['ms_per_sample']:7.1f} ms/sample "
              f"{r['mpaths']:6.3f} Mpaths/s  compile {r['compile_s']:5.0f}s"
              f"  img_drift {drift:.2e}", flush=True)


if __name__ == "__main__":
    main()
