"""City-scene A/B: instanced TLAS-over-BLAS (ops/instanced.py
mesh-rounds) vs flattened-soup two-level bvh2l (ops/bvh2l.py bucketed
probe + sweep), each in a subprocess (import-time env). Reference-mode
1spp at a small raster first; pass W H to change.

    python tools/profile_city_ab.py [W H]
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def child():
    import numpy as np
    from rtxpt_tpu.models.renderer import Renderer, reference_config
    from rtxpt_tpu.scene import envmap as EM, procedural

    W = int(os.environ["CITY_W"])
    H = int(os.environ["CITY_H"])
    host = procedural.build_city().finish()
    cam = procedural.city_camera(W, H)
    cfg = reference_config(max_bounces=6, max_diffuse_bounces=4,
                           nee_distant_samples=1, nee_local_samples=1)
    t0 = time.time()
    r = Renderer(host, cam, cfg,
                 env_radiance=EM.bake_procedural_sky(height=64))
    build_s = time.time() - t0
    t0 = time.time()
    img = np.asarray(r.render(W, H, 1))
    compile_s = time.time() - t0
    t0 = time.time()
    img = np.asarray(r.render(W, H, 1))
    dt = time.time() - t0
    print("RESULT " + json.dumps({
        "bvh": type(r.bvh).__name__,
        "build_s": round(build_s, 1),
        "compile_s": round(compile_s, 1),
        "s_per_sample": round(dt, 2),
        "mpaths": round(W * H / dt / 1e6, 4),
        "img_mean": float(img.mean()),
    }), flush=True)


def main():
    if "--one" in sys.argv:
        child()
        return
    W = sys.argv[1] if len(sys.argv) > 1 else "640"
    H = sys.argv[2] if len(sys.argv) > 2 else "360"
    for tag, env in [("instanced", {"RTXPT_INSTANCED": "1"}),
                     ("soup_bvh2l", {"RTXPT_INSTANCED": "0"})]:
        e = dict(os.environ, CITY_W=W, CITY_H=H, **env)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one"],
            env=e, capture_output=True, text=True, timeout=2400)
        line = [l for l in p.stdout.splitlines()
                if l.startswith("RESULT ")]
        if not line:
            print(f"{tag}: FAILED\n{p.stdout[-700:]}\n{p.stderr[-700:]}")
            continue
        r = json.loads(line[0][7:])
        print(f"{tag:11s} {W}x{H}: {r['s_per_sample']:8.2f} s/sample "
              f"({r['mpaths']:.4f} Mpaths/s) build {r['build_s']}s "
              f"compile {r['compile_s']}s bvh={r['bvh']} "
              f"mean={r['img_mean']:.4f}", flush=True)


if __name__ == "__main__":
    main()
