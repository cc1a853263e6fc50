"""CLUSTER=64 vs 128 A/B for the dense-MT kernel.

CLUSTER=128 halves the visit count (and the per-visit fixed overhead:
gate, loop control, winner commit) and doubles the matmul M-dim
(RC 256 -> 512), at the cost of coarser gating (more wasted pair tests
when only part of a big cluster overlaps the ray set) and one more
quantized winner-row bit (2^-17 rel t, selection-only).

CLUSTER is read at import (module constant baked into the build + the
kernel), so the A/B runs each variant in a subprocess and ALTERNATES
them several times to cancel the axon tunnel's ~2x slow timing drift
(tools/profile_e2e_lab.py finding); per-variant medians over the
alternations are the comparable numbers.

    python tools/profile_cluster128_ab.py [alternations] [spp]
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

W, H = 800, 600


def child():
    import numpy as np
    from rtxpt_tpu.models.renderer import Renderer, reference_config
    from rtxpt_tpu.scene import envmap as EM, procedural

    spp = int(os.environ.get("AB_SPP", "4"))
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(W, H)
    cfg = reference_config(max_bounces=6, max_diffuse_bounces=4,
                           nee_distant_samples=1, nee_local_samples=1)
    r = Renderer(host, cam, cfg,
                 env_radiance=EM.bake_procedural_sky(height=64))
    img = np.asarray(r.render(W, H, spp))          # compile + warm
    t0 = time.time()
    img = np.asarray(r.render(W, H, spp))
    dt = (time.time() - t0) / spp
    print("RESULT " + json.dumps({
        "cluster": os.environ.get("RTXPT_MT_CLUSTER", "64"),
        "ms_per_sample": round(dt * 1e3, 1),
        "img_mean": float(img.mean()),
    }), flush=True)


def main():
    if "--one" in sys.argv:
        child()
        return
    alts = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spp = sys.argv[2] if len(sys.argv) > 2 else "4"
    res = {"64": [], "128": []}
    means = {}
    for a in range(alts):
        for cl in ("64", "128"):
            e = dict(os.environ, RTXPT_MT_CLUSTER=cl, AB_SPP=spp)
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one"],
                env=e, capture_output=True, text=True, timeout=1200)
            line = [l for l in p.stdout.splitlines()
                    if l.startswith("RESULT ")]
            if not line:
                print(f"cluster={cl} alt={a}: FAILED\n{p.stdout[-400:]}"
                      f"\n{p.stderr[-400:]}", flush=True)
                continue
            r = json.loads(line[0][7:])
            res[cl].append(r["ms_per_sample"])
            means[cl] = r["img_mean"]
            print(f"alt {a} cluster={cl}: {r['ms_per_sample']} ms/sample "
                  f"mean={r['img_mean']:.5f}", flush=True)
    for cl, xs in res.items():
        if xs:
            xs = sorted(xs)
            print(f"cluster={cl}: median {xs[len(xs) // 2]} ms/sample "
                  f"over {xs} (img mean {means.get(cl):.5f})")


if __name__ == "__main__":
    main()
