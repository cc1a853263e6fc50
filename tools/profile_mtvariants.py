"""Dense-MT kernel variant lab: time trace_closest / trace_anyhit on
representative coherent + incoherent ray sets under env-baked kernel
variants (TILE, PRECISION, PROBE, EPILOGUE). Each variant runs in a
SUBPROCESS so import-time env constants re-bake; the parent prints a
table.

    python tools/profile_mtvariants.py              # run the sweep
    python tools/profile_mtvariants.py --one <tag>  # child mode
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

N = 480 * 1024


def child():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from rtxpt_tpu.ops import mt_dense
    from rtxpt_tpu.models.renderer import reference_config
    from rtxpt_tpu.pt import integrator
    from rtxpt_tpu import config as C
    from rtxpt_tpu.scene import procedural

    host = procedural.build_programmer_art().finish()
    scene = host
    # build rays straight from the scene geometry (no renderer: keep the
    # child cheap). Coherent: camera primaries. Incoherent: points in
    # the scene bbox + hash directions (the post-bounce regime).
    cam = procedural.default_camera(800, 600)
    cfg = reference_config()
    px = jnp.arange(N, dtype=jnp.uint32) % 800
    py = (jnp.arange(N, dtype=jnp.uint32) // 800) % 600
    p0 = integrator.init_paths(cam, px, py, cfg,
                               C.default_constants(0), 0)
    dmt = None
    from rtxpt_tpu.models.renderer import Renderer
    from rtxpt_tpu.scene import envmap as EM
    r = Renderer(host, cam, cfg, env_radiance=EM.bake_procedural_sky(
        height=64))
    dmt = r.assets.dense
    assert dmt is not None, "programmer-art must take the dense-MT tier"

    rng = np.random.RandomState(7)
    lo = np.asarray(dmt.aabb)[:, 0:3].min(0)
    hi = np.asarray(dmt.aabb)[:, 3:6].max(0)
    o_inc = jnp.asarray(lo + (hi - lo) * rng.rand(N, 3).astype(np.float32)
                        * 0.8 + 0.1 * (hi - lo))
    d = rng.randn(N, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d_inc = jnp.asarray(d)
    act = jnp.ones((N,), bool)
    act30 = jnp.asarray(rng.rand(N) < 0.3)

    def timed(f, *a, reps=6):
        np.asarray(jax.tree_util.tree_leaves(f(*a))[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        return (time.perf_counter() - t0) / reps * 1e3

    res = {}
    res["closest_coh"] = timed(
        lambda: mt_dense.trace_closest(dmt, p0.origin, p0.direction,
                                       active=act))
    res["closest_inc"] = timed(
        lambda: mt_dense.trace_closest(dmt, o_inc, d_inc, active=act))
    res["closest_inc30"] = timed(
        lambda: mt_dense.trace_closest(dmt, o_inc, d_inc, active=act30))
    res["anyhit_inc"] = timed(
        lambda: mt_dense.trace_anyhit(dmt, o_inc, d_inc, t_max=3.0,
                                      active=act))
    # correctness fingerprint (hit count + mean t) so variants that
    # change math get caught immediately
    h = mt_dense.trace_closest(dmt, o_inc, d_inc, active=act)
    res["fp_hits"] = int((np.asarray(h.prim) >= 0).sum())
    ht = np.asarray(h.t)
    res["fp_meant"] = float(ht[np.asarray(h.prim) >= 0].mean())
    print("RESULT " + json.dumps(res), flush=True)


VARIANTS = [
    ("base", {"RTXPT_MT_ANYHIT_EARLY": "0"}),
    ("noepi", {"RTXPT_MT_PROBE": "noepi"}),
    ("nomm", {"RTXPT_MT_PROBE": "nomm"}),
    ("prec_default", {"RTXPT_MT_PRECISION": "default"}),
    ("tile512", {"RTXPT_MT_TILE": "512"}),
    ("tile2048", {"RTXPT_MT_TILE": "2048"}),
    ("sign", {"RTXPT_MT_EPILOGUE": "sign"}),
    ("nogate", {"RTXPT_MT_NOGATE": "1"}),
    ("sign_nogate", {"RTXPT_MT_EPILOGUE": "sign",
                     "RTXPT_MT_NOGATE": "1"}),
    ("sign_tile512", {"RTXPT_MT_EPILOGUE": "sign",
                      "RTXPT_MT_TILE": "512"}),
    # round-5 batch 2
    ("anyearly", {"RTXPT_MT_ANYHIT_EARLY": "1"}),
    ("pipe", {"RTXPT_MT_PIPELINE": "1",
              "RTXPT_MT_ANYHIT_EARLY": "0"}),
    ("pipe_sign", {"RTXPT_MT_PIPELINE": "1",
                   "RTXPT_MT_EPILOGUE": "sign",
                   "RTXPT_MT_ANYHIT_EARLY": "0"}),
    ("cluster32", {"RTXPT_MT_CLUSTER": "32",
                   "RTXPT_MT_ANYHIT_EARLY": "0"}),
    ("pipe_cluster32", {"RTXPT_MT_PIPELINE": "1",
                        "RTXPT_MT_CLUSTER": "32",
                        "RTXPT_MT_ANYHIT_EARLY": "0"}),
]


def main():
    if "--one" in sys.argv:
        child()
        return
    names = sys.argv[1:] or [v[0] for v in VARIANTS]
    table = {}
    for tag, env in VARIANTS:
        if tag not in names:
            continue
        e = dict(os.environ, **env)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", tag],
            env=e, capture_output=True, text=True, timeout=1200)
        line = [l for l in p.stdout.splitlines()
                if l.startswith("RESULT ")]
        if not line:
            print(f"{tag}: FAILED\n{p.stdout[-800:]}\n{p.stderr[-800:]}")
            continue
        table[tag] = json.loads(line[0][7:])
        r = table[tag]
        print(f"{tag:14s} coh {r['closest_coh']:7.1f}  "
              f"inc {r['closest_inc']:7.1f}  "
              f"inc30 {r['closest_inc30']:7.1f}  "
              f"any {r['anyhit_inc']:7.1f} ms   "
              f"hits={r['fp_hits']} meant={r['fp_meant']:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
