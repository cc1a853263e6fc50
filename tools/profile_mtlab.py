"""In-process interleaved A/B of dense-MT kernel structure variants.

Cross-process timings on the axon tunnel drift up to 2x run-to-run
(tools/profile_mtvariants.py round-5 logs), so this lab compiles ALL
variants side by side (the `variant` static arg of _trace_dense) and
times them INTERLEAVED round-robin; per-variant medians cancel drift.

    python tools/profile_mtlab.py [rounds]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

N = 480 * 1024

#  (EPILOGUE, PIPELINE, NOGATE, ANYHIT_EARLY, PROBE, PALLAS_PREPASS)
VARIANTS = [
    ("base", ("classic", False, False, False, "", False)),
    ("pprep", ("classic", False, False, False, "", True)),
    ("anyearly", ("classic", False, False, True, "", True)),
    ("pipe", ("classic", True, False, False, "", True)),
    ("pipe_early", ("classic", True, False, True, "", True)),
]


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    print("devices:", jax.devices(), flush=True)
    from rtxpt_tpu import config as C
    from rtxpt_tpu.models.renderer import Renderer, reference_config
    from rtxpt_tpu.ops import mt_dense
    from rtxpt_tpu.pt import integrator
    from rtxpt_tpu.scene import envmap as EM, procedural

    cfg = reference_config()
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(800, 600)
    r = Renderer(host, cam, cfg,
                 env_radiance=EM.bake_procedural_sky(height=64))
    dmt = r.assets.dense
    assert dmt is not None

    px = jnp.arange(N, dtype=jnp.uint32) % 800
    py = (jnp.arange(N, dtype=jnp.uint32) // 800) % 600
    p0 = integrator.init_paths(cam, px, py, cfg,
                               C.default_constants(0), 0)
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

    cases = {
        "coh": lambda v: mt_dense.trace_closest(
            dmt, p0.origin, p0.direction, active=act, variant=v),
        "inc": lambda v: mt_dense.trace_closest(
            dmt, o_inc, d_inc, active=act, variant=v),
        "inc30": lambda v: mt_dense.trace_closest(
            dmt, o_inc, d_inc, active=act30, variant=v),
        "any": lambda v: mt_dense.trace_anyhit(
            dmt, o_inc, d_inc, t_max=3.0, active=act, variant=v),
    }

    # compile + correctness fingerprint per variant
    ref = None
    for tag, v in VARIANTS:
        for cn, fn in cases.items():
            out = fn(v)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
        h = cases["inc"](v)
        fp = (int((np.asarray(h.prim) >= 0).sum()),
              float(np.asarray(h.t)[np.asarray(h.prim) >= 0].mean()))
        if ref is None:
            ref = fp
        match = "OK" if (fp[0] == ref[0]
                         and abs(fp[1] - ref[1]) < 1e-5) else \
            f"MISMATCH {fp} vs {ref}"
        print(f"compiled {tag}: fp={fp[0]},{fp[1]:.4f} {match}",
              flush=True)

    res = {t: {c: [] for c in cases} for t, _ in VARIANTS}
    for rd in range(rounds):
        for tag, v in VARIANTS:
            for cn, fn in cases.items():
                t0 = time.perf_counter()
                for _ in range(3):
                    out = fn(v)
                np.asarray(jax.tree_util.tree_leaves(out)[0])
                res[tag][cn].append(
                    (time.perf_counter() - t0) / 3 * 1e3)
        print(f"round {rd}: " + " | ".join(
            f"{t} inc={res[t]['inc'][-1]:.1f}" for t, _ in VARIANTS),
            flush=True)

    print("---- medians (ms)", flush=True)
    for tag, _ in VARIANTS:
        m = {c: float(np.median(res[tag][c])) for c in cases}
        print(f"{tag:10s} coh {m['coh']:7.1f}  inc {m['inc']:7.1f}  "
              f"inc30 {m['inc30']:7.1f}  any {m['any']:7.1f}",
              flush=True)


if __name__ == "__main__":
    main()
