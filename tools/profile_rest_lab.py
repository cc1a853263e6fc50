"""Interleaved in-process attribution of the NON-trace ~88 ms/sample
(the 'rest' from tools/profile_r5split.py) on the production 800x600
8spp regen render.

Each variant monkeypatches ONE subsystem to a near-zero-cost stub around
its renderer's first (tracing) render, so the stub bakes into that
renderer's compiled program; timed batches then interleave round-robin
(the only trustworthy protocol on the axon tunnel — ~2x drift both
cross-process and across minutes; tools/profile_e2e_lab.py).

Variants:
  full      production program
  stubsurf  shading.load_surface runs at 8 lanes, rows broadcast to N
            (removes the gather/interp cost, keeps shapes + trace stats)
  stubenv   envmap.eval_dir -> zeros (removes the miss-radiance bilinear
            env fetch at full wavefront width, integrator.py:515)
  stubpdf   integrator._distant_pdf -> uniform constant (removes the
            mip-descent pdf eval used for scatter MIS)
  xlagather RTXPT_MXU_GATHER=0 (in-loop MXU one-hot vs XLA row gathers
            at today's operating point; re-check of the round-3 A/B)

    python tools/profile_rest_lab.py [rounds] [variant ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

W, H, SPP = 800, 600, 8


def main():
    args = sys.argv[1:]
    rounds = int(args[0]) if args and args[0].isdigit() else 6
    names = set(a for a in args if not a.isdigit()) or {
        "full", "stubsurf", "stubenv", "stubpdf", "xlagather"}
    import jax
    import jax.numpy as jnp
    print("devices:", jax.devices(), flush=True)
    from rtxpt_tpu.models.renderer import Renderer, reference_config
    from rtxpt_tpu.pt import integrator, shading
    from rtxpt_tpu.scene import envmap as EM, procedural

    cfg = reference_config(max_bounces=6, max_diffuse_bounces=4,
                           nee_distant_samples=1, nee_local_samples=1)
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(W, H)
    env = EM.bake_procedural_sky(height=64)

    orig_surf = shading.load_surface
    orig_eval = EM.eval_dir
    orig_pdf = integrator._distant_pdf

    def surf_tiny(scene, prim, bary, ray_dir, outside_ior=None,
                  cone_width=None):
        n = prim.shape[0]
        k = min(8, n)
        out = orig_surf(
            scene, prim[:k], bary[:k], ray_dir[:k],
            None if outside_ior is None else outside_ior[:k],
            None if cone_width is None else cone_width[:k])
        return jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a[:1], (n,) + a.shape[1:]), out)

    def setup(tag):
        """Install the variant's stub; returns a teardown fn."""
        if tag == "stubsurf":
            shading.load_surface = surf_tiny
            return lambda: setattr(shading, "load_surface", orig_surf)
        if tag == "stubenv":
            EM.eval_dir = lambda e, d: jnp.zeros(d.shape[:-1] + (3,))
            return lambda: setattr(EM, "eval_dir", orig_eval)
        if tag == "stubpdf":
            integrator._distant_pdf = lambda a, c, d: jnp.full(
                d.shape[:-1], 1.0 / (4.0 * np.pi), jnp.float32)
            return lambda: setattr(integrator, "_distant_pdf", orig_pdf)
        if tag == "xlagather":
            os.environ["RTXPT_MXU_GATHER"] = "0"
            return lambda: os.environ.pop("RTXPT_MXU_GATHER", None)
        return lambda: None

    rends = []
    full_mean = None
    for tag in ["full", "stubsurf", "stubenv", "stubpdf", "xlagather"]:
        if tag not in names:
            continue
        teardown = setup(tag)
        try:
            r = Renderer(host, cam, cfg, env_radiance=env)
            t0 = time.time()
            img = np.asarray(r.render(W, H, SPP))
        finally:
            teardown()
        print(f"{tag}: compile+first {time.time() - t0:.0f}s "
              f"mean={img.mean():.6f}", flush=True)
        if tag == "full":
            full_mean = img.mean()
        elif tag == "xlagather" and full_mean is not None and \
                abs(img.mean() - full_mean) / full_mean > 1e-5:
            print(f"  WARNING xlagather image drift: {img.mean():.6f} "
                  f"vs {full_mean:.6f}", flush=True)
        rends.append((tag, r))

    res = {t: [] for t, _ in rends}
    for rd in range(rounds):
        for tag, r in rends:
            t0 = time.time()
            np.asarray(r.render(W, H, SPP))
            res[tag].append((time.time() - t0) / SPP * 1e3)
        print(f"round {rd}: " + " | ".join(
            f"{t}={res[t][-1]:.0f}" for t, _ in rends), flush=True)

    print("---- medians (ms/sample; delta vs full = that subsystem's "
          "in-loop cost)", flush=True)
    med = {t: float(np.median(v)) for t, v in res.items()}
    base = med.get("full")
    for tag, _ in rends:
        d = "" if base is None or tag == "full" else \
            f"  delta {base - med[tag]:+.1f}"
        print(f"{tag:10s} {med[tag]:7.1f}{d}", flush=True)


if __name__ == "__main__":
    main()
