"""Round-5 decomposition of the 212 ms/sample regen render: stub out one
subsystem at a time (monkeypatch before trace) and re-time the FULL
production render. Differences attribute wall-clock to closest-trace,
anyhit/visibility, and NEE-non-trace without touching production code.

Run variants in ONE process (tunnel rule):
    python tools/profile_r5split.py [full nonee noclosest noanyhit]
"""
import dataclasses
import sys
import time

sys.path.insert(0, __import__("os").path.join(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__)),
    ".."))

import numpy as np

W, H = 800, 600
SPP = 8


def bench(mk, tag):
    r = mk()
    t0 = time.time()
    np.asarray(r.render(W, H, SPP))
    print(f"{tag}: compile+{SPP}spp {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    np.asarray(r.render(W, H, SPP))
    dt = (time.time() - t0) / SPP
    print(f"{tag}: {dt * 1e3:.1f} ms/sample", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    print("devices:", jax.devices(), flush=True)
    from rtxpt_tpu.models.renderer import Renderer, reference_config
    from rtxpt_tpu.ops import traverse
    from rtxpt_tpu.ops.intersect import Hit
    from rtxpt_tpu.pt import visibility as VIS
    from rtxpt_tpu.scene import envmap as EM, procedural

    cfg = reference_config(max_bounces=6, max_diffuse_bounces=4,
                           nee_distant_samples=1, nee_local_samples=1)
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(W, H)
    env = EM.bake_procedural_sky(height=64)
    variants = set(sys.argv[1:]) or {"full", "nonee", "noclosest",
                                     "noanyhit"}
    res = {}

    if "full" in variants:
        res["full"] = bench(
            lambda: Renderer(host, cam, cfg, env_radiance=env), "full")

    if "nonee" in variants:
        cfg_b = dataclasses.replace(cfg, nee_distant_samples=0,
                                    nee_local_samples=0)
        res["nonee"] = bench(
            lambda: Renderer(host, cam, cfg_b, env_radiance=env), "nonee")

    orig_closest = traverse.trace_closest
    orig_vis = VIS.trace_visibility

    if "noclosest" in variants:
        def stub_closest(bvh, soup, origins, dirs, t_min=0.0, t_max=1e30,
                         active=None, leaf_size=4, dense=None):
            n = origins.shape[0]
            # pseudo-random 70% hit rate from the ray bits keeps the
            # loop's termination statistics close to the real scene
            # (rays_per_path ~2.0 closest), so iteration liveness and
            # therefore the non-trace per-iteration cost stay realistic
            b = jax.lax.bitcast_convert_type(dirs, jnp.uint32)
            h = (b[:, 0] ^ (b[:, 1] * jnp.uint32(0x9E3779B9))
                 ^ (b[:, 2] * jnp.uint32(0x85EBCA6B)))
            h = (h ^ (h >> 13)) * jnp.uint32(0xC2B2AE35)
            u = (h >> 8).astype(jnp.float32) * jnp.float32(2.0 ** -24)
            t = jnp.full((n,), 2.0, jnp.float32)
            prim = jnp.where(u < 0.7, 0, -1).astype(jnp.int32)
            uv = jnp.full((n, 2), 0.25, jnp.float32)
            return Hit(t, prim, uv)
        traverse.trace_closest = stub_closest
        try:
            res["noclosest"] = bench(
                lambda: Renderer(host, cam, cfg, env_radiance=env),
                "noclosest(stub)")
        finally:
            traverse.trace_closest = orig_closest

    if "noanyhit" in variants:
        def stub_vis(assets, origins, dirs, t_min=0.0, t_max=1e30,
                     active=None, exact=False):
            return jnp.zeros((origins.shape[0],), bool)
        VIS.trace_visibility = stub_vis
        try:
            res["noanyhit"] = bench(
                lambda: Renderer(host, cam, cfg, env_radiance=env),
                "noanyhit(stub)")
        finally:
            VIS.trace_visibility = orig_vis

    if "full" in res:
        f = res["full"] * 1e3
        print("---- attribution (ms/sample)", flush=True)
        if "noclosest" in res:
            print(f"closest trace : {f - res['noclosest'] * 1e3:8.1f}")
        if "noanyhit" in res:
            print(f"anyhit trace  : {f - res['noanyhit'] * 1e3:8.1f}")
        if "nonee" in res:
            print(f"nee total     : {f - res['nonee'] * 1e3:8.1f}")


if __name__ == "__main__":
    main()
