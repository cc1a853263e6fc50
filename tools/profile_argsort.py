"""Cost of an in-jit ray sort at wavefront scale: key build + argsort +
gather(o,d,tmax,act) + scatter-back(t,prim,uv) on the chip."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print("devices:", jax.devices(), flush=True)
    r = np.random.default_rng(3)
    for n in (480_256, 960_512):
        o = jnp.asarray(r.uniform(-5, 5, (n, 3)), jnp.float32)
        d = jnp.asarray(r.normal(size=(n, 3)), jnp.float32)
        tm = jnp.full((n,), 1e30, jnp.float32)
        act = jnp.asarray(r.random(n) > 0.3)

        @jax.jit
        def key_sort_gather(o, d, tm, act):
            q = jnp.clip((o + 5.0) * (127.0 / 10.0), 0, 127).astype(
                jnp.uint32)

            def part7(x):
                x = (x | (x << 8)) & jnp.uint32(0x0100F00F)
                x = (x | (x << 4)) & jnp.uint32(0x010C30C3)
                x = (x | (x << 2)) & jnp.uint32(0x09249249)
                return x
            m = part7(q[:, 0]) | (part7(q[:, 1]) << jnp.uint32(1)) \
                | (part7(q[:, 2]) << jnp.uint32(2))
            octant = ((d[:, 0] > 0).astype(jnp.uint32)
                      | ((d[:, 1] > 0).astype(jnp.uint32) << 1)
                      | ((d[:, 2] > 0).astype(jnp.uint32) << 2))
            key = (octant << jnp.uint32(21)) | m
            order = jnp.argsort(key)
            os_ = o[order]
            ds_ = d[order]
            tms = tm[order]
            acts = act[order]
            # fake outputs to scatter back
            t = os_[:, 0] + ds_[:, 0] + tms
            prim = (acts).astype(jnp.int32)
            inv = jnp.zeros((n,), jnp.int32).at[order].set(
                jnp.arange(n, dtype=jnp.int32))
            return t[inv], prim[inv]

        out = key_sort_gather(o, d, tm, act)
        np.asarray(out[0])
        t0 = time.perf_counter()
        for _ in range(8):
            out = key_sort_gather(o, d, tm, act)
        np.asarray(out[0])
        dt = (time.perf_counter() - t0) / 8
        print(f"n={n}: sort+gather+scatter {dt*1e3:7.2f} ms", flush=True)

        # argsort alone
        @jax.jit
        def argsort_only(d):
            key = (d[:, 0] * 1e6).astype(jnp.int32)
            return jnp.argsort(key)
        oo = argsort_only(d)
        np.asarray(oo)
        t0 = time.perf_counter()
        for _ in range(8):
            oo = argsort_only(d)
        np.asarray(oo)
        print(f"n={n}: argsort alone      "
              f"{(time.perf_counter()-t0)/8*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
