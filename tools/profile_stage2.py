"""Stage-2 (denoise+TAA) internals on the chip: time the temporal
reprojection gather, the a-trous cascade and TAA separately at the
realtime render size — drives the stage-2 optimization (VERDICT r4
target <30 ms at 360p)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=10):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / reps


def main():
    from rtxpt_tpu.denoise import relax
    from rtxpt_tpu.post import taa as taa_mod

    W, H = (1920, 1080) if os.environ.get("RTXPT_1080") == "1" \
        else (640, 360)
    key = jax.random.PRNGKey(0)
    rad = jax.random.uniform(key, (H, W, 3))
    nrm = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (H, W, 3))
    z = jnp.full((H, W), 5.0)
    mot = jax.random.uniform(key, (H, W, 2)) * 4.0 - 2.0
    state = relax.DenoiserState.create(H, W)

    t = timeit(jax.jit(lambda s, r, m: jax.tree_util.tree_leaves(
        relax.temporal_accumulate(s, r, nrm, z, m))[0]), state, rad, mot)
    print(f"temporal_accumulate ({W}x{H}):  {t*1e3:8.2f} ms", flush=True)

    var = jnp.abs(rad[..., 0])
    t = timeit(jax.jit(lambda r, v: relax.atrous_filter(
        r, v, nrm, z, iterations=4)), rad, var)
    print(f"atrous x4 (diffuse):           {t*1e3:8.2f} ms", flush=True)
    t = timeit(jax.jit(lambda r, v: relax.atrous_filter(
        r, v, nrm, z, roughness=var, iterations=3)), rad, var)
    print(f"atrous x3 (specular):          {t*1e3:8.2f} ms", flush=True)

    t = timeit(jax.jit(lambda r, m: relax.denoise(
        None, r, nrm, z, m)[0]), rad, mot)
    print(f"denoise full (1 channel):      {t*1e3:8.2f} ms", flush=True)

    ts = taa_mod.TAAState(history=rad, valid=jnp.asarray(True))
    t = timeit(jax.jit(lambda s, r, m: taa_mod.resolve(s, r, m)[0]),
               ts, rad, mot)
    print(f"taa resolve:                   {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
