"""Chip A/B: dense-MT CLUSTER=32 vs 64 kernel timings + the full render
with the consolidated bsdf_sample mixture pdf."""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

SNIPPET = r"""
import os, sys, time
sys.path.insert(0, %(root)r)
import numpy as np
import jax, jax.numpy as jnp
from rtxpt_tpu.models.renderer import Renderer, reference_config
from rtxpt_tpu.ops import mt_dense
from rtxpt_tpu.pt import integrator
from rtxpt_tpu.scene import envmap as EM, procedural
from rtxpt_tpu import config as C

W, H = 800, 600
host = procedural.build_programmer_art().finish()
cam = procedural.default_camera(W, H)
base = reference_config(max_bounces=6, max_diffuse_bounces=4,
                        nee_distant_samples=1, nee_local_samples=1)
r0 = Renderer(host, cam, base,
              env_radiance=EM.bake_procedural_sky(height=64))
yy, xx = np.mgrid[0:H, 0:W]
px = jnp.asarray(xx.reshape(-1).astype(np.uint32))
py = jnp.asarray(yy.reshape(-1).astype(np.uint32))
consts = C.default_constants(0)
p0 = integrator.init_paths(cam, px, py, base, consts, 0)

def timeit(fn, *args, reps=8):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / reps

t = timeit(jax.jit(lambda o, d, a: mt_dense.trace_closest(
    r0.dense, o, d, active=a).t), p0.origin, p0.direction, p0.active)
t2 = timeit(jax.jit(lambda o, d, a: jnp.sum(mt_dense.trace_anyhit(
    r0.dense, o, d, t_max=100.0, active=a))),
    jnp.tile(p0.origin, (2, 1)), jnp.tile(p0.direction, (2, 1)),
    jnp.tile(p0.active, 2))
print(f"CLUSTER={mt_dense.CLUSTER}: closest {t*1e3:6.2f} ms  "
      f"anyhit(2n) {t2*1e3:6.2f} ms", flush=True)

if os.environ.get("AB_FULL") == "1":
    t0 = time.time()
    np.asarray(r0.render(W, H, 6))
    c = time.time() - t0
    r0.accum = None
    t0 = time.time()
    np.asarray(r0.render(W, H, 6))
    dt = (time.time() - t0) / 6
    print(f"full 6-bounce: {dt*1e3:7.0f} ms/sample "
          f"({W*H/dt/1e6:.3f} Mpaths/s)  [compile+1 {c:.0f}s]", flush=True)
"""


def main():
    root = os.path.join(HERE, "..")
    for cluster, full in (("32", "0"), ("64", "1")):
        env = dict(os.environ, RTXPT_MT_CLUSTER=cluster, AB_FULL=full)
        subprocess.run([sys.executable, "-c", SNIPPET % {"root": root}],
                       env=env, check=False)


if __name__ == "__main__":
    main()
