"""Regen multi-stage wavefront compaction (round 5) is a pure
scheduling change: the same (pixel, sample) work runs on the same RNG
streams, just packed into narrower stages as lanes exhaust their spp —
so the accumulated image must match the uncompacted regen loop to float
noise, lane for lane."""
import dataclasses
import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rtxpt_tpu import config as C
from rtxpt_tpu.models.renderer import Renderer, reference_config
from rtxpt_tpu.pt import integrator
from rtxpt_tpu.scene import envmap as EM, procedural


@pytest.mark.slow
def test_regen_multistage_compaction_exact():
    W, H = 160, 120     # 19200 lanes > wavefront_compaction_min 16384
    cfg = reference_config(max_bounces=4, max_diffuse_bounces=3,
                           nee_distant_samples=1, nee_local_samples=1)
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(W, H)
    r = Renderer(host, cam, cfg,
                 env_radiance=EM.bake_procedural_sky(height=32))
    yy, xx = np.mgrid[0:H, 0:W]
    px = jnp.asarray(xx.reshape(-1).astype(np.uint32))
    py = jnp.asarray(yy.reshape(-1).astype(np.uint32))
    consts = C.default_constants(0)
    cam2 = cam._replace(jitter=jnp.zeros(2, jnp.float32),
                        viewport=jnp.asarray([W, H], jnp.float32))
    f_on = jax.jit(functools.partial(integrator.render_wavefront,
                                     cfg=cfg, spp=4))
    cfg_off = dataclasses.replace(cfg, wavefront_compaction=False)
    f_off = jax.jit(functools.partial(integrator.render_wavefront,
                                      cfg=cfg_off, spp=4))
    a = np.asarray(f_on(r.assets, cam2, px, py, consts))
    b = np.asarray(f_off(r.assets, cam2, px, py, consts))
    assert np.isfinite(a).all()
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
