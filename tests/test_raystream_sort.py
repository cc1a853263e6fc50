"""Raystream wavefront re-sort (round 5) is a pure scheduling change:
lane permutation never touches per-lane math (RNG streams are seeded
from (pixel, vertex, sample), traversal results are per-ray
deterministic regardless of tile grouping), so a regen render with
wavefront_sort="raystream" must match sort "none" to float noise.

This is the TPU translation of SER's hit-coherence reorder
(NvReorderThread, RTXPT/Sample.hlsl:122-131): the argsort+gather is the
reorder unit; the win shows up as smaller per-tile cluster unions in
ops/mt_dense (A/B harness: tools/profile_raysort_ab.py)."""
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
def test_regen_raystream_sort_exact():
    W, H = 96, 64
    cfg = reference_config(max_bounces=4, max_diffuse_bounces=3,
                           nee_distant_samples=1, nee_local_samples=1)
    # sort composes with regen only through the plain while_loop (the
    # staged compaction unwind is positional); keep compaction off on
    # BOTH sides so the loops are structurally identical
    cfg = dataclasses.replace(cfg, wavefront_compaction=False)
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
    cfg_rs = dataclasses.replace(cfg, wavefront_sort="raystream")
    f_none = jax.jit(functools.partial(integrator.render_wavefront,
                                       cfg=cfg, spp=2))
    f_rs = jax.jit(functools.partial(integrator.render_wavefront,
                                     cfg=cfg_rs, spp=2))
    a = np.asarray(f_none(r.assets, cam2, px, py, consts))
    b = np.asarray(f_rs(r.assets, cam2, px, py, consts))
    assert np.isfinite(b).all()
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
