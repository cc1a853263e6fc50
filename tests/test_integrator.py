"""End-to-end integrator correctness.

The two oracles from SURVEY.md section 4:
  1. White furnace: constant env + no geometry -> image == env radiance.
  2. MIS A/B (BASELINE config 2): NEE on vs off must converge to the same
     image (the estimator changes, the integral doesn't).
"""
import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from rtxpt_tpu import config as C
from rtxpt_tpu.models.renderer import Renderer, reference_config
from rtxpt_tpu.scene import envmap as EM
from rtxpt_tpu.scene import procedural

W, H = 48, 32


def _renderer(cfg, sky_scale=1.0, diffuse_only=False):
    host = procedural.build_programmer_art(diffuse_only=diffuse_only).finish()
    cam = procedural.default_camera(W, H)
    env = EM.bake_procedural_sky(height=64, sky_scale=sky_scale,
                                 sun_radiance=(40.0, 38.0, 33.0))
    return Renderer(host, cam, cfg, env_radiance=env)


def test_white_furnace_no_geometry():
    """Empty scene + unit env: every pixel must equal 1 exactly after one
    sample (camera ray -> miss -> env with MIS weight 1)."""
    from rtxpt_tpu.scene.build import SceneBuilder
    sb = SceneBuilder()
    sb.add_material()
    host = sb.finish()
    cam = procedural.default_camera(W, H)
    env = jnp.ones((64, 128, 3), jnp.float32)
    r = Renderer(host, cam, reference_config(), env_radiance=env)
    img = np.asarray(r.render(W, H, 1))
    np.testing.assert_allclose(img, 1.0, atol=1e-5)


@pytest.mark.slow
def test_nee_on_off_converge_to_same_image():
    """BASELINE config 2 oracle: MIS on/off A/B."""
    spp = 48
    cfg_on = reference_config(nee_distant_samples=1, nee_local_samples=1,
                              max_bounces=4, max_diffuse_bounces=3,
                              enable_russian_roulette=False)
    cfg_off = dataclasses.replace(cfg_on, nee_enabled=False)
    r_on = _renderer(cfg_on)
    r_off = _renderer(cfg_off)
    img_on = np.asarray(r_on.render(W, H, spp))
    img_off = np.asarray(r_off.render(W, H, spp))
    # Means must agree within Monte-Carlo noise; NEE-off is high variance,
    # so compare downsampled means and global mean.
    m_on, m_off = img_on.mean(), img_off.mean()
    assert abs(m_on - m_off) / max(m_on, m_off) < 0.08, (m_on, m_off)
    # 8x8 block means
    bs_on = img_on.reshape(H // 8, 8, W // 8, 8, 3).mean((1, 3, 4))
    bs_off = img_off.reshape(H // 8, 8, W // 8, 8, 3).mean((1, 3, 4))
    rel = np.abs(bs_on - bs_off) / (0.5 * (bs_on + bs_off) + 5e-2)
    assert np.median(rel) < 0.25, np.median(rel)


@pytest.mark.slow
def test_no_nans_full_materials():
    cfg = reference_config(max_bounces=6)
    r = _renderer(cfg)
    img = np.asarray(r.render(W, H, 2))
    assert np.isfinite(img).all()
    assert (img >= 0).all()
    assert img.mean() > 0.01  # produced light


def test_deterministic():
    """Same sample index -> bit-identical image (stateless RNG).
    Fast-tier estimator gate (ADVICE r2: keep at least one cheap
    correctness oracle in the default suite)."""
    cfg = reference_config(max_bounces=2, nee_local_samples=1,
                           nee_distant_samples=1)
    r1 = _renderer(cfg)
    r2 = _renderer(cfg)
    a = np.asarray(r1.render_sample(W, H, 5))
    b = np.asarray(r2.render_sample(W, H, 5))
    np.testing.assert_array_equal(a, b)


def test_glass_sphere_transmits_light():
    """A camera ray through the glass sphere must pick up environment
    radiance (delta transmission chains work)."""
    cfg = reference_config(max_bounces=8, nee_distant_samples=1,
                           nee_local_samples=0)
    r = _renderer(cfg)
    img = np.asarray(r.render(W, H, 4))
    assert np.isfinite(img).all()
    # glass sphere is at (1.3, 0.55, 0.9); with the default camera it's in
    # the right half of the frame; just assert global sanity here
    assert img.mean() > 0.01


def _compaction_ab(w, h, threshold, **cfg_over):
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(w, h)
    env = EM.bake_procedural_sky(height=32, sun_radiance=(40.0, 38.0, 33.0))
    cfg = reference_config(wavefront_compaction_min=threshold,
                           **{"max_bounces": 4, "nee_distant_samples": 1,
                              "nee_local_samples": 1, **cfg_over})
    a = np.asarray(Renderer(host, cam, cfg, env_radiance=env)
                   .render(w, h, 1, jitter_aa=False))
    cfg_nc = dataclasses.replace(cfg, wavefront_compaction=False)
    b = np.asarray(Renderer(host, cam, cfg_nc, env_radiance=env)
                   .render(w, h, 1, jitter_aa=False))
    assert np.isfinite(a).all()
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


@pytest.mark.slow   # 154 s: two full bounce-loop compiles; the
def test_tail_compaction_equivalence():   # compacted path is implicitly
    # exercised by every realtime/golden test in the default tier
    """Wavefront tail compaction (live set gathered to n//8 lanes and
    the bounce loop continued at narrow width) must not change the
    image: same per-lane ops, same RNG streams, only the width of the
    dispatch shrinks. Threshold lowered so the 64x48 wavefront crosses
    it; spp=1 avoids regeneration (which disables compaction)."""
    _compaction_ab(64, 48, threshold=1024, max_bounces=3,
                   nee_local_samples=0)


@pytest.mark.slow
def test_tail_compaction_equivalence_production_width():
    """Same A/B at the production threshold (128x128 = 16384 lanes)."""
    _compaction_ab(128, 128, threshold=16384)
