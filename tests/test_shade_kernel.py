"""Fused shade+NEE megakernel (pt/shade_kernel.py) equivalence: the
Pallas kernel path (interpret mode on CPU) must reproduce the XLA bounce
math. RNG draws happen outside in the same order, so sequences are
identical; the component-form math uses the same formulas, so the render
must match to float-reassociation noise."""
import numpy as np
import pytest

from rtxpt_tpu.models.renderer import Renderer, reference_config
from rtxpt_tpu.scene import envmap as EM, procedural

W, H = 32, 24


def _render(monkeypatch, kernel: bool, spp: int = 2, **cfg_kw):
    if kernel:
        monkeypatch.setenv("RTXPT_SHADE_KERNEL", "1")
        monkeypatch.setenv("RTXPT_SHADE_KERNEL_INTERPRET", "1")
    else:
        monkeypatch.setenv("RTXPT_SHADE_KERNEL", "0")
        monkeypatch.delenv("RTXPT_SHADE_KERNEL_INTERPRET", raising=False)
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(W, H)
    kw = dict(max_bounces=3, max_diffuse_bounces=2,
              nee_distant_samples=1, nee_local_samples=1)
    kw.update(cfg_kw)
    cfg = reference_config(**kw)
    r = Renderer(host, cam, cfg,
                 env_radiance=EM.bake_procedural_sky(height=32))
    return np.asarray(r.render(W, H, spp))


def test_shade_kernel_matches_xla(monkeypatch):
    ref = _render(monkeypatch, kernel=False)
    got = _render(monkeypatch, kernel=True)
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_shade_kernel_matches_xla_no_local(monkeypatch):
    """Distant-only NEE variant (different plane layout)."""
    ref = _render(monkeypatch, kernel=False, nee_local_samples=0)
    got = _render(monkeypatch, kernel=True, nee_local_samples=0)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_shade_kernel_matches_xla_multi_sample(monkeypatch):
    """2 distant + 2 local NEE samples (the SampleUI.h:149-152 default
    counts) — exercises the generalized per-sample plane layout."""
    ref = _render(monkeypatch, kernel=False, spp=1,
                  nee_distant_samples=2, nee_local_samples=2)
    got = _render(monkeypatch, kernel=True, spp=1,
                  nee_distant_samples=2, nee_local_samples=2)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def _render_fill(monkeypatch, kernel: bool):
    from rtxpt_tpu.models.realtime import RealtimeRenderer
    from rtxpt_tpu.models.renderer import realtime_config
    if kernel:
        monkeypatch.setenv("RTXPT_SHADE_KERNEL", "1")
        monkeypatch.setenv("RTXPT_SHADE_KERNEL_INTERPRET", "1")
    else:
        monkeypatch.setenv("RTXPT_SHADE_KERNEL", "0")
        monkeypatch.delenv("RTXPT_SHADE_KERNEL_INTERPRET", raising=False)
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(W, H)
    cfg = realtime_config(use_restir_di=False, use_restir_gi=False,
                          denoiser_enabled=False, use_stable_planes=True,
                          max_bounces=3, max_diffuse_bounces=2,
                          nee_distant_samples=1, nee_local_samples=1)
    r = RealtimeRenderer(host, cam, cfg,
                         env_radiance=EM.bake_procedural_sky(height=32))
    out = [np.asarray(r.render_frame(W, H, taa=False, denoise=False))
           for _ in range(2)]
    return out[1]


def test_shade_kernel_matches_xla_fill(monkeypatch):
    """FILL-mode wavefront (stable-planes realtime frame): the fill
    variant exports emission + split NEE for the plane routing — the
    frame must match the XLA path."""
    ref = _render_fill(monkeypatch, kernel=False)
    got = _render_fill(monkeypatch, kernel=True)
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)
