"""Denoiser QUALITY gates (VERDICT r4 weak #5): the NRD slot's value is
measured, not assumed. A converged reference-mode accumulation is the
oracle; a denoised low-sample realtime frame must land within a recorded
PSNR floor of it, and must beat the RAW (denoiser-off) frame by a clear
margin — separately for ReLAX and ReBLUR (the two NRD denoisers the
reference selects between at RTXPT/Sample.cpp:1461-1466)."""
import dataclasses

import numpy as np
import pytest

from rtxpt_tpu.models.realtime import RealtimeRenderer
from rtxpt_tpu.models.renderer import Renderer, realtime_config, \
    reference_config
from rtxpt_tpu.scene import envmap as EM, procedural

W, H = 64, 48
REF_SPP = 64
RT_FRAMES = 4          # static camera: temporal accumulation warm-up
PEAK = 4.0             # linear-HDR PSNR peak (clip range)


def _psnr(img, truth):
    a = np.clip(np.asarray(img), 0.0, PEAK)
    b = np.clip(np.asarray(truth), 0.0, PEAK)
    mse = float(np.mean((a - b) ** 2))
    return 10.0 * np.log10(PEAK * PEAK / max(mse, 1e-12))


@pytest.fixture(scope="module")
def scene():
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(W, H)
    env = EM.bake_procedural_sky(height=32)
    return host, cam, env


@pytest.fixture(scope="module")
def truth(scene):
    host, cam, env = scene
    common = dict(max_bounces=4, max_diffuse_bounces=3,
                  nee_distant_samples=1, nee_local_samples=1)
    ref = Renderer(host, cam, reference_config(**common),
                   env_radiance=env)
    return np.asarray(ref.render(W, H, REF_SPP))


def _realtime(scene, method: str, denoise: bool):
    host, cam, env = scene
    cfg = realtime_config(use_restir_di=True, use_restir_gi=True,
                          denoiser_enabled=True, use_stable_planes=True,
                          max_bounces=4, max_diffuse_bounces=3,
                          denoiser_method=method)
    rt = RealtimeRenderer(host, cam, cfg, env_radiance=env)
    frame = None
    for _ in range(RT_FRAMES):
        frame = rt.render_frame(W, H, denoise=denoise, taa=False)
    return np.asarray(frame)


@pytest.mark.slow
@pytest.mark.parametrize("method,floor_db,margin_db", [
    # recorded round 5 (8-device CPU mesh): raw 17.63 dB; denoised
    # relax 19.80 / reblur 19.52. Floors backed off ~1.5 dB for
    # run-to-run noise; ratchet upward as quality lands.
    ("relax", 18.0, 1.5),
    ("reblur", 18.0, 1.5),
])
def test_denoised_psnr_floor(scene, truth, method, floor_db, margin_db):
    raw = _realtime(scene, method, denoise=False)
    den = _realtime(scene, method, denoise=True)
    psnr_raw = _psnr(raw, truth)
    psnr_den = _psnr(den, truth)
    print(f"[{method}] raw {psnr_raw:.2f} dB -> denoised "
          f"{psnr_den:.2f} dB")
    assert np.isfinite(den).all()
    # the denoiser must measurably beat the raw 1spp frame...
    assert psnr_den > psnr_raw + margin_db, (psnr_den, psnr_raw)
    # ...and clear the recorded absolute quality floor
    assert psnr_den > floor_db, (psnr_den, floor_db)
