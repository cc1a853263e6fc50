"""Reference-vs-realtime A/B oracle (LocalConfig REF_VS_REALTIME,
LocalConfig.cpp:40-57): with ReSTIR/denoiser/TAA/PSR disabled, the average
of N realtime frames must converge to the reference-mode N-sample
accumulation — the two pipelines estimate the same integral."""
import numpy as np
import pytest
import jax.numpy as jnp

from rtxpt_tpu.models.realtime import RealtimeRenderer
from rtxpt_tpu.models.renderer import Renderer, realtime_config, \
    reference_config
from rtxpt_tpu.scene import envmap as EM, procedural

W, H = 48, 32
N = 32


@pytest.mark.slow
def test_realtime_converges_to_reference():
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(W, H)
    env = EM.bake_procedural_sky(height=32,
                                 sun_radiance=(40.0, 38.0, 33.0))

    common = dict(max_bounces=4, max_diffuse_bounces=3,
                  nee_distant_samples=1, nee_local_samples=1,
                  enable_russian_roulette=False)
    ref = Renderer(host, cam, reference_config(**common),
                   env_radiance=env)
    ref_img = np.asarray(ref.render(W, H, N, jitter_aa=False))

    rt_cfg = realtime_config(use_restir_di=False, use_restir_gi=False,
                             denoiser_enabled=False, realtime_noise=False,
                             **common)
    rt = RealtimeRenderer(host, cam, rt_cfg, env_radiance=env)
    acc = np.zeros((H, W, 3), np.float32)
    import rtxpt_tpu.pt.gbuffer as GB
    for i in range(N):
        rt.frame_index = i  # advances the per-frame RNG streams
        frame = rt.render_frame(W, H, denoise=False, taa=False)
        acc += np.asarray(frame)
    rt_img = acc / N

    # block means must agree within Monte-Carlo noise
    def blocks(a):
        return a.reshape(H // 8, 8, W // 8, 8, 3).mean((1, 3, 4))

    b_ref, b_rt = blocks(ref_img), blocks(rt_img)
    rel = np.abs(b_ref - b_rt) / (0.5 * (b_ref + b_rt) + 5e-2)
    assert np.median(rel) < 0.25, (np.median(rel), b_ref.mean(),
                                   b_rt.mean())
    m_ref, m_rt = ref_img.mean(), rt_img.mean()
    assert abs(m_ref - m_rt) / max(m_ref, m_rt) < 0.10, (m_ref, m_rt)
