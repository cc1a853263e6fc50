"""ReSTIR DI pipeline: presampled RIS tiles, unbiased spatial reuse,
boiling filter (VERDICT round-1 item 6; reference RTXDI/RtxdiPass.cpp)."""
import numpy as np
import pytest
import jax.numpy as jnp

from rtxpt_tpu import config as C
from rtxpt_tpu.models.realtime import RealtimeRenderer
from rtxpt_tpu.models.renderer import (Renderer, realtime_config,
                                       reference_config)
from rtxpt_tpu.restir import di
from rtxpt_tpu.restir.reservoir import LIGHT_ENV, LIGHT_INVALID, Reservoir
from rtxpt_tpu.scene import procedural


def _assets():
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(32, 24)
    r = Renderer(host, cam, reference_config())
    return r.assets


def test_presample_tiles_valid():
    assets = _assets()
    ris = di.presample_lights(assets, 0, tiles=4, size=64)
    light = np.asarray(ris.light)
    inv = np.asarray(ris.inv_pdf)
    assert light.shape == (256,)
    # env and local entries both present; every entry usable
    assert (light == LIGHT_ENV).any()
    assert (light >= 0).any()
    assert (inv[light != LIGHT_INVALID] > 0).all()


def test_boiling_filter_kills_outliers():
    n = 64 * 64
    r = Reservoir(light=jnp.zeros((n,), jnp.int32),
                  uv=jnp.zeros((n, 2)),
                  w_sum=jnp.ones((n,)),
                  m=jnp.ones((n,)),
                  target=jnp.ones((n,)))
    # one enormous outlier
    r = r._replace(w_sum=r.w_sum.at[100].set(1e6))
    out = di.boiling_filter(r, 64, 64)
    assert int(np.asarray(out.light)[100]) == LIGHT_INVALID
    # everyone else survives
    keep = np.asarray(out.light) != LIGHT_INVALID
    assert keep.sum() >= n - 16 * 16  # at most its block is affected


def test_restir_di_fast_bias_gate():
    """Default-tier ReSTIR DI bias gate (VERDICT r3 next #6): tiny-scale
    averaged ReSTIR DI vs reference mode. Loose threshold — it exists to
    catch gross estimator breakage in the default suite; the tight A/B
    stays in the slow tier below."""
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(24, 16)
    spp = 6
    ref = np.asarray(Renderer(host, cam, reference_config(
        max_bounces=2, max_diffuse_bounces=1)).render(24, 16, spp))
    cfg = realtime_config(use_restir_di=True, use_restir_gi=False,
                          denoiser_enabled=False, use_stable_planes=False,
                          max_bounces=2, max_diffuse_bounces=1)
    r = RealtimeRenderer(host, cam, cfg)
    acc = np.zeros_like(ref)
    for _ in range(spp):
        acc += np.asarray(r.render_frame(24, 16, taa=False,
                                         denoise=False))
    acc /= spp
    rel = abs(acc.mean() - ref.mean()) / ref.mean()
    assert rel < 0.4, (acc.mean(), ref.mean(), rel)


@pytest.mark.slow
def test_restir_di_unbiased_vs_reference():
    """Bias A/B (VERDICT item 6 'Done'): averaged ReSTIR DI frames on a
    static scene match the reference-mode estimate within noise."""
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(48, 32)
    spp = 32
    ref = np.asarray(Renderer(host, cam, reference_config(
        max_bounces=2, max_diffuse_bounces=1)).render(48, 32, spp))
    cfg = realtime_config(use_restir_di=True, use_restir_gi=False,
                          denoiser_enabled=False,
                          max_bounces=2, max_diffuse_bounces=1)
    r = RealtimeRenderer(host, cam, cfg)
    acc = np.zeros_like(ref)
    for _ in range(spp):
        acc += np.asarray(r.render_frame(48, 32, taa=False,
                                         denoise=False))
    acc /= spp
    rel = abs(acc.mean() - ref.mean()) / ref.mean()
    assert rel < 0.12, (acc.mean(), ref.mean(), rel)
