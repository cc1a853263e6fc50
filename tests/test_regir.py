"""ReGIR grid: unbiasedness A/B vs power-CDF local sampling, and debug
view rendering."""
import numpy as np
import pytest
import jax.numpy as jnp

from rtxpt_tpu import config as C
from rtxpt_tpu.models.renderer import Renderer, reference_config
from rtxpt_tpu.scene import envmap as EM, procedural


def _render(local_type, spp=16, **cfg_over):
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(48, 32)
    env = EM.bake_procedural_sky(height=32, sky_scale=0.05,
                                 sun_radiance=(2, 2, 2))
    cfg = reference_config(nee_local_type=local_type, max_bounces=4,
                           max_diffuse_bounces=3, nee_distant_samples=0,
                           nee_local_samples=2,
                           enable_russian_roulette=False, **cfg_over)
    r = Renderer(host, cam, cfg, env_radiance=env)
    return np.asarray(r.render(48, 32, spp))


@pytest.mark.slow
def test_regir_unbiased_vs_power():
    a = _render(C.NEE_LOCAL_POWER)
    b = _render(C.NEE_LOCAL_REGIR)
    assert a.mean() > 0.05  # the emissive panel lights the scene
    rel = abs(a.mean() - b.mean()) / max(a.mean(), 1e-6)
    assert rel < 0.1, (a.mean(), b.mean())


def test_regir_grid_populated():
    from rtxpt_tpu.restir import regir as RG
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(32, 24)
    r = Renderer(host, cam, reference_config(),
                 env_radiance=EM.bake_procedural_sky(height=32))
    lo = jnp.min(r.scene.positions, axis=0) - 1e-3
    hi = jnp.max(r.scene.positions, axis=0) + 1e-3
    grid = RG.build_regir(r.lights, r.scene.positions, r.scene.indices,
                          lo, hi, 0)
    w = np.asarray(grid.w)
    # most cells see the downward emissive panel
    assert (w > 0).mean() > 0.3


@pytest.mark.slow
def test_debug_views_render():
    from rtxpt_tpu.utils import debugviews
    host = procedural.build_programmer_art().finish()
    w, h = 32, 24
    cam = procedural.default_camera(w, h)
    r = Renderer(host, cam, reference_config(),
                 env_radiance=EM.bake_procedural_sky(height=32))
    cam2 = cam._replace(viewport=jnp.asarray([w, h], jnp.float32))
    from rtxpt_tpu.models.realtime import RealtimeRenderer
    from rtxpt_tpu.models.renderer import realtime_config
    # stable-planes default pipeline: feeds the StablePlane* views
    rt_sp = RealtimeRenderer(host, cam)
    rt_sp.render_frame(w, h)
    # PSR-lite pipeline: feeds the Denoiser*/ReSTIR* FrameOutputs views
    rt = RealtimeRenderer(host, cam, realtime_config(
        use_restir_di=True, use_restir_gi=True, denoiser_enabled=True,
        use_stable_planes=False))
    rt.render_frame(w, h)
    for view in debugviews.VIEWS:  # every advertised view must render
        img = np.asarray(debugviews.render_debug_view(
            view, r.assets, cam2, w, h,
            frame_outputs=rt.last_outputs,
            stable_planes=rt_sp.last_stable_planes,
            plane_radiance=rt_sp.last_plane_radiance,
            plane_denoised=rt_sp.last_plane_denoised,
            den_states=rt_sp.den_states,
            color=rt.last_outputs.color))
        assert img.shape == (h, w, 3), view
        assert np.isfinite(img).all(), view
    # per-plane explorer: explicit plane index (DebugViewStablePlaneIndex)
    for view in ("StablePlaneNormals", "StablePlaneDiffRadiance",
                 "StablePlaneCombinedRadianceDenoised"):
        img = np.asarray(debugviews.render_debug_view(
            view, r.assets, cam2, w, h,
            stable_planes=rt_sp.last_stable_planes,
            plane_radiance=rt_sp.last_plane_radiance,
            plane_denoised=rt_sp.last_plane_denoised,
            plane_index=1))
        assert img.shape == (h, w, 3) and np.isfinite(img).all(), view
    info = debugviews.inspect_pixel(r.assets, cam2, w, h, w // 2, h // 2)
    assert info["valid"] and info["prim"] >= 0


@pytest.mark.slow
def test_regir_onion_unbiased_vs_power():
    """Onion layout (log-spherical camera-centred cells) must estimate
    the same image as power-CDF sampling — cells only reshape where the
    reservoirs live, not the estimator."""
    a = _render(C.NEE_LOCAL_POWER)
    b = _render(C.NEE_LOCAL_REGIR, regir_layout="onion")
    rel = abs(a.mean() - b.mean()) / max(a.mean(), 1e-6)
    assert rel < 0.1, (a.mean(), b.mean())


def test_regir_onion_grid_populated():
    from rtxpt_tpu.restir import regir as RG
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(32, 24)
    r = Renderer(host, cam, reference_config(),
                 env_radiance=EM.bake_procedural_sky(height=32))
    lo = jnp.min(r.scene.positions, axis=0) - 1e-3
    hi = jnp.max(r.scene.positions, axis=0) + 1e-3
    grid = RG.build_regir(r.lights, r.scene.positions, r.scene.indices,
                          lo, hi, 0, dims=4, per_cell=4, candidates=8,
                          layout="onion", center=cam.pos)
    assert grid.onion_layers > 0
    w = np.asarray(grid.w)
    assert (w > 0).mean() > 0.15
    # cell lookup + sampling round-trips for points across the scene
    rs = np.random.RandomState(0)
    pts = jnp.asarray(rs.uniform(-3, 3, (512, 3)).astype(np.float32))
    u2 = jnp.asarray(rs.uniform(size=(512, 2)).astype(np.float32))
    ls = RG.sample_regir(grid, r.lights, r.scene.positions,
                         r.scene.indices, pts, u2)
    assert np.asarray(ls.valid).mean() > 0.2
    assert np.isfinite(np.asarray(ls.li)).all()
