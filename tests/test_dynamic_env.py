"""Per-frame dynamic environment bake (VERDICT r3 missing #6;
EnvMapBaker::Update + analytic directional splat,
RTXPT/Lighting/Distant/EnvMapBaker.cpp, Sample.cpp:1495-1521)."""
import numpy as np
import jax.numpy as jnp

from rtxpt_tpu.models.renderer import Renderer, reference_config
from rtxpt_tpu.scene import envmap as EM, procedural


def test_directional_splat_conserves_flux():
    """A splatted directional light's baked disc integrates back to the
    light's irradiance (radiance = E / solid_angle over the disc)."""
    base = np.zeros((64, 128, 3), np.float32)
    e = 5.0
    out = EM.bake_with_directional(
        base, [dict(direction=(0.0, -1.0, 0.0), radiance=(e, e, e))],
        angular_radius=0.1)
    env = EM.make_envmap(out)
    # integrate radiance * texel solid angle over the sphere
    omega = np.asarray(env.omega_rows)[:, None]
    total = float((np.asarray(out)[..., 0] * omega).sum())
    assert abs(total - e) / e < 0.05, total


def test_animated_sun_updates_running_renderer():
    host = procedural.build_programmer_art(with_emissive=False).finish()
    cam = procedural.default_camera(24, 16)
    cfg = reference_config(max_bounces=2, max_diffuse_bounces=1,
                           nee_local_samples=0)
    r = Renderer(host, cam, cfg,
                 env_radiance=EM.bake_procedural_sky(
                     height=32, sun_dir=(0.35, 0.65, 0.2)))
    img0 = np.asarray(r.render(24, 16, 2))
    # move the sun below the horizon-ish and darken the sky
    r.update_environment(EM.bake_procedural_sky(
        height=32, sun_dir=(-0.5, 0.2, -0.8), sky_scale=0.2))
    r.reset_accumulation()
    img1 = np.asarray(r.render(24, 16, 2))
    assert np.isfinite(img1).all()
    assert img1.mean() < img0.mean() * 0.8, (img0.mean(), img1.mean())
