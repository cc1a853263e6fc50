"""Physically-based sky gates (precomputed_sky.hlsli parity bake,
VERDICT r4 next #8): the Rayleigh+Mie single-scatter bake must show the
qualitative physics the reference's atmospheric model produces — blue
zenith, bright horizon, sunset reddening, earth-shadowed ground — and
feed the standard env-map importance pipeline."""
import numpy as np
import pytest

from rtxpt_tpu.scene import envmap as EM

H = 48


def _sky(**kw):
    return np.asarray(EM.bake_atmospheric_sky(height=H, samples=16,
                                              sun_samples=4, **kw))


def _dirs():
    v, u = np.meshgrid((np.arange(H) + 0.5) / H,
                       (np.arange(2 * H) + 0.5) / (2 * H), indexing="ij")
    th = v * np.pi
    ph = (u * 2 - 1) * np.pi
    return np.stack([np.sin(th) * np.cos(ph), np.cos(th),
                     np.sin(th) * np.sin(ph)], -1)


def test_rayleigh_blue_zenith_and_bright_horizon():
    sky = _sky()
    assert np.isfinite(sky).all() and (sky >= 0).all()
    zen = sky[1].mean(0)          # top row ~ zenith
    hor = sky[H // 2 - 2].mean(0)  # just above horizon
    # Rayleigh ~ lambda^-4: blue channel dominates away from the sun
    assert zen[2] > zen[0] * 1.5, zen
    # longer path length through the atmosphere -> brighter horizon
    assert hor.mean() > zen.mean(), (hor.mean(), zen.mean())


def test_sunset_reddening():
    d = _dirs()

    def aureole_rb(sky, sun):
        s = np.asarray(sun, float)
        s /= np.linalg.norm(s)
        # ring AROUND the disc (exclude the disc itself)
        c = d @ s
        m = (c > np.cos(0.12)) & (c < np.cos(0.02))
        mean = sky[m].mean(0)
        return mean[0] / max(mean[2], 1e-9)

    hi = aureole_rb(_sky(), (0.35, 0.65, 0.2))
    lo = aureole_rb(_sky(sun_dir=(0.999, 0.045, 0.0)),
                    (0.999, 0.045, 0.0))
    # low sun: blue scattered OUT of the long path -> redder aureole
    assert lo > hi * 1.5, (lo, hi)


def test_earth_shadow_and_sun_disc_hot():
    # bake with a disc wide enough to cover equirect texels at H=48
    sky = _sky(sun_angular_radius=0.06)
    d = _dirs()
    up = sky[: H // 2 - 3].mean()
    s = np.asarray((0.35, 0.65, 0.2), float)
    s /= np.linalg.norm(s)
    disc = sky[(d @ s) > np.cos(0.05)].mean()
    assert disc > 50.0 * up, (disc, up)     # delta-ish sun disc
    # earth shadow: with the sun just below the horizon the ground goes
    # nearly black (direct term blocked by the planet) while twilight
    # sky keeps scattering
    dusk = _sky(sun_dir=(0.999, -0.03, 0.0))
    ground_dusk = dusk[H // 2 + 4:].mean()
    ground_noon = sky[H // 2 + 4:].mean()
    assert ground_dusk < 0.05 * ground_noon, (ground_dusk, ground_noon)


def test_turbidity_brightens_aureole():
    d = _dirs()
    s = np.asarray((0.35, 0.65, 0.2), float)
    s /= np.linalg.norm(s)
    ring = (d @ s > np.cos(0.25)) & (d @ s < np.cos(0.02))
    clear = _sky(turbidity=1.0)[ring].mean()
    hazy = _sky(turbidity=6.0)[ring].mean()
    assert hazy > clear, (hazy, clear)


def test_feeds_importance_pipeline():
    sky = EM.bake_atmospheric_sky(height=32, samples=8, sun_samples=2)
    env = EM.make_envmap(sky)
    # sampling machinery accepts the baked map and importance-finds the
    # sun (the bake's whole point for outdoor NEE)
    import jax.numpy as jnp
    u = jnp.asarray(np.random.default_rng(0).random((256, 2)),
                    jnp.float32)
    _, pdf, le = EM.sample_mip_descent(env, u)
    pdf = np.asarray(pdf)
    assert np.isfinite(pdf).all() and (pdf > 0).any()
    assert np.isfinite(np.asarray(le)).all()
