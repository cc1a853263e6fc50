"""Multi-chip sharding: pixel-tile render equivalence + halo exchange."""
import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from rtxpt_tpu.parallel import halo, meshutils


def test_halo_exchange_matches_global_stencil():
    mesh = meshutils.make_mesh()
    n = mesh.devices.size
    h, w = 8 * n, 16
    x = jnp.arange(h * w, dtype=jnp.float32).reshape(h, w)

    def body(x_local):
        padded = halo.exchange_row_halo(x_local, 1, meshutils.TILE_AXIS)
        # 3-row vertical box blur using the halo
        return (padded[:-2] + padded[1:-1] + padded[2:]) / 3.0

    f = jax.jit(jax.shard_map(body, mesh=mesh,
                              in_specs=P(meshutils.TILE_AXIS),
                              out_specs=P(meshutils.TILE_AXIS)))
    got = np.asarray(f(x))
    pad = np.concatenate([x[:1], x, x[-1:]], axis=0)
    want = np.asarray((pad[:-2] + pad[1:-1] + pad[2:]) / 3.0)
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.slow
def test_sharded_render_matches_single_device():
    from rtxpt_tpu import config as C
    from rtxpt_tpu.models.renderer import Renderer, reference_config
    from rtxpt_tpu.scene import envmap as EM, procedural

    cfg = reference_config(max_bounces=3, max_diffuse_bounces=2,
                           nee_distant_samples=1, nee_local_samples=1)
    host = procedural.build_programmer_art().finish()
    w, h = 32, 16
    cam = procedural.default_camera(w, h)
    r = Renderer(host, cam, cfg,
                 env_radiance=EM.bake_procedural_sky(height=32))
    single = np.asarray(r.render_sample(w, h, 0, jitter_aa=False))

    mesh = meshutils.make_mesh()
    cam2 = cam._replace(jitter=jnp.zeros(2, jnp.float32),
                        viewport=jnp.asarray([w, h], jnp.float32))
    consts = C.default_constants(0)
    sharded = np.asarray(meshutils.render_image_sharded(
        r.assets, cam2, cfg, consts, w, h, mesh))
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_sharded_post_matches_single_device():
    """Sharded denoise+TAA (halo-exchanged) == single-device output for
    in-halo motion (the production consumer of parallel/halo.py)."""
    from rtxpt_tpu.denoise import relax
    from rtxpt_tpu.parallel import meshutils
    from rtxpt_tpu.post import taa as taa_mod

    h, w = 160, 48
    rng = np.random.default_rng(0)
    rad = jnp.asarray(rng.random((h, w, 3), dtype=np.float32))
    nrm = jnp.tile(jnp.asarray([0.0, 1.0, 0.0]), (h, w, 1))
    z = jnp.ones((h, w), jnp.float32)
    mot = jnp.zeros((h, w, 2), jnp.float32)

    mesh = meshutils.make_mesh(jax.devices()[:4])
    c_sh, den_sh, taa_sh = meshutils.denoise_taa_sharded(
        mesh, None, None, rad, nrm, z, mot)
    c1, den1 = relax.denoise(None, rad, nrm, z, mot)
    c1, taa1 = taa_mod.resolve(
        taa_mod.TAAState(history=jnp.zeros_like(rad),
                         valid=jnp.asarray(False)), c1, mot)
    # interior must match exactly; the global image BORDER rows differ
    # by design (the halo path edge-clamps the spatial-variance taps
    # where convolve2d zero-pads — the halo behavior is the correct one)
    sl = slice(32, -32)
    np.testing.assert_allclose(np.asarray(c_sh)[sl], np.asarray(c1)[sl],
                               rtol=2e-4, atol=2e-5)
    # temporal state identical everywhere (accumulation is pointwise)
    np.testing.assert_allclose(np.asarray(den_sh.radiance),
                               np.asarray(den1.radiance), atol=1e-6)
    # second frame exercises reprojection through the sharded state
    rad2 = rad * 0.5
    c_sh2, _, _ = meshutils.denoise_taa_sharded(
        mesh, den_sh, taa_sh, rad2, nrm, z, mot)
    c2, _ = relax.denoise(den1, rad2, nrm, z, mot)
    c2, _ = taa_mod.resolve(taa1, c2, mot)
    np.testing.assert_allclose(np.asarray(c_sh2)[sl],
                               np.asarray(c2)[sl], rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_realtime_sharded_post_smoke():
    """RealtimeRenderer with a multi-device mesh routes the post stage
    through the halo-exchanged sharded path."""
    from rtxpt_tpu.models.realtime import RealtimeRenderer
    from rtxpt_tpu.models.renderer import realtime_config
    from rtxpt_tpu.parallel import meshutils
    from rtxpt_tpu.scene import procedural

    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(48, 40)
    cfg = realtime_config(use_restir_di=False, use_restir_gi=False,
                          denoiser_enabled=True, max_bounces=2,
                          max_diffuse_bounces=1)
    mesh = meshutils.make_mesh(jax.devices()[:4])
    r = RealtimeRenderer(host, cam, cfg, mesh=mesh)
    for _ in range(2):
        img = np.asarray(r.render_frame(48, 40))
    assert img.shape == (40, 48, 3)
    assert np.isfinite(img).all()
    assert img.mean() > 0.01


@pytest.mark.slow
def test_stage1_sharded_matches_single_device():
    """Row-sharded realtime stage 1 (pt_frame_sharded) vs the unsharded
    frame fn. With zero motion and spatial taps that stay inside each
    slab the paths are IDENTICAL; in general they differ only where a
    tap lands within tap-radius of a slab seam, so the frame must agree
    everywhere except a bounded seam band."""
    from rtxpt_tpu import config as C
    from rtxpt_tpu.models import realtime as RT
    from rtxpt_tpu.models.renderer import realtime_config
    from rtxpt_tpu.scene import envmap as EM, procedural

    w, h = 32, 192       # slabs of 48 rows: 16px boiling blocks align,
    n_dev = 4            # and rows exist farther than tap radius (20)
    #                      from every seam
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(w, h)
    cfg = realtime_config(use_restir_di=True, use_restir_gi=True,
                          denoiser_enabled=False, use_stable_planes=False,
                          max_bounces=3, max_diffuse_bounces=2)
    env = EM.bake_procedural_sky(height=32)

    single = RT.RealtimeRenderer(host, cam, cfg, env_radiance=env)
    shard = RT.RealtimeRenderer(host, cam, cfg, env_radiance=env,
                                mesh=meshutils.make_mesh(
                                    jax.devices()[:n_dev]))
    assert shard._shard_stage1(h)
    for _ in range(2):      # frame 0 (no history) + frame 1 (temporal)
        img_1 = np.asarray(single.render_frame(w, h, taa=False))
        img_n = np.asarray(shard.render_frame(w, h, taa=False))
    assert np.isfinite(img_n).all()
    rows = h // n_dev
    # rows within a tap radius of a seam may legitimately differ
    # (clamped tap sets); everything else must match to float noise
    seam_band = np.zeros(h, bool)
    for s in range(rows, h, rows):
        seam_band[max(s - 21, 0):min(s + 21, h)] = True
    np.testing.assert_allclose(img_n[~seam_band], img_1[~seam_band],
                               rtol=1e-4, atol=1e-5)
    # and the seam rows still agree in the mean (same estimator)
    if seam_band.any():
        a, b = img_n[seam_band].mean(), img_1[seam_band].mean()
        assert abs(a - b) < 0.15 * max(abs(b), 1e-3), (a, b)
