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
