"""Primary surface replacement: mirror/glass pixels must land on the
reflected/refracted surface in the G-buffer."""
import numpy as np
import jax.numpy as jnp

from rtxpt_tpu.models.renderer import Renderer, realtime_config
from rtxpt_tpu.pt import gbuffer as GB
from rtxpt_tpu.scene import envmap as EM, procedural


def test_psr_replaces_mirror_surface():
    host = procedural.build_programmer_art().finish()
    w, h = 64, 48
    cam = procedural.default_camera(w, h)
    r = Renderer(host, cam, realtime_config(),
                 env_radiance=EM.bake_procedural_sky(height=32))
    cam2 = cam._replace(viewport=jnp.asarray([w, h], jnp.float32))
    yy, xx = np.mgrid[0:h, 0:w]
    px = jnp.asarray(xx.reshape(-1).astype(np.uint32))
    py = jnp.asarray(yy.reshape(-1).astype(np.uint32))
    gb0 = GB.trace_gbuffer(r.assets, cam2, cam2, px, py, psr_depth=0)
    gb2 = GB.trace_gbuffer(r.assets, cam2, cam2, px, py, psr_depth=2)
    thp = np.asarray(gb2.psr_thp)
    moved = (thp < 0.999).any(-1)
    # the scene has mirror + glass spheres: some pixels must have chained
    assert moved.sum() > 20
    # chained pixels must have a different surface than the raw primary
    pos0 = np.asarray(gb0.pos)
    pos2 = np.asarray(gb2.pos)
    changed = np.linalg.norm(pos0 - pos2, axis=-1) > 1e-3
    assert (changed[moved].mean()) > 0.9
    # non-delta pixels are untouched
    same = ~moved
    np.testing.assert_allclose(pos2[same], pos0[same], atol=1e-5)
    # throughput is bounded
    assert (thp >= 0).all() and (thp <= 1.001).all()
