"""ReBLUR-style denoiser (denoise/reblur.py) + TAA clamp-relax mask
(VERDICT r2 item 8): config selects relax|reblur; hit-distance drives the
kernel; disocclusion regions are not re-blurred by TAA."""
import numpy as np
import jax.numpy as jnp
import pytest

from rtxpt_tpu.denoise import reblur
from rtxpt_tpu.post import taa as taa_mod


def _noisy(h, w, seed, base=1.0, sigma=0.5):
    r = np.random.RandomState(seed)
    return jnp.asarray(
        (base + sigma * r.randn(h, w, 3)).astype(np.float32))


def _flat_geo(h, w):
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (h, w, 3))
    view_z = jnp.full((h, w), 5.0)
    motion = jnp.zeros((h, w, 2))
    return normal, view_z, motion


def test_reblur_reduces_noise_and_converges():
    h, w = 48, 64
    normal, view_z, motion = _flat_geo(h, w)
    state = None
    out = None
    for f in range(6):
        rad = _noisy(h, w, f)
        out, state = reblur.denoise(state, rad, normal, view_z, motion,
                                    hit_t=jnp.full((h, w), 100.0))
    out = np.asarray(out)[8:-8, 8:-8]
    assert abs(out.mean() - 1.0) < 0.05
    assert out.std() < 0.5 * 0.5   # well under single-frame noise


def test_reblur_hit_distance_drives_radius():
    """Short hitT (contact) must blur less than long hitT."""
    h, w = 48, 64
    normal, view_z, motion = _flat_geo(h, w)
    rad = _noisy(h, w, 3)
    far, _ = reblur.denoise(None, rad, normal, view_z, motion,
                            hit_t=jnp.full((h, w), 1e4))
    near, _ = reblur.denoise(None, rad, normal, view_z, motion,
                             hit_t=jnp.full((h, w), 0.01))
    far_std = float(np.asarray(far)[8:-8, 8:-8].std())
    near_std = float(np.asarray(near)[8:-8, 8:-8].std())
    assert far_std < 0.6 * near_std, (far_std, near_std)


def test_reblur_preserves_geometric_edges():
    h, w = 48, 64
    normal, view_z, motion = _flat_geo(h, w)
    # two half-planes with different normals and radiance levels
    nl = np.broadcast_to([0.0, 0.0, 1.0], (h, w // 2, 3))
    nr = np.broadcast_to([1.0, 0.0, 0.0], (h, w - w // 2, 3))
    normal = jnp.asarray(np.concatenate([nl, nr], axis=1)
                         .astype(np.float32))
    rad = np.ones((h, w, 3), np.float32)
    rad[:, w // 2:] = 3.0
    out, _ = reblur.denoise(None, jnp.asarray(rad), normal, view_z,
                            motion, hit_t=jnp.full((h, w), 1e4))
    out = np.asarray(out)
    assert abs(out[:, :w // 2 - 2].mean() - 1.0) < 0.05
    assert abs(out[:, w // 2 + 2:].mean() - 3.0) < 0.05


def test_taa_relax_mask_skips_stale_history():
    h, w = 16, 16
    color = jnp.ones((h, w, 3))
    ghost = jnp.full((h, w, 3), 1.4)   # within the (flat) clip box? no —
    # flat current frame has zero sigma so clipping alone would also kill
    # the ghost; use a noisy current frame so the clip box is wide
    r = np.random.RandomState(0)
    color = jnp.asarray((1.0 + 0.6 * r.randn(h, w, 3)).astype(np.float32))
    state = taa_mod.TAAState(history=ghost, valid=jnp.asarray(True))
    motion = jnp.zeros((h, w, 2))
    out_rel, _ = taa_mod.resolve(state, color, motion,
                                 relax_mask=jnp.ones((h, w)))
    # full relax -> exactly the current frame (fresh denoised signal)
    assert np.allclose(np.asarray(out_rel), np.asarray(color))
    out_def, _ = taa_mod.resolve(state, color, motion)
    assert not np.allclose(np.asarray(out_def), np.asarray(color))


def test_denoiser_method_config_selects_reblur():
    from rtxpt_tpu.models.realtime import RealtimeRenderer
    from rtxpt_tpu.models.renderer import realtime_config
    from rtxpt_tpu.scene import procedural
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(32, 24)
    cfg = realtime_config(use_restir_di=False, use_restir_gi=False,
                          denoiser_enabled=True, denoiser_method="reblur",
                          max_bounces=1, max_diffuse_bounces=1,
                          nee_distant_samples=1, nee_local_samples=0)
    rr = RealtimeRenderer(host, cam, cfg)
    # one frame: the has_prev variant (a second full compile) is covered
    # by test_reblur_reduces_noise_and_converges
    img = np.asarray(rr.render_frame(32, 24))
    assert np.isfinite(img).all()
    assert img.mean() > 0.0
