"""Textures, alpha test, animation/refit, lights, envmap IS, realtime."""
import numpy as np
import jax.numpy as jnp

from rtxpt_tpu.scene import animation, envmap as EM, procedural
from rtxpt_tpu.scene import textures as TX
from rtxpt_tpu.scene.build import to_device


def test_texture_sampling_bilinear_and_srgb():
    check = np.zeros((8, 8, 4), np.uint8)
    check[...] = (255, 0, 0, 255)
    stack = TX.build_texture_stack([check], size=8)
    uv = jnp.asarray([[0.5, 0.5], [0.1, 0.9]])
    tex = jnp.asarray([0, 0], jnp.int32)
    out = np.asarray(TX.sample_stack(stack, tex, uv))
    np.testing.assert_allclose(out[:, 0], 1.0, atol=0.02)  # red
    np.testing.assert_allclose(out[:, 1], 0.0, atol=0.02)
    # -1 slot -> white
    out2 = np.asarray(TX.sample_stack(stack, jnp.asarray([-1]), uv[:1]))
    np.testing.assert_allclose(out2, 1.0)


def test_envmap_importance_sampling_pdf_consistency():
    """sample_mip_descent's returned pdf must equal pdf_mip_descent(dir),
    and importance sampling must concentrate samples on the sun."""
    rad = EM.bake_procedural_sky(height=32)
    env = EM.make_envmap(rad)
    rs = np.random.RandomState(0)
    u2 = jnp.asarray(rs.uniform(size=(4096, 2)).astype(np.float32))
    d, pdf, le = EM.sample_mip_descent(env, u2)
    pdf2 = EM.pdf_mip_descent(env, d)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2),
                               rtol=1e-4)
    # MC estimate of total env power: E[Le/pdf] ~ integral of Le
    est = (np.asarray(le) / np.asarray(pdf)[:, None]).mean(0)
    # quadrature integral
    h, w = rad.shape[0], rad.shape[1]
    omega = EM._row_solid_angles(h, w)
    ref = (np.asarray(rad) * omega[:, None, None]).sum((0, 1))
    np.testing.assert_allclose(est, ref, rtol=0.05)


def test_refit_bvh8_after_animation():
    from rtxpt_tpu.ops import bvh as B, intersect as I
    from rtxpt_tpu.ops import traverse as TR
    sc = to_device(procedural.build_programmer_art().finish())
    pos = np.asarray(sc.positions)
    bv2 = B.build_bvh(pos, np.asarray(sc.indices))
    bv8 = B.collapse_bvh8(bv2, sc.positions, sc.indices)
    pos2 = pos + 0.2 * np.sin(pos * 3.0).astype(np.float32)
    bv8r = animation.refit_bvh8(bv8, jnp.asarray(pos2), sc.indices)
    soup2 = I.TriSoup.build(jnp.asarray(pos2), sc.indices)
    rs = np.random.RandomState(1)
    o = jnp.asarray(rs.uniform(-3, 3, (256, 3)).astype(np.float32))
    d = rs.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    h_ref = I.bruteforce_closest(soup2, o, jnp.asarray(d))
    h_fit = TR.trace_closest(bv8r, None, o, jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(h_fit.t), np.asarray(h_ref.t),
                               rtol=1e-4, atol=1e-4)


def test_keyframe_sampling():
    ch = animation.Channel(
        node=0, path="translation",
        times=np.asarray([0.0, 1.0, 2.0], np.float32),
        values=np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0]], np.float32))
    np.testing.assert_allclose(animation.sample_channel(ch, 0.5),
                               [0.5, 0, 0])
    np.testing.assert_allclose(animation.sample_channel(ch, 1.5),
                               [1, 0.5, 0])
    np.testing.assert_allclose(animation.sample_channel(ch, 5.0),
                               [1, 1, 0])
    # slerp through 90 degrees
    ch2 = animation.Channel(
        node=0, path="rotation",
        times=np.asarray([0.0, 1.0], np.float32),
        values=np.asarray([[0, 0, 0, 1],
                           [0, 0.7071068, 0, 0.7071068]], np.float32))
    q = animation.sample_channel(ch2, 0.5)
    np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-5)
    assert abs(q[1] - np.sin(np.pi / 8)) < 1e-4


def test_realtime_renderer_stable_and_finite():
    from rtxpt_tpu.models.realtime import RealtimeRenderer
    host = procedural.build_programmer_art().finish()
    w, h = 48, 32
    cam = procedural.default_camera(w, h)
    r = RealtimeRenderer(host, cam,
                         env_radiance=EM.bake_procedural_sky(height=32))
    means = []
    for _ in range(4):
        img = np.asarray(r.render_frame(w, h))
        assert np.isfinite(img).all()
        means.append(img.mean())
    # temporal stability: no geometric blow-up
    assert means[-1] < means[0] * 2.0 + 0.5
