"""Textures, alpha test, animation/refit, lights, envmap IS, realtime."""
import numpy as np
import pytest
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


@pytest.mark.slow  # BVH8 refit oracle: compile-heavy; fast-tier refit
#   coverage lives in test_instanced + test_skinning
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_sphere_light_renders_and_matches_point_far_field():
    """Sphere analytic lights must be sampled (round-1 bug: LIGHT_SPHERE
    was never valid in sample_local_lights). Far-field check: a sphere of
    radius r with surface radiance L illuminates like a point light with
    intensity L*pi*r^2 (PolymorphicLight.hlsli sphere vs point)."""
    from rtxpt_tpu.models.renderer import Renderer, reference_config
    from rtxpt_tpu.scene import lights as LI

    host = procedural.build_programmer_art(
        diffuse_only=True, with_emissive=False).finish()
    cam = procedural.default_camera(40, 30)
    cfg = reference_config(use_env_lights=False, max_bounces=2,
                           max_diffuse_bounces=2, nee_distant_samples=0,
                           nee_local_samples=2,
                           enable_russian_roulette=False)
    L, r = 400.0, 0.12
    sphere = [{"kind": LI.LIGHT_SPHERE, "position": (0.0, 3.0, 0.0),
               "radius": r, "radiance": (L, L, L)}]
    eq = L * np.pi * r * r
    point = [{"kind": LI.LIGHT_POINT, "position": (0.0, 3.0, 0.0),
              "radiance": (eq, eq, eq)}]
    img_s = np.asarray(Renderer(host, cam, cfg,
                                analytic_lights=sphere).render(40, 30, 8))
    img_p = np.asarray(Renderer(host, cam, cfg,
                                analytic_lights=point).render(40, 30, 8))
    assert img_s.mean() > 0.01, "sphere light produced a black image"
    rel = abs(img_s.mean() - img_p.mean()) / img_p.mean()
    assert rel < 0.15, (img_s.mean(), img_p.mean())


def test_data_textures_not_srgb_decoded():
    """Normal/metal-rough maps are linear data: a uint8 128 texel must
    decode to ~0.502, not 0.5^2.2 (round-1 bug applied sRGB to every
    uint8 texture)."""
    nm = np.full((8, 8, 4), 128, np.uint8)
    stack = TX.build_texture_stack([nm], srgb=[False])
    out = np.asarray(TX.sample_stack(stack, jnp.asarray([0], jnp.int32),
                                     jnp.asarray([[0.5, 0.5]])))
    np.testing.assert_allclose(out[0, :3], 128 / 255.0, atol=0.01)
    # sRGB color map decodes through the 2.2 curve
    stack_c = TX.build_texture_stack([nm], srgb=[True])
    out_c = np.asarray(TX.sample_stack(stack_c, jnp.asarray([0], jnp.int32),
                                       jnp.asarray([[0.5, 0.5]])))
    np.testing.assert_allclose(out_c[0, :3], (128 / 255.0) ** 2.2,
                               atol=0.01)


def test_texture_native_sizes_and_trilinear():
    """Textures keep their own pow2 resolution (no 256^2 cap) and lod
    blends between adjacent mips."""
    big = np.zeros((64, 64, 4), np.float32)
    big[::2, :] = 1.0  # horizontal stripes: mip0 striped, mip1+ = 0.5
    small = np.full((4, 4, 4), 1.0, np.float32)
    stack = TX.build_texture_stack([big, small], srgb=[False, False])
    assert int(stack.mip_size[0, 0]) == 64
    assert int(stack.mip_size[1, 0]) == 4
    tex = jnp.asarray([0], jnp.int32)
    uv = jnp.asarray([[0.25, 16.5 / 64.0]])  # texel-center row
    # lod is UV-space log2 footprint; -6 -> mip0 (64px), 0 -> 1x1 mip
    lod_fine = jnp.asarray([-10.0])
    lod_coarse = jnp.asarray([0.0])
    f = np.asarray(TX.sample_stack(stack, tex, uv, lod_fine))[0, 0]
    c = np.asarray(TX.sample_stack(stack, tex, uv, lod_coarse))[0, 0]
    assert abs(c - 0.5) < 0.05, c          # fully averaged at the top
    assert abs(f - 0.5) > 0.4, f  # mip0 sees a solid stripe row
