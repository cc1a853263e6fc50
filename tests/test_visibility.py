"""Exact alpha re-test for visibility rays (pt/visibility.py; VERDICT r2
item 7): shadow transmittance through a partially-masked occluder must
match a brute-force alpha-aware oracle within a few %, not just "some
shadow" (the OMM cells only coarsely bound it)."""
import numpy as np
import jax.numpy as jnp
import pytest

from rtxpt_tpu.models.renderer import Renderer, reference_config
from rtxpt_tpu.pt import visibility
from rtxpt_tpu.scene.build import SceneBuilder, Mesh


def _host(alpha_img):
    sb = SceneBuilder()
    sb.add_material(base_color=(0.8, 0.8, 0.8), roughness=1.0)
    sb.add_material(base_color=(1, 1, 1), roughness=1.0,
                    alpha_mode=1, alpha_cutoff=0.5, base_tex=0)
    quad_p = np.asarray([[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1]],
                        np.float32)
    quad_i = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    uv = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    floor = sb.add_mesh(Mesh(positions=quad_p * 4.0, indices=quad_i,
                             uvs=uv))
    occ = sb.add_mesh(Mesh(positions=quad_p + np.asarray([0, 2, 0],
                                                         np.float32),
                           indices=quad_i, uvs=uv, material=1))
    sb.add_instance(floor, material_override=0)
    sb.add_instance(occ, material_override=1)
    host = sb.finish()
    host["texture_images"] = [alpha_img]
    return host


def _rays(n=24):
    g = np.linspace(-0.9, 0.9, n)
    gx, gz = np.meshgrid(g, g)
    o = np.stack([gx.reshape(-1), np.full(gx.size, 0.01),
                  gz.reshape(-1)], -1).astype(np.float32)
    d = np.tile(np.asarray([[0, 1, 0]], np.float32), (o.shape[0], 1))
    return jnp.asarray(o), jnp.asarray(d)


def _oracle_occlusion(alpha_img, o):
    """Ray straight up hits the occluder at (x,z) -> uv -> nearest-texel
    alpha >= 0.5 means occluded."""
    h, w = alpha_img.shape[:2]
    u = (np.asarray(o)[:, 0] + 1.0) / 2.0   # quad spans [-1,1] in x/z
    v = (np.asarray(o)[:, 2] + 1.0) / 2.0
    inside = (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1)
    x = np.clip((u * w).astype(int), 0, w - 1)
    y = np.clip((v * h).astype(int), 0, h - 1)
    a = alpha_img[y, x, 3].astype(np.float32) / 255.0
    return inside & (a >= 0.5)


@pytest.mark.parametrize("pattern", ["stripes", "sparse_dots"])
def test_exact_alpha_matches_oracle(pattern):
    img = np.full((32, 32, 4), 255, np.uint8)
    if pattern == "stripes":
        img[:, ::2, 3] = 0                 # sub-OMM-cell stripes
    else:
        img[..., 3] = 0
        img[::4, ::4, 3] = 255             # sparse opaque dots
    from rtxpt_tpu.scene import procedural
    host = _host(img)
    r = Renderer(host, procedural.default_camera(8, 8),
                 reference_config())
    assert r.cfg.exact_alpha_test     # mask material present -> enabled
    o, d = _rays()
    occ = np.asarray(visibility.trace_visibility(
        r.assets, o, d, t_max=10.0, exact=True))
    ref = _oracle_occlusion(img, o)
    agree = (occ == ref).mean()
    assert agree > 0.97, (agree, occ.mean(), ref.mean())
    # transmittance within a few % of the oracle
    assert abs(occ.mean() - ref.mean()) < 0.05


def test_exact_alpha_disabled_for_maskless_scene():
    from rtxpt_tpu.scene import procedural
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(8, 8)
    r = Renderer(host, cam, reference_config())
    assert not r.cfg.exact_alpha_test
