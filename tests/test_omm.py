"""Opacity micro-masks (the OMM equivalent, scene/omm.py) + any-hit
alpha behavior (VERDICT round-1 item 4; reference
RTXPT/OpacityMicroMap/OmmBuildQueue.cpp + Sample.hlsl:408-413)."""
import numpy as np
import jax.numpy as jnp

from rtxpt_tpu.ops import bvh as bvh_mod, traverse
from rtxpt_tpu.ops.intersect import TriSoup
from rtxpt_tpu.scene import omm
from rtxpt_tpu.scene.build import SceneBuilder, Mesh


def _scene_with_mask(alpha_img):
    """Floor + an occluder quad above it with an alpha-MASK texture."""
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


def _shadow_fraction(host):
    masks = omm.bake_opacity_masks(host)
    b2 = bvh_mod.build_bvh(host["positions"], host["indices"])
    import jax.numpy as jnp
    pos = jnp.asarray(host["positions"])
    idx = jnp.asarray(host["indices"])
    b8 = bvh_mod.collapse_bvh8(b2, pos, idx, tri_omm=masks)
    soup = TriSoup.build(pos, idx, b2.order)
    # shadow rays from points on the floor straight up past the occluder
    g = np.linspace(-0.9, 0.9, 16)
    gx, gz = np.meshgrid(g, g)
    o = np.stack([gx.reshape(-1), np.full(gx.size, 0.01),
                  gz.reshape(-1)], -1).astype(np.float32)
    d = np.tile(np.asarray([[0, 1, 0]], np.float32), (o.shape[0], 1))
    occluded = traverse.trace_anyhit(b8, soup, jnp.asarray(o),
                                     jnp.asarray(d), t_max=10.0)
    return float(np.asarray(occluded).mean())


def test_fully_masked_occluder_casts_no_shadow():
    img = np.zeros((8, 8, 4), np.uint8)           # alpha 0 everywhere
    img[..., :3] = 255
    frac = _shadow_fraction(_scene_with_mask(img))
    assert frac == 0.0, frac


def test_opaque_occluder_casts_full_shadow():
    img = np.full((8, 8, 4), 255, np.uint8)
    frac = _shadow_fraction(_scene_with_mask(img))
    assert frac == 1.0, frac


def test_half_masked_occluder_casts_partial_shadow():
    img = np.full((8, 8, 4), 255, np.uint8)
    img[:, 4:, 3] = 0                             # right half transparent
    frac = _shadow_fraction(_scene_with_mask(img))
    assert 0.25 < frac < 0.75, frac


def test_bake_masks_values():
    img = np.zeros((8, 8, 4), np.uint8)
    host = _scene_with_mask(img)
    masks = omm.bake_opacity_masks(host)
    # floor (opaque material) all-ones; occluder fully transparent -> 0
    tri_mat = np.asarray(host["tri_mat"])
    assert (masks[tri_mat == 0] == 0xFFFF).all()
    assert (masks[tri_mat == 1] == 0).all()
