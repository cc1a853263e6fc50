"""Skinned geometry end-to-end: JOINTS/WEIGHTS -> joint matrices ->
device skinning -> BVH8 refit -> render (VERDICT round-1 item 9;
reference donut Scene.cpp:745-800 skinning_cs + Sample.cpp:1355-1380)."""
import types

import numpy as np
import jax.numpy as jnp

from rtxpt_tpu.models.renderer import Renderer, reference_config
from rtxpt_tpu.scene import animation as AN
from rtxpt_tpu.scene.build import Mesh, SceneBuilder
from rtxpt_tpu.scene.camera import make_camera


def _skinned_host():
    """A vertical two-bone 'arm': quad strip from y=0..2, lower verts
    bound to joint 0 (node 1), upper to joint 1 (node 2)."""
    sb = SceneBuilder()
    sb.add_material(base_color=(0.8, 0.2, 0.2), roughness=1.0)
    ys = np.linspace(0.0, 2.0, 5)
    pos = []
    for y in ys:
        pos += [[-0.2, y, 0.0], [0.2, y, 0.0]]
    pos = np.asarray(pos, np.float32)
    idx = []
    for r in range(4):
        a = 2 * r
        idx += [[a, a + 1, a + 2], [a + 1, a + 3, a + 2]]
    idx = np.asarray(idx, np.int32)
    w_up = np.clip(pos[:, 1] / 2.0, 0.0, 1.0)
    weights = np.stack([1.0 - w_up, w_up, np.zeros_like(w_up),
                        np.zeros_like(w_up)], -1).astype(np.float32)
    joints = np.tile(np.asarray([[0, 1, 0, 0]], np.int32),
                     (pos.shape[0], 1))
    mesh = sb.add_mesh(Mesh(positions=pos, indices=idx, joints=joints,
                            weights=weights))
    sb.add_instance(mesh, None, skin=0)
    host = sb.finish()
    assert len(host["skin_bindings"]) == 1

    # node 0: scene root holding the mesh; node 1: root bone at origin;
    # node 2: elbow bone at y=1 (child of 1)
    nodes = [
        {"mesh": 0, "skin": 0},
        {"translation": [0, 0, 0], "children": [2]},
        {"translation": [0, 1, 0]},
    ]
    gjson = {"nodes": nodes, "scenes": [{"nodes": [0, 1]}], "scene": 0,
             "animations": []}
    gf = types.SimpleNamespace(json=gjson)
    inv_bind = np.stack([np.eye(3, 4, dtype=np.float32),
                         np.asarray([[1, 0, 0, 0], [0, 1, 0, -1],
                                     [0, 0, 1, 0]], np.float32)])
    info = dict(gltf=gf,
                skins=[dict(joints=[1, 2], inverse_bind=inv_bind)])
    return host, info


def test_rest_pose_identity():
    host, info = _skinned_host()
    cam = make_camera(32, 24, pos=(0, 1, 4), look_dir=(0, 0, -1))
    r = Renderer(host, cam, reference_config(max_bounces=2))
    before = np.asarray(r.scene.positions).copy()
    r.animate(info, 0.0)
    after = np.asarray(r.scene.positions)
    np.testing.assert_allclose(after, before, atol=1e-5)


def test_bent_elbow_moves_vertices_and_refits():
    host, info = _skinned_host()
    cam = make_camera(32, 24, pos=(0, 1, 4), look_dir=(0, 0, -1))
    r = Renderer(host, cam, reference_config(max_bounces=2))
    # bend the elbow 90 degrees around z (quaternion about +z)
    s, c = np.sin(np.pi / 4), np.cos(np.pi / 4)
    info["gltf"].json["nodes"][2]["rotation"] = [0.0, 0.0, float(s),
                                                float(c)]
    r.animate(info, 0.0)
    p = np.asarray(r.scene.positions)
    # the tip (rest (±0.2, 2)) rotates to ~(∓1 offset) about the elbow
    tip = p[-2:]
    assert abs(tip[:, 1].max() - 1.2) < 0.05, tip
    assert tip[:, 0].min() < -0.7, tip
    # BVH refit reflects the new pose: render still hits the arm
    img = np.asarray(r.render(32, 24, 2))
    assert np.isfinite(img).all()
    # the BVH8 leaf table contains the moved vertex data
    root_bounds = np.asarray(r.bvh.table[0, :48])
    assert root_bounds.reshape(8, 6)[:, 3].max() < 1.6  # y max shrank
