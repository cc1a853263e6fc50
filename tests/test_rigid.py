"""Rigid node animation: node TRS channels re-flatten non-skinned
instance vertex ranges and refit/retarget the acceleration structure
(donut SceneGraph transform refresh, SceneGraph.cpp; RTXPT per-frame
TLAS build over static BLASes, Sample.cpp:1353-1421)."""
import numpy as np
import jax.numpy as jnp

from rtxpt_tpu.models.renderer import Renderer, reference_config
from rtxpt_tpu.scene import animation as AN
from rtxpt_tpu.scene.build import Mesh, SceneBuilder, to_device
from rtxpt_tpu.scene.camera import make_camera


def _unit_quad():
    pos = np.asarray([[-0.5, -0.5, 0], [0.5, -0.5, 0],
                      [0.5, 0.5, 0], [-0.5, 0.5, 0]], np.float32)
    idx = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    return pos, idx


class _GF:
    """Minimal gltf.GltfFile stand-in: json + accessor(i)."""

    def __init__(self, json, accessors):
        self.json = json
        self._acc = accessors

    def accessor(self, i):
        return self._acc[i]


def _rigid_host(path="translation"):
    """Two instances of one quad: node 1 animated, node 2 static."""
    sb = SceneBuilder()
    sb.add_material(base_color=(0.8, 0.2, 0.2), roughness=1.0)
    pos, idx = _unit_quad()
    mesh = sb.add_mesh(Mesh(positions=pos, indices=idx))
    sb.add_instance(mesh, np.eye(3, 4, dtype=np.float32), node=1)
    x2 = np.eye(3, 4, dtype=np.float32)
    x2[:, 3] = [0.0, 0.0, -3.0]
    sb.add_instance(mesh, x2, node=2)
    host = sb.finish()
    assert len(host["rigid_bindings"]) == 2

    nodes = [
        {"children": [1, 2]},
        {"translation": [0, 0, 0]},
        {"translation": [0, 0, -3]},
    ]
    if path == "translation":
        out = np.asarray([[0, 0, 0], [2, 0, 0]], np.float32)
    else:  # rotation: 90 degrees about +y
        s, c = np.sin(np.pi / 4), np.cos(np.pi / 4)
        out = np.asarray([[0, s, 0, c]] * 2, np.float32)
    gjson = {"nodes": nodes, "scenes": [{"nodes": [0]}], "scene": 0,
             "animations": [{
                 "channels": [{"sampler": 0,
                               "target": {"node": 1, "path": path}}],
                 "samplers": [{"input": 0, "output": 1,
                               "interpolation": "LINEAR"}],
             }]}
    info = dict(gltf=_GF(gjson, [np.asarray([0.0, 1.0], np.float32),
                                 out]), skins=[])
    return host, info


def test_rigid_refresh_moves_range_end_to_end():
    host, info = _rigid_host()
    cam = make_camera(32, 24, pos=(0, 0, 4), look_dir=(0, 0, -1))
    r = Renderer(host, cam, reference_config(max_bounces=2))
    before = np.asarray(r.scene.positions).copy()
    r.animate(info, 0.0)                   # t=0: identity, nothing moves
    np.testing.assert_allclose(np.asarray(r.scene.positions), before,
                               atol=1e-6)
    r.animate(info, 1.0)                   # t=1: instance 0 moves +2x
    p = np.asarray(r.scene.positions)
    np.testing.assert_allclose(p[0:4, 0],
                               before[0:4, 0] + 2.0, atol=1e-6)
    np.testing.assert_allclose(p[4:8], before[4:8], atol=1e-6)
    if r.scene.vert_pack is not None:
        np.testing.assert_allclose(np.asarray(r.scene.vert_pack[0:4, 0]),
                                   p[0:4, 0], atol=1e-6)
    # acceleration structures follow: render stays finite and the moved
    # quad is visible at its NEW location (camera ray through x=+2)
    img = np.asarray(r.render(32, 24, 1))
    assert np.isfinite(img).all()
    # retained instance table tracks the animation
    np.testing.assert_allclose(
        host["instancing"]["transforms"][0][:, 3], [2, 0, 0], atol=1e-6)


def test_rigid_rotation_transforms_normals_and_tangents():
    host, info = _rigid_host(path="rotation")
    scene = to_device(host)
    from rtxpt_tpu.ops import bvh as bvh_mod
    bvh2 = bvh_mod.build_bvh(host["positions"], host["indices"])
    bvh8 = bvh_mod.collapse_bvh8(bvh2, scene.positions, scene.indices)
    s1, _ = AN.refresh_skinned(host, info, scene, bvh8, 1.0)
    n = np.asarray(s1.normals[0:4])
    # quad normal (0,0,1) rotated 90deg about y -> (1,0,0)
    np.testing.assert_allclose(np.abs(n[:, 0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(n[:, 2], 0.0, atol=1e-5)
    if s1.vert_pack is not None:
        t = np.asarray(s1.vert_pack[0:4, 6:9])
        # tangents rotate with the node: unit length, orthogonal to n
        np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1.0,
                                   atol=1e-4)
        np.testing.assert_allclose(np.abs((t * n).sum(-1)), 0.0,
                                   atol=1e-4)


def test_rigid_refresh_instanced_tlas_rows():
    """With an instanced TLAS, rigid motion updates instance rows only
    (no BLAS rebuild) and traversal sees the move."""
    host, info = _rigid_host()
    from rtxpt_tpu.ops import instanced as inst_mod
    tl = inst_mod.build_instanced(host["instancing"])
    scene = to_device(host)
    s1, tl1 = AN.refresh_skinned(host, info, scene, tl, 1.0)
    hit = inst_mod.trace_closest(
        tl1, jnp.asarray([[2.0, 0.0, 5.0]], jnp.float32),
        jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32))
    assert int(hit.prim[0]) >= 0                # found at x=+2
    np.testing.assert_allclose(float(hit.t[0]), 5.0, atol=1e-4)
    # a ray through the OLD location passes through to the static
    # instance at z=-3 (t=8), not the stale row at z=0 (t=5)
    thr = inst_mod.trace_closest(
        tl1, jnp.asarray([[0.0, 0.0, 5.0]], jnp.float32),
        jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32))
    np.testing.assert_allclose(float(thr.t[0]), 8.0, atol=1e-4)
