"""Instanced TLAS-over-BLAS (ops/instanced.py; VERDICT r2 item 4):
shared meshes store ONE BLAS, rigid motion refits without rebuild, and
traversal matches the flattened-soup path exactly."""
import numpy as np
import jax.numpy as jnp
import pytest

from rtxpt_tpu.ops import bvh as bvh_mod, instanced, traverse
from rtxpt_tpu.ops.intersect import TriSoup, bruteforce_closest
from rtxpt_tpu.scene import procedural
from rtxpt_tpu.scene.build import Mesh, SceneBuilder
from rtxpt_tpu.scene.procedural import make_box, make_icosphere


def _two_instance_host():
    sb = SceneBuilder()
    sb.add_material()
    box = sb.add_mesh(make_box((0.5, 0.5, 0.5)))
    xf1 = np.eye(3, 4, dtype=np.float32)
    xf2 = np.eye(3, 4, dtype=np.float32)
    xf2[:, 3] = [2.0, 0.0, 0.5]
    xf2[:, :3] *= 0.7
    sb.add_instance(box, xf1, 0)
    sb.add_instance(box, xf2, 0)
    return sb.finish()


def _rays(n=400, seed=5):
    r = np.random.RandomState(seed)
    o = r.uniform(-4, 4, (n, 3)).astype(np.float32)
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_shared_mesh_stores_one_blas():
    host = _two_instance_host()
    tl = instanced.build_instanced(host["instancing"])
    assert tl.num_meshes == 1          # two instances, ONE BLAS
    assert tl.num_instances == 2


def test_instanced_matches_flat_trace():
    host = _two_instance_host()
    tl = instanced.build_instanced(host["instancing"])
    soup = TriSoup.build(host["positions"], host["indices"])
    o, d = _rays()
    ref = bruteforce_closest(soup, o, d)
    got = instanced.trace_closest(tl, o, d)
    rp, gp = np.asarray(ref.prim), np.asarray(got.prim)
    assert ((rp >= 0) == (gp >= 0)).all()
    both = rp >= 0
    assert np.allclose(np.asarray(ref.t)[both], np.asarray(got.t)[both],
                       rtol=1e-4, atol=1e-5)
    same = both & (rp == gp)
    assert same.sum() >= 0.999 * both.sum()
    assert np.allclose(np.asarray(ref.bary)[same],
                       np.asarray(got.bary)[same], atol=1e-4)
    occ = np.asarray(instanced.trace_anyhit(tl, o, d, t_max=100.0))
    assert (occ == (rp >= 0)).all()


def test_mirrored_instance_bary_remap():
    sb = SceneBuilder()
    sb.add_material()
    box = sb.add_mesh(make_box((0.5, 0.5, 0.5)))
    mir = np.eye(3, 4, dtype=np.float32)
    mir[0, 0] = -1.0                          # mirror in x
    mir[:, 3] = [1.5, 0, 0]
    sb.add_instance(box, np.eye(3, 4, dtype=np.float32), 0)
    sb.add_instance(box, mir, 0)
    host = sb.finish()
    tl = instanced.build_instanced(host["instancing"])
    soup = TriSoup.build(host["positions"], host["indices"])
    # rays AIMED at the two boxes (random origins on a sphere, targets
    # jittered inside the boxes) so every lane exercises the remap
    r = np.random.RandomState(9)
    o_np = r.normal(size=(600, 3)).astype(np.float32)
    o_np = 5.0 * o_np / np.linalg.norm(o_np, axis=-1, keepdims=True)
    tgt = r.uniform(-0.4, 0.4, (600, 3)).astype(np.float32)
    tgt[::2, 0] += 1.5                            # mirrored instance
    d_np = tgt - o_np
    d_np /= np.linalg.norm(d_np, axis=-1, keepdims=True)
    o, d = jnp.asarray(o_np), jnp.asarray(d_np)
    ref = bruteforce_closest(soup, o, d)
    got = instanced.trace_closest(tl, o, d)
    same = (np.asarray(ref.prim) >= 0) & \
        (np.asarray(ref.prim) == np.asarray(got.prim))
    assert same.sum() > 50
    assert np.allclose(np.asarray(ref.bary)[same],
                       np.asarray(got.bary)[same], atol=1e-4)


def test_rigid_refit_moves_instance():
    host = _two_instance_host()
    tl = instanced.build_instanced(host["instancing"])
    o = jnp.asarray([[2.0, 0.0, -5.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    hit0 = instanced.trace_closest(tl, o, d)
    assert int(np.asarray(hit0.prim)[0]) >= 0   # instance 2 on the ray
    xf = np.eye(3, 4, dtype=np.float32)
    xf[:, 3] = [10.0, 0.0, 0.0]                 # move it away
    tl2 = instanced.set_instance_transform(tl, host["instancing"], 1, xf)
    hit1 = instanced.trace_closest(tl2, o, d)
    assert int(np.asarray(hit1.prim)[0]) < 0
    # and a ray at the new location finds it
    o2 = jnp.asarray([[10.0, 0.0, -5.0]], jnp.float32)
    hit2 = instanced.trace_closest(tl2, o2, d)
    assert int(np.asarray(hit2.prim)[0]) >= 0


def test_many_instances_chunked_no_fallback(monkeypatch):
    """>INST_CHUNK instances traverse the instanced path in chunks with
    NO flattened-soup fallback, and match the brute-force soup trace
    (VERDICT r3 next #5 'Done' criterion). blocks=4 city = 534 instances
    = 3 chunks of 256; 55k tris auto-selects instanced without forcing."""
    from rtxpt_tpu.models.renderer import Renderer, reference_config
    monkeypatch.delenv("RTXPT_INSTANCED", raising=False)
    host = procedural.build_city(blocks=4).finish()
    assert len(host["instancing"]["mesh_of_instance"]) > instanced.INST_CHUNK
    cam = procedural.city_camera(24, 16, blocks=4)
    r = Renderer(host, cam, reference_config(max_bounces=1,
                                             max_diffuse_bounces=1,
                                             nee_local_samples=0))
    assert hasattr(r.bvh, "inst_aabb"), "auto path fell back to soup"
    assert r.bvh.num_instances > instanced.INST_CHUNK

    soup = TriSoup.build(host["positions"], host["indices"])
    o, d = _rays(n=256, seed=11)
    o = o * jnp.asarray([8.0, 2.0, 8.0]) + jnp.asarray([0.0, 3.0, 0.0])
    ref = bruteforce_closest(soup, o, d)
    got = instanced.trace_closest(r.bvh, o, d)
    rp, gp = np.asarray(ref.prim), np.asarray(got.prim)
    assert ((rp >= 0) == (gp >= 0)).all()
    both = rp >= 0
    assert np.allclose(np.asarray(ref.t)[both], np.asarray(got.t)[both],
                       rtol=1e-4, atol=1e-5)


def test_city_renders_through_instanced_path(monkeypatch):
    """End-to-end: the city fixture auto-selects the instanced path and
    produces a finite image; memory drops (4 BLASes vs 55k-tri soup)."""
    from rtxpt_tpu.models.renderer import Renderer, reference_config
    monkeypatch.setenv("RTXPT_INSTANCED", "1")
    sb = procedural.build_city(blocks=2)
    host = sb.finish()
    cam = procedural.default_camera(32, 20)
    r = Renderer(host, cam, reference_config(max_bounces=1,
                                             max_diffuse_bounces=1,
                                             nee_local_samples=0))
    assert hasattr(r.bvh, "inst_aabb")
    img = np.asarray(r.render(32, 20, 1))
    assert np.isfinite(img).all() and img.mean() > 0.0
