"""Two-level BVH8 (ops/bvh2l.py) vs the flat single-table traversal:
same hits, any-hit parity, OMM carried through (the TLAS/BLAS-scale
path for Bistro-class scenes)."""
import numpy as np
import jax.numpy as jnp

from rtxpt_tpu.ops import bvh as bvh_mod, bvh2l, traverse
from rtxpt_tpu.ops.intersect import TriSoup
from rtxpt_tpu.scene import procedural


def _scene_and_rays(n_rays=4096):
    host = procedural.build_programmer_art().finish()
    pos = jnp.asarray(host["positions"])
    idx = jnp.asarray(host["indices"])
    rng = np.random.default_rng(3)
    o = rng.uniform(-4, 4, (n_rays, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.2, 4.0, n_rays)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return host, pos, idx, jnp.asarray(o), jnp.asarray(d)


def test_two_level_matches_flat():
    host, pos, idx, o, d = _scene_and_rays()
    b2 = bvh_mod.build_bvh(host["positions"], host["indices"])
    b8 = bvh_mod.collapse_bvh8(b2, pos, idx)
    soup = TriSoup.build(pos, idx, b2.order)
    # force a multi-subtree split of the small scene
    tl = bvh2l.build_two_level(host["positions"], host["indices"],
                               cap_tris=800)
    assert tl.num_subtrees >= 4, tl.num_subtrees

    h_flat = traverse.trace_closest(b8, soup, o, d)
    h_tl = bvh2l.trace_closest(tl, o, d)
    pf = np.asarray(h_flat.prim)
    pt = np.asarray(h_tl.prim)
    # hits agree (modulo coplanar-tie prim choice: t must agree always)
    np.testing.assert_allclose(np.asarray(h_tl.t)[pf >= 0],
                               np.asarray(h_flat.t)[pf >= 0], rtol=1e-4)
    assert (pf >= 0).sum() == (pt >= 0).sum()
    assert (pf == pt).mean() > 0.995

    a_flat = np.asarray(traverse.trace_anyhit(b8, soup, o, d, t_max=6.0))
    a_tl = np.asarray(bvh2l.trace_anyhit(tl, o, d, t_max=6.0))
    assert (a_flat == a_tl).all()


def test_two_level_dispatch_via_traverse():
    host, pos, idx, o, d = _scene_and_rays(512)
    tl = bvh2l.build_two_level(host["positions"], host["indices"],
                               cap_tris=800)
    h = traverse.trace_closest(tl, None, o, d)
    assert np.asarray(h.prim).max() >= 0


def test_bucketed_probe_matches_flat(monkeypatch):
    """The one-dispatch scalar-prefetch probe (sorted rays, per-tile
    subtree planes) + culled sweep must agree with the flat traversal
    bit-for-bit on t."""
    monkeypatch.setenv("RTXPT_BVH2L_INTERPRET", "1")
    host, pos, idx, o, d = _scene_and_rays(2048)
    b2 = bvh_mod.build_bvh(host["positions"], host["indices"])
    b8 = bvh_mod.collapse_bvh8(b2, pos, idx)
    soup = TriSoup.build(pos, idx, b2.order)
    tl = bvh2l.build_two_level(host["positions"], host["indices"],
                               cap_tris=300)
    assert tl.num_subtrees >= 8, tl.num_subtrees  # probe engages

    h_flat = traverse.trace_closest(b8, soup, o, d)
    h_tl = bvh2l.trace_closest(tl, o, d)
    pf = np.asarray(h_flat.prim)
    pt = np.asarray(h_tl.prim)
    np.testing.assert_allclose(np.asarray(h_tl.t)[pf >= 0],
                               np.asarray(h_flat.t)[pf >= 0], rtol=1e-4)
    assert (pf >= 0).sum() == (pt >= 0).sum()
    assert (pf == pt).mean() > 0.995
    # partially-active wavefront (the integrator's normal case)
    act = jnp.asarray(np.arange(2048) % 3 != 0)
    h_act = bvh2l.trace_closest(tl, o, d, active=act)
    pa = np.asarray(h_act.prim)
    assert (pa[~np.asarray(act)] == -1).all()
    keep = np.asarray(act) & (pf >= 0)
    np.testing.assert_allclose(np.asarray(h_act.t)[keep],
                               np.asarray(h_flat.t)[keep], rtol=1e-4)
    # bucketed occluder probe: anyhit parity with the flat kernel
    a_flat = np.asarray(traverse.trace_anyhit(b8, soup, o, d, t_max=6.0))
    a_tl = np.asarray(bvh2l.trace_anyhit(tl, o, d, t_max=6.0))
    assert (a_flat == a_tl).all()


def test_city_scene_builds_two_level():
    host = procedural.build_city(blocks=3, subdivisions=1).finish()
    tl = bvh2l.build_two_level(host["positions"], host["indices"])
    assert tl.num_subtrees >= 1
    assert tl.rows <= 4096
    cam = procedural.city_camera(32, 24, blocks=3)
    from rtxpt_tpu.scene.camera import compute_rays
    px, py = np.meshgrid(np.arange(32, dtype=np.uint32),
                         np.arange(24, dtype=np.uint32))
    o, d = compute_rays(cam, jnp.asarray(px.reshape(-1)),
                        jnp.asarray(py.reshape(-1)))
    h = bvh2l.trace_closest(tl, o, d)
    assert (np.asarray(h.prim) >= 0).mean() > 0.5  # city fills the view
