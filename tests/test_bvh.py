"""BVH build + traversal vs brute-force oracle."""
import numpy as np
import pytest
import jax.numpy as jnp

from rtxpt_tpu.ops import bvh as bvh_mod
from rtxpt_tpu.ops import intersect, traverse
from rtxpt_tpu.scene import procedural
from rtxpt_tpu.scene.build import to_device


def _scene():
    sb = procedural.build_programmer_art()
    host = sb.finish()
    return to_device(host)


def _rand_rays(n, seed=0):
    rs = np.random.RandomState(seed)
    o = rs.uniform(-3, 3, size=(n, 3)).astype(np.float32)
    o[:, 1] = rs.uniform(0.2, 3.0, size=n)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_closest_matches_bruteforce():
    sc = _scene()
    bv = bvh_mod.build_bvh(np.asarray(sc.positions), np.asarray(sc.indices))
    soup_bvh = intersect.TriSoup.build(sc.positions, sc.indices, bv.order)
    soup_brt = intersect.TriSoup.build(sc.positions, sc.indices)
    o, d = _rand_rays(512)
    hb = traverse.trace_closest(bv, soup_bvh, o, d)
    ho = intersect.bruteforce_closest(soup_brt, o, d)
    hb_prim, ho_prim = np.asarray(hb.prim), np.asarray(ho.prim)
    hb_t, ho_t = np.asarray(hb.t), np.asarray(ho.t)
    # allow t-ties between coplanar tris: compare distances everywhere
    np.testing.assert_allclose(hb_t, ho_t, rtol=1e-4, atol=1e-5)
    agree = (hb_prim == ho_prim) | (np.abs(hb_t - ho_t) < 1e-4)
    assert agree.all()
    # sanity: a decent fraction hits the scene
    assert (ho_prim >= 0).mean() > 0.4


def test_anyhit_matches_bruteforce():
    sc = _scene()
    bv = bvh_mod.build_bvh(np.asarray(sc.positions), np.asarray(sc.indices))
    soup_bvh = intersect.TriSoup.build(sc.positions, sc.indices, bv.order)
    soup_brt = intersect.TriSoup.build(sc.positions, sc.indices)
    o, d = _rand_rays(512, seed=1)
    occ_b = np.asarray(traverse.trace_anyhit(bv, soup_bvh, o, d, t_max=4.0))
    occ_o = np.asarray(intersect.bruteforce_anyhit(soup_brt, o, d, t_max=4.0))
    np.testing.assert_array_equal(occ_b, occ_o)


def test_active_mask():
    sc = _scene()
    bv = bvh_mod.build_bvh(np.asarray(sc.positions), np.asarray(sc.indices))
    soup = intersect.TriSoup.build(sc.positions, sc.indices, bv.order)
    o, d = _rand_rays(64, seed=2)
    active = jnp.arange(64) % 2 == 0
    h = traverse.trace_closest(bv, soup, o, d, active=active)
    assert (np.asarray(h.prim)[~np.asarray(active)] == -1).all()


@pytest.mark.slow
def test_refit_matches_rebuild():
    sc = _scene()
    pos = np.asarray(sc.positions)
    idx = np.asarray(sc.indices)
    bv = bvh_mod.build_bvh(pos, idx)
    # translate all vertices; refit and check traversal still correct
    pos2 = pos + np.asarray([0.3, 0.1, -0.2], np.float32)
    bv2 = bvh_mod.refit(bv, jnp.asarray(pos2), jnp.asarray(idx))
    soup2 = intersect.TriSoup.build(jnp.asarray(pos2), jnp.asarray(idx),
                                    bv2.order)
    soup_brt = intersect.TriSoup.build(jnp.asarray(pos2), jnp.asarray(idx))
    o, d = _rand_rays(256, seed=3)
    hb = traverse.trace_closest(bv2, soup2, o, d)
    ho = intersect.bruteforce_closest(soup_brt, o, d)
    np.testing.assert_allclose(np.asarray(hb.t), np.asarray(ho.t),
                               rtol=1e-4, atol=1e-5)
