"""Dense matmul-MT traversal (ops/mt_dense.py) vs the brute-force oracle.

Runs the Pallas kernel in interpret mode on the CPU test backend; on TPU
the same program compiles via Mosaic (exercised by bench/goldens)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtxpt_tpu.ops import mt_dense
from rtxpt_tpu.ops.intersect import TriSoup, bruteforce_closest


def _random_scene(seed, n_tris=300, spread=4.0):
    r = np.random.RandomState(seed)
    centers = r.uniform(-spread, spread, (n_tris, 3))
    v0 = centers + r.uniform(-0.4, 0.4, (n_tris, 3))
    v1 = centers + r.uniform(-0.4, 0.4, (n_tris, 3))
    v2 = centers + r.uniform(-0.4, 0.4, (n_tris, 3))
    positions = np.concatenate([v0, v1, v2]).astype(np.float32)
    indices = np.arange(3 * n_tris, dtype=np.int32).reshape(3, n_tris).T
    return positions, indices


def _random_rays(seed, n=257, spread=4.0):
    r = np.random.RandomState(seed)
    o = r.uniform(-2 * spread, 2 * spread, (n, 3)).astype(np.float32)
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_dense_closest_matches_oracle():
    positions, indices = _random_scene(3)
    dmt = mt_dense.build_dense(positions, indices)
    soup = TriSoup.build(positions, indices)
    o, d = _random_rays(7)
    ref = bruteforce_closest(soup, o, d)
    got = mt_dense.trace_closest(dmt, o, d, interpret=True)
    ref_t = np.asarray(ref.t)
    got_t = np.asarray(got.t)
    hit_match = (np.asarray(ref.prim) >= 0) == (np.asarray(got.prim) >= 0)
    assert hit_match.mean() > 0.995
    both = hit_match & (np.asarray(ref.prim) >= 0)
    assert np.allclose(ref_t[both], got_t[both], rtol=1e-3, atol=1e-4)
    # barycentrics of agreeing prims match
    same = both & (np.asarray(ref.prim) == np.asarray(got.prim))
    assert same.sum() > 0.9 * both.sum()
    assert np.allclose(np.asarray(ref.bary)[same],
                       np.asarray(got.bary)[same], atol=2e-3)


def test_dense_anyhit_and_tmax():
    positions, indices = _random_scene(11)
    dmt = mt_dense.build_dense(positions, indices)
    soup = TriSoup.build(positions, indices)
    o, d = _random_rays(13)
    ref = bruteforce_closest(soup, o, d)
    has = np.asarray(ref.prim) >= 0
    t_ref = np.asarray(ref.t)
    # t_max beyond the hit -> occluded; before the hit -> clear
    t_far = jnp.asarray(np.where(has, t_ref + 1.0, 1e6).astype(np.float32))
    t_near = jnp.asarray(np.maximum(t_ref - 0.5, 1e-3).astype(np.float32))
    occ_far = np.asarray(mt_dense.trace_anyhit(dmt, o, d, t_max=t_far,
                                               interpret=True))
    occ_near = np.asarray(mt_dense.trace_anyhit(dmt, o, d, t_max=t_near,
                                                interpret=True))
    assert (occ_far[has]).mean() > 0.99
    # near-capped rays may still clip a different (nearer) triangle rarely
    assert (~occ_near[has] | occ_far[has]).all()
    assert (occ_near[has]).mean() < 0.25


def test_dense_active_mask_and_padding():
    positions, indices = _random_scene(17, n_tris=70)   # forces padding
    dmt = mt_dense.build_dense(positions, indices)
    o, d = _random_rays(19, n=64)
    act = jnp.asarray((np.arange(64) % 2) == 0)
    got = mt_dense.trace_closest(dmt, o, d, active=act, interpret=True)
    assert (np.asarray(got.prim)[~np.asarray(act)] == -1).all()


def test_dense_omm_channel():
    positions, indices = _random_scene(23, n_tris=64)
    omm = np.full((64,), 0xFFFF, np.int64)
    omm[:32] = 0           # fully transparent triangles: never hit
    dmt = mt_dense.build_dense(positions, indices, tri_omm=omm)
    assert dmt.has_omm
    o, d = _random_rays(29, n=128)
    got = mt_dense.trace_closest(dmt, o, d, interpret=True)
    prim = np.asarray(got.prim)
    assert not np.isin(prim[prim >= 0], np.arange(32)).any()


def test_tile_worklists_conservative_superset():
    """The O(T*NC) interval prepass must admit every cluster the exact
    per-ray prepass admits (missing one would drop true hits), and the
    traced image must be identical either way."""
    positions, indices = _random_scene(5, n_tris=500)
    dmt = mt_dense.build_dense(positions, indices)
    nc = dmt.num_clusters
    o, d = _random_rays(13, n=2048)
    t_max = jnp.full((2048,), 1e30, jnp.float32)
    act = jnp.asarray(np.random.RandomState(2).rand(2048) > 0.2)
    c_ex, o_ex = mt_dense._tile_worklists_exact(
        dmt.aabb, o, d, t_max, act, nc=nc)
    c_cv, o_cv = mt_dense._tile_worklists_interval(
        dmt.aabb, o, d, t_max, act, nc=nc)
    c_ex, o_ex = np.asarray(c_ex), np.asarray(o_ex)
    c_cv, o_cv = np.asarray(c_cv), np.asarray(o_cv)
    for t in range(c_ex.shape[0]):
        exact = set(o_ex[t, :c_ex[t]].tolist())
        conserv = set(o_cv[t, :c_cv[t]].tolist())
        assert exact <= conserv, f"tile {t} dropped {exact - conserv}"
    # identical hits through the kernel either way. The prepass choice
    # is baked into jitted _trace_dense, so flip the module global AND
    # clear the jit cache (else the second call hits the cache and
    # compares the exact path to itself — ADVICE r4 medium).
    got = mt_dense.trace_closest(dmt, o, d, active=act, interpret=True)
    mt_dense.TILE_PREPASS = True
    mt_dense._trace_dense._clear_cache()
    try:
        ref = mt_dense.trace_closest(dmt, o, d, active=act,
                                     interpret=True)
    finally:
        mt_dense.TILE_PREPASS = False
        mt_dense._trace_dense._clear_cache()
    assert np.array_equal(np.asarray(ref.prim), np.asarray(got.prim))
    assert np.allclose(np.asarray(ref.t), np.asarray(got.t))
