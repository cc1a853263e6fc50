"""Unified BVH8 layout vs the BVH2 oracle (XLA path; the Pallas kernel
shares the same table format and is validated on-device)."""
import numpy as np
import jax.numpy as jnp

from rtxpt_tpu.ops import bvh as bvh_mod
from rtxpt_tpu.ops import intersect, traverse
from rtxpt_tpu.scene import procedural
from rtxpt_tpu.scene.build import to_device


def test_bvh8_matches_bvh2():
    sc = to_device(procedural.build_programmer_art().finish())
    bv2 = bvh_mod.build_bvh(np.asarray(sc.positions),
                            np.asarray(sc.indices))
    bv8 = bvh_mod.collapse_bvh8(bv2, sc.positions, sc.indices,
                                leaf_collapse=16)
    soup = intersect.TriSoup.build(sc.positions, sc.indices, bv2.order)
    rs = np.random.RandomState(0)
    n = 512
    o = jnp.asarray(rs.uniform(-3, 3, (n, 3)).astype(np.float32))
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    h2 = traverse.trace_closest(bv2, soup, o, d)
    h8 = traverse.trace_closest(bv8, None, o, d)
    np.testing.assert_allclose(np.asarray(h8.t), np.asarray(h2.t),
                               rtol=1e-4, atol=1e-5)
    p2, p8 = np.asarray(h2.prim), np.asarray(h8.prim)
    t2, t8 = np.asarray(h2.t), np.asarray(h8.t)
    assert ((p2 == p8) | (np.abs(t2 - t8) < 1e-4)).all()
    occ2 = traverse.trace_anyhit(bv2, soup, o, d, t_max=4.0)
    occ8 = traverse.trace_anyhit(bv8, None, o, d, t_max=4.0)
    np.testing.assert_array_equal(np.asarray(occ2), np.asarray(occ8))


def test_bvh8_code_values_exact_in_float():
    """Child codes are stored as float VALUES; they must round-trip."""
    sc = to_device(procedural.build_programmer_art().finish())
    bv2 = bvh_mod.build_bvh(np.asarray(sc.positions),
                            np.asarray(sc.indices))
    bv8 = bvh_mod.collapse_bvh8(bv2, sc.positions, sc.indices)
    codes = np.asarray(bv8.table[:bv8.num_nodes, 48:56])
    assert (codes == np.round(codes)).all()
    assert np.abs(codes).max() < 2 ** 24
