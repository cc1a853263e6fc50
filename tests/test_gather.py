"""MXU gather-plane machinery: the fused barycentric-interp gather
kernel (interpret mode), device-side plane packing, and the skinning
refresh of derived tables (vert_gp / tri_geom / dense-MT planes)."""
import numpy as np
import jax.numpy as jnp

from rtxpt_tpu.ops import gather_pallas as GPL


def _rand_table(rs, rows, width):
    return (rs.standard_normal((rows, width)) * 10.0).astype(np.float32)


def test_gather_rows_interp_matches_manual():
    rs = np.random.RandomState(3)
    rows, width, n = 257, 12, 2000
    table = _rand_table(rs, rows, width)
    gp = GPL.pack_f32(table)
    tri = rs.randint(0, rows, (n, 3)).astype(np.int32)
    b = rs.uniform(0, 1, (n, 2)).astype(np.float32) * 0.5
    w = np.stack([1.0 - b[:, 0] - b[:, 1], b[:, 0], b[:, 1]], -1)
    out = np.asarray(GPL.gather_rows_interp(
        gp, jnp.asarray(tri), jnp.asarray(w), interpret=True))
    ref = np.einsum("nv,nvw->nw", w, table[tri])
    np.testing.assert_allclose(out, ref, rtol=2e-6, atol=2e-5)


def test_pack_f32_device_matches_host():
    rs = np.random.RandomState(5)
    table = _rand_table(rs, 100, 7)
    host = GPL.pack_f32(table)
    dev = GPL.pack_f32_device(jnp.asarray(table))
    assert dev.width == host.width and dev.rows == host.rows
    np.testing.assert_array_equal(
        np.asarray(dev.planes, np.float32),
        np.asarray(host.planes, np.float32))


def test_tri_geom_pack_matches_shading_fallback():
    """tri_geom rows must equal what the XLA fallback computes inline
    (face normal from the vertex cross product, raw uv area)."""
    from rtxpt_tpu.scene import procedural
    from rtxpt_tpu.scene import types as ST
    host = procedural.build_programmer_art().finish()
    pos = np.asarray(host["positions"])
    uvs = np.asarray(host["uvs"])
    idx = np.asarray(host["indices"])
    tg = ST.tri_geom_pack(pos, uvs, idx, np)
    p0, p1, p2 = pos[idx[:, 0]], pos[idx[:, 1]], pos[idx[:, 2]]
    cr = np.cross(p1 - p0, p2 - p0)
    ln = np.linalg.norm(cr, axis=-1)
    np.testing.assert_allclose(tg[:, 4], 0.5 * ln, rtol=1e-6)
    ok = ln > 1e-12
    np.testing.assert_allclose(tg[ok, 0:3], cr[ok] / ln[ok, None],
                               rtol=1e-5, atol=1e-6)


def test_dense_refresh_matches_rebuild():
    """refresh_dense on deformed positions must reproduce a from-scratch
    build (same morton order kept by construction; recenter origin is
    baked so compare against a rebuild recentered identically)."""
    from rtxpt_tpu.ops import mt_dense
    rs = np.random.RandomState(11)
    v = rs.uniform(-2, 2, (60, 3)).astype(np.float32)
    idx = rs.randint(0, 60, (40, 3)).astype(np.int32)
    d0 = mt_dense.build_dense(v, idx)
    moved = v + rs.uniform(-0.2, 0.2, v.shape).astype(np.float32)
    d1 = mt_dense.refresh_dense(d0, jnp.asarray(moved), jnp.asarray(idx))
    # rebuild from scratch on the moved verts; same tri order because
    # the morton codes are computed from centroids that moved slightly—
    # compare per ORIGINAL id so ordering differences don't matter
    assert np.array_equal(np.asarray(d1.tri_ids), np.asarray(d0.tri_ids))
    # exactness: the refreshed planes must intersect like a fresh build.
    o = jnp.asarray(rs.uniform(-3, 3, (128, 3)).astype(np.float32))
    dvec = rs.standard_normal((128, 3)).astype(np.float32)
    dvec /= np.linalg.norm(dvec, axis=-1, keepdims=True)
    d2 = mt_dense.build_dense(moved, idx)
    h1 = mt_dense.trace_closest(d1, o, jnp.asarray(dvec), interpret=True)
    h2 = mt_dense.trace_closest(d2, o, jnp.asarray(dvec), interpret=True)
    np.testing.assert_array_equal(np.asarray(h1.prim), np.asarray(h2.prim))
    np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h2.t),
                               rtol=1e-5, atol=1e-5)


def test_skinning_refreshes_derived_tables():
    """After refresh_skinned, vert_pack/vert_gp/tri_geom must reflect
    the new pose (the round-3 staleness fix: vert_gp and the dense
    planes previously kept the rest pose)."""
    from tests.test_skinning import _skinned_host
    from rtxpt_tpu.models.renderer import Renderer, reference_config
    from rtxpt_tpu.scene.camera import make_camera
    host, info = _skinned_host()
    cam = make_camera(32, 24, pos=(0, 1, 4), look_dir=(0, 0, -1))
    r = Renderer(host, cam, reference_config(max_bounces=2))
    tg0 = np.asarray(r.scene.tri_geom_pack)
    s, c = np.sin(np.pi / 4), np.cos(np.pi / 4)
    info["gltf"].json["nodes"][2]["rotation"] = [0.0, 0.0, float(s),
                                                float(c)]
    r.animate(info, 0.0)
    # vert_pack positions match scene.positions (already covered) AND
    # tri_geom was recomputed for the new pose
    tg1 = np.asarray(r.scene.tri_geom_pack)
    del tg0  # planar ribbon: normals may be pose-invariant here
    from rtxpt_tpu.scene import types as ST
    expect = np.asarray(ST.tri_geom_pack(
        np.asarray(r.scene.positions), np.asarray(r.scene.uvs),
        np.asarray(r.scene.indices), np))
    np.testing.assert_allclose(tg1, expect, rtol=1e-5, atol=1e-6)
    if r.scene.vert_gp is not None:
        fresh = GPL.pack_f32(np.asarray(r.scene.vert_pack))
        np.testing.assert_array_equal(
            np.asarray(r.scene.vert_gp.planes, np.float32),
            np.asarray(fresh.planes, np.float32))
