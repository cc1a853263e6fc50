import numpy as np
import jax.numpy as jnp

from rtxpt_tpu.core import mathutils as mu


def test_normalize():
    v = jnp.array([[3.0, 0.0, 4.0], [0.0, 2.0, 0.0]])
    n = np.asarray(mu.normalize(v))
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, rtol=1e-6)


def test_onb_orthonormal():
    rs = np.random.RandomState(0)
    n = rs.normal(size=(256, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    t, b = mu.onb_from_normal(jnp.asarray(n))
    t, b = np.asarray(t), np.asarray(b)
    np.testing.assert_allclose(np.sum(t * n, -1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.sum(b * n, -1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.sum(t * b, -1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1.0, atol=1e-5)
    # right-handed: cross(t,b) == n
    np.testing.assert_allclose(np.cross(t, b), n, atol=1e-5)


def test_local_frame_roundtrip():
    rs = np.random.RandomState(1)
    n = rs.normal(size=(64, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    v = rs.normal(size=(64, 3)).astype(np.float32)
    t, b = mu.onb_from_normal(jnp.asarray(n))
    loc = mu.to_local(jnp.asarray(v), t, b, jnp.asarray(n))
    back = mu.from_local(loc, t, b, jnp.asarray(n))
    np.testing.assert_allclose(np.asarray(back), v, atol=1e-5)


def test_cosine_hemisphere_distribution():
    """Mean cos(theta) of cosine-weighted samples should be 2/3."""
    rs = np.random.RandomState(2)
    u = rs.uniform(size=(20000, 2)).astype(np.float32)
    d, pdf = mu.sample_cosine_hemisphere_concentric(jnp.asarray(u))
    d, pdf = np.asarray(d), np.asarray(pdf)
    assert (d[:, 2] >= 0).all()
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(pdf, d[:, 2] / np.pi, atol=1e-6)
    assert abs(d[:, 2].mean() - 2.0 / 3.0) < 0.01


def test_oct_encoding_roundtrip():
    rs = np.random.RandomState(3)
    n = rs.normal(size=(512, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    dec = np.asarray(mu.decode_oct(mu.encode_oct(jnp.asarray(n))))
    np.testing.assert_allclose(dec, n, atol=2e-7 + 1e-3)


def test_compute_ray_origin_offsets_forward():
    """Offset origin must be strictly on the normal side of the surface."""
    rs = np.random.RandomState(4)
    pos = (rs.normal(size=(256, 3)) * 100).astype(np.float32)
    n = rs.normal(size=(256, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    new = np.asarray(mu.compute_ray_origin(jnp.asarray(pos), jnp.asarray(n)))
    d = np.sum((new - pos) * n, axis=-1)
    assert (d > 0).all()
    # and the offset is tiny relative to the magnitude
    assert (np.abs(new - pos) <= np.maximum(np.abs(pos) * 1e-4, 1e-3)).all()


def test_mis_balance():
    w = float(mu.eval_mis(1.0, 2.0, 1.0, 2.0))
    assert abs(w - 0.5) < 1e-6
    w = float(mu.eval_mis(1.0, 1.0, 4.0, 1.0))
    assert abs(w - 0.2) < 1e-6


def test_firefly_filter():
    sig = jnp.array([[100.0, 100.0, 100.0]])
    out = np.asarray(mu.firefly_filter(sig, 1.0, jnp.array([1.0])))
    assert mu.luminance(jnp.asarray(out))[0] <= 1.0 + 1e-5
    # disabled when threshold <= 0
    out = np.asarray(mu.firefly_filter(sig, 0.0, jnp.array([1.0])))
    np.testing.assert_allclose(out, np.asarray(sig))
