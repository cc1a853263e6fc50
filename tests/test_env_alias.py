"""Alias-table env sampler (scene/envmap.sample_alias): O(1) draws with
the exact mip-descent texel pmf — distribution, pdf and furnace checks."""
import numpy as np
import jax.numpy as jnp

from rtxpt_tpu.core import mathutils as mu
from rtxpt_tpu.scene import envmap as EM


def _env():
    return EM.make_envmap(EM.bake_procedural_sky(height=32))


def test_alias_pdf_matches_pdf_fn():
    env = _env()
    r = np.random.RandomState(0)
    u2 = jnp.asarray(r.rand(4096, 2).astype(np.float32))
    d, pdf, le = EM.sample_alias(env, u2)
    pdf_fn = EM.pdf_mip_descent(env, d)
    assert np.allclose(np.asarray(pdf), np.asarray(pdf_fn), rtol=1e-4)
    # le matches direct radiance lookup at the texel
    h, w = env.height, env.width
    uv = EM.dir_to_uv(d)
    x = np.clip((np.asarray(uv[..., 0]) * w).astype(int), 0, w - 1)
    y = np.clip((np.asarray(uv[..., 1]) * h).astype(int), 0, h - 1)
    le_ref = np.asarray(env.radiance)[y, x] * float(env.intensity)
    assert np.allclose(np.asarray(le), le_ref, rtol=1e-4)


def test_alias_distribution_matches_descent():
    env = _env()
    r = np.random.RandomState(1)
    n = 200_000
    u2 = jnp.asarray(r.rand(n, 2).astype(np.float32))
    d_a, _, _ = EM.sample_alias(env, u2)
    d_m, _, _ = EM.sample_mip_descent(env, u2)

    def texel_hist(d):
        uv = EM.dir_to_uv(d)
        h, w = env.height, env.width
        x = np.clip((np.asarray(uv[..., 0]) * w).astype(int), 0, w - 1)
        y = np.clip((np.asarray(uv[..., 1]) * h).astype(int), 0, h - 1)
        return np.bincount(y * w + x, minlength=h * w) / d.shape[0]

    ha, hm = texel_hist(d_a), texel_hist(d_m)
    # both match the analytic pmf within sampling noise; restrict to
    # texels with >=100 expected draws (poisson rel sigma ~10%)
    pmf = np.asarray(env.mips[-1]).reshape(-1) / float(env.total)
    sel = pmf > 100.0 / n
    for hh in (ha, hm):
        err = np.abs(hh - pmf)[sel] / pmf[sel]
        assert np.percentile(err, 90) < 0.25, np.percentile(err, 90)


def test_alias_furnace():
    """E[le / pdf] over alias draws == integral of le (within noise)."""
    env = _env()
    r = np.random.RandomState(2)
    u2 = jnp.asarray(r.rand(100_000, 2).astype(np.float32))
    d, pdf, le = EM.sample_alias(env, u2)
    est = (np.asarray(mu.luminance(le)) /
           np.maximum(np.asarray(pdf), 1e-20)).mean()
    lum = np.asarray(mu.luminance(env.radiance))
    omega = np.asarray(env.omega_rows)
    ref = float((lum * omega[:, None]).sum())
    assert abs(est - ref) / ref < 0.02, (est, ref)
