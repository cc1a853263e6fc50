"""Sample-generator quality tiers (PTConfig.rng_quality).

The reference exposes three generator tiers in SampleUI: uniform hash
(StatelessUniformSampleGenerator), low-discrepancy Owen-Sobol
(StatelessLowDiscrepancySampleGenerator) and the reference-mode
high-quality uniform tier (StatelessHQUniformSampleGenerator.hlsli:20).
The TPU translation keeps ONE state machine (core/rng.SampleGenerator)
and selects the tier by flags: low_discrepancy=True -> LD, hq=True ->
extra independent output-mixing round on the non-LD stream.

Gates here: (1) hq changes the OUTPUT but never the STATE trajectory,
(2) the hq stream is decorrelated from the uniform stream and still
uniform, (3) LD beats uniform on integration error for a smooth
integrand (the reason LD is the default), with hq matching uniform's
Monte-Carlo rate (its purpose is stream quality, not discrepancy).
"""
import numpy as np
import jax.numpy as jnp

from rtxpt_tpu.core import rng


def _draw_stream(g, n, allow_ld=True):
    outs = []
    for _ in range(n):
        g, u = rng.next_uint(g, allow_ld=allow_ld)
        outs.append(np.asarray(u))
    return g, np.stack(outs)


def test_hq_same_state_trajectory():
    """Toggling hq must never desync the effect/dimension state: a path
    that switches tiers mid-frame would otherwise break stream
    alignment with the reference."""
    px = jnp.arange(64, dtype=jnp.uint32)
    py = jnp.full((64,), 7, jnp.uint32)
    g_u = rng.make(px, py, 2, 5, hq=False)
    g_h = rng.make(px, py, 2, 5, hq=True)
    for _ in range(8):
        g_u, _ = rng.next_uint(g_u)
        g_h, _ = rng.next_uint(g_h)
    np.testing.assert_array_equal(np.asarray(g_u.effect),
                                  np.asarray(g_h.effect))
    np.testing.assert_array_equal(np.asarray(g_u.dimension),
                                  np.asarray(g_h.dimension))
    np.testing.assert_array_equal(np.asarray(g_u.base),
                                  np.asarray(g_h.base))


def test_hq_output_mixed_and_uniform():
    px = jnp.arange(256, dtype=jnp.uint32)
    py = jnp.zeros((256,), jnp.uint32)
    _, s_u = _draw_stream(rng.make(px, py, 0, 0, hq=False), 16)
    _, s_h = _draw_stream(rng.make(px, py, 0, 0, hq=True), 16)
    # different stream...
    assert (s_u != s_h).mean() > 0.99
    # ...decorrelated from the uniform one (bitwise: ~half the bits of
    # the XOR are set, as for independent uniforms)
    xor_bits = np.unpackbits(
        (s_u ^ s_h).astype(">u4").view(np.uint8)).mean()
    assert 0.45 < xor_bits < 0.55
    # ...and still marginally uniform
    f = s_h.astype(np.float64) / 2**32
    assert abs(f.mean() - 0.5) < 0.01
    assert abs(f.var() - 1.0 / 12.0) < 0.01


def test_ld_beats_uniform_hq_matches_uniform():
    """Integration error of E[x*y] over the first 2 dims, averaged over
    pixels: LD (Owen-Sobol) should beat both uniform tiers clearly;
    hq should sit in the same Monte-Carlo error class as uniform."""
    n_pix, n_samp = 64, 64
    px = jnp.arange(n_pix, dtype=jnp.uint32)
    py = jnp.full((n_pix,), 3, jnp.uint32)

    def estimate(ld, hq):
        acc = np.zeros(n_pix)
        for s in range(n_samp):
            g = rng.make(px, py, 0, s, low_discrepancy=ld, hq=hq)
            g, u = rng.next_uint(g)
            g, v = rng.next_uint(g)
            fu = np.asarray(u).astype(np.float64) / 2**32
            fv = np.asarray(v).astype(np.float64) / 2**32
            acc += fu * fv
        return acc / n_samp

    err = {k: np.sqrt(np.mean((estimate(ld, hq) - 0.25) ** 2))
           for k, (ld, hq) in dict(ld=(True, False),
                                   uniform=(False, False),
                                   hq=(False, True)).items()}
    assert err["ld"] < 0.6 * err["uniform"], err
    assert err["hq"] < 2.5 * err["uniform"], err
