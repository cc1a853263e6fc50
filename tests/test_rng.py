"""Bit-exactness + statistical tests for the stateless sample generators.

The numpy oracle below is an independent uint32 reimplementation of the hash
chain (reference: Utils.hlsli Hash32*, NoiseAndSequences.hlsli bhos_*,
StatelessSampleGenerators.hlsli) used to cross-check the jnp version.
"""
import numpy as np
import pytest

from rtxpt_tpu.core import rng

M = np.uint64(0xFFFFFFFF)


def py_hash32(x):
    x = int(x) & 0xFFFFFFFF
    x ^= x >> 16
    x = (x * 0x7FEB352D) & 0xFFFFFFFF
    x ^= x >> 15
    x = (x * 0x846CA68B) & 0xFFFFFFFF
    x ^= x >> 16
    return x


def py_combine(seed, value):
    seed = int(seed) & 0xFFFFFFFF
    return (seed ^ ((py_hash32(value) + 0x9E3779B9 + ((seed << 6) & 0xFFFFFFFF)
                     + (seed >> 2)) & 0xFFFFFFFF)) & 0xFFFFFFFF


def py_reverse(x):
    return int(f"{int(x) & 0xFFFFFFFF:032b}"[::-1], 2)


def py_owen_hash(x, seed):
    x = int(x) & 0xFFFFFFFF
    seed = int(seed) & 0xFFFFFFFF
    x ^= (x * 0x3D20ADEA) & 0xFFFFFFFF
    x = (x + seed) & 0xFFFFFFFF
    x = (x * ((seed >> 16) | 1)) & 0xFFFFFFFF
    x ^= (x * 0x05526C56) & 0xFFFFFFFF
    x ^= (x * 0x53A22864) & 0xFFFFFFFF
    return x


def py_owen_scramble(x, seed):
    return py_reverse(py_owen_hash(py_reverse(x), seed))


def py_sobol(index, dim):
    X = 0
    for bit in range(32):
        if (int(index) >> bit) & 1:
            X ^= int(rng._SOBOL_DIRECTIONS[dim][bit])
    return X


class PyLDGen:
    """Oracle: StatelessLowDiscrepancySampleGenerator, scalar python ints."""

    def __init__(self, px, py, vertex_index, sample_index):
        self.sample_index = sample_index
        self.base = py_combine(py_hash32((vertex_index + 0x035F9F29)
                                         & 0xFFFFFFFF),
                               ((px << 16) | py) & 0xFFFFFFFF)
        self.start_effect(0, False)

    def start_effect(self, seed, ld, sub_index=0, sub_count=1):
        self.active = (self.sample_index * sub_count + sub_index) & 0xFFFFFFFF
        self.effect = py_combine(self.base, seed)
        if ld:
            self.dim = 0
        else:
            self.effect = py_combine(self.effect, self.active)
            self.dim = 0xFFFFFFFF

    def next_uint(self):
        if self.dim == 0xFFFFFFFF:
            self.effect = py_hash32(self.effect)
            return self.effect
        shuffle_seed = py_combine(self.effect, 0)
        dim_seed = py_combine(self.effect, 1 + self.dim)
        shuffled = py_owen_scramble(self.active, shuffle_seed)
        if self.dim == 0:
            s = py_reverse(shuffled)
        else:
            s = py_sobol(shuffled, self.dim)
        s = py_owen_scramble(s, dim_seed)
        self.dim += 1
        if self.dim >= 5:
            self.effect = py_combine(self.effect, self.active)
            self.dim = 0xFFFFFFFF
        return s


def test_hash32_bit_exact():
    xs = np.array([0, 1, 2, 12345, 0xDEADBEEF, 0xFFFFFFFF], dtype=np.uint32)
    got = np.asarray(rng.hash32(xs))
    want = np.array([py_hash32(x) for x in xs], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_hash32_combine_bit_exact():
    pairs = [(0, 0), (1, 2), (0xDEADBEEF, 0xCAFEBABE), (7, 0xFFFFFFFF)]
    for s, v in pairs:
        got = int(rng.hash32_combine(np.uint32(s), np.uint32(v)))
        assert got == py_combine(s, v)


def test_reverse_and_owen():
    xs = [0, 1, 0x80000000, 0x12345678, 0xFFFFFFFF]
    for x in xs:
        assert int(rng.reverse_bits32(np.uint32(x))) == py_reverse(x)
        assert int(rng.owen_scramble(np.uint32(x), np.uint32(123))) == \
            py_owen_scramble(x, 123)


def test_sobol_traced_dim():
    for dim in range(5):
        idx = np.array([0, 1, 2, 3, 1000, 65535], dtype=np.uint32)
        got = np.asarray(rng.sobol(idx, np.full_like(idx, dim)))
        want = np.array([py_sobol(i, dim) for i in idx], dtype=np.uint32)
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("ld", [False, True])
@pytest.mark.parametrize("effect", [rng.EFFECT_BASE, rng.EFFECT_SCATTER_BSDF,
                                    rng.EFFECT_NEE])
def test_generator_sequence_bit_exact(ld, effect):
    px, py, vi, si = 37, 113, 2, 9
    oracle = PyLDGen(px, py, vi, si)
    oracle.start_effect(effect, ld)

    g = rng.make(np.uint32(px), np.uint32(py), np.uint32(vi), np.uint32(si))
    g = rng.start_effect(g, effect, ld)
    for step in range(8):  # crosses the 5-dim LD->non-LD fallback boundary
        g, u = rng.next_uint(g)
        assert int(u) == oracle.next_uint(), f"step {step} ld={ld}"


def test_generator_vectorized_matches_scalar():
    px = np.arange(64, dtype=np.uint32) % 17
    py = np.arange(64, dtype=np.uint32) // 17
    g = rng.make(px, py, np.uint32(1), np.uint32(0))
    g = rng.start_effect(g, rng.EFFECT_SCATTER_BSDF, True)
    g, u = rng.next_uint(g)
    u = np.asarray(u)
    for i in [0, 13, 63]:
        o = PyLDGen(int(px[i]), int(py[i]), 1, 0)
        o.start_effect(rng.EFFECT_SCATTER_BSDF, True)
        assert int(u[i]) == o.next_uint()


def test_uniformity():
    """Mean/variance of 1D samples over many pixels ~ U[0,1)."""
    px = np.arange(4096, dtype=np.uint32) % 64
    py = np.arange(4096, dtype=np.uint32) // 64
    g = rng.make(px, py, np.uint32(1), np.uint32(0))
    g, u = rng.next_1d(g)
    u = np.asarray(u)
    assert abs(u.mean() - 0.5) < 0.02
    assert abs(u.var() - 1.0 / 12.0) < 0.005
    assert u.min() >= 0.0 and u.max() < 1.0


def test_ld_stratification_beats_uniform():
    """Owen-Sobol' 2D integration error should be much lower than pseudo-
    random at equal sample count (the reason the LD generator exists)."""
    n = 256
    idx = np.arange(n, dtype=np.uint32)

    def draw(ld):
        g = rng.make(np.uint32(5), np.uint32(7), np.uint32(1), idx)
        g = rng.start_effect(g, rng.EFFECT_SCATTER_BSDF, ld)
        g, xy = rng.next_2d(g)
        return np.asarray(xy)

    # integrate f(x,y) = x*y over [0,1)^2 (exact: 0.25)
    ld_err = abs(np.prod(draw(True), axis=-1).mean() - 0.25)
    pr_err = abs(np.prod(draw(False), axis=-1).mean() - 0.25)
    assert ld_err < 0.01
    assert ld_err < pr_err * 0.5 + 1e-5


def test_effect_decorrelation():
    """Different effect seeds at the same vertex must be decorrelated."""
    px = np.arange(1024, dtype=np.uint32) % 32
    py = np.arange(1024, dtype=np.uint32) // 32
    g0 = rng.make(px, py, np.uint32(1), np.uint32(0))
    a = np.asarray(rng.next_1d(rng.start_effect(g0, rng.EFFECT_NEE))[1])
    b = np.asarray(rng.next_1d(
        rng.start_effect(g0, rng.EFFECT_RUSSIAN_ROULETTE))[1])
    corr = np.corrcoef(a, b)[0, 1]
    assert abs(corr) < 0.1
