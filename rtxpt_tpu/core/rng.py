"""Stateless counter-based sample generators (pseudo + low-discrepancy).

TPU-native re-implementation of the reference's stateless sampling stack:
  - RTXPT/PathTracer/Utils.hlsli (Hash32 / Hash32Combine / Hash32ToFloat)
  - RTXPT/PathTracer/NoiseAndSequences.hlsli (Owen-scrambled Sobol',
    "Practical Hash-based Owen Scrambling", Burley 2020)
  - RTXPT/PathTracer/StatelessSampleGenerators.hlsli
    (StatelessUniformSampleGenerator / StatelessLowDiscrepancySampleGenerator)
  - RTXPT/PathTracer/Sampling.hlsli (SampleGeneratorEffectSeed)

The design is already *stateless / counter-based* in the reference — each
sample is a pure function of (pixel, vertexIndex, sampleIndex, effect,
dimension) — which is exactly the functional form JAX wants. Everything here
is bit-exact uint32 math so rendered sequences are reproducible across
backends, which is what makes image-for-image validation tractable.

All functions broadcast over arbitrary leading batch dims (path wavefronts).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32


def _u32(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=U32)


# SampleGeneratorEffectSeed (reference: Sampling.hlsli:16-24)
EFFECT_BASE = 0
EFFECT_SCATTER_BSDF = 1
EFFECT_NEE = 2
EFFECT_NEE_LOCAL = 3
EFFECT_NEE_DISTANT = 4
EFFECT_RUSSIAN_ROULETTE = 5

# LD sampling is disabled after this many diffuse bounces
# (reference: Sampling.hlsli:27)
DISABLE_LD_AFTER_DIFFUSE_BOUNCES = 2

_SUPPORTED_LD_DIMENSIONS = 5
_NON_LD = np.uint32(0xFFFFFFFF)


def hash32(x):
    """lowbias32 hash (Utils.hlsli:96-110; Chris Wellons)."""
    x = _u32(x)
    x = x ^ (x >> 16)
    x = x * np.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * np.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def hash32_combine(seed, value):
    """boost-style hash_combine (Utils.hlsli:127-130)."""
    seed = _u32(seed)
    return seed ^ (hash32(value) + np.uint32(0x9E3779B9)
                   + (seed << 6) + (seed >> 2))


def hash32_to_float(h):
    """Upper 24 bits -> [0,1) (Utils.hlsli:137-142)."""
    return (_u32(h) >> 8).astype(jnp.float32) * np.float32(1.0 / 16777216.0)


def reverse_bits32(x):
    x = _u32(x)
    x = ((x & np.uint32(0xAAAAAAAA)) >> 1) | ((x & np.uint32(0x55555555)) << 1)
    x = ((x & np.uint32(0xCCCCCCCC)) >> 2) | ((x & np.uint32(0x33333333)) << 2)
    x = ((x & np.uint32(0xF0F0F0F0)) >> 4) | ((x & np.uint32(0x0F0F0F0F)) << 4)
    x = ((x & np.uint32(0xFF00FF00)) >> 8) | ((x & np.uint32(0x00FF00FF)) << 8)
    return (x >> 16) | (x << 16)


def owen_hash(x, seed):
    """Improved Laine-Karras hash (NoiseAndSequences.hlsli:162-178;
    psychopath.io 2021 variant)."""
    x = _u32(x)
    seed = _u32(seed)
    x = x ^ (x * np.uint32(0x3D20ADEA))
    x = x + seed
    x = x * ((seed >> 16) | np.uint32(1))
    x = x ^ (x * np.uint32(0x05526C56))
    x = x ^ (x * np.uint32(0x53A22864))
    return x


def owen_scramble(x, seed):
    """nested_uniform_scramble_base2 (NoiseAndSequences.hlsli:180-186)."""
    return reverse_bits32(owen_hash(reverse_bits32(x), seed))


# Sobol' direction numbers, dims 0..4 (NoiseAndSequences.hlsli:92-137;
# standard Joe-Kuo first five dimensions).
_SOBOL_DIRECTIONS = np.array([
    [0x80000000, 0x40000000, 0x20000000, 0x10000000,
     0x08000000, 0x04000000, 0x02000000, 0x01000000,
     0x00800000, 0x00400000, 0x00200000, 0x00100000,
     0x00080000, 0x00040000, 0x00020000, 0x00010000,
     0x00008000, 0x00004000, 0x00002000, 0x00001000,
     0x00000800, 0x00000400, 0x00000200, 0x00000100,
     0x00000080, 0x00000040, 0x00000020, 0x00000010,
     0x00000008, 0x00000004, 0x00000002, 0x00000001],
    [0x80000000, 0xc0000000, 0xa0000000, 0xf0000000,
     0x88000000, 0xcc000000, 0xaa000000, 0xff000000,
     0x80800000, 0xc0c00000, 0xa0a00000, 0xf0f00000,
     0x88880000, 0xcccc0000, 0xaaaa0000, 0xffff0000,
     0x80008000, 0xc000c000, 0xa000a000, 0xf000f000,
     0x88008800, 0xcc00cc00, 0xaa00aa00, 0xff00ff00,
     0x80808080, 0xc0c0c0c0, 0xa0a0a0a0, 0xf0f0f0f0,
     0x88888888, 0xcccccccc, 0xaaaaaaaa, 0xffffffff],
    [0x80000000, 0xc0000000, 0x60000000, 0x90000000,
     0xe8000000, 0x5c000000, 0x8e000000, 0xc5000000,
     0x68800000, 0x9cc00000, 0xee600000, 0x55900000,
     0x80680000, 0xc09c0000, 0x60ee0000, 0x90550000,
     0xe8808000, 0x5cc0c000, 0x8e606000, 0xc5909000,
     0x6868e800, 0x9c9c5c00, 0xeeee8e00, 0x5555c500,
     0x8000e880, 0xc0005cc0, 0x60008e60, 0x9000c590,
     0xe8006868, 0x5c009c9c, 0x8e00eeee, 0xc5005555],
    [0x80000000, 0xc0000000, 0x20000000, 0x50000000,
     0xf8000000, 0x74000000, 0xa2000000, 0x93000000,
     0xd8800000, 0x25400000, 0x59e00000, 0xe6d00000,
     0x78080000, 0xb40c0000, 0x82020000, 0xc3050000,
     0x208f8000, 0x51474000, 0xfbea2000, 0x75d93000,
     0xa0858800, 0x914e5400, 0xdbe79e00, 0x25db6d00,
     0x58800080, 0xe54000c0, 0x79e00020, 0xb6d00050,
     0x800800f8, 0xc00c0074, 0x200200a2, 0x50050093],
    [0x80000000, 0x40000000, 0x20000000, 0xb0000000,
     0xf8000000, 0xdc000000, 0x7a000000, 0x9d000000,
     0x5a800000, 0x2fc00000, 0xa1600000, 0xf0b00000,
     0xda880000, 0x6fc40000, 0x81620000, 0x40bb0000,
     0x22878000, 0xb3c9c000, 0xfb65a000, 0xddb2d000,
     0x78022800, 0x9c0b3c00, 0x5a0fb600, 0x2d0ddb00,
     0xa2878080, 0xf3c9c040, 0xdb65a020, 0x6db2d0b0,
     0x800228f8, 0x400b3cdc, 0x200fb67a, 0xb00ddb9d],
], dtype=np.uint32)


def sobol(index, dimension):
    """Sobol' sample for (index, dimension); dimension may be a traced
    per-lane uint in [0,4] (NoiseAndSequences.hlsli bhos_sobol).

    The direction numbers are compile-time constants folded into an
    unrolled XOR chain — the previous (N,32)-wide gather + fold
    materialized 64 MB of intermediates per draw (measured 22 ms per
    next_3d at 480k lanes; tools/profile_nee.py)."""
    index = _u32(index)
    dim = jnp.clip(_u32(dimension), 0, _SUPPORTED_LD_DIMENSIONS - 1)
    zero = jnp.zeros_like(index)
    accs = []
    for d in range(_SUPPORTED_LD_DIMENSIONS):
        v = zero
        for i in range(32):
            c = np.uint32(_SOBOL_DIRECTIONS[d, i])
            bit = (index >> np.uint32(i)) & np.uint32(1)
            v = v ^ jnp.where(bit != 0, c, np.uint32(0))
        accs.append(v)
    out = accs[0]
    for d in range(1, _SUPPORTED_LD_DIMENSIONS):
        out = jnp.where(dim == d, accs[d], out)
    return out


# output-finalizer key of the HQ tier (see `hq` field below)
_HQ_FINALIZE_KEY = np.uint32(0x6C62272E)


class SampleGenerator(NamedTuple):
    """Functional port of StatelessLowDiscrepancySampleGenerator
    (StatelessSampleGenerators.hlsli:74-160). All fields uint32, same shape;
    the whole struct is a pytree so it threads through lax control flow."""
    base: jnp.ndarray          # m_baseHash
    effect: jnp.ndarray        # m_effectHash
    sample_index: jnp.ndarray  # m_sampleIndex
    dimension: jnp.ndarray     # m_dimension (0xFFFFFFFF = non-LD mode)
    active: jnp.ndarray        # m_activeIndex
    hq: jnp.ndarray            # 0/1: high-quality output finalizer (the
    #   StatelessHQUniformSampleGenerator.hlsli:20 tier — reference-mode
    #   quality setting). The STATE machine is identical to the uniform
    #   tier; outputs pass one extra independent mixing round, giving a
    #   decorrelated, higher-quality stream at ~5 extra VPU ops/draw.


def make(pixel_x, pixel_y, vertex_index, sample_index,
         low_discrepancy=False, hq=False) -> SampleGenerator:
    """Seed a generator from (pixel, path vertex, sample index)
    (StatelessSampleGenerators.hlsli:85-93). hq=True selects the
    high-quality uniform tier (StatelessHQUniformSampleGenerator)."""
    px = _u32(pixel_x)
    py = _u32(pixel_y)
    base = hash32_combine(hash32(_u32(vertex_index) + np.uint32(0x035F9F29)),
                          (px << 16) | py)
    si = _u32(sample_index)
    shape = jnp.broadcast_shapes(base.shape, si.shape)
    base = jnp.broadcast_to(base, shape)
    g = SampleGenerator(
        base=base,
        effect=jnp.zeros_like(base),
        sample_index=jnp.broadcast_to(si, shape),
        dimension=jnp.full_like(base, _NON_LD),
        active=jnp.zeros_like(base),
        hq=jnp.broadcast_to(_u32(jnp.asarray(hq, jnp.uint32)), shape),
    )
    return start_effect(g, EFFECT_BASE, low_discrepancy)


def start_effect(g: SampleGenerator, effect_seed, low_discrepancy=False,
                 sub_index=0, sub_count=1) -> SampleGenerator:
    """Rebase onto a decorrelated per-effect stream
    (StatelessSampleGenerators.hlsli:102-116). `low_discrepancy` may be a
    traced per-lane bool."""
    active = g.sample_index * _u32(sub_count) + _u32(sub_index)
    eff_ld = hash32_combine(g.base, _u32(effect_seed))
    eff_nold = hash32_combine(eff_ld, active)
    ld = jnp.broadcast_to(jnp.asarray(low_discrepancy, bool), g.base.shape)
    return SampleGenerator(
        base=g.base,
        effect=jnp.where(ld, eff_ld, eff_nold),
        sample_index=g.sample_index,
        dimension=jnp.where(ld, jnp.zeros_like(g.base),
                            jnp.full_like(g.base, _NON_LD)),
        active=jnp.broadcast_to(active, g.base.shape),
        hq=g.hq,
    )


def next_uint(g: SampleGenerator, allow_ld: bool = True):
    """Advance and return a full-range uint32 sample
    (StatelessSampleGenerators.hlsli:122-159).

    allow_ld=False is a STATIC fast path for draws whose effect was
    started with low_discrepancy=False (NEE, russian roulette, ...):
    the LD machinery (Sobol + Owen scrambles) is skipped entirely;
    bit-identical to the general path for such generators."""
    # --- non-LD path: effect = Hash32(effect); the HQ tier passes the
    # OUTPUT through one extra independent mixing round (state machine
    # identical, so hq toggling never desyncs streams)
    eff_hashed = hash32(g.effect)
    out_nold = jnp.where(g.hq != 0,
                         hash32(eff_hashed ^ _HQ_FINALIZE_KEY),
                         eff_hashed)
    if not allow_ld:
        g2 = SampleGenerator(base=g.base, effect=eff_hashed,
                             sample_index=g.sample_index,
                             dimension=g.dimension, active=g.active,
                             hq=g.hq)
        return g2, out_nold

    in_ld = g.dimension != _NON_LD

    # --- LD path
    shuffle_seed = hash32_combine(g.effect, 0)
    dim_seed = hash32_combine(g.effect, np.uint32(1) + g.dimension)
    shuffled = owen_scramble(g.active, shuffle_seed)
    # dim 0 uses the Laine-Karras permutation (reversed bits); dims 1+ Sobol'
    ld_sample = jnp.where(g.dimension == 0,
                          reverse_bits32(shuffled),
                          sobol(shuffled, g.dimension))
    ld_sample = owen_scramble(ld_sample, dim_seed)

    new_dim = g.dimension + np.uint32(1)
    exhausted = new_dim >= np.uint32(_SUPPORTED_LD_DIMENSIONS)
    eff_after_ld = jnp.where(exhausted, hash32_combine(g.effect, g.active),
                             g.effect)
    new_dim = jnp.where(exhausted, jnp.full_like(new_dim, _NON_LD), new_dim)

    out = jnp.where(in_ld, ld_sample, out_nold)
    g2 = SampleGenerator(
        base=g.base,
        effect=jnp.where(in_ld, eff_after_ld, eff_hashed),
        sample_index=g.sample_index,
        dimension=jnp.where(in_ld, new_dim, g.dimension),
        active=g.active,
        hq=g.hq,
    )
    return g2, out


def next_1d(g: SampleGenerator, allow_ld: bool = True):
    g, u = next_uint(g, allow_ld)
    return g, hash32_to_float(u)


def next_2d(g: SampleGenerator, allow_ld: bool = True):
    g, x = next_1d(g, allow_ld)
    g, y = next_1d(g, allow_ld)
    return g, jnp.stack([x, y], axis=-1)


def next_3d(g: SampleGenerator, allow_ld: bool = True):
    g, x = next_1d(g, allow_ld)
    g, y = next_1d(g, allow_ld)
    g, z = next_1d(g, allow_ld)
    return g, jnp.stack([x, y, z], axis=-1)


def next_4d(g: SampleGenerator, allow_ld: bool = True):
    g, a = next_2d(g, allow_ld)
    g, b = next_2d(g, allow_ld)
    return g, jnp.concatenate([a, b], axis=-1)
