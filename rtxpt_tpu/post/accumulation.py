"""Reference-mode progressive accumulation.

Port of RTXPT/AccumulationPass.hlsl:24-53 (invoked Sample.cpp:2469-2474):
running mean via lerp(prev, new, 1/(N+1)). Accumulation is resumable by
construction (sample index + buffer are the checkpoint, SURVEY.md section 5).
"""
from __future__ import annotations

import jax.numpy as jnp


def accumulate(prev, new, sample_index):
    """prev/new: (...,3); sample_index: 0 for the first sample."""
    w = 1.0 / (jnp.asarray(sample_index, jnp.float32) + 1.0)
    return prev + (new - prev) * w
