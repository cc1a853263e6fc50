"""Temporal anti-aliasing.

TPU-native port of donut's TemporalAntiAliasingPass
(donut/src/render/TemporalAntiAliasingPass.cpp; taa_cs.hlsl; wired at
RTXPT/Sample.cpp:1469-1482 with jitter advanced at :2602-2609): history
reprojection via motion vectors, 3x3 neighborhood clamp, exponential
blend. R2 jitter sequence lives in models/renderer.r2_jitter.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..core import mathutils as mu
from ..denoise.relax import _bilinear_gather, _shift


class TAAState(NamedTuple):
    history: jnp.ndarray   # (H,W,3)
    valid: jnp.ndarray     # () bool - has any history


def resolve(state: Optional[TAAState], color, motion,
            blend: float = 0.1) -> tuple:
    """color: (H,W,3) current frame; motion: (H,W,2) px (prev - cur).
    Returns (resolved, new_state). jit-safe: state.valid is a traced
    flag, so the first-frame passthrough is a select."""
    h, w = color.shape[0], color.shape[1]
    if state is None:
        return color, TAAState(history=color, valid=jnp.asarray(True))

    yy, xx = jnp.mgrid[0:h, 0:w]
    px = xx + motion[..., 0]
    py = yy + motion[..., 1]
    hist = _bilinear_gather(state.history, px, py)
    in_bounds = ((px >= 0) & (px <= w - 1) & (py >= 0)
                 & (py <= h - 1))[..., None]

    # 3x3 neighborhood min/max clamp
    cmin = color
    cmax = color
    for jy in (-1, 0, 1):
        for jx in (-1, 0, 1):
            if jy == 0 and jx == 0:
                continue
            s = _shift(color, jy, jx)
            cmin = jnp.minimum(cmin, s)
            cmax = jnp.maximum(cmax, s)
    hist = jnp.clip(hist, cmin, cmax)
    out = jnp.where(in_bounds, mu.lerp(hist, color, blend), color)
    out = jnp.where(state.valid, out, color)
    return out, TAAState(history=out, valid=jnp.asarray(True))
