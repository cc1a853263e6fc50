"""Tone mapping: exposure + operators incl. ACES, with histogram-based
auto-exposure.

Port of the reference's ToneMapper (RTXPT/ToneMapper/ToneMappingPasses.cpp:
luminance histogram :364-460, operators ToneMappingPasses.h:39-55 incl.
ACES), as fused jnp ops: the histogram is a one-hot scatter-add reduce, the
curve applies per pixel; XLA fuses the whole post chain into the frame fn.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import mathutils as mu

OP_LINEAR = 0
OP_REINHARD = 1
OP_ACES = 2

_HISTOGRAM_BINS = 128
_LOG_LUM_MIN = -10.0
_LOG_LUM_MAX = 8.0


def luminance_histogram(rgb):
    """(H,W,3) -> (BINS,) luminance histogram over log2 luminance."""
    lum = mu.luminance(jnp.maximum(rgb, 0.0))
    loglum = jnp.log2(jnp.maximum(lum, 1e-10))
    t = (loglum - _LOG_LUM_MIN) / (_LOG_LUM_MAX - _LOG_LUM_MIN)
    bins = jnp.clip((t * _HISTOGRAM_BINS).astype(jnp.int32), 0,
                    _HISTOGRAM_BINS - 1)
    return jnp.zeros(_HISTOGRAM_BINS, jnp.int32).at[
        bins.reshape(-1)].add(1)


def auto_exposure(rgb, low_percentile=0.6, high_percentile=0.95,
                  key_value=0.18, min_ev=-12.0, max_ev=12.0):
    """Histogram-based average log-luminance between two percentiles
    (ToneMappingPasses auto-exposure), returning a linear exposure scale."""
    hist = luminance_histogram(rgb).astype(jnp.float32)
    cdf = jnp.cumsum(hist)
    total = jnp.maximum(cdf[-1], 1.0)
    lo = low_percentile * total
    hi = high_percentile * total
    # mass inside the percentile band per bin
    inside = jnp.clip(cdf, lo, hi) - jnp.clip(cdf - hist, lo, hi)
    centers = _LOG_LUM_MIN + (jnp.arange(_HISTOGRAM_BINS) + 0.5) \
        / _HISTOGRAM_BINS * (_LOG_LUM_MAX - _LOG_LUM_MIN)
    avg_log = jnp.sum(inside * centers) / jnp.maximum(jnp.sum(inside), 1e-5)
    avg_log = jnp.clip(avg_log, min_ev, max_ev)
    return key_value / jnp.exp2(avg_log)


def aces_fitted(x):
    """ACES filmic fit (Narkowicz), as used by donut's ACES operator."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def reinhard(x):
    return x / (1.0 + x)


def linear_to_srgb(x):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x <= 0.0031308, x * 12.92,
                     1.055 * jnp.power(jnp.maximum(x, 1e-7),
                                       1.0 / 2.4) - 0.055)


def tonemap(rgb, exposure=1.0, operator: int = OP_ACES,
            auto_expose: bool = False):
    """HDR (H,W,3) -> display sRGB (H,W,3) in [0,1]."""
    scale = jnp.asarray(exposure, jnp.float32)
    if auto_expose:
        scale = scale * auto_exposure(rgb)
    x = jnp.maximum(rgb, 0.0) * scale
    if operator == OP_ACES:
        y = aces_fitted(x)
    elif operator == OP_REINHARD:
        y = reinhard(x)
    else:
        y = x
    return linear_to_srgb(y)
