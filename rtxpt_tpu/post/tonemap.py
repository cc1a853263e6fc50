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
OP_HABLE_UC2 = 3      # Uncharted 2 filmic (donut HableUc2)
OP_CLAMP = 4          # plain clamp (reference 'Clamp' operator)

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


def hable_uc2(x, white_point: float = 11.2):
    """Uncharted 2 filmic operator (ToneMappingPasses.h HableUc2)."""
    def f(v):
        a, b, c, d, e, f_ = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
        return ((v * (a * v + c * b) + d * e)
                / (v * (a * v + b) + d * f_)) - e / f_
    return jnp.clip(f(x) / f(jnp.asarray(white_point)), 0.0, 1.0)


# ---- white balance (ToneMappingPasses white-balance term) -------------
# CIE 1931-ish correlated color temperature -> linear sRGB scale factors
def white_balance_scale(temperature_k: float = 6500.0):
    """Returns (3,) RGB multipliers that neutralize a `temperature_k`
    illuminant (6500K = identity); Krystek/planckian-locus fit like the
    reference's ToneMapper white-balance control."""
    import numpy as np
    t = float(np.clip(temperature_k, 1667.0, 25000.0)) / 1000.0
    # planckian locus approximation (Kim et al.)
    if t < 4.0:
        x = (-0.2661239 / t ** 3 - 0.2343589 / t ** 2
             + 0.8776956 / t + 0.179910)
    else:
        x = (-3.0258469 / t ** 3 + 2.1070379 / t ** 2
             + 0.2226347 / t + 0.240390)
    y = -3.0 * x * x + 2.87 * x - 0.275
    # xyY -> XYZ (Y=1) -> linear sRGB
    xyz = np.asarray([x / y, 1.0, (1 - x - y) / y], np.float64)
    m = np.asarray([[3.2404542, -1.5371385, -0.4985314],
                    [-0.9692660, 1.8760108, 0.0415560],
                    [0.0556434, -0.2040259, 1.0572252]])
    rgb = np.maximum(m @ xyz, 1e-4)
    scale = 1.0 / rgb
    scale /= scale.mean()
    return jnp.asarray(scale, jnp.float32)


def linear_to_srgb(x):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x <= 0.0031308, x * 12.92,
                     1.055 * jnp.power(jnp.maximum(x, 1e-7),
                                       1.0 / 2.4) - 0.055)


def tonemap(rgb, exposure=1.0, operator: int = OP_ACES,
            auto_expose: bool = False, white_balance_k: float = 6500.0,
            prev_exposure=None, adaptation_rate: float = 0.0):
    """HDR (H,W,3) -> display sRGB (H,W,3) in [0,1].

    `white_balance_k`: illuminant temperature (6500 = neutral).
    `prev_exposure` + `adaptation_rate` enable temporal eye adaptation
    (exponential approach like ToneMappingPasses::AdvanceFrame): returns
    (srgb, new_exposure) instead when prev_exposure is given."""
    scale = jnp.asarray(exposure, jnp.float32)
    if auto_expose:
        scale = scale * auto_exposure(rgb)
    if prev_exposure is not None and adaptation_rate > 0.0:
        scale = prev_exposure + (scale - prev_exposure) * adaptation_rate
    x = jnp.maximum(rgb, 0.0) * scale
    if white_balance_k != 6500.0:
        x = x * white_balance_scale(white_balance_k)
    if operator == OP_ACES:
        y = aces_fitted(x)
    elif operator == OP_REINHARD:
        y = reinhard(x)
    elif operator == OP_HABLE_UC2:
        y = hable_uc2(x)
    elif operator == OP_CLAMP:
        y = jnp.clip(x, 0.0, 1.0)
    else:
        y = x
    out = linear_to_srgb(y)
    if prev_exposure is not None:
        return out, scale
    return out
