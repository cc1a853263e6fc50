"""Temporal anti-aliasing.

TPU-native port of donut's TemporalAntiAliasingPass
(donut/src/render/TemporalAntiAliasingPass.cpp:228 TemporalResolve;
taa_cs.hlsl; wired at RTXPT/Sample.cpp:1469-1482 with jitter advanced at
:2602-2609): Catmull-Rom history resampling, variance-based neighborhood
clipping (mean +- k*sigma of the 3x3 window, tighter than min/max and
less prone to ghost retention), exponential blend. The R2 jitter
sequence lives in models/renderer.r2_jitter.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..core import mathutils as mu
from ..denoise.relax import _bilinear_gather, _pad_edge, _tap


class TAAState(NamedTuple):
    history: jnp.ndarray   # (H,W,3)
    valid: jnp.ndarray     # () bool - has any history


def _catmull_rom_gather(img, x, y):
    """5-tap optimized Catmull-Rom resampling of (H,W,C) at float coords
    (the taa_cs.hlsl / Karis bicubic-via-bilinear trick: the 4x4 kernel
    collapses to 5 bilinear fetches at weighted offsets)."""
    h, w = img.shape[0], img.shape[1]
    xc = jnp.floor(x - 0.5) + 0.5
    yc = jnp.floor(y - 0.5) + 0.5
    fx = x - xc
    fy = y - yc

    def crw(f):
        # Catmull-Rom weights for offsets -1, 0, 1, 2
        f2 = f * f
        f3 = f2 * f
        w0 = -0.5 * f3 + f2 - 0.5 * f
        w1 = 1.5 * f3 - 2.5 * f2 + 1.0
        w2 = -1.5 * f3 + 2.0 * f2 + 0.5 * f
        w3 = 0.5 * f3 - 0.5 * f2
        return w0, w1, w2, w3

    wx = crw(fx)
    wy = crw(fy)
    # center 2x2 collapsed to one bilinear tap
    wx12 = wx[1] + wx[2]
    wy12 = wy[1] + wy[2]
    ox = wx[2] / jnp.maximum(wx12, 1e-8)
    oy = wy[2] / jnp.maximum(wy12, 1e-8)

    taps = [
        (xc + ox, yc - 1.0, wx12 * wy[0]),
        (xc - 1.0, yc + oy, wx[0] * wy12),
        (xc + ox, yc + oy, wx12 * wy12),
        (xc + 2.0, yc + oy, wx[3] * wy12),
        (xc + ox, yc + 2.0, wx12 * wy[3]),
    ]
    acc = 0.0
    wacc = 0.0
    for tx, ty, tw in taps:
        acc = acc + _bilinear_gather(img, tx, ty) * tw[..., None]
        wacc = wacc + tw
    return acc / jnp.maximum(wacc[..., None], 1e-8)


def resolve(state: Optional[TAAState], color, motion,
            blend: float = 0.1, clip_sigma: float = 1.0,
            use_catmull_rom: bool = True, relax_mask=None) -> tuple:
    """color: (H,W,3) current frame; motion: (H,W,2) px (prev - cur).
    Returns (resolved, new_state). jit-safe: state.valid is a traced
    flag, so the first-frame passthrough is a select.

    relax_mask: optional (H,W) in [0,1] — the denoiser's disocclusion /
    history-reset signal (donut TemporalAntiAliasingPass.cpp:228 fed by
    RTXPT/Sample.cpp:1469-1482): where the denoiser just reset history,
    TAA's own history is equally stale, so the blend snaps toward the
    freshly denoised current frame instead of re-blurring it with
    ghosted history."""
    h, w = color.shape[0], color.shape[1]
    if state is None:
        return color, TAAState(history=color, valid=jnp.asarray(True))

    yy, xx = jnp.mgrid[0:h, 0:w]
    px = xx + motion[..., 0]
    py = yy + motion[..., 1]
    if use_catmull_rom:
        hist = _catmull_rom_gather(state.history, px, py)
    else:
        hist = _bilinear_gather(state.history, px, py)
    in_bounds = ((px >= 0) & (px <= w - 1) & (py >= 0)
                 & (py <= h - 1))[..., None]

    # variance clip: history clipped to mean +- k*sigma of the 3x3 window
    m1 = color
    m2 = color * color
    cmin = color
    cmax = color
    cp = _pad_edge(color, 1, 1)     # one pad, 8 fusible static slices
    for jy in (-1, 0, 1):
        for jx in (-1, 0, 1):
            if jy == 0 and jx == 0:
                continue
            s = _tap(cp, h, w, jy, jx, 1)
            m1 = m1 + s
            m2 = m2 + s * s
            cmin = jnp.minimum(cmin, s)
            cmax = jnp.maximum(cmax, s)
    m1 = m1 / 9.0
    sigma = jnp.sqrt(jnp.maximum(m2 / 9.0 - m1 * m1, 0.0))
    lo = jnp.maximum(m1 - clip_sigma * sigma, cmin)
    hi = jnp.minimum(m1 + clip_sigma * sigma, cmax)
    hist = jnp.clip(hist, lo, hi)

    blend_eff = jnp.full(color.shape[:2], blend, jnp.float32)
    if relax_mask is not None:
        blend_eff = jnp.maximum(blend_eff, jnp.clip(relax_mask, 0.0, 1.0))
    out = jnp.where(in_bounds,
                    mu.lerp(hist, color, blend_eff[..., None]), color)
    out = jnp.where(state.valid, out, color)
    return out, TAAState(history=out, valid=jnp.asarray(True))
