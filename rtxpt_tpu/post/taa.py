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


def _crw(f):
    # Catmull-Rom weights for offsets -1, 0, 1, 2
    f2 = f * f
    f3 = f2 * f
    w0 = -0.5 * f3 + f2 - 0.5 * f
    w1 = 1.5 * f3 - 2.5 * f2 + 1.0
    w2 = -1.5 * f3 + 2.0 * f2 + 0.5 * f
    w3 = 0.5 * f3 - 0.5 * f2
    return w0, w1, w2, w3


def _catmull_rom_gather(img, x, y):
    """EXACT 16-texel Catmull-Rom resampling of (H,W,3) at float coords
    via ONE wide row gather.

    The round-3 version used the Karis 5-bilinear-tap approximation —
    but on TPU each bilinear tap is 4 row-gather calls, and the XLA row
    gather pays ~2.3 ms fixed + ~1 ms/column at wavefront width
    (tools/profile_stage2.py: 58 ms per TAA resolve at 640x360, gather-
    bound). Instead the 4x4 neighborhood is STACKED channel-wise with 16
    static edge-clamped shifts (pure fusible slices), so the resample is
    ONE 48-column gather at the integer base texel + the full separable
    CR weights — exact (no dropped corner terms) and ~2x faster."""
    h, w = img.shape[0], img.shape[1]
    from ..denoise.relax import _pad_edge, _tap
    xc = jnp.floor(x - 0.5) + 0.5
    yc = jnp.floor(y - 0.5) + 0.5
    fx = x - xc
    fy = y - yc
    wx = _crw(fx)
    wy = _crw(fy)

    # stacked 4x4 neighborhood: S[y, x, 3*(4j+i):...] = img[y+j-1, x+i-1]
    pimg = _pad_edge(img, 2, 2)
    planes = [_tap(pimg, h, w, -(j - 1), -(i - 1), 2)
              for j in range(4) for i in range(4)]
    stacked = jnp.concatenate(planes, axis=-1)          # (H, W, 48)

    x0 = jnp.clip((xc - 0.5).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip((yc - 0.5).astype(jnp.int32), 0, h - 1)
    rows = jnp.take(stacked.reshape(h * w, 48), y0 * w + x0, axis=0)
    rows = rows.reshape(x.shape + (16, 3))

    acc = 0.0
    wacc = 0.0
    for j in range(4):
        for i in range(4):
            tw = wx[i] * wy[j]
            acc = acc + rows[..., 4 * j + i, :] * tw[..., None]
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
