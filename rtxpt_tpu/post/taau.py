"""Temporal anti-aliased upscaling (TAAU) — the DLSS slot.

The reference reserves its upscaler slot for Streamline/DLSS
(RTXPT/Streamline/SLWrapper.cpp; render-size != display-size plumbing at
RTXPT/Sample.cpp:1733-1781 driven by sl::DLSSOptimalSettings). The
TPU-native equivalent keeps the same contract — the path tracer renders
at a reduced resolution and the upscaler produces display resolution —
with a jitter-aware temporal upsampler in place of the NN:

  * each display pixel fetches the current frame at its exact source
    position in render space, un-doing the camera jitter (so over frames
    the R2 jitter sequence scans sub-pixel positions = superresolution);
  * a confidence weight favors display pixels that land close to a real
    rendered sample this frame (those get fresh detail, others lean on
    history);
  * history is kept at DISPLAY resolution, reprojected with upscaled
    motion vectors and variance-clipped against the upsampled frame.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..core import mathutils as mu
from ..denoise.relax import _bilinear_gather, _shift


class TAAUState(NamedTuple):
    history: jnp.ndarray   # (Hd,Wd,3) display-resolution history
    valid: jnp.ndarray     # () bool


def resolve(state: Optional[TAAUState], color, motion, display_size,
            jitter=(0.0, 0.0), base_blend: float = 0.01,
            clip_sigma: float = 1.5) -> tuple:
    """color: (Hr,Wr,3) render-res frame; motion: (Hr,Wr,2) px in RENDER
    units (prev - cur); display_size: (Wd, Hd) static ints; jitter: the
    camera sub-pixel jitter (render px) used this frame.
    Returns (display (Hd,Wd,3), new_state)."""
    hr, wr = color.shape[0], color.shape[1]
    wd, hd = int(display_size[0]), int(display_size[1])
    sx = wr / wd
    sy = hr / hd

    yy, xx = jnp.mgrid[0:hd, 0:wd]
    # display pixel center -> render-space coordinates (un-jittered)
    rx = (xx + 0.5) * sx - 0.5 - jitter[0]
    ry = (yy + 0.5) * sy - 0.5 - jitter[1]
    cur = _bilinear_gather(color, rx, ry)

    # confidence: distance from the nearest rendered sample this frame
    dx = rx - jnp.round(rx)
    dy = ry - jnp.round(ry)
    dist2 = dx * dx + dy * dy
    confidence = jnp.exp(-dist2 / 0.05)           # ~1 on-sample, ~0 far

    if state is None:
        return cur, TAAUState(history=cur, valid=jnp.asarray(True))

    # motion upsampled to display px
    mot = _bilinear_gather(motion, rx, ry)
    mot = mot * jnp.asarray([1.0 / sx, 1.0 / sy])
    px = xx + mot[..., 0]
    py = yy + mot[..., 1]
    hist = _bilinear_gather(state.history, px, py)
    in_bounds = ((px >= 0) & (px <= wd - 1) & (py >= 0)
                 & (py <= hd - 1))[..., None]

    # variance clip against the upsampled current frame
    m1 = cur
    m2 = cur * cur
    for jy in (-1, 0, 1):
        for jx in (-1, 0, 1):
            if jy == 0 and jx == 0:
                continue
            s = _shift(cur, jy, jx)
            m1 = m1 + s
            m2 = m2 + s * s
    m1 = m1 / 9.0
    sigma = jnp.sqrt(jnp.maximum(m2 / 9.0 - m1 * m1, 0.0))
    # confidence-relaxed clip: pixels that land on a fresh sample keep
    # their superresolved history (the upsampled current frame is band-
    # limited, so a tight clip would erase sub-render-pixel detail);
    # off-sample pixels clamp hard against ghosting
    widen = (1.0 + 6.0 * confidence)[..., None]
    hist = jnp.clip(hist, m1 - clip_sigma * widen * sigma,
                    m1 + clip_sigma * widen * sigma)

    blend = base_blend + (0.5 - base_blend) * confidence[..., None]
    out = jnp.where(in_bounds, mu.lerp(hist, cur, blend), cur)
    out = jnp.where(state.valid, out, cur)
    return out, TAAUState(history=out, valid=jnp.asarray(True))
