"""ReBLUR-style real-time denoiser: hit-distance-driven kernel scaling.

The reference exposes TWO NRD denoisers per stable plane — ReLAX
(denoise/relax.py) or ReBLUR (RTXPT/Sample.cpp:1461-1466 selecting
nrd::Denoiser::REBLUR_DIFFUSE_SPECULAR) — switched from the UI. This is
the TPU-native ReBLUR equivalent, built on its published core ideas:

  * temporal accumulation with geometry-validated reprojection and an
    accumulated HIT DISTANCE channel alongside radiance;
  * a screen-space bilateral blur whose per-pixel RADIUS is driven by
    the accumulated hit distance (far, smooth lighting -> wide kernel;
    contact/short hitT -> tight kernel), shrinking with history length
    (converged pixels stop blurring) and with specular roughness;
  * two rotated poisson-disk passes instead of ReLAX's a-trous wavelet
    cascade — fewer, adaptive taps rather than many fixed ones.

Round-5 depth (the NRD ReBLUR pipeline stages this module was missing,
dispatched by the reference at RTXPT/NRD/NrdIntegration.cpp:506):

  * FAST HISTORY: a second, short accumulation (<= 4 frames) clamps the
    long history each frame — ReBLUR's anti-lag mechanism (history that
    drifts from recent signal is pulled back and its length cut);
  * ANTI-FIREFLY: an RCRS-style cross-neighborhood luminance clamp on
    the accumulated signal before blurring;
  * HISTORY FIX: pixels with short history (< 4 frames, disocclusions)
    take an extra wide-radius reconstruction blur so holes fill from
    valid neighbors instead of staying noisy;
  * TEMPORAL STABILIZATION: a post-blur temporal pass with its own
    reprojected history, neighborhood-clamped like TAA, that removes
    residual blur-pattern shimmer.

Same (filtered, state) contract as relax.denoise so the realtime post
stages can switch on PTConfig.denoiser_method.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..core import mathutils as mu
from .relax import _bilinear_gather, _neighborhood_box

MAX_HISTORY = 32.0
BASE_RADIUS_PX = 16.0

# 8-point poisson disk (unit radius), rotated per pass
_POISSON = [
    (-0.4706069, -0.4427112), (-0.9057375, 0.3003471),
    (-0.3487388, 0.4037880), (0.1023042, 0.6439373),
    (0.5699277, 0.3513750), (0.2939128, -0.1131226),
    (0.7836658, -0.4208784), (0.1564120, -0.8198990),
]


MAX_FAST_HISTORY = 4.0
HISTORY_FIX_FRAMES = 4.0     # ReBLUR historyFixFrameNum default


class ReblurState(NamedTuple):
    radiance: jnp.ndarray   # (H,W,3) accumulated demodulated radiance
    fast: jnp.ndarray       # (H,W,3) FAST history (<=4-frame) clamp ref
    hit_t: jnp.ndarray      # (H,W) accumulated hit distance
    history: jnp.ndarray    # (H,W)
    normal: jnp.ndarray     # (H,W,3)
    view_z: jnp.ndarray     # (H,W)
    stab: jnp.ndarray       # (H,W,3) temporal-stabilization history
    stab_valid: jnp.ndarray  # () bool

    @staticmethod
    def create(h: int, w: int) -> "ReblurState":
        return ReblurState(
            radiance=jnp.zeros((h, w, 3), jnp.float32),
            fast=jnp.zeros((h, w, 3), jnp.float32),
            hit_t=jnp.zeros((h, w), jnp.float32),
            history=jnp.zeros((h, w), jnp.float32),
            normal=jnp.zeros((h, w, 3), jnp.float32),
            view_z=jnp.full((h, w), 1e30, jnp.float32),
            stab=jnp.zeros((h, w, 3), jnp.float32),
            stab_valid=jnp.asarray(False))


def _accumulate(state: ReblurState, radiance, hit_t, normal, view_z,
                motion, history_clamp: float = 3.0):
    h, w = radiance.shape[0], radiance.shape[1]
    yy, xx = jnp.mgrid[0:h, 0:w]
    px = xx + motion[..., 0]
    py = yy + motion[..., 1]
    in_bounds = (px >= 0) & (px <= w - 1) & (py >= 0) & (py <= h - 1)
    # ONE stacked reprojection gather for all history channels
    # (incl. the fast history and the stabilization history)
    stacked = jnp.concatenate(
        [state.radiance, state.hit_t[..., None], state.history[..., None],
         state.normal, state.view_z[..., None], state.fast, state.stab],
        -1)
    prev = _bilinear_gather(stacked, px, py)
    prev_rad, prev_hit, prev_hist = prev[..., 0:3], prev[..., 3], \
        prev[..., 4]
    prev_nrm, prev_z = prev[..., 5:8], prev[..., 8]
    prev_fast = prev[..., 9:12]
    prev_stab = prev[..., 12:15]
    nrm_ok = jnp.sum(normal * prev_nrm, -1) > 0.8
    z_ok = jnp.abs(view_z - prev_z) < 0.1 * jnp.maximum(view_z, 1e-3)
    valid = in_bounds & nrm_ok & z_ok & (view_z < 1e29)

    if history_clamp > 0.0:
        box_m, box_s = _neighborhood_box(radiance, 1)
        clamped = jnp.clip(prev_rad, box_m - history_clamp * box_s,
                           box_m + history_clamp * box_s)
        moved = mu.luminance(jnp.abs(clamped - prev_rad)) / \
            jnp.maximum(mu.luminance(box_m) + 1e-4, 1e-4)
        prev_rad = clamped
        prev_hist = prev_hist * jnp.clip(1.0 - moved, 0.25, 1.0)

    hist = jnp.where(valid, jnp.minimum(prev_hist + 1.0, MAX_HISTORY), 1.0)
    alpha = 1.0 / hist
    rad = mu.lerp(jnp.where(valid[..., None], prev_rad, radiance),
                  radiance, alpha[..., None])
    ht = mu.lerp(jnp.where(valid, prev_hit, hit_t), hit_t, alpha)

    # FAST HISTORY (ReBLUR anti-lag): a parallel <=4-frame accumulation
    # tracks the recent signal; the long history is clamped to a
    # luminance band around it, and where the clamp engaged the
    # effective history length is cut so convergence restarts.
    fast_alpha = 1.0 / jnp.minimum(hist, MAX_FAST_HISTORY)
    fast = mu.lerp(jnp.where(valid[..., None], prev_fast, radiance),
                   radiance, fast_alpha[..., None])
    lum_slow = mu.luminance(rad)
    lum_fast = mu.luminance(fast)
    band = 0.5 * lum_fast + 1e-3
    lum_clamped = jnp.clip(lum_slow, lum_fast - band, lum_fast + band)
    scale = lum_clamped / jnp.maximum(lum_slow, 1e-6)
    engaged = jnp.abs(scale - 1.0) > 1e-3
    rad = rad * scale[..., None]
    hist = jnp.where(engaged, jnp.minimum(hist, MAX_FAST_HISTORY), hist)

    return ReblurState(radiance=rad, fast=fast, hit_t=ht, history=hist,
                       normal=normal, view_z=view_z, stab=prev_stab,
                       stab_valid=state.stab_valid)


def _blur_pass(radiance, radius_px, normal, view_z, roughness, angle):
    """One rotated poisson-disk bilateral pass with per-pixel radius."""
    h, w = radiance.shape[0], radiance.shape[1]
    yy, xx = jnp.mgrid[0:h, 0:w]
    ca, sa = math.cos(angle), math.sin(angle)
    if roughness is not None:
        phi_n = 32.0 / jnp.clip(roughness * roughness, 1.0 / 32.0, 1.0)
    else:
        phi_n = 8.0
    acc = radiance
    acc_w = jnp.ones((h, w), jnp.float32)
    stacked = jnp.concatenate([radiance, normal, view_z[..., None]], -1)
    for ox, oy in _POISSON:
        rx, ry = ox * ca - oy * sa, ox * sa + oy * ca
        tx = xx + radius_px * rx
        ty = yy + radius_px * ry
        s = _bilinear_gather(stacked, tx, ty)   # one gather per tap
        rad_s, nrm_s, z_s = s[..., 0:3], s[..., 3:6], s[..., 6]
        w_n = jnp.maximum(jnp.sum(normal * nrm_s, -1), 0.0) ** phi_n
        w_z = jnp.exp(-jnp.abs(z_s - view_z)
                      / jnp.maximum(0.05 * view_z + 1e-3, 1e-3))
        wgt = w_n * w_z
        acc = acc + rad_s * wgt[..., None]
        acc_w = acc_w + wgt
    return acc / jnp.maximum(acc_w[..., None], 1e-8)


def _anti_firefly(radiance):
    """RCRS-style cross-neighborhood luminance clamp (the NRD
    REBLUR anti-firefly pass): a pixel brighter than every cross
    neighbor is scaled down to the neighborhood max."""
    from .relax import _pad_edge
    xp = _pad_edge(radiance, 1, 1)
    lums = []
    for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        nb = xp[1 + dy:1 + dy + radiance.shape[0],
                1 + dx:1 + dx + radiance.shape[1]]
        lums.append(mu.luminance(nb))
    nb_max = jnp.maximum(jnp.maximum(lums[0], lums[1]),
                         jnp.maximum(lums[2], lums[3]))
    lum = mu.luminance(radiance)
    scale = jnp.minimum(1.0, nb_max / jnp.maximum(lum, 1e-6))
    return radiance * scale[..., None]


def denoise(state: Optional[ReblurState], radiance, normal, view_z,
            motion, roughness=None, hit_t=None, iterations: int = 2):
    """Full ReBLUR-style pipeline for one channel: temporal accumulation
    (+fast-history anti-lag) -> anti-firefly -> adaptive blur passes ->
    history fix -> temporal stabilization. The NRD REBLUR stage list the
    reference dispatches per frame (NrdIntegration.cpp:506).

    hit_t: (H,W) per-pixel ray hit distance for this channel (the
    committed stable-plane channel's .w); None -> distance-neutral
    radius. Returns (filtered, new_state)."""
    h, w = radiance.shape[0], radiance.shape[1]
    if state is None:
        state = ReblurState.create(h, w)
    if hit_t is None:
        hit_t = jnp.full((h, w), 1e4, jnp.float32)
    state = _accumulate(state, radiance, hit_t, normal, view_z, motion)

    # ANTI-FIREFLY on the accumulated signal, before any blur spreads
    # an outlier across its (wide) kernel footprint
    signal = _anti_firefly(state.radiance)

    # hit-distance-driven kernel radius (the ReBLUR signature):
    #   far lighting (hitT >> viewZ scale) -> full base radius,
    #   contact lighting -> tight kernel; converged history shrinks it;
    #   specular tightens with roughness.
    hit_frac = state.hit_t / (state.hit_t
                              + jnp.maximum(state.view_z, 1e-3))
    radius = BASE_RADIUS_PX * hit_frac / jnp.sqrt(state.history)
    if roughness is not None:
        radius = radius * jnp.clip(roughness * 2.0, 0.05, 1.0)
    filtered = signal
    for it in range(max(iterations, 1)):
        filtered = _blur_pass(filtered, radius * (0.5 ** it), normal,
                              view_z, roughness,
                              angle=2.399963 * (it + 1))

    # HISTORY FIX: disoccluded pixels (history < HISTORY_FIX_FRAMES)
    # get one extra WIDE reconstruction pass — radius grows as history
    # shrinks — so they fill from geometry-compatible neighbors
    # instead of carrying 1-frame noise into the output.
    fix_w = mu.saturate(1.0 - (state.history - 1.0)
                        / (HISTORY_FIX_FRAMES - 1.0))
    wide = _blur_pass(filtered, BASE_RADIUS_PX * (1.0 + fix_w),
                      normal, view_z, roughness, angle=0.5)
    filtered = mu.lerp(filtered, wide, fix_w[..., None])

    # TEMPORAL STABILIZATION: TAA-like pass on the DENOISED output with
    # its own (already motion-reprojected in _accumulate) history,
    # neighborhood-clamped so it never lags the stabilized signal.
    box_m, box_s = _neighborhood_box(filtered, 1)
    stab_prev = jnp.clip(state.stab, box_m - 2.0 * box_s,
                         box_m + 2.0 * box_s)
    stab_alpha = jnp.where(state.stab_valid, 0.2, 1.0)
    out = mu.lerp(stab_prev, filtered, stab_alpha)
    state = state._replace(stab=out, stab_valid=jnp.asarray(True))
    return out, state
