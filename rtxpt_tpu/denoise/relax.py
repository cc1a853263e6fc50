"""ReLAX-style real-time denoiser (the NRD replacement).

TPU-native re-implementation of the denoising stage the reference gets
from the NRD SDK (RTXPT/NRD/NrdIntegration.cpp dispatching
nrd::Denoiser::RELAX_DIFFUSE_SPECULAR; inputs prepared by
RTXPT/PostProcess.hlsl DenoiserPrepareInputs, composited by
DenoiserFinalMerge; driven per stable plane by Sample.cpp:2398-2440).

Pipeline (the published ReLAX structure, all fused jnp stencil ops over
(H, W) buffers -- ideal XLA territory):
  1. temporal reprojection + accumulation of demodulated radiance and
     luminance moments (history length per pixel, geometry-validated);
  2. variance estimation (temporal when history is long, 7x7 spatial
     bilateral fallback for young pixels);
  3. N iterations of edge-aware a-trous wavelet filtering with
     variance-guided luminance weights, normal and depth edge-stopping;
     variance is filtered alongside.

Diffuse and specular are filtered independently (RTXPT_DIFFUSE_SPECULAR
_SPLIT), with specular edge-stopping sharpened by roughness.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import mathutils as mu


class DenoiserState(NamedTuple):
    """Per-channel temporal history (one instance per stable plane,
    mirroring Sample.h:174's NRD instance array)."""
    radiance: jnp.ndarray     # (H,W,3) accumulated demodulated radiance
    moments: jnp.ndarray      # (H,W,2) luminance m1, m2
    history: jnp.ndarray      # (H,W) frames accumulated
    normal: jnp.ndarray       # (H,W,3) prev normals
    view_z: jnp.ndarray       # (H,W) prev depth

    @staticmethod
    def create(h: int, w: int) -> "DenoiserState":
        return DenoiserState(
            radiance=jnp.zeros((h, w, 3), jnp.float32),
            moments=jnp.zeros((h, w, 2), jnp.float32),
            history=jnp.zeros((h, w), jnp.float32),
            normal=jnp.zeros((h, w, 3), jnp.float32),
            view_z=jnp.full((h, w), 1e30, jnp.float32))


def _bilinear_gather(img, x, y):
    """Bilinear fetch of (H,W,C) at float coords; clamped.

    One flat gather per corner over the channel-stacked image — callers
    stack every channel they reproject into ONE image first (the TPU
    gather unit is the bottleneck of the temporal passes; 4 gathers of
    (H,W,C_total) beat 4*k gathers of the k separate buffers)."""
    h, w = img.shape[0], img.shape[1]
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = jnp.clip(x - x0, 0.0, 1.0)[..., None]
    fy = jnp.clip(y - y0, 0.0, 1.0)[..., None]
    flat = img.reshape((h * w,) + img.shape[2:])
    a = jnp.take(flat, y0 * w + x0, axis=0) * (1 - fx) + \
        jnp.take(flat, y0 * w + x1, axis=0) * fx
    b = jnp.take(flat, y1 * w + x0, axis=0) * (1 - fx) + \
        jnp.take(flat, y1 * w + x1, axis=0) * fx
    return a * (1 - fy) + b * fy


def _pad_edge(x, ry: int, rx: int):
    """Edge-clamp pad of the two leading (H,W) axes."""
    pw = ((ry, ry), (rx, rx)) + ((0, 0),) * (x.ndim - 2)
    return jnp.pad(x, pw, mode="edge")


def _tap(xp, h: int, w: int, dy: int, dx: int, r: int):
    """(H,W,...) window of an edge-padded array, shifted by (dy,dx) with
    clamp — bit-identical to the old roll+border-fix `_shift(x,dy,dx)`
    but a single fusible static slice instead of roll + two scatters
    (the stage-2 rewrite, VERDICT r3 next #2: ~500 roll/scatter trios per
    frame prevented XLA from fusing the stencil cascade)."""
    start = (r - dy, r - dx) + (0,) * (xp.ndim - 2)
    limit = (r - dy + h, r - dx + w) + xp.shape[2:]
    return jax.lax.slice(xp, start, limit)


def _neighborhood_box(x, radius: int = 1):
    """Per-pixel mean and std of the (2r+1)^2 neighborhood of (H,W,C)."""
    h, w = x.shape[0], x.shape[1]
    xp = _pad_edge(x, radius, radius)
    n = 0
    m1 = jnp.zeros_like(x)
    m2 = jnp.zeros_like(x)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            s = _tap(xp, h, w, dy, dx, radius)
            m1 = m1 + s
            m2 = m2 + s * s
            n += 1
    m1 = m1 / n
    sigma = jnp.sqrt(jnp.maximum(m2 / n - m1 * m1, 0.0))
    return m1, sigma


def temporal_accumulate(state: DenoiserState, radiance, normal, view_z,
                        motion, max_history: float = 32.0,
                        history_clamp: float = 3.0):
    """Reproject history with motion vectors, validate geometry, blend.
    radiance: (H,W,3) demodulated; motion: (H,W,2) px (prev - cur).

    history_clamp > 0 applies the ReLAX anti-lag color-box clamp: the
    reprojected history is clamped to mean +- k*sigma of the current
    frame's 3x3 neighborhood, killing ghosting trails under lighting
    changes (NRD RELAX history clamping)."""
    h, w = radiance.shape[0], radiance.shape[1]
    yy, xx = jnp.mgrid[0:h, 0:w]
    px = xx + motion[..., 0]
    py = yy + motion[..., 1]
    in_bounds = (px >= 0) & (px <= w - 1) & (py >= 0) & (py <= h - 1)

    # ONE stacked reprojection gather for all history channels
    stacked = jnp.concatenate(
        [state.radiance, state.moments, state.history[..., None],
         state.normal, state.view_z[..., None]], -1)
    prev = _bilinear_gather(stacked, px, py)
    prev_rad, prev_mom = prev[..., 0:3], prev[..., 3:5]
    prev_hist, prev_nrm, prev_z = prev[..., 5], prev[..., 6:9], \
        prev[..., 9]

    # disocclusion tests (plane distance + normal, NRD-style)
    nrm_ok = jnp.sum(normal * prev_nrm, -1) > 0.8
    z_ok = jnp.abs(view_z - prev_z) < 0.1 * jnp.maximum(view_z, 1e-3)
    valid = in_bounds & nrm_ok & z_ok & (view_z < 1e29)

    if history_clamp > 0.0:
        box_m, box_s = _neighborhood_box(radiance, 1)
        lo = box_m - history_clamp * box_s
        hi = box_m + history_clamp * box_s
        clamped = jnp.clip(prev_rad, lo, hi)
        # shorten history in proportion to how much clamping moved it,
        # so variance estimation recovers quickly after a change
        moved = mu.luminance(jnp.abs(clamped - prev_rad)) / \
            jnp.maximum(mu.luminance(box_m) + 1e-4, 1e-4)
        prev_rad = clamped
        prev_hist = prev_hist * jnp.clip(1.0 - moved, 0.25, 1.0)

    hist = jnp.where(valid, jnp.minimum(prev_hist + 1.0, max_history), 1.0)
    alpha = 1.0 / hist
    lum = mu.luminance(radiance)
    mom_new = jnp.stack([lum, lum * lum], -1)
    rad = mu.lerp(jnp.where(valid[..., None], prev_rad, radiance),
                  radiance, alpha[..., None])
    mom = mu.lerp(jnp.where(valid[..., None], prev_mom, mom_new),
                  mom_new, alpha[..., None])
    new_state = DenoiserState(radiance=rad, moments=mom, history=hist,
                              normal=normal, view_z=view_z)
    return new_state


def _spatial_variance(lum, radius: int = 3):
    """Boxed spatial variance fallback for young pixels."""
    m1 = lum
    m2 = lum * lum
    k = 2 * radius + 1
    kernel = jnp.ones((k, k), jnp.float32) / (k * k)

    def blur(x):
        return jax.scipy.signal.convolve2d(x, kernel, mode="same")
    bm1 = blur(m1)
    bm2 = blur(m2)
    return jnp.maximum(bm2 - bm1 * bm1, 0.0)


def estimate_variance(state: DenoiserState):
    m1 = state.moments[..., 0]
    m2 = state.moments[..., 1]
    temporal_var = jnp.maximum(m2 - m1 * m1, 0.0)
    lum = mu.luminance(state.radiance)
    spatial_var = _spatial_variance(lum)
    young = state.history < 4.0
    return jnp.where(young, spatial_var, temporal_var)


def _shift(x, dy, dx):
    """Shift (H,W,...) by (dy,dx) with edge clamp (pad + static slice)."""
    r = max(abs(dy), abs(dx), 1)
    return _tap(_pad_edge(x, r, r), x.shape[0], x.shape[1], dy, dx, r)


def atrous_filter(radiance, variance, normal, view_z, roughness=None,
                  iterations: int = 5, phi_lum: float = 4.0,
                  phi_normal: float = 64.0, phi_z: float = 1.0):
    """Edge-aware a-trous wavelet passes (SVGF/ReLAX core).

    When `roughness` (H,W) is given the channel is filtered as SPECULAR:
    the normal edge-stopper sharpens as roughness drops (a mirror only
    accepts neighbors with near-identical normals) and a roughness
    edge-stopper keeps different-material pixels apart — the ReLAX
    specular lobe-similarity weights.

    Stencil layout (the TPU shape of NRD's per-pass pipelines): the
    static guides (normal/viewZ/roughness) are edge-padded ONCE for the
    whole cascade; per iteration the changing channels
    (radiance/variance/luminance) are stacked and padded once; every tap
    is then a static slice, which XLA fuses into the weight math — no
    roll, no scatter, no per-tap luminance recompute."""
    h, w = radiance.shape[0], radiance.shape[1]
    weights_5 = [1.0 / 16, 1.0 / 4, 3.0 / 8, 1.0 / 4, 1.0 / 16]
    if roughness is not None:
        # low roughness -> effectively delta lobe -> huge normal power
        phi_n_eff = phi_normal / jnp.clip(roughness * roughness,
                                          1.0 / 64.0, 1.0)
        lum_scale = jnp.clip(roughness * 2.0, 0.1, 1.0)
        guides = jnp.concatenate([normal, view_z[..., None],
                                  roughness[..., None]], -1)
    else:
        phi_n_eff = phi_normal
        lum_scale = 1.0
        guides = jnp.concatenate([normal, view_z[..., None]], -1)
    big_r = 2 << max(iterations - 1, 0)
    gp = _pad_edge(guides, big_r, big_r)
    for it in range(iterations):
        step = 1 << it
        lum_c = mu.luminance(radiance)
        sigma_l = phi_lum * lum_scale * \
            jnp.sqrt(jnp.maximum(variance, 1e-10)) + 1e-4
        data = jnp.concatenate([radiance, variance[..., None],
                                lum_c[..., None]], -1)
        dp = _pad_edge(data, 2 * step, 2 * step)
        acc = radiance * weights_5[2] * weights_5[2]
        acc_v = variance * (weights_5[2] * weights_5[2]) ** 2
        acc_w = jnp.full_like(lum_c, weights_5[2] * weights_5[2])
        for jy in range(-2, 3):
            for jx in range(-2, 3):
                if jy == 0 and jx == 0:
                    continue
                wk = weights_5[jy + 2] * weights_5[jx + 2]
                d_s = _tap(dp, h, w, jy * step, jx * step, 2 * step)
                g_s = _tap(gp, h, w, jy * step, jx * step, big_r)
                rad_s, var_s, lum_s = d_s[..., 0:3], d_s[..., 3], \
                    d_s[..., 4]
                nrm_s, z_s = g_s[..., 0:3], g_s[..., 3]
                w_l = jnp.exp(-jnp.abs(lum_s - lum_c) / sigma_l)
                w_n = jnp.maximum(jnp.sum(normal * nrm_s, -1),
                                  0.0) ** phi_n_eff
                w_z = jnp.exp(-jnp.abs(z_s - view_z)
                              / (phi_z * jnp.maximum(view_z, 1e-3)))
                wgt = wk * w_l * w_n * w_z
                if roughness is not None:
                    wgt = wgt * jnp.exp(-jnp.abs(g_s[..., 4] - roughness)
                                        / 0.3)
                acc += rad_s * wgt[..., None]
                acc_v += var_s * wgt * wgt
                acc_w += wgt
        radiance = acc / jnp.maximum(acc_w[..., None], 1e-8)
        variance = acc_v / jnp.maximum(acc_w * acc_w, 1e-8)
    return radiance


def denoise(state: Optional[DenoiserState], radiance, normal, view_z,
            motion, roughness=None, iterations: int = 4):
    """Full pipeline for one channel; returns (filtered, new_state)."""
    h, w = radiance.shape[0], radiance.shape[1]
    if state is None:
        state = DenoiserState.create(h, w)
    state = temporal_accumulate(state, radiance, normal, view_z, motion)
    var = estimate_variance(state)
    filtered = atrous_filter(state.radiance, var, normal, view_z,
                             roughness, iterations=iterations)
    return filtered, state
