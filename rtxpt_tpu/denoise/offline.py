"""Offline photo-mode denoiser (the OptiX/OIDN slot).

The reference shells out to a prebuilt OptiX denoiser executable for
photo-mode screenshots (RTXPT/Sample.cpp:2572-2600 DenoisedScreenshot ->
tools/denoiser_OptiX/Denoiser.exe). The TPU-native slot runs an
auxiliary-guided edge-aware filter in-process instead: a multi-pass
a-trous cross-bilateral filter guided by first-hit albedo, normal and
depth (the same guide set OIDN consumes), tuned for converged/offline
input rather than 1-spp realtime noise.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import mathutils as mu
from .relax import _shift


def photo_denoise(hdr, albedo, normal, view_z, iterations: int = 3,
                  sigma_lum: float = 0.35, phi_normal: float = 96.0,
                  phi_albedo: float = 8.0, phi_z: float = 0.6):
    """hdr/albedo/normal: (H,W,3); view_z: (H,W). Returns filtered HDR.

    Demodulates by albedo first so texture detail survives untouched,
    filters illumination only, then re-modulates (OIDN's prefiltered-
    aux mode)."""
    eps = 1e-3
    illum = hdr / jnp.maximum(albedo, eps)
    lum_c = mu.luminance(illum)
    out = illum
    weights_5 = [1.0 / 16, 1.0 / 4, 3.0 / 8, 1.0 / 4, 1.0 / 16]
    for it in range(iterations):
        step = 1 << it
        lum_c = mu.luminance(out)
        acc = out * (weights_5[2] ** 2)
        acc_w = jnp.full_like(lum_c, weights_5[2] ** 2)
        for jy in range(-2, 3):
            for jx in range(-2, 3):
                if jy == 0 and jx == 0:
                    continue
                wk = weights_5[jy + 2] * weights_5[jx + 2]
                s = _shift(out, jy * step, jx * step)
                nrm_s = _shift(normal, jy * step, jx * step)
                alb_s = _shift(albedo, jy * step, jx * step)
                z_s = _shift(view_z, jy * step, jx * step)
                w_l = jnp.exp(-jnp.abs(mu.luminance(s) - lum_c)
                              / (sigma_lum * (1.0 + lum_c) + 1e-4))
                w_n = jnp.maximum(jnp.sum(normal * nrm_s, -1),
                                  0.0) ** phi_normal
                w_a = jnp.exp(-phi_albedo * jnp.sum(
                    jnp.abs(alb_s - albedo), -1))
                w_z = jnp.exp(-jnp.abs(z_s - view_z)
                              / (phi_z * jnp.maximum(view_z, 1e-3)))
                w = wk * w_l * w_n * w_a * w_z
                acc = acc + s * w[..., None]
                acc_w = acc_w + w
        out = acc / jnp.maximum(acc_w[..., None], 1e-8)
    return out * jnp.maximum(albedo, eps)


def photo_denoise_auto(renderer, hdr, width: int, height: int):
    """Convenience wrapper: traces the guide G-buffer with the
    renderer's camera and filters `hdr` (the CLI --photo-denoise path)."""
    import numpy as np

    from ..pt import gbuffer as GB
    yy, xx = np.mgrid[0:height, 0:width]
    px = jnp.asarray(xx.reshape(-1).astype(np.uint32))
    py = jnp.asarray(yy.reshape(-1).astype(np.uint32))
    gb = GB.trace_gbuffer(renderer.assets, renderer.camera,
                          renderer.camera, px, py)
    shp = (height, width)
    albedo = (gb.diffuse_albedo + gb.specular_albedo).reshape(shp + (3,))
    albedo = jnp.clip(albedo, 0.0, 1.0)
    normal = gb.normal.reshape(shp + (3,))
    view_z = gb.view_z.reshape(shp)
    return photo_denoise(hdr, albedo, normal, view_z)
