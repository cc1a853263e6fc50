"""The Falcor standard BSDF, vectorized over path wavefronts.

TPU-native re-implementation of the reference's material stack:
  - RTXPT/PathTracer/Rendering/Materials/Microfacet.hlsli (GGX NDF/G/VNDF,
    bounded-VNDF sampling per GPUOpen "Bounded VNDF Sampling for Smith-GGX")
  - Fresnel.hlsli (Schlick + exact dielectric)
  - BxDF.hlsli (lobes: Frostbite diffuse, Lambert diffuse transmission,
    microfacet specular reflection, microfacet reflection+transmission;
    FalcorBSDF mixture with lobe-selection probabilities)
  - StandardBSDF.hlsli (local-frame dispatch, diffuse/specular split eval)

Reference compile-time configuration reproduced here (BxDFConfig.hlsli,
BxDF.hlsli:37-54): DiffuseBrdf=Frostbite, SpecularMasking=SmithGGXCorrelated,
GGXSampling=BVNDF, EnableDeltaBSDF=1, RecycleSelectSamples=1,
kMinGGXAlpha=0.0064, RTXPT_DIFFUSE_SPECULAR_SPLIT (eval returns the split).

Everything operates on local-space directions (z = shading normal) and is
branch-free: per-lane control flow from the reference becomes masked selects
so a whole wavefront evaluates in one fused VPU pass.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core import mathutils as mu

K_MIN_COS_THETA = 1e-6
K_MIN_GGX_ALPHA = 0.0064
ONE_MINUS_EPS = float.fromhex("0x1.fffffep-1")

# LobeType (LobeType.hlsli)
LOBE_NONE = 0x00
LOBE_DIFFUSE_REFLECTION = 0x01
LOBE_SPECULAR_REFLECTION = 0x02
LOBE_DELTA_REFLECTION = 0x04
LOBE_DIFFUSE_TRANSMISSION = 0x10
LOBE_SPECULAR_TRANSMISSION = 0x20
LOBE_DELTA_TRANSMISSION = 0x40
LOBE_DIFFUSE = 0x11
LOBE_SPECULAR = 0x22
LOBE_DELTA = 0x44
LOBE_NON_DELTA = 0x33
LOBE_REFLECTION = 0x0F
LOBE_TRANSMISSION = 0xF0
LOBE_ALL = 0xFF


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


# ---------------------------------------------------------------------------
# Microfacet (Microfacet.hlsli)
# ---------------------------------------------------------------------------

def eval_ndf_ggx(alpha, cos_theta):
    a2 = alpha * alpha
    d = (cos_theta * a2 - cos_theta) * cos_theta + 1.0
    return a2 / jnp.maximum(d * d * mu.M_PI, 1e-30)


def eval_lambda_ggx(alpha_sqr, cos_theta):
    cs = jnp.maximum(cos_theta, 1e-12)
    cos_sqr = cs * cs
    tan_sqr = jnp.maximum(1.0 - cos_sqr, 0.0) / cos_sqr
    lam = 0.5 * (-1.0 + jnp.sqrt(1.0 + alpha_sqr * tan_sqr))
    return jnp.where(cos_theta <= 0.0, 0.0, lam)


def eval_g1_ggx(alpha_sqr, cos_theta):
    cs = jnp.maximum(cos_theta, 1e-12)
    cos_sqr = cs * cs
    tan_sqr = jnp.maximum(1.0 - cos_sqr, 0.0) / cos_sqr
    g = 2.0 / (1.0 + jnp.sqrt(1.0 + alpha_sqr * tan_sqr))
    return jnp.where(cos_theta <= 0.0, 0.0, g)


def eval_masking_smith_ggx_correlated(alpha, cos_i, cos_o):
    a2 = alpha * alpha
    return 1.0 / jnp.maximum(
        1.0 + eval_lambda_ggx(a2, cos_i) + eval_lambda_ggx(a2, cos_o), 1e-12)


def eval_pdf_ggx_vndf(alpha, wi, h):
    g1 = eval_g1_ggx(alpha * alpha, wi[..., 2])
    d = eval_ndf_ggx(alpha, h[..., 2])
    wi_dot_h = jnp.maximum(_dot(wi, h), 0.0)
    return g1 * d * wi_dot_h / jnp.maximum(
        wi[..., 2] * wi_dot_h * 4.0, 1e-20)


def eval_pdf_ggx_bvndf(alpha, i, m):
    """Bounded-VNDF pdf (Microfacet.hlsli:105-128); i has z>0."""
    ndf = eval_ndf_ggx(alpha, m[..., 2])
    ai_x = alpha * i[..., 0]
    ai_y = alpha * i[..., 1]
    len2 = ai_x * ai_x + ai_y * ai_y
    t = jnp.sqrt(len2 + i[..., 2] * i[..., 2])
    a = mu.saturate(alpha)
    s = 1.0 + jnp.sqrt(i[..., 0] ** 2 + i[..., 1] ** 2)
    a2, s2 = a * a, s * s
    k = (1.0 - a2) * s2 / (s2 + a2 * i[..., 2] * i[..., 2])
    return ndf / jnp.maximum(2.0 * (k * i[..., 2] + t), 1e-20)


def sample_ggx_bvndf(alpha, i, u2):
    """Bounded-VNDF half-vector sampling (Microfacet.hlsli:185-207)."""
    al = alpha[..., None]
    i_std = mu.normalize(jnp.concatenate([i[..., :2] * al, i[..., 2:3]], -1))
    phi = mu.M_2PI * u2[..., 0]
    a = mu.saturate(alpha)
    s = 1.0 + jnp.sqrt(i[..., 0] ** 2 + i[..., 1] ** 2)
    a2, s2 = a * a, s * s
    k = (1.0 - a2) * s2 / (s2 + a2 * i[..., 2] * i[..., 2])
    b = jnp.where(i[..., 2] > 0.0, k * i_std[..., 2], i_std[..., 2])
    z = (1.0 - u2[..., 1]) * (1.0 + b) - b
    sin_t = jnp.sqrt(mu.saturate(1.0 - z * z))
    o_std = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), z], -1)
    m_std = i_std + o_std
    m = jnp.concatenate([m_std[..., :2] * al, m_std[..., 2:3]], -1)
    return mu.normalize(m)


# ---------------------------------------------------------------------------
# Fresnel (Fresnel.hlsli)
# ---------------------------------------------------------------------------

def fresnel_schlick(f0, f90, cos_theta):
    c = jnp.maximum(1.0 - cos_theta, 0.0)
    return f0 + (f90 - f0) * (c ** 5)


def fresnel_dielectric(eta, cos_theta_i):
    """Exact dielectric Fresnel; returns (F, cos_theta_t). eta = etaI/etaT;
    handles cos<0 by flipping (Fresnel.hlsli:45-69)."""
    flip = cos_theta_i < 0.0
    eta = jnp.where(flip, 1.0 / jnp.maximum(eta, 1e-8), eta)
    ci = jnp.abs(cos_theta_i)
    sin_t_sq = eta * eta * (1.0 - ci * ci)
    tir = sin_t_sq > 1.0
    ct = jnp.sqrt(jnp.maximum(1.0 - sin_t_sq, 0.0))
    denom_s = eta * ci + ct
    denom_p = eta * ct + ci
    rs = (eta * ci - ct) / jnp.where(jnp.abs(denom_s) < 1e-12, 1e-12, denom_s)
    rp = (eta * ct - ci) / jnp.where(jnp.abs(denom_p) < 1e-12, 1e-12, denom_p)
    f = 0.5 * (rs * rs + rp * rp)
    return jnp.where(tir, 1.0, f), jnp.where(tir, 0.0, ct)


# ---------------------------------------------------------------------------
# BSDF data + derived mixture (BxDF.hlsli StandardBSDFData / FalcorBSDF)
# ---------------------------------------------------------------------------

class BSDFData(NamedTuple):
    """StandardBSDFData SoA (BxDF.hlsli:565-612)."""
    diffuse: jnp.ndarray                # (N,3)
    specular: jnp.ndarray               # (N,3)
    roughness: jnp.ndarray              # (N,)
    metallic: jnp.ndarray               # (N,)
    eta: jnp.ndarray                    # (N,) incident/transmitted IoR
    transmission: jnp.ndarray           # (N,3)
    diffuse_transmission: jnp.ndarray   # (N,)
    specular_transmission: jnp.ndarray  # (N,)


class FalcorBSDF(NamedTuple):
    """Derived per-lane mixture state (FalcorBSDF::__init,
    BxDF.hlsli:647-714)."""
    diff_albedo: jnp.ndarray       # (N,3)
    spec_albedo: jnp.ndarray       # (N,3)
    trans_albedo: jnp.ndarray      # (N,3)
    alpha: jnp.ndarray             # (N,) spec-reflection GGX alpha (0=delta)
    alpha_t: jnp.ndarray           # (N,) spec refl/trans alpha (0=delta)
    eta: jnp.ndarray               # (N,)
    roughness: jnp.ndarray         # (N,) original (for lobe classification)
    diff_trans: jnp.ndarray        # (N,)
    spec_trans: jnp.ndarray        # (N,)
    p_diffuse: jnp.ndarray         # (N,)
    p_diffuse_t: jnp.ndarray       # (N,)
    p_specular: jnp.ndarray        # (N,)
    p_specular_t: jnp.ndarray      # (N,)
    active_lobes: jnp.ndarray      # (N,) int32 LobeType mask


class BSDFSample(NamedTuple):
    """BSDFSample (IBSDF.hlsli): local-space wo + weight/pdf/lobe."""
    wo: jnp.ndarray        # (N,3) local space
    pdf: jnp.ndarray       # (N,) solid-angle pdf (0 for delta)
    weight: jnp.ndarray    # (N,3) f*cos/pdf (or delta weight)
    lobe: jnp.ndarray      # (N,) int32 LobeType
    lobe_p: jnp.ndarray    # (N,) probability of the chosen lobe
    valid: jnp.ndarray     # (N,) bool


def _has(active, lobe):
    return (active & lobe) != 0


def make_bsdf(data: BSDFData, cos_v, thin_surface,
              active_lobes=None) -> FalcorBSDF:
    """FalcorBSDF::__init (BxDF.hlsli:647-714). cos_v = dot(V, N)."""
    if active_lobes is None:
        active_lobes = jnp.full(data.roughness.shape, LOBE_ALL, jnp.int32)
    thin = jnp.asarray(thin_surface, bool)
    trans_albedo = jnp.where(thin[..., None], data.transmission,
                             jnp.sqrt(jnp.maximum(data.transmission, 0.0)))
    alpha = data.roughness * data.roughness
    alpha = jnp.where(alpha < K_MIN_GGX_ALPHA, 0.0, alpha)
    alpha_t = jnp.where(data.eta == 1.0, 0.0, alpha)

    metallic_brdf = data.metallic * (1.0 - data.specular_transmission)
    dielectric_bsdf = (1.0 - data.metallic) * (
        1.0 - data.specular_transmission)
    specular_bsdf = data.specular_transmission
    diffuse_w = mu.luminance(data.diffuse)
    specular_w = mu.luminance(fresnel_schlick(data.specular, 1.0,
                                              cos_v[..., None]))

    p_diff = jnp.where(_has(active_lobes, LOBE_DIFFUSE_REFLECTION),
                       diffuse_w * dielectric_bsdf *
                       (1.0 - data.diffuse_transmission), 0.0)
    p_diff_t = jnp.where(_has(active_lobes, LOBE_DIFFUSE_TRANSMISSION),
                         diffuse_w * dielectric_bsdf *
                         data.diffuse_transmission, 0.0)
    p_spec = jnp.where(
        _has(active_lobes, LOBE_SPECULAR_REFLECTION | LOBE_DELTA_REFLECTION),
        specular_w * (metallic_brdf + dielectric_bsdf), 0.0)
    p_spec_t = jnp.where(
        _has(active_lobes, LOBE_SPECULAR_REFLECTION | LOBE_DELTA_REFLECTION
             | LOBE_SPECULAR_TRANSMISSION | LOBE_DELTA_TRANSMISSION),
        specular_bsdf, 0.0)
    norm = p_diff + p_diff_t + p_spec + p_spec_t
    inv = jnp.where(norm > 0.0, 1.0 / jnp.maximum(norm, 1e-30), 0.0)
    return FalcorBSDF(
        diff_albedo=data.diffuse, spec_albedo=data.specular,
        trans_albedo=trans_albedo, alpha=alpha, alpha_t=alpha_t,
        eta=data.eta, roughness=data.roughness,
        diff_trans=data.diffuse_transmission,
        spec_trans=data.specular_transmission,
        p_diffuse=p_diff * inv, p_diffuse_t=p_diff_t * inv,
        p_specular=p_spec * inv, p_specular_t=p_spec_t * inv,
        active_lobes=active_lobes)


def get_lobes(data: BSDFData):
    """FalcorBSDF::getLobes (BxDF.hlsli:742-762)."""
    alpha = data.roughness * data.roughness
    is_delta = alpha < K_MIN_GGX_ALPHA
    dt = data.diffuse_transmission
    st = data.specular_transmission
    lobes = jnp.where(is_delta, LOBE_DELTA_REFLECTION,
                      LOBE_SPECULAR_REFLECTION).astype(jnp.int32)
    has_diff = jnp.any(data.diffuse > 0.0, axis=-1) & (st < 1.0)
    lobes |= jnp.where(has_diff & (dt < 1.0), LOBE_DIFFUSE_REFLECTION, 0)
    lobes |= jnp.where(has_diff & (dt > 0.0), LOBE_DIFFUSE_TRANSMISSION, 0)
    lobes |= jnp.where(st > 0.0,
                       jnp.where(is_delta, LOBE_DELTA_TRANSMISSION,
                                 LOBE_SPECULAR_TRANSMISSION), 0)
    return lobes


# ---------------------------------------------------------------------------
# Individual lobes. eval() returns f*cos like the reference.
# ---------------------------------------------------------------------------

def _diffuse_frostbite_weight(wi, wo, roughness):
    """Frostbite diffuse weight = f*pi/albedo (BxDF.hlsli:198-209)."""
    h = mu.safe_normalize(wi + wo)
    wo_dot_h = _dot(wo, h)
    energy_bias = 0.5 * roughness
    energy_factor = 1.0 + (1.0 / 1.51 - 1.0) * roughness
    fd90 = energy_bias + 2.0 * wo_dot_h * wo_dot_h * roughness
    wi_scatter = fresnel_schlick(1.0, fd90, wi[..., 2])
    wo_scatter = fresnel_schlick(1.0, fd90, wo[..., 2])
    return wi_scatter * wo_scatter * energy_factor


def diffuse_eval(b: FalcorBSDF, wi, wo):
    ok = jnp.minimum(wi[..., 2], wo[..., 2]) >= K_MIN_COS_THETA
    w = _diffuse_frostbite_weight(wi, wo, b.roughness)
    f = b.diff_albedo * (w * mu.M_1_PI * wo[..., 2])[..., None]
    return jnp.where(ok[..., None], f, 0.0)


def diffuse_pdf(wi, wo):
    ok = jnp.minimum(wi[..., 2], wo[..., 2]) >= K_MIN_COS_THETA
    return jnp.where(ok, mu.M_1_PI * wo[..., 2], 0.0)


def diffuse_trans_eval(b: FalcorBSDF, wi, wo):
    ok = jnp.minimum(wi[..., 2], -wo[..., 2]) >= K_MIN_COS_THETA
    f = b.trans_albedo * (mu.M_1_PI * -wo[..., 2])[..., None]
    return jnp.where(ok[..., None], f, 0.0)


def diffuse_trans_pdf(wi, wo):
    ok = jnp.minimum(wi[..., 2], -wo[..., 2]) >= K_MIN_COS_THETA
    return jnp.where(ok, mu.M_1_PI * -wo[..., 2], 0.0)


def spec_eval(b: FalcorBSDF, wi, wo):
    """SpecularReflectionMicrofacet::eval (BxDF.hlsli:261-283); f*cos."""
    ok = (jnp.minimum(wi[..., 2], wo[..., 2]) >= K_MIN_COS_THETA) & \
        (b.alpha > 0.0) & _has(b.active_lobes, LOBE_SPECULAR_REFLECTION)
    h = mu.safe_normalize(wi + wo)
    wi_dot_h = _dot(wi, h)
    d = eval_ndf_ggx(b.alpha, h[..., 2])
    g = eval_masking_smith_ggx_correlated(b.alpha, wi[..., 2], wo[..., 2])
    f = fresnel_schlick(b.spec_albedo, 1.0, wi_dot_h[..., None])
    val = f * (d * g * 0.25 / jnp.maximum(wi[..., 2], 1e-12))[..., None]
    return jnp.where(ok[..., None], val, 0.0)


def spec_pdf(b: FalcorBSDF, wi, wo):
    """SpecularReflectionMicrofacet::evalPdf (BxDF.hlsli:334-357)."""
    ok = (jnp.minimum(wi[..., 2], wo[..., 2]) >= K_MIN_COS_THETA) & \
        (b.alpha > 0.0) & _has(b.active_lobes, LOBE_SPECULAR_REFLECTION)
    h = mu.safe_normalize(wi + wo)
    return jnp.where(ok, eval_pdf_ggx_bvndf(b.alpha, wi, h), 0.0)


def spec_trans_eval(b: FalcorBSDF, wi, wo):
    """SpecularReflectionTransmissionMicrofacet::eval (BxDF.hlsli:371-410)."""
    is_refl = wo[..., 2] > 0.0
    ok = (jnp.minimum(wi[..., 2], jnp.abs(wo[..., 2])) >= K_MIN_COS_THETA) \
        & (b.alpha_t > 0.0)
    has_r = _has(b.active_lobes, LOBE_SPECULAR_REFLECTION)
    has_t = _has(b.active_lobes, LOBE_SPECULAR_TRANSMISSION)
    ok &= jnp.where(is_refl, has_r, has_t)

    h = wo + wi * jnp.where(is_refl, 1.0, b.eta)[..., None]
    h = mu.safe_normalize(h)
    h = h * jnp.where(h[..., 2:3] >= 0.0, 1.0, -1.0)
    wi_dot_h = _dot(wi, h)
    wo_dot_h = _dot(wo, h)
    d = eval_ndf_ggx(b.alpha_t, h[..., 2])
    g = eval_masking_smith_ggx_correlated(b.alpha_t, wi[..., 2],
                                          jnp.abs(wo[..., 2]))
    f, _ = fresnel_dielectric(b.eta, wi_dot_h)
    refl = (f * d * g * 0.25 / jnp.maximum(wi[..., 2], 1e-12))[..., None] \
        * jnp.ones_like(b.trans_albedo)
    sqrt_denom = wo_dot_h + b.eta * wi_dot_h
    tterm = b.eta * b.eta * wi_dot_h * wo_dot_h / (
        jnp.maximum(wi[..., 2], 1e-12) *
        jnp.where(jnp.abs(sqrt_denom) < 1e-12, 1e-12, sqrt_denom) ** 2)
    trans = b.trans_albedo * ((1.0 - f) * d * g * jnp.abs(tterm))[..., None]
    return jnp.where(ok[..., None], jnp.where(is_refl[..., None], refl,
                                              trans), 0.0)


def spec_trans_pdf(b: FalcorBSDF, wi, wo):
    """SpecularReflectionTransmissionMicrofacet::evalPdf
    (BxDF.hlsli:506-558)."""
    is_refl = wo[..., 2] > 0.0
    ok = (jnp.minimum(wi[..., 2], jnp.abs(wo[..., 2])) >= K_MIN_COS_THETA) \
        & (b.alpha_t > 0.0)
    has_r = _has(b.active_lobes, LOBE_SPECULAR_REFLECTION)
    has_t = _has(b.active_lobes, LOBE_SPECULAR_TRANSMISSION)
    ok &= jnp.where(is_refl, has_r, has_t)

    h = wo + wi * jnp.where(is_refl, 1.0, b.eta)[..., None]
    h = mu.safe_normalize(h)
    h = h * jnp.where(h[..., 2:3] >= 0.0, 1.0, -1.0)
    wi_dot_h = _dot(wi, h)
    wo_dot_h = _dot(wo, h)
    f, _ = fresnel_dielectric(b.eta, wi_dot_h)
    pdf = eval_pdf_ggx_bvndf(b.alpha_t, wi, h)

    # reflection Jacobian
    pdf_r = jnp.where(wo_dot_h <= 0.0, 0.0,
                      pdf * wi_dot_h / jnp.maximum(wo_dot_h, 1e-12))
    # refraction Jacobian
    sqrt_denom = wo_dot_h + b.eta * wi_dot_h
    denom = jnp.maximum(sqrt_denom * sqrt_denom, 1e-20)
    pdf_t = jnp.where(wo_dot_h > 0.0, 0.0,
                      pdf * wi_dot_h * 4.0 * jnp.abs(wo_dot_h) / denom)
    pdf = jnp.where(is_refl, pdf_r, pdf_t)
    both = has_r & has_t
    pdf = jnp.where(both, pdf * jnp.where(is_refl, f, 1.0 - f), pdf)
    return jnp.where(ok, jnp.clip(pdf, 0.0, mu.FLT_MAX), 0.0)


# ---------------------------------------------------------------------------
# Mixture eval / sample / pdf (FalcorBSDF, BxDF.hlsli:764-879)
# ---------------------------------------------------------------------------

def bsdf_eval_split(b: FalcorBSDF, wi, wo):
    """Diffuse/specular split eval (BxDF.hlsli:764-772). Returns f*cos."""
    diffuse = jnp.zeros_like(b.diff_albedo)
    specular = jnp.zeros_like(b.diff_albedo)
    diffuse += jnp.where((b.p_diffuse > 0.0)[..., None],
                         ((1.0 - b.spec_trans) *
                          (1.0 - b.diff_trans))[..., None] *
                         diffuse_eval(b, wi, wo), 0.0)
    diffuse += jnp.where((b.p_diffuse_t > 0.0)[..., None],
                         ((1.0 - b.spec_trans) * b.diff_trans)[..., None] *
                         diffuse_trans_eval(b, wi, wo), 0.0)
    specular += jnp.where((b.p_specular > 0.0)[..., None],
                          (1.0 - b.spec_trans)[..., None] *
                          spec_eval(b, wi, wo), 0.0)
    specular += jnp.where((b.p_specular_t > 0.0)[..., None],
                          b.spec_trans[..., None] *
                          spec_trans_eval(b, wi, wo), 0.0)
    return diffuse, specular


def bsdf_eval(b: FalcorBSDF, wi, wo):
    d, s = bsdf_eval_split(b, wi, wo)
    return d + s


def bsdf_eval_pdf(b: FalcorBSDF, wi, wo):
    """FalcorBSDF::evalPdf (BxDF.hlsli:871-879)."""
    pdf = b.p_diffuse * diffuse_pdf(wi, wo)
    pdf += b.p_diffuse_t * diffuse_trans_pdf(wi, wo)
    pdf += b.p_specular * spec_pdf(b, wi, wo)
    pdf += b.p_specular_t * spec_trans_pdf(b, wi, wo)
    return pdf


def bsdf_eval_split_pdf(b: FalcorBSDF, wi, wo):
    """Fused eval_split + evalPdf for NEE: one half-vector / NDF /
    Fresnel evaluation per lobe serves both the f*cos value and the
    solid-angle pdf (the reference computes them in one BSDF pass too —
    StandardBSDF.hlsli eval returns pdf alongside the split). Returns
    (diffuse f*cos, specular f*cos, pdf)."""
    wi_z = wi[..., 2]
    wo_z = wo[..., 2]

    # ---- diffuse reflection
    ok_d = (jnp.minimum(wi_z, wo_z) >= K_MIN_COS_THETA) & (b.p_diffuse > 0.0)
    w_fb = _diffuse_frostbite_weight(wi, wo, b.roughness)
    base_d = jnp.where(ok_d, mu.M_1_PI * wo_z, 0.0)
    f_diff = b.diff_albedo * (base_d * w_fb)[..., None]
    pdf = b.p_diffuse * base_d

    # ---- diffuse transmission
    ok_dt = (jnp.minimum(wi_z, -wo_z) >= K_MIN_COS_THETA) & \
        (b.p_diffuse_t > 0.0)
    base_dt = jnp.where(ok_dt, mu.M_1_PI * -wo_z, 0.0)
    f_diff_t = b.trans_albedo * base_dt[..., None]
    pdf += b.p_diffuse_t * base_dt

    # ---- specular reflection (shared h / D between value and BVNDF pdf)
    ok_s = (jnp.minimum(wi_z, wo_z) >= K_MIN_COS_THETA) & \
        (b.alpha > 0.0) & _has(b.active_lobes, LOBE_SPECULAR_REFLECTION)
    h = mu.safe_normalize(wi + wo)
    wi_dot_h = _dot(wi, h)
    d_s = eval_ndf_ggx(b.alpha, h[..., 2])
    g_s = eval_masking_smith_ggx_correlated(b.alpha, wi_z, wo_z)
    f_s = fresnel_schlick(b.spec_albedo, 1.0, wi_dot_h[..., None])
    spec_val = f_s * (d_s * g_s * 0.25
                      / jnp.maximum(wi_z, 1e-12))[..., None]
    f_spec = jnp.where((ok_s & (b.p_specular > 0.0))[..., None],
                       spec_val, 0.0)
    # BVNDF pdf with the shared D (Microfacet.hlsli:105-128)
    a_s = mu.saturate(b.alpha)
    s_s = 1.0 + jnp.sqrt(wi[..., 0] ** 2 + wi[..., 1] ** 2)
    a2s, s2s = a_s * a_s, s_s * s_s
    k_s = (1.0 - a2s) * s2s / (s2s + a2s * wi_z * wi_z)
    t_s = jnp.sqrt((b.alpha * wi[..., 0]) ** 2
                   + (b.alpha * wi[..., 1]) ** 2 + wi_z * wi_z)
    pdf_s = d_s / jnp.maximum(2.0 * (k_s * wi_z + t_s), 1e-20)
    pdf += jnp.where(ok_s, b.p_specular * pdf_s, 0.0)

    # ---- specular reflection+transmission (shared h / dots / D / F)
    is_refl = wo_z > 0.0
    ok_t = (jnp.minimum(wi_z, jnp.abs(wo_z)) >= K_MIN_COS_THETA) & \
        (b.alpha_t > 0.0)
    has_r = _has(b.active_lobes, LOBE_SPECULAR_REFLECTION)
    has_t = _has(b.active_lobes, LOBE_SPECULAR_TRANSMISSION)
    ok_t &= jnp.where(is_refl, has_r, has_t)
    h_t = wo + wi * jnp.where(is_refl, 1.0, b.eta)[..., None]
    h_t = mu.safe_normalize(h_t)
    h_t = h_t * jnp.where(h_t[..., 2:3] >= 0.0, 1.0, -1.0)
    wi_dot_ht = _dot(wi, h_t)
    wo_dot_ht = _dot(wo, h_t)
    d_t = eval_ndf_ggx(b.alpha_t, h_t[..., 2])
    g_t = eval_masking_smith_ggx_correlated(b.alpha_t, wi_z,
                                            jnp.abs(wo_z))
    f_t, _ = fresnel_dielectric(b.eta, wi_dot_ht)
    refl = (f_t * d_t * g_t * 0.25
            / jnp.maximum(wi_z, 1e-12))[..., None] * \
        jnp.ones_like(b.trans_albedo)
    sqrt_denom = wo_dot_ht + b.eta * wi_dot_ht
    tterm = b.eta * b.eta * wi_dot_ht * wo_dot_ht / (
        jnp.maximum(wi_z, 1e-12) *
        jnp.where(jnp.abs(sqrt_denom) < 1e-12, 1e-12, sqrt_denom) ** 2)
    trans = b.trans_albedo * ((1.0 - f_t) * d_t * g_t
                              * jnp.abs(tterm))[..., None]
    f_spec_t = jnp.where((ok_t & (b.p_specular_t > 0.0))[..., None],
                         jnp.where(is_refl[..., None], refl, trans), 0.0)
    # BVNDF pdf with the shared D + Jacobians (BxDF.hlsli:506-558)
    a_t = mu.saturate(b.alpha_t)
    s2t = s2s                     # depends on wi only
    a2t = a_t * a_t
    k_t = (1.0 - a2t) * s2t / (s2t + a2t * wi_z * wi_z)
    t_t = jnp.sqrt((b.alpha_t * wi[..., 0]) ** 2
                   + (b.alpha_t * wi[..., 1]) ** 2 + wi_z * wi_z)
    pdf_m = d_t / jnp.maximum(2.0 * (k_t * wi_z + t_t), 1e-20)
    pdf_r = jnp.where(wo_dot_ht <= 0.0, 0.0,
                      pdf_m * wi_dot_ht
                      / jnp.maximum(wo_dot_ht, 1e-12))
    denom = jnp.maximum(sqrt_denom * sqrt_denom, 1e-20)
    pdf_tr = jnp.where(wo_dot_ht > 0.0, 0.0,
                       pdf_m * wi_dot_ht * 4.0 * jnp.abs(wo_dot_ht)
                       / denom)
    pdf_st = jnp.where(is_refl, pdf_r, pdf_tr)
    pdf_st = jnp.where(has_r & has_t,
                       pdf_st * jnp.where(is_refl, f_t, 1.0 - f_t),
                       pdf_st)
    pdf += jnp.where(ok_t, b.p_specular_t
                     * jnp.clip(pdf_st, 0.0, mu.FLT_MAX), 0.0)

    # mixture weights (bsdf_eval_split's outer factors)
    diffuse = ((1.0 - b.spec_trans) * (1.0 - b.diff_trans))[..., None] \
        * f_diff + ((1.0 - b.spec_trans) * b.diff_trans)[..., None] \
        * f_diff_t
    specular = (1.0 - b.spec_trans)[..., None] * f_spec \
        + b.spec_trans[..., None] * f_spec_t
    return diffuse, specular, pdf


def bsdf_sample(b: FalcorBSDF, wi, u3) -> BSDFSample:
    """FalcorBSDF::sample (BxDF.hlsli:785-869) with RecycleSelectSamples.

    u3: (N,3) uniform samples (.xy projection, .z lobe select).
    All four lobe samplers run; the selected lobe's result is kept.
    """
    u_sel = u3[..., 2]
    u2 = u3[..., :2]
    n3 = b.diff_albedo.shape[:-1] + (3,)

    c1 = b.p_diffuse
    c2 = c1 + b.p_diffuse_t
    c3 = c2 + b.p_specular
    sel_diff = u_sel < c1
    sel_difft = (~sel_diff) & (u_sel < c2)
    sel_spec = (~sel_diff) & (~sel_difft) & (u_sel < c3)
    sel_spect = (~sel_diff) & (~sel_difft) & (~sel_spec) & \
        (b.p_specular_t > 0.0)

    wi_z_ok = wi[..., 2] >= K_MIN_COS_THETA

    # ---- diffuse reflection / transmission: cosine hemisphere
    wo_cos, pdf_cos = mu.sample_cosine_hemisphere_concentric(u2)
    wo_dt = wo_cos * jnp.asarray([1.0, 1.0, -1.0])

    # ---- specular reflection (alpha may be 0 => delta)
    h_r = sample_ggx_bvndf(jnp.maximum(b.alpha, 1e-8), wi, u2)
    wi_dot_hr = _dot(wi, h_r)
    wo_sr = 2.0 * wi_dot_hr[..., None] * h_r - wi
    delta_r = b.alpha == 0.0
    wo_sr = jnp.where(delta_r[..., None],
                      jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], -1),
                      wo_sr)
    sr_valid = wi_z_ok & jnp.where(
        delta_r,
        _has(b.active_lobes, LOBE_DELTA_REFLECTION),
        (wo_sr[..., 2] >= K_MIN_COS_THETA) &
        _has(b.active_lobes, LOBE_SPECULAR_REFLECTION))
    sr_pdf = jnp.where(delta_r, 0.0, spec_pdf(b, wi, wo_sr) *
                       jnp.ones_like(b.alpha))
    sr_weight = jnp.where(
        delta_r[..., None],
        fresnel_schlick(b.spec_albedo, 1.0, wi[..., 2:3]),
        spec_eval(b, wi, wo_sr) / jnp.maximum(sr_pdf, 1e-20)[..., None])
    sr_lobe = jnp.where(delta_r, LOBE_DELTA_REFLECTION,
                        LOBE_SPECULAR_REFLECTION).astype(jnp.int32)

    # ---- specular reflection+transmission combined lobe
    # RecycleSelectSamples: rescale the remaining select sample
    u_sel_st = jnp.clip((u_sel - c3) / jnp.maximum(b.p_specular_t, 1e-20),
                        0.0, ONE_MINUS_EPS)
    delta_t = b.alpha_t == 0.0
    h_t = sample_ggx_bvndf(jnp.maximum(b.alpha_t, 1e-8), wi, u2)
    h_t = jnp.where(delta_t[..., None],
                    jnp.asarray([0.0, 0.0, 1.0]) * jnp.ones(n3), h_t)
    wi_dot_ht = _dot(wi, h_t)
    f_t, cos_theta_t = fresnel_dielectric(b.eta, wi_dot_ht)
    has_r = _has(b.active_lobes,
                 jnp.where(delta_t, LOBE_DELTA_REFLECTION,
                           LOBE_SPECULAR_REFLECTION).astype(jnp.int32))
    has_t = _has(b.active_lobes,
                 jnp.where(delta_t, LOBE_DELTA_TRANSMISSION,
                           LOBE_SPECULAR_TRANSMISSION).astype(jnp.int32))
    both = has_r & has_t
    is_refl_t = jnp.where(both, u_sel_st < f_t, has_r)
    # lobeP only carries the F split for the DELTA case (BxDF.hlsli:441)
    st_lobe_p = jnp.where(delta_t & both,
                          jnp.where(is_refl_t, f_t, 1.0 - f_t), 1.0)
    wo_st_r = 2.0 * wi_dot_ht[..., None] * h_t - wi
    wo_st_t = (b.eta * wi_dot_ht - cos_theta_t)[..., None] * h_t \
        - b.eta[..., None] * wi
    wo_st = jnp.where(is_refl_t[..., None], wo_st_r, wo_st_t)
    st_valid = wi_z_ok & (has_r | has_t) & \
        ~(has_t & ~has_r & (f_t == 1.0)) & \
        (jnp.abs(wo_st[..., 2]) >= K_MIN_COS_THETA) & \
        ((wo_st[..., 2] > 0.0) == is_refl_t)
    st_pdf = jnp.where(delta_t, 0.0, spec_trans_pdf(b, wi, wo_st))
    # delta weights (BxDF.hlsli:448-451)
    one3 = jnp.ones(n3)
    delta_w = jnp.where(is_refl_t[..., None], one3, b.trans_albedo)
    delta_w = jnp.where(both[..., None], delta_w,
                        delta_w * jnp.where(is_refl_t, f_t,
                                            1.0 - f_t)[..., None])
    rough_w = spec_trans_eval(b, wi, wo_st) / \
        jnp.maximum(st_pdf, 1e-20)[..., None]
    st_weight = jnp.where(delta_t[..., None], delta_w,
                          jnp.where((st_pdf > 0.0)[..., None], rough_w, 0.0))
    st_lobe = jnp.where(
        is_refl_t,
        jnp.where(delta_t, LOBE_DELTA_REFLECTION, LOBE_SPECULAR_REFLECTION),
        jnp.where(delta_t, LOBE_DELTA_TRANSMISSION,
                  LOBE_SPECULAR_TRANSMISSION)).astype(jnp.int32)

    # ---- select by lobe and apply mixture weights/pdf cross terms
    # (BxDF.hlsli:808-863)
    wo = jnp.where(sel_diff[..., None], wo_cos,
                   jnp.where(sel_difft[..., None], wo_dt,
                             jnp.where(sel_spec[..., None], wo_sr, wo_st)))
    zero3 = jnp.zeros(n3)

    # diffuse reflection branch
    d_valid = wi_z_ok & (wo_cos[..., 2] >= K_MIN_COS_THETA)
    d_weight = b.diff_albedo * _diffuse_frostbite_weight(
        wi, wo_cos, b.roughness)[..., None]
    d_weight = d_weight / jnp.maximum(b.p_diffuse, 1e-20)[..., None] * \
        ((1.0 - b.spec_trans) * (1.0 - b.diff_trans))[..., None]

    # diffuse transmission branch
    dt_valid = wi_z_ok & (-wo_dt[..., 2] >= K_MIN_COS_THETA)
    dt_weight = b.trans_albedo / jnp.maximum(b.p_diffuse_t,
                                             1e-20)[..., None] * \
        ((1.0 - b.spec_trans) * b.diff_trans)[..., None]

    # specular reflection branch
    s_weight = sr_weight / jnp.maximum(b.p_specular, 1e-20)[..., None] * \
        (1.0 - b.spec_trans)[..., None]
    s_lobe_p = jnp.ones_like(b.alpha)

    # specular reflection+transmission branch
    t_weight = st_weight / jnp.maximum(b.p_specular_t, 1e-20)[..., None] * \
        b.spec_trans[..., None]

    valid = jnp.where(sel_diff, d_valid,
                      jnp.where(sel_difft, dt_valid,
                                jnp.where(sel_spec, sr_valid,
                                          jnp.where(sel_spect, st_valid,
                                                    False))))
    weight = jnp.where(sel_diff[..., None], d_weight,
                       jnp.where(sel_difft[..., None], dt_weight,
                                 jnp.where(sel_spec[..., None], s_weight,
                                           jnp.where(sel_spect[..., None],
                                                     t_weight, zero3))))
    # mixture pdf of the SELECTED direction: identical to the per-branch
    # "own pdf + cross terms" sums the reference writes out lobe by lobe
    # (each branch's own sampling pdf equals its evalPdf at wo, and every
    # cross term is another lobe's evalPdf at wo — so the whole 10-eval
    # cascade collapses to ONE evalPdf of the selected wo; 4 lobe-pdf
    # evaluations instead of 10 per bounce)
    pdf = bsdf_eval_pdf(b, wi, wo)
    lobe = jnp.where(sel_diff, LOBE_DIFFUSE_REFLECTION,
                     jnp.where(sel_difft, LOBE_DIFFUSE_TRANSMISSION,
                               jnp.where(sel_spec, sr_lobe,
                                         st_lobe))).astype(jnp.int32)
    lobe_p = jnp.where(sel_diff, b.p_diffuse,
                       jnp.where(sel_difft, b.p_diffuse_t,
                                 jnp.where(sel_spec, s_lobe_p * b.p_specular,
                                           st_lobe_p * b.p_specular_t)))
    # delta events report pdf 0 (BxDF.hlsli:865-866)
    is_delta = (lobe & LOBE_DELTA) != 0
    pdf = jnp.where(is_delta | ~valid, 0.0, pdf)
    weight = jnp.where(valid[..., None], weight, 0.0)
    return BSDFSample(wo=wo, pdf=pdf, weight=weight, lobe=lobe,
                      lobe_p=lobe_p, valid=valid)
