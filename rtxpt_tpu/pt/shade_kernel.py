"""Fused shade + NEE Pallas megakernel (the "ubershader" tier).

The reference evaluates emission, russian roulette, BSDF sampling and
NEE in ONE closest-hit ubershader invocation per thread
(RTXPT/Sample.hlsl:368-393 -> PathTracer::HandleHit,
PathTracer.hlsli:371-525). The round-3 TPU build expressed that math as
an XLA chain between the trace kernels; measured cost was ~44 ms of the
~90 ms/bounce at 480k lanes (ROADMAP round-3 decomposition) — fusion
boundaries at every Pallas gather plus transcendental-heavy VPU chains.
This module fuses the whole post-trace bounce program into ONE Pallas
kernel over (TILE,) lane blocks (VERDICT r3 next #3):

    emission*MIS + firefly     (PathTracer.hlsli:456-468)
    russian roulette           (:125-149)
    FalcorBSDF make + sample   (BxDF.hlsli:647-714, 785-869)
    scatter ray + cone/firefly (:158-264)
    NEE: distant + local       (PathTracerNEE.hlsli:155-344)
      light geometry, fused bsdf eval+pdf, MIS, grazing, firefly
    scatter-side emissive MIS  (NEE.hlsli:248-280)

Everything is component-form ((TILE,) x/y/z lanes — the (N,3) layout of
the XLA path maps badly onto (8,128) native tiles), matching
ops/traverse_pallas.py's house style. Inputs/outputs are two stacked
(C, N) planes so the whole bounce pays ONE HBM read + ONE write of ~80
rows instead of a fusion boundary per chain link.

Stays OUTSIDE the kernel (gathers / int-packing / divergent control):
  * the closest/anyhit traces and the one-hot surface gathers;
  * alpha test + nested-dielectric stack ops (integer packing);
  * env-map distant sampling + pdf (luminance-pyramid gathers) — the
    distant light SAMPLE is drawn outside and passed in; the scatter
    direction's env pdf (env MIS) is applied outside from the kernel's
    bs.pdf output;
  * HandleMiss (env eval), regen, stable-planes FILL bookkeeping
    (cfg.mode == FILL falls back to the XLA path).

Equivalence: tests/test_shade_kernel.py checks this kernel against the
XLA bounce math lobe-for-lobe in interpret mode on CPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import mathutils as mu
from . import bsdf as B

TILE = 1024
K_MIN_COS = B.K_MIN_COS_THETA
ONE_MINUS_EPS = B.ONE_MINUS_EPS
M_PI = float(np.pi)
M_2PI = float(2.0 * np.pi)
M_1_PI = float(1.0 / np.pi)
M_PI_4 = float(np.pi / 4.0)
M_PI_2 = float(np.pi / 2.0)
FLT_MAX = 3.402823466e38


# ---------------------------------------------------------------------------
# plane layout bookkeeping
# ---------------------------------------------------------------------------

class _Layout:
    def __init__(self):
        self.rows = 0
        self.map = {}

    def add(self, name: str, k: int = 1):
        self.map[name] = (self.rows, k)
        self.rows += k

    def get(self, ref, name):
        r, k = self.map[name]
        if k == 1:
            return ref[r]
        return tuple(ref[r + i] for i in range(k))

    def put(self, ref, name, val):
        r, k = self.map[name]
        if k == 1:
            ref[r] = val
        else:
            for i in range(k):
                ref[r + i] = val[i]


def _in_layout(nee_distant: int, nee_local: int) -> _Layout:
    L = _Layout()
    # surface (post load_surface + update_outside_ior)
    L.add("pos", 3)
    L.add("n", 3)
    L.add("t", 3)
    L.add("b", 3)
    L.add("face_n", 3)
    L.add("vertex_n", 3)
    L.add("v", 3)
    L.add("emission", 3)
    L.add("front_facing")
    L.add("thin")
    L.add("shadow_fade")
    # bsdf data
    L.add("bd_diffuse", 3)
    L.add("bd_specular", 3)
    L.add("bd_rough")
    L.add("bd_metallic")
    L.add("bd_eta")
    L.add("bd_trans", 3)
    L.add("bd_dtrans")
    L.add("bd_strans")
    # path
    L.add("thp", 3)
    L.add("radiance", 3)
    L.add("origin", 3)
    L.add("direction", 3)
    L.add("firefly_k")
    L.add("emissive_mis")
    L.add("env_mis")
    L.add("cone_spread")
    L.add("diffuse_bounces")
    L.add("vertex_index")
    L.add("shade")            # is_hit & true_int & ~alpha_reject
    L.add("nee_skip")         # FILL: lanes whose NEE contribution the
    #   plane routing discards (restir_covered) — don't cast their rays
    # uniforms (pre-drawn outside in the exact XLA order)
    L.add("u_rr")
    L.add("u3", 3)
    for i in range(nee_distant):
        L.add(f"ls_dir{i}", 3)
        L.add(f"ls_dist{i}")
        L.add(f"ls_li{i}", 3)
        L.add(f"ls_pdf{i}")
        L.add(f"ls_valid{i}")
    for j in range(nee_local):
        L.add(f"lrow_p0{j}", 3)
        L.add(f"lrow_e1{j}", 3)
        L.add(f"lrow_e2{j}", 3)
        L.add(f"lrow_pos{j}", 3)
        L.add(f"lrow_radius{j}")
        L.add(f"lrow_rad{j}", 3)
        L.add(f"lrow_inv_area{j}")
        L.add(f"lrow_kind{j}")
        L.add(f"lrow_axis{j}", 3)
        L.add(f"lrow_cos_cone{j}")
        L.add(f"lrow_soft{j}")
        L.add(f"pick_pdf{j}")
        L.add(f"u3l{j}", 3)
    return L


def _out_layout(nee_distant: int, nee_local: int,
                fill: bool = False) -> _Layout:
    L = _Layout()
    L.add("radiance", 3)      # + emission term (passthrough when fill)
    L.add("thp", 3)           # post RR + scatter weight
    L.add("origin", 3)
    L.add("direction", 3)
    L.add("firefly_k")
    L.add("emissive_mis")     # fully resolved (analytic local-K MIS)
    L.add("env_mis_pre")      # where(shade, 1, old); env_w applied outside
    L.add("cone_spread")
    L.add("diffuse_bounces")
    L.add("lobe")             # f32-encoded LobeType
    L.add("bs_pdf")
    L.add("lobe_p")
    L.add("scatter_valid")
    L.add("will_scatter")
    L.add("rr_kill")
    L.add("non_delta_scatter")  # shade & scatter_valid & ~delta (env MIS)
    L.add("vis_origin", 3)      # NEE visibility ray origin
    if fill:
        # FILL routes emission + split NEE into stable-plane channels
        # (PathTracerStablePlanes StablePlanesHandleNEE) outside
        L.add("emission_term", 3)   # max(thp_pre_rr * em, 0) where shade
        L.add("pre_scatter_thp", 3)
    k = nee_distant + nee_local
    for i in range(k):
        L.add(f"nee_dir{i}", 3)
        L.add(f"nee_dist{i}")
        L.add(f"nee_need{i}")
        if fill:
            L.add(f"nee_contrib_d{i}", 3)   # diffuse/specular split
            L.add(f"nee_contrib_s{i}", 3)
        else:
            L.add(f"nee_contrib{i}", 3)
    return L


# ---------------------------------------------------------------------------
# component-form vector helpers ((TILE,) lanes)
# ---------------------------------------------------------------------------

def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross3(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _scale3(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _add3(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub3(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _mul3(a, b):
    return (a[0] * b[0], a[1] * b[1], a[2] * b[2])


def _where3(c, a, b):
    return (jnp.where(c, a[0], b[0]), jnp.where(c, a[1], b[1]),
            jnp.where(c, a[2], b[2]))


def _normalize3(a, eps=1e-20):
    l = jnp.sqrt(_dot3(a, a))
    inv = 1.0 / jnp.maximum(l, eps)
    return _scale3(a, inv)


def _safe_normalize3(a):
    l = jnp.sqrt(_dot3(a, a))
    n = _scale3(a, 1.0 / jnp.maximum(l, 1e-20))
    ok = l > 1e-20
    return _where3(ok, n, (jnp.zeros_like(l),) * 3)


def _luminance3(c):
    return 0.2126 * c[0] + 0.7152 * c[1] + 0.0722 * c[2]


def _sat(x):
    return jnp.clip(x, 0.0, 1.0)


def _to_local(v, t, b, n):
    return (_dot3(v, t), _dot3(v, b), _dot3(v, n))


def _from_local(v, t, b, n):
    return (v[0] * t[0] + v[1] * b[0] + v[2] * n[0],
            v[0] * t[1] + v[1] * b[1] + v[2] * n[1],
            v[0] * t[2] + v[1] * b[2] + v[2] * n[2])


def _compute_ray_origin(pos, fn):
    """mu.compute_ray_origin, componentwise (RTG6 integer offset)."""
    out = []
    for c in range(3):
        p = pos[c]
        f = fn[c]
        i_off = (f * (3.0 * 256.0)).astype(jnp.int32)
        pos_bits = jax.lax.bitcast_convert_type(p, jnp.int32)
        shifted = pos_bits + jnp.where(p < 0.0, -i_off, i_off)
        i_pos = jax.lax.bitcast_convert_type(shifted, jnp.float32)
        f_off = f * (3.0 / 65536.0)
        out.append(jnp.where(jnp.abs(p) < (1.0 / 16.0), p + f_off, i_pos))
    return tuple(out)


def _fresnel_schlick3(f0, f90, cos_theta):
    c = jnp.maximum(1.0 - cos_theta, 0.0)
    c5 = c * c
    c5 = c5 * c5 * c
    return tuple(f0[i] + (f90 - f0[i]) * c5 for i in range(3))


def _fresnel_schlick1(f0, f90, cos_theta):
    c = jnp.maximum(1.0 - cos_theta, 0.0)
    c5 = c * c
    c5 = c5 * c5 * c
    return f0 + (f90 - f0) * c5


def _firefly_filter3(sig, threshold, k):
    t = threshold * k
    lum = _luminance3(sig)
    s = t / jnp.maximum(lum, 1e-30)
    over = lum > t
    out = tuple(jnp.where(over, sig[i] * s, sig[i]) for i in range(3))
    enabled = threshold > 0.0
    return tuple(jnp.where(enabled, out[i], sig[i]) for i in range(3))


def _spread_angle_from_pdf(pdf, growth):
    # polynomial acos (mu.acos_approx): Mosaic has no acos lowering, and
    # using the same approximation in BOTH paths keeps them bit-equal
    safe = jnp.maximum(pdf, 1e-30)
    return growth * 2.0 * mu.acos_approx(
        jnp.clip(1.0 - (1.0 / safe) / M_2PI, -1.0, 1.0))


def _new_firefly_k(cur_k, bounce_pdf, lobe_p):
    angle = jnp.where(bounce_pdf == 0.0, 0.0,
                      _spread_angle_from_pdf(bounce_pdf, 1.0))
    p = 32.0 / (32.0 + angle * angle)
    p = p * jnp.sqrt(jnp.maximum(lobe_p, 0.0))
    return jnp.maximum(1e-4, cur_k * p)


def _eval_mis(n0, p0, n1, p1):
    q0 = n0 * p0
    q1 = n1 * p1
    return _sat(q0 / jnp.maximum(q0 + q1, 1e-30))


# ---------------------------------------------------------------------------
# component-form BSDF (ports of pt/bsdf.py; formulas unchanged)
# ---------------------------------------------------------------------------

def _make_bsdf_c(bd, cos_v, thin):
    """make_bsdf (BxDF.hlsli:647-714), LOBE_ALL active."""
    trans_albedo = _where3(
        thin, bd["trans"],
        tuple(jnp.sqrt(jnp.maximum(bd["trans"][i], 0.0))
              for i in range(3)))
    alpha = bd["rough"] * bd["rough"]
    alpha = jnp.where(alpha < B.K_MIN_GGX_ALPHA, 0.0, alpha)
    alpha_t = jnp.where(bd["eta"] == 1.0, 0.0, alpha)
    metallic_brdf = bd["metallic"] * (1.0 - bd["strans"])
    dielectric = (1.0 - bd["metallic"]) * (1.0 - bd["strans"])
    diffuse_w = _luminance3(bd["diffuse"])
    specular_w = _luminance3(_fresnel_schlick3(bd["specular"], 1.0, cos_v))
    p_diff = diffuse_w * dielectric * (1.0 - bd["dtrans"])
    p_diff_t = diffuse_w * dielectric * bd["dtrans"]
    p_spec = specular_w * (metallic_brdf + dielectric)
    p_spec_t = bd["strans"]
    norm = p_diff + p_diff_t + p_spec + p_spec_t
    inv = jnp.where(norm > 0.0, 1.0 / jnp.maximum(norm, 1e-30), 0.0)
    return dict(diff_albedo=bd["diffuse"], spec_albedo=bd["specular"],
                trans_albedo=trans_albedo, alpha=alpha, alpha_t=alpha_t,
                eta=bd["eta"], roughness=bd["rough"],
                diff_trans=bd["dtrans"], spec_trans=bd["strans"],
                p_diffuse=p_diff * inv, p_diffuse_t=p_diff_t * inv,
                p_specular=p_spec * inv, p_specular_t=p_spec_t * inv)


def _frostbite_weight_c(wi, wo, roughness):
    h = _safe_normalize3(_add3(wi, wo))
    wo_dot_h = _dot3(wo, h)
    energy_bias = 0.5 * roughness
    energy_factor = 1.0 + (1.0 / 1.51 - 1.0) * roughness
    fd90 = energy_bias + 2.0 * wo_dot_h * wo_dot_h * roughness
    wi_sc = _fresnel_schlick1(1.0, fd90, wi[2])
    wo_sc = _fresnel_schlick1(1.0, fd90, wo[2])
    return wi_sc * wo_sc * energy_factor


def _fresnel_dielectric_c(eta, cos_i):
    flip = cos_i < 0.0
    eta = jnp.where(flip, 1.0 / jnp.maximum(eta, 1e-8), eta)
    ci = jnp.abs(cos_i)
    sin_t_sq = eta * eta * (1.0 - ci * ci)
    tir = sin_t_sq > 1.0
    ct = jnp.sqrt(jnp.maximum(1.0 - sin_t_sq, 0.0))
    denom_s = eta * ci + ct
    denom_p = eta * ct + ci
    rs = (eta * ci - ct) / jnp.where(jnp.abs(denom_s) < 1e-12, 1e-12,
                                     denom_s)
    rp = (eta * ct - ci) / jnp.where(jnp.abs(denom_p) < 1e-12, 1e-12,
                                     denom_p)
    f = 0.5 * (rs * rs + rp * rp)
    return jnp.where(tir, 1.0, f), jnp.where(tir, 0.0, ct)


def _sample_ggx_bvndf_c(alpha, i, u0, u1):
    al = alpha
    i_std = _normalize3((i[0] * al, i[1] * al, i[2]))
    phi = M_2PI * u0
    a = _sat(alpha)
    s = 1.0 + jnp.sqrt(i[0] * i[0] + i[1] * i[1])
    a2, s2 = a * a, s * s
    k = (1.0 - a2) * s2 / (s2 + a2 * i[2] * i[2])
    bz = jnp.where(i[2] > 0.0, k * i_std[2], i_std[2])
    z = (1.0 - u1) * (1.0 + bz) - bz
    sin_t = jnp.sqrt(_sat(1.0 - z * z))
    o_std = (sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), z)
    m_std = _add3(i_std, o_std)
    m = (m_std[0] * al, m_std[1] * al, m_std[2])
    return _normalize3(m)


def _eval_ndf_ggx(alpha, cos_theta):
    a2 = alpha * alpha
    d = (cos_theta * a2 - cos_theta) * cos_theta + 1.0
    return a2 / jnp.maximum(d * d * M_PI, 1e-30)


def _eval_lambda_ggx(a2, cos_theta):
    cs = jnp.maximum(cos_theta, 1e-12)
    cos_sqr = cs * cs
    tan_sqr = jnp.maximum(1.0 - cos_sqr, 0.0) / cos_sqr
    lam = 0.5 * (-1.0 + jnp.sqrt(1.0 + a2 * tan_sqr))
    return jnp.where(cos_theta <= 0.0, 0.0, lam)


def _smith_ggx_correlated(alpha, cos_i, cos_o):
    a2 = alpha * alpha
    return 1.0 / jnp.maximum(
        1.0 + _eval_lambda_ggx(a2, cos_i) + _eval_lambda_ggx(a2, cos_o),
        1e-12)


def _pdf_ggx_bvndf_c(alpha, i, m):
    ndf = _eval_ndf_ggx(alpha, m[2])
    t = jnp.sqrt((alpha * i[0]) ** 2 + (alpha * i[1]) ** 2 + i[2] * i[2])
    a = _sat(alpha)
    s = 1.0 + jnp.sqrt(i[0] * i[0] + i[1] * i[1])
    a2, s2 = a * a, s * s
    k = (1.0 - a2) * s2 / (s2 + a2 * i[2] * i[2])
    return ndf / jnp.maximum(2.0 * (k * i[2] + t), 1e-20)


def _spec_eval_c(b, wi, wo):
    ok = (jnp.minimum(wi[2], wo[2]) >= K_MIN_COS) & (b["alpha"] > 0.0)
    h = _safe_normalize3(_add3(wi, wo))
    wi_dot_h = _dot3(wi, h)
    d = _eval_ndf_ggx(b["alpha"], h[2])
    g = _smith_ggx_correlated(b["alpha"], wi[2], wo[2])
    f = _fresnel_schlick3(b["spec_albedo"], 1.0, wi_dot_h)
    s = d * g * 0.25 / jnp.maximum(wi[2], 1e-12)
    return tuple(jnp.where(ok, f[i] * s, 0.0) for i in range(3))


def _spec_pdf_c(b, wi, wo):
    ok = (jnp.minimum(wi[2], wo[2]) >= K_MIN_COS) & (b["alpha"] > 0.0)
    h = _safe_normalize3(_add3(wi, wo))
    return jnp.where(ok, _pdf_ggx_bvndf_c(b["alpha"], wi, h), 0.0)


def _spec_trans_eval_c(b, wi, wo):
    is_refl = wo[2] > 0.0
    ok = (jnp.minimum(wi[2], jnp.abs(wo[2])) >= K_MIN_COS) & \
        (b["alpha_t"] > 0.0)
    h = _add3(wo, _scale3(wi, jnp.where(is_refl, 1.0, b["eta"])))
    h = _safe_normalize3(h)
    flip = jnp.where(h[2] >= 0.0, 1.0, -1.0)
    h = _scale3(h, flip)
    wi_dot_h = _dot3(wi, h)
    wo_dot_h = _dot3(wo, h)
    d = _eval_ndf_ggx(b["alpha_t"], h[2])
    g = _smith_ggx_correlated(b["alpha_t"], wi[2], jnp.abs(wo[2]))
    f, _ = _fresnel_dielectric_c(b["eta"], wi_dot_h)
    refl = f * d * g * 0.25 / jnp.maximum(wi[2], 1e-12)
    sqrt_denom = wo_dot_h + b["eta"] * wi_dot_h
    tterm = b["eta"] * b["eta"] * wi_dot_h * wo_dot_h / (
        jnp.maximum(wi[2], 1e-12) *
        jnp.where(jnp.abs(sqrt_denom) < 1e-12, 1e-12, sqrt_denom) ** 2)
    tr = (1.0 - f) * d * g * jnp.abs(tterm)
    return tuple(jnp.where(
        ok, jnp.where(is_refl, refl, b["trans_albedo"][i] * tr), 0.0)
        for i in range(3))


def _spec_trans_pdf_c(b, wi, wo):
    is_refl = wo[2] > 0.0
    ok = (jnp.minimum(wi[2], jnp.abs(wo[2])) >= K_MIN_COS) & \
        (b["alpha_t"] > 0.0)
    h = _add3(wo, _scale3(wi, jnp.where(is_refl, 1.0, b["eta"])))
    h = _safe_normalize3(h)
    flip = jnp.where(h[2] >= 0.0, 1.0, -1.0)
    h = _scale3(h, flip)
    wi_dot_h = _dot3(wi, h)
    wo_dot_h = _dot3(wo, h)
    f, _ = _fresnel_dielectric_c(b["eta"], wi_dot_h)
    pdf = _pdf_ggx_bvndf_c(b["alpha_t"], wi, h)
    pdf_r = jnp.where(wo_dot_h <= 0.0, 0.0,
                      pdf * wi_dot_h / jnp.maximum(wo_dot_h, 1e-12))
    sqrt_denom = wo_dot_h + b["eta"] * wi_dot_h
    denom = jnp.maximum(sqrt_denom * sqrt_denom, 1e-20)
    pdf_t = jnp.where(wo_dot_h > 0.0, 0.0,
                      pdf * wi_dot_h * 4.0 * jnp.abs(wo_dot_h) / denom)
    pdf = jnp.where(is_refl, pdf_r, pdf_t)
    # LOBE_ALL: both reflection and transmission lobes are active
    pdf = pdf * jnp.where(is_refl, f, 1.0 - f)
    return jnp.where(ok, jnp.clip(pdf, 0.0, FLT_MAX), 0.0)


def _bsdf_eval_pdf_c(b, wi, wo):
    """bsdf_eval_pdf (mixture pdf of wo)."""
    ok_d = jnp.minimum(wi[2], wo[2]) >= K_MIN_COS
    pdf = b["p_diffuse"] * jnp.where(ok_d, M_1_PI * wo[2], 0.0)
    ok_dt = jnp.minimum(wi[2], -wo[2]) >= K_MIN_COS
    pdf += b["p_diffuse_t"] * jnp.where(ok_dt, M_1_PI * -wo[2], 0.0)
    pdf += b["p_specular"] * _spec_pdf_c(b, wi, wo)
    pdf += b["p_specular_t"] * _spec_trans_pdf_c(b, wi, wo)
    return pdf


def _bsdf_eval_split_pdf_c(b, wi, wo):
    """bsdf_eval_split_pdf (fused NEE eval; bsdf.py:424-524)."""
    wi_z, wo_z = wi[2], wo[2]
    ok_d = (jnp.minimum(wi_z, wo_z) >= K_MIN_COS) & (b["p_diffuse"] > 0.0)
    w_fb = _frostbite_weight_c(wi, wo, b["roughness"])
    base_d = jnp.where(ok_d, M_1_PI * wo_z, 0.0)
    f_diff = tuple(b["diff_albedo"][i] * base_d * w_fb for i in range(3))
    pdf = b["p_diffuse"] * base_d

    ok_dt = (jnp.minimum(wi_z, -wo_z) >= K_MIN_COS) & \
        (b["p_diffuse_t"] > 0.0)
    base_dt = jnp.where(ok_dt, M_1_PI * -wo_z, 0.0)
    f_diff_t = tuple(b["trans_albedo"][i] * base_dt for i in range(3))
    pdf += b["p_diffuse_t"] * base_dt

    ok_s = (jnp.minimum(wi_z, wo_z) >= K_MIN_COS) & (b["alpha"] > 0.0)
    h = _safe_normalize3(_add3(wi, wo))
    wi_dot_h = _dot3(wi, h)
    d_s = _eval_ndf_ggx(b["alpha"], h[2])
    g_s = _smith_ggx_correlated(b["alpha"], wi_z, wo_z)
    f_s = _fresnel_schlick3(b["spec_albedo"], 1.0, wi_dot_h)
    sv = d_s * g_s * 0.25 / jnp.maximum(wi_z, 1e-12)
    okp = ok_s & (b["p_specular"] > 0.0)
    f_spec = tuple(jnp.where(okp, f_s[i] * sv, 0.0) for i in range(3))
    a_s = _sat(b["alpha"])
    s_s = 1.0 + jnp.sqrt(wi[0] * wi[0] + wi[1] * wi[1])
    a2s, s2s = a_s * a_s, s_s * s_s
    k_s = (1.0 - a2s) * s2s / (s2s + a2s * wi_z * wi_z)
    t_s = jnp.sqrt((b["alpha"] * wi[0]) ** 2 + (b["alpha"] * wi[1]) ** 2
                   + wi_z * wi_z)
    pdf_s = d_s / jnp.maximum(2.0 * (k_s * wi_z + t_s), 1e-20)
    pdf += jnp.where(ok_s, b["p_specular"] * pdf_s, 0.0)

    is_refl = wo_z > 0.0
    ok_t = (jnp.minimum(wi_z, jnp.abs(wo_z)) >= K_MIN_COS) & \
        (b["alpha_t"] > 0.0)
    h_t = _add3(wo, _scale3(wi, jnp.where(is_refl, 1.0, b["eta"])))
    h_t = _safe_normalize3(h_t)
    flip = jnp.where(h_t[2] >= 0.0, 1.0, -1.0)
    h_t = _scale3(h_t, flip)
    wi_dot_ht = _dot3(wi, h_t)
    wo_dot_ht = _dot3(wo, h_t)
    d_t = _eval_ndf_ggx(b["alpha_t"], h_t[2])
    g_t = _smith_ggx_correlated(b["alpha_t"], wi_z, jnp.abs(wo_z))
    f_t, _ = _fresnel_dielectric_c(b["eta"], wi_dot_ht)
    refl = f_t * d_t * g_t * 0.25 / jnp.maximum(wi_z, 1e-12)
    sqrt_denom = wo_dot_ht + b["eta"] * wi_dot_ht
    tterm = b["eta"] * b["eta"] * wi_dot_ht * wo_dot_ht / (
        jnp.maximum(wi_z, 1e-12) *
        jnp.where(jnp.abs(sqrt_denom) < 1e-12, 1e-12, sqrt_denom) ** 2)
    tr = (1.0 - f_t) * d_t * g_t * jnp.abs(tterm)
    okt = ok_t & (b["p_specular_t"] > 0.0)
    f_spec_t = tuple(jnp.where(
        okt, jnp.where(is_refl, refl, b["trans_albedo"][i] * tr), 0.0)
        for i in range(3))
    a_t = _sat(b["alpha_t"])
    a2t = a_t * a_t
    k_t = (1.0 - a2t) * s2s / (s2s + a2t * wi_z * wi_z)
    t_t = jnp.sqrt((b["alpha_t"] * wi[0]) ** 2
                   + (b["alpha_t"] * wi[1]) ** 2 + wi_z * wi_z)
    pdf_m = d_t / jnp.maximum(2.0 * (k_t * wi_z + t_t), 1e-20)
    pdf_r = jnp.where(wo_dot_ht <= 0.0, 0.0,
                      pdf_m * wi_dot_ht / jnp.maximum(wo_dot_ht, 1e-12))
    denom = jnp.maximum(sqrt_denom * sqrt_denom, 1e-20)
    pdf_tr = jnp.where(wo_dot_ht > 0.0, 0.0,
                       pdf_m * wi_dot_ht * 4.0 * jnp.abs(wo_dot_ht)
                       / denom)
    pdf_st = jnp.where(is_refl, pdf_r, pdf_tr)
    pdf_st = pdf_st * jnp.where(is_refl, f_t, 1.0 - f_t)
    pdf += jnp.where(ok_t, b["p_specular_t"]
                     * jnp.clip(pdf_st, 0.0, FLT_MAX), 0.0)

    wd = (1.0 - b["spec_trans"]) * (1.0 - b["diff_trans"])
    wdt = (1.0 - b["spec_trans"]) * b["diff_trans"]
    ws = 1.0 - b["spec_trans"]
    wst = b["spec_trans"]
    diffuse = tuple(wd * f_diff[i] + wdt * f_diff_t[i] for i in range(3))
    specular = tuple(ws * f_spec[i] + wst * f_spec_t[i] for i in range(3))
    return diffuse, specular, pdf


def _sample_cosine_hemisphere_c(u0, u1):
    ux = 2.0 * u0 - 1.0
    uy = 2.0 * u1 - 1.0
    ax, ay = jnp.abs(ux), jnp.abs(uy)
    use_x = ax > ay
    r = jnp.where(use_x, ux, uy)
    phi = jnp.where(
        use_x,
        (uy / jnp.where(ux == 0, 1.0, ux)) * M_PI_4,
        M_PI_2 - (ux / jnp.where(uy == 0, 1.0, uy)) * M_PI_4)
    dx = r * jnp.cos(phi)
    dy = r * jnp.sin(phi)
    zero = (ux == 0.0) & (uy == 0.0)
    dx = jnp.where(zero, ux, dx)
    dy = jnp.where(zero, uy, dy)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - (dx * dx + dy * dy)))
    return (dx, dy, z), z * M_1_PI


def _bsdf_sample_c(b, wi, u3):
    """bsdf_sample (bsdf.py:527-679), LOBE_ALL."""
    u0, u1, u_sel = u3
    c1 = b["p_diffuse"]
    c2 = c1 + b["p_diffuse_t"]
    c3 = c2 + b["p_specular"]
    sel_diff = u_sel < c1
    sel_difft = (~sel_diff) & (u_sel < c2)
    sel_spec = (~sel_diff) & (~sel_difft) & (u_sel < c3)
    sel_spect = (~sel_diff) & (~sel_difft) & (~sel_spec) & \
        (b["p_specular_t"] > 0.0)
    wi_z_ok = wi[2] >= K_MIN_COS

    wo_cos, _ = _sample_cosine_hemisphere_c(u0, u1)
    wo_dt = (wo_cos[0], wo_cos[1], -wo_cos[2])

    h_r = _sample_ggx_bvndf_c(jnp.maximum(b["alpha"], 1e-8), wi, u0, u1)
    wi_dot_hr = _dot3(wi, h_r)
    wo_sr = _sub3(_scale3(h_r, 2.0 * wi_dot_hr), wi)
    delta_r = b["alpha"] == 0.0
    wo_sr = _where3(delta_r, (-wi[0], -wi[1], wi[2]), wo_sr)
    # boolean selects as logical ops (Mosaic can't trunci i8->i1)
    sr_valid = wi_z_ok & (delta_r | (wo_sr[2] >= K_MIN_COS))
    sr_pdf = jnp.where(delta_r, 0.0, _spec_pdf_c(b, wi, wo_sr))
    se = _spec_eval_c(b, wi, wo_sr)
    inv_srp = 1.0 / jnp.maximum(sr_pdf, 1e-20)
    fs_d = _fresnel_schlick3(b["spec_albedo"], 1.0, wi[2])
    sr_weight = tuple(jnp.where(delta_r, fs_d[i], se[i] * inv_srp)
                      for i in range(3))
    sr_lobe = jnp.where(delta_r, B.LOBE_DELTA_REFLECTION,
                        B.LOBE_SPECULAR_REFLECTION).astype(jnp.float32)

    u_sel_st = jnp.clip((u_sel - c3)
                        / jnp.maximum(b["p_specular_t"], 1e-20),
                        0.0, ONE_MINUS_EPS)
    delta_t = b["alpha_t"] == 0.0
    h_t = _sample_ggx_bvndf_c(jnp.maximum(b["alpha_t"], 1e-8), wi, u0, u1)
    zero = jnp.zeros_like(u0)
    h_t = _where3(delta_t, (zero, zero, jnp.ones_like(u0)), h_t)
    wi_dot_ht = _dot3(wi, h_t)
    f_t, cos_theta_t = _fresnel_dielectric_c(b["eta"], wi_dot_ht)
    # LOBE_ALL: has_r = has_t = True, both = True
    is_refl_t = u_sel_st < f_t
    st_lobe_p = jnp.where(delta_t,
                          jnp.where(is_refl_t, f_t, 1.0 - f_t), 1.0)
    wo_st_r = _sub3(_scale3(h_t, 2.0 * wi_dot_ht), wi)
    wo_st_t = _sub3(_scale3(h_t, b["eta"] * wi_dot_ht - cos_theta_t),
                    _scale3(wi, b["eta"]))
    wo_st = _where3(is_refl_t, wo_st_r, wo_st_t)
    # LOBE_ALL: has_r = has_t = True -> the (has_r|has_t) and
    # ~(has_t & ~has_r & TIR) guards of bsdf.py:599-602 are constant True
    st_valid = wi_z_ok & (jnp.abs(wo_st[2]) >= K_MIN_COS) & \
        ((wo_st[2] > 0.0) == is_refl_t)
    st_pdf = jnp.where(delta_t, 0.0, _spec_trans_pdf_c(b, wi, wo_st))
    one = jnp.ones_like(u0)
    delta_w = _where3(is_refl_t, (one, one, one), b["trans_albedo"])
    ste = _spec_trans_eval_c(b, wi, wo_st)
    inv_stp = 1.0 / jnp.maximum(st_pdf, 1e-20)
    rough_ok = st_pdf > 0.0
    st_weight = tuple(jnp.where(delta_t, delta_w[i],
                                jnp.where(rough_ok, ste[i] * inv_stp, 0.0))
                      for i in range(3))
    st_lobe = jnp.where(
        is_refl_t,
        jnp.where(delta_t, B.LOBE_DELTA_REFLECTION,
                  B.LOBE_SPECULAR_REFLECTION),
        jnp.where(delta_t, B.LOBE_DELTA_TRANSMISSION,
                  B.LOBE_SPECULAR_TRANSMISSION)).astype(jnp.float32)

    wo = _where3(sel_diff, wo_cos,
                 _where3(sel_difft, wo_dt,
                         _where3(sel_spec, wo_sr, wo_st)))

    d_valid = wi_z_ok & (wo_cos[2] >= K_MIN_COS)
    wfb = _frostbite_weight_c(wi, wo_cos, b["roughness"])
    wd = (1.0 - b["spec_trans"]) * (1.0 - b["diff_trans"]) \
        / jnp.maximum(b["p_diffuse"], 1e-20)
    d_weight = tuple(b["diff_albedo"][i] * wfb * wd for i in range(3))

    dt_valid = wi_z_ok & (-wo_dt[2] >= K_MIN_COS)
    wdt = (1.0 - b["spec_trans"]) * b["diff_trans"] \
        / jnp.maximum(b["p_diffuse_t"], 1e-20)
    dt_weight = tuple(b["trans_albedo"][i] * wdt for i in range(3))

    ws = (1.0 - b["spec_trans"]) / jnp.maximum(b["p_specular"], 1e-20)
    s_weight = tuple(sr_weight[i] * ws for i in range(3))
    wst = b["spec_trans"] / jnp.maximum(b["p_specular_t"], 1e-20)
    t_weight = tuple(st_weight[i] * wst for i in range(3))

    # sel_* are mutually exclusive, so the where-cascade is a disjunction
    valid = (sel_diff & d_valid) | (sel_difft & dt_valid) | \
        (sel_spec & sr_valid) | (sel_spect & st_valid)
    zero3 = (zero, zero, zero)
    weight = _where3(sel_diff, d_weight,
                     _where3(sel_difft, dt_weight,
                             _where3(sel_spec, s_weight,
                                     _where3(sel_spect, t_weight, zero3))))
    pdf = _bsdf_eval_pdf_c(b, wi, wo)
    lobe = jnp.where(sel_diff, float(B.LOBE_DIFFUSE_REFLECTION),
                     jnp.where(sel_difft,
                               float(B.LOBE_DIFFUSE_TRANSMISSION),
                               jnp.where(sel_spec, sr_lobe, st_lobe)))
    lobe_p = jnp.where(sel_diff, b["p_diffuse"],
                       jnp.where(sel_difft, b["p_diffuse_t"],
                                 jnp.where(sel_spec, b["p_specular"],
                                           st_lobe_p
                                           * b["p_specular_t"])))
    is_delta = (lobe.astype(jnp.int32) & B.LOBE_DELTA) != 0
    pdf = jnp.where(is_delta | ~valid, 0.0, pdf)
    weight = tuple(jnp.where(valid, weight[i], 0.0) for i in range(3))
    return dict(wo=wo, pdf=pdf, weight=weight, lobe=lobe, lobe_p=lobe_p,
                valid=valid)


# ---------------------------------------------------------------------------
# local light geometry (lights.sample_local_lights, row pre-fetched)
# ---------------------------------------------------------------------------

def _local_light_sample_c(L, ref, pos, j: int):
    g = lambda name: L.get(ref, name + str(j))
    kind = g("lrow_kind")
    p0 = g("lrow_p0")
    e1 = g("lrow_e1")
    e2 = g("lrow_e2")
    pos_l = g("lrow_pos")
    r_s = g("lrow_radius")
    rad = g("lrow_rad")
    inv_area = g("lrow_inv_area")
    pick_pdf = g("pick_pdf")
    u1, u2, u3 = g("u3l")

    # triangle
    su = jnp.sqrt(u2)
    b1 = 1.0 - su
    b2 = u3 * su
    lp = _add3(p0, _add3(_scale3(e1, b1), _scale3(e2, b2)))
    fn = _safe_normalize3(_cross3(e1, e2))
    to_l = _sub3(lp, pos)
    dist_sq = jnp.maximum(_dot3(to_l, to_l), 1e-12)
    dist = jnp.sqrt(dist_sq)
    dir_t = _scale3(to_l, 1.0 / dist)
    cos_l = -_dot3(fn, dir_t)
    pdf_tri = dist_sq * inv_area / jnp.maximum(cos_l, 1e-12)
    tri_visible = cos_l > 1e-6

    # point / spot
    to_p = _sub3(pos_l, pos)
    dist_p_sq = jnp.maximum(_dot3(to_p, to_p), 1e-12)
    dist_p = jnp.sqrt(dist_p_sq)
    dir_p = _scale3(to_p, 1.0 / dist_p)

    # sphere
    z = 1.0 - 2.0 * u2
    s_ = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = M_2PI * u3
    n_s = (s_ * jnp.cos(phi), s_ * jnp.sin(phi), z)
    lp_s = _add3(pos_l, _scale3(n_s, r_s))
    to_s = _sub3(lp_s, pos)
    dist_s_sq = jnp.maximum(_dot3(to_s, to_s), 1e-12)
    dist_s = jnp.sqrt(dist_s_sq)
    dir_s = _scale3(to_s, 1.0 / dist_s)
    cos_s = -_dot3(n_s, dir_s)
    pdf_sph = dist_s_sq * inv_area / jnp.maximum(cos_s, 1e-12)
    sph_visible = cos_s > 1e-6

    dir_d = _scale3(_safe_normalize3(pos_l), -1.0)

    from ..scene.lights import (LIGHT_DIRECTIONAL, LIGHT_POINT,
                                LIGHT_SPHERE, LIGHT_SPOT, LIGHT_TRIANGLE)
    is_tri = kind == LIGHT_TRIANGLE
    is_sph = kind == LIGHT_SPHERE
    is_spot = kind == LIGHT_SPOT
    is_pt = (kind == LIGHT_POINT) | is_spot
    is_dir = kind == LIGHT_DIRECTIONAL

    direction = _where3(is_tri, dir_t,
                        _where3(is_sph, dir_s,
                                _where3(is_pt, dir_p, dir_d)))
    distance = jnp.where(
        is_tri, dist,
        jnp.where(is_sph, dist_s,
                  jnp.where(is_pt, dist_p, mu.K_MAX_RAY_TRAVEL)))
    pdf = jnp.where(is_tri, pdf_tri * pick_pdf,
                    jnp.where(is_sph, pdf_sph * pick_pdf, pick_pdf))
    axis = g("lrow_axis")
    cos_theta = -_dot3(axis, dir_p)
    soft = g("lrow_soft")
    tshape = jnp.clip((cos_theta - g("lrow_cos_cone"))
                      / jnp.maximum(soft, 1e-6), 0.0, 1.0)
    shape_s = jnp.where(soft > 1e-6, tshape * tshape * (3.0 - 2.0 * tshape),
                        (cos_theta >= g("lrow_cos_cone"))
                        .astype(jnp.float32))
    shape = jnp.where(is_spot, shape_s, 1.0)
    inv_pick = 1.0 / jnp.maximum(pick_pdf, 1e-20)
    inv_pdf = 1.0 / jnp.maximum(pdf, 1e-20)
    li = tuple(jnp.where(
        is_tri | is_sph, rad[i] * inv_pdf,
        jnp.where(is_pt, rad[i] * shape / dist_p_sq * inv_pick,
                  rad[i] * inv_pick)) for i in range(3))
    # kinds are mutually exclusive -> where-cascade as a disjunction
    valid = (is_tri & tri_visible) | (is_sph & sph_visible) | is_pt \
        | is_dir
    return direction, distance, li, pdf, valid, is_pt | is_dir


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _make_kernel(Lin: _Layout, Lout: _Layout, nee_distant: int,
                 nee_local: int, cfg_static: dict):
    """cfg_static: enable_russian_roulette, max_bounces,
    max_diffuse_bounces, local_pdf_k (LOCAL_PDF_ESTIMATE_K or 0),
    fill (stable-planes FILL: emission + split NEE exported for the
    plane routing outside)."""
    fill = cfg_static.get("fill", False)

    def kernel(consts_ref, in_ref, out_ref):
        gi = lambda name: Lin.get(in_ref, name)
        po = lambda name, val: Lout.put(out_ref, name, val)

        firefly_threshold = consts_ref[0]
        atten = consts_ref[1]
        nee_min_rad = consts_ref[2]
        pixel_cone_spread = consts_ref[3]

        shade = gi("shade") != 0.0
        thp = gi("thp")
        radiance = gi("radiance")
        firefly_k0 = gi("firefly_k")

        # ---- emission with MIS (PathTracer.hlsli:456-468)
        em = _scale3(gi("emission"), gi("emissive_mis"))
        em = _firefly_filter3(em, firefly_threshold, firefly_k0)
        em = _scale3(em, atten)
        add = _mul3(thp, em)
        add = tuple(jnp.where(shade, jnp.maximum(add[i], 0.0), 0.0)
                    for i in range(3))
        if fill:
            # FILL: emission on/off the stable branch is routed outside
            po("emission_term", add)
        else:
            radiance = tuple(radiance[i] + add[i] for i in range(3))

        vertex_index = gi("vertex_index")
        diffuse_bounces0 = gi("diffuse_bounces")
        finished = (vertex_index > float(cfg_static["max_bounces"])) | \
            (diffuse_bounces0 > float(cfg_static["max_diffuse_bounces"]))

        # ---- russian roulette (:125-149)
        if cfg_static["enable_russian_roulette"]:
            rr_val = _luminance3(thp)
            prob = _sat(0.8 - rr_val)
            prob = prob * prob
            prob = prob * prob
            rr_kill = gi("u_rr") < prob
            keep = shade & ~rr_kill
            inv1p = 1.0 / (1.0 - prob)
            thp = tuple(jnp.where(keep, thp[i] * inv1p, thp[i])
                        for i in range(3))
        else:
            rr_kill = jnp.zeros_like(shade)

        pre_scatter_thp = thp
        pre_scatter_k = firefly_k0
        will_scatter = shade & ~finished & ~rr_kill

        # ---- BSDF make + sample (GenerateScatterRay)
        n = gi("n")
        t = gi("t")
        bt = gi("b")
        v = gi("v")
        bd = dict(diffuse=gi("bd_diffuse"), specular=gi("bd_specular"),
                  rough=gi("bd_rough"), metallic=gi("bd_metallic"),
                  eta=gi("bd_eta"), trans=gi("bd_trans"),
                  dtrans=gi("bd_dtrans"), strans=gi("bd_strans"))
        thin = gi("thin") != 0.0
        cos_v = _dot3(v, n)
        bb = _make_bsdf_c(bd, cos_v, thin)
        wi = _to_local(v, t, bt, n)
        bs = _bsdf_sample_c(bb, wi, gi("u3"))
        wo_world = _from_local(bs["wo"], t, bt, n)
        lobe_i = bs["lobe"].astype(jnp.int32)
        is_delta = (lobe_i & B.LOBE_DELTA) != 0
        is_transmission = (lobe_i & B.LOBE_TRANSMISSION) != 0
        is_reflection = (lobe_i & B.LOBE_REFLECTION) != 0
        scatter_thp = _mul3(thp, bs["weight"])
        scatter_valid = bs["valid"] & (
            (scatter_thp[0] > 0.0) | (scatter_thp[1] > 0.0)
            | (scatter_thp[2] > 0.0))
        rough_props = jnp.where(bb["alpha"] < B.K_MIN_GGX_ALPHA, 0.0,
                                bb["roughness"])
        is_diffuse_bounce = is_reflection & (
            ((lobe_i & B.LOBE_DIFFUSE_REFLECTION) != 0)
            | (rough_props > float(cfg_static["spec_rough_threshold"])))
        diffuse_bounces = diffuse_bounces0 + jnp.where(
            will_scatter & is_diffuse_bounce, 1.0, 0.0)

        cone_spread0 = gi("cone_spread")
        cone_spread = jnp.where(
            will_scatter & ~is_delta,
            jnp.minimum(cone_spread0
                        + _spread_angle_from_pdf(bs["pdf"], 0.15), M_2PI),
            cone_spread0)
        firefly_k = jnp.where(
            will_scatter,
            _new_firefly_k(firefly_k0, bs["pdf"], bs["lobe_p"]),
            firefly_k0)

        face_n = gi("face_n")
        front = gi("front_facing") != 0.0
        side_refl = front == is_reflection
        fn_r = _where3(side_refl, face_n, _scale3(face_n, -1.0))
        new_origin = _compute_ray_origin(gi("pos"), fn_r)
        origin = _where3(will_scatter, new_origin, gi("origin"))
        direction = _where3(will_scatter, wo_world, gi("direction"))
        thp = _where3(will_scatter, scatter_thp, thp)

        # visibility-ray origin: view side of the surface
        vis_origin = _compute_ray_origin(
            gi("pos"), _where3(front, face_n, _scale3(face_n, -1.0)))

        # ---- NEE (PathTracerNEE.hlsli:155-344)
        emissive_mis = jnp.where(shade, 1.0, gi("emissive_mis"))
        env_mis_pre = jnp.where(shade, 1.0, gi("env_mis"))
        vertex_n = gi("vertex_n")
        shadow_fade = gi("shadow_fade")
        nee_ok = shade & ~finished & ~rr_kill \
            & (gi("nee_skip") == 0.0)           # will_scatter_nee

        def nee_one(ls_dir, ls_dist, ls_li, light_mis_pdf, ls_pdf,
                    ls_valid, sample_weight, idx, ls_delta=None):
            wo_nee = _to_local(ls_dir, t, bt, n)
            fd, fs, scatter_pdf = _bsdf_eval_split_pdf_c(bb, wi, wo_nee)
            mis = _eval_mis(1.0, light_mis_pdf / sample_weight, 1.0,
                            scatter_pdf)
            if ls_delta is not None:
                # delta lights (point/spot/directional) are unreachable
                # by scatter rays -> MIS weight 1 (energy conservation;
                # tests/test_analytic_oracles.py)
                mis = jnp.where(ls_delta, 1.0, mis)
            li = _scale3(ls_li, mis * sample_weight)
            pdf_ff = ls_pdf / sample_weight
            lum = _luminance3(_mul3(_add3(fd, fs), li))
            need = nee_ok & ls_valid & (lum > nee_min_rad)
            nee_k = _new_firefly_k(pre_scatter_k, pdf_ff,
                                   jnp.ones_like(pdf_ff))
            grazing = jnp.where(
                shadow_fade > 0.0,
                _sat((_dot3(ls_dir, vertex_n) - shadow_fade)
                     / (2.0 * shadow_fade)), 1.0)
            dr = _firefly_filter3(_mul3(fd, li), firefly_threshold, nee_k)
            sr = _firefly_filter3(_mul3(fs, li), firefly_threshold, nee_k)

            def finish(sig):
                c = _scale3(sig, grazing)
                c = _mul3(pre_scatter_thp, c)
                c = _scale3(c, atten)
                return tuple(jnp.where(need, jnp.maximum(x, 0.0), 0.0)
                             for x in c)

            po(f"nee_dir{idx}", ls_dir)
            po(f"nee_dist{idx}", ls_dist * (1.0 - 1e-4))
            po(f"nee_need{idx}", need.astype(jnp.float32))
            if fill:
                # StablePlanesHandleNEE keeps diffuse/specular split for
                # the per-plane denoiser channels
                po(f"nee_contrib_d{idx}", finish(dr))
                po(f"nee_contrib_s{idx}", finish(sr))
            else:
                po(f"nee_contrib{idx}", finish(_add3(dr, sr)))

        idx = 0
        for i in range(nee_distant):
            sample_weight = 1.0 / float(nee_distant)
            ls_pdf = gi(f"ls_pdf{i}")
            nee_one(gi(f"ls_dir{i}"), gi(f"ls_dist{i}"), gi(f"ls_li{i}"),
                    ls_pdf, ls_pdf, gi(f"ls_valid{i}") != 0.0,
                    sample_weight, idx)
            idx += 1
        for j in range(nee_local):
            sample_weight = 1.0 / float(nee_local)
            d_l, dist_l, li_l, pdf_l, ok_l, delta_l = \
                _local_light_sample_c(Lin, in_ref, gi("pos"), j)
            lk = jnp.full_like(pdf_l, float(cfg_static["local_pdf_k"]))
            nee_one(d_l, dist_l, li_l, lk, pdf_l, ok_l, sample_weight,
                    idx, ls_delta=delta_l)
            idx += 1

        # scatter-side MIS for the next segment (NEE.hlsli:248-280)
        non_delta_scatter = scatter_valid & ~is_delta
        if nee_local:
            em_w = _eval_mis(1.0, bs["pdf"], float(nee_local),
                             jnp.full_like(bs["pdf"],
                                           float(cfg_static["local_pdf_k"])))
            emissive_mis = jnp.where(shade & non_delta_scatter, em_w,
                                     emissive_mis)

        po("radiance", radiance)
        po("thp", thp)
        po("origin", origin)
        po("direction", direction)
        po("firefly_k", firefly_k)
        po("emissive_mis", emissive_mis)
        po("env_mis_pre", env_mis_pre)
        po("cone_spread", cone_spread)
        po("diffuse_bounces", diffuse_bounces)
        po("lobe", bs["lobe"])
        po("bs_pdf", bs["pdf"])
        po("lobe_p", bs["lobe_p"])
        po("scatter_valid", scatter_valid.astype(jnp.float32))
        po("will_scatter", will_scatter.astype(jnp.float32))
        po("rr_kill", rr_kill.astype(jnp.float32))
        po("non_delta_scatter",
           (shade & non_delta_scatter).astype(jnp.float32))
        po("vis_origin", vis_origin)
        if fill:
            po("pre_scatter_thp", pre_scatter_thp)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("nee_distant", "nee_local", "rr",
                              "max_bounces", "max_diffuse_bounces",
                              "spec_rough_threshold", "local_pdf_k",
                              "fill", "interpret"))
def shade_nee_pallas(planes_in, consts4, *, nee_distant: int,
                     nee_local: int, rr: bool, max_bounces: int,
                     max_diffuse_bounces: int,
                     spec_rough_threshold: float, local_pdf_k: float,
                     fill: bool = False, interpret: bool = False):
    """planes_in: (C_IN, N) f32 per _in_layout; consts4: (4,) f32
    [firefly_threshold, atten, nee_min_radiance, pixel_cone_spread].
    Returns (C_OUT, N) f32 per _out_layout."""
    Lin = _in_layout(nee_distant, nee_local)
    Lout = _out_layout(nee_distant, nee_local, fill)
    c_in, n = planes_in.shape
    assert c_in == Lin.rows, (c_in, Lin.rows)
    n_pad = (max(n, TILE) + TILE - 1) // TILE * TILE
    x = jnp.pad(planes_in, ((0, 0), (0, n_pad - n)))
    cfg_static = dict(enable_russian_roulette=rr, max_bounces=max_bounces,
                      max_diffuse_bounces=max_diffuse_bounces,
                      spec_rough_threshold=spec_rough_threshold,
                      local_pdf_k=local_pdf_k, fill=fill)
    kernel = _make_kernel(Lin, Lout, nee_distant, nee_local, cfg_static)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Lout.rows, n_pad), jnp.float32),
        grid=(n_pad // TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((Lin.rows, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Lout.rows, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(consts4, x)
    return out[:, :n]


def pack_inputs(Lin: _Layout, n: int, values: dict) -> jnp.ndarray:
    """Assemble (C_IN, N) from named (N,)/(N,3) arrays."""
    rows = [None] * Lin.rows
    for name, (r, k) in Lin.map.items():
        v = values[name]
        if k == 1:
            rows[r] = jnp.asarray(v, jnp.float32).reshape(n)
        else:
            v = jnp.asarray(v, jnp.float32)
            for i in range(k):
                rows[r + i] = v[..., i].reshape(n)
    return jnp.stack(rows, axis=0)


def in_layout(nee_distant: int, nee_local: int) -> _Layout:
    return _in_layout(nee_distant, nee_local)


def out_layout(nee_distant: int, nee_local: int,
               fill: bool = False) -> _Layout:
    return _out_layout(nee_distant, nee_local, fill)


def unpack_out(Lout: _Layout, planes: jnp.ndarray) -> dict:
    out = {}
    for name, (r, k) in Lout.map.items():
        if k == 1:
            out[name] = planes[r]
        else:
            out[name] = jnp.stack([planes[r + i] for i in range(k)],
                                  axis=-1)
    return out
