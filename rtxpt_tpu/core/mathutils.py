"""Vector math / sampling helpers for the path tracer.

TPU-native equivalents of the reference's math layer:
  - donut/include/donut/core/math/* (host math)
  - RTXPT/PathTracer/Utils/Math/MathHelpers.hlsli (device sampling helpers)
  - RTXPT/PathTracer/Utils.hlsli (luminance, octahedral encoding)
  - RTXPT/PathTracer/PathTracerHelpers.hlsli (ray-origin offsetting, MIS
    heuristics, ray-cone spread heuristics)

All functions are pure jnp, operate on float32 arrays with a trailing
3-component axis for vectors, and broadcast over arbitrary leading batch
dimensions so they vectorize over path wavefronts.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

F32 = jnp.float32

M_PI = 3.14159265358979323846
M_2PI = 2.0 * M_PI
M_1_PI = 1.0 / M_PI
M_PI_2 = M_PI / 2.0
M_PI_4 = M_PI / 4.0
FLT_MAX = 3.402823466e38
# Maximum ray travel distance (reference: PathTracerTypes.hlsli kMaxRayTravel).
K_MAX_RAY_TRAVEL = 1e15


def dot(a, b, keepdims: bool = True):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def length(v, keepdims: bool = True):
    return jnp.sqrt(jnp.maximum(dot(v, v, keepdims), 0.0))


def normalize(v, eps: float = 0.0):
    return v / jnp.maximum(length(v), eps if eps > 0 else jnp.finfo(F32).tiny)


def safe_normalize(v, fallback=None):
    l = length(v)
    n = v / jnp.maximum(l, 1e-20)
    if fallback is None:
        fallback = jnp.zeros_like(v)
    return jnp.where(l > 1e-20, n, fallback)


def cross(a, b):
    return jnp.cross(a, b)


def lerp(a, b, t):
    return a + (b - a) * t


def saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def luminance(rgb):
    """Relative luminance, ITU-R BT.709 (reference: Utils.hlsli:25)."""
    w = jnp.asarray([0.2126, 0.7152, 0.0722], dtype=rgb.dtype)
    return jnp.sum(rgb * w, axis=-1)


def luminance_clamp(rgb, threshold):
    """Clamp rgb by luminance (reference: Utils.hlsli LuminanceClamp)."""
    lum = luminance(rgb)[..., None]
    scaled = rgb / jnp.maximum(lum, 1e-30) * threshold
    return jnp.where(lum > threshold, scaled, rgb)


def reflect(i, n):
    """HLSL-style reflect: i - 2*dot(i,n)*n (i points toward surface)."""
    return i - 2.0 * dot(i, n) * n


# ---------------------------------------------------------------------------
# Coordinate frames
# ---------------------------------------------------------------------------

def perp_stark(u):
    """A vector perpendicular to u (Stark 2009), branch-free jnp version
    (reference: MathHelpers.hlsli perp_stark)."""
    a = jnp.abs(u)
    xm = ((a[..., 0] - a[..., 1]) < 0) & ((a[..., 0] - a[..., 2]) < 0)
    ym = ((a[..., 1] - a[..., 2]) < 0) & (~xm)
    zm = ~(xm | ym)
    sel = jnp.stack([xm, ym, zm], axis=-1)
    return jnp.cross(u, sel.astype(u.dtype))


def onb_from_normal(n):
    """Build an orthonormal basis (t, b, n) around unit normal n.

    Branchless Frisvad/Duff et al. construction; stable for all n.
    Returns (tangent, bitangent)."""
    s = jnp.where(n[..., 2:3] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2:3])
    bv = n[..., 0:1] * n[..., 1:2] * a
    t = jnp.concatenate(
        [1.0 + s * n[..., 0:1] * n[..., 0:1] * a, s * bv, -s * n[..., 0:1]], axis=-1)
    b = jnp.concatenate(
        [bv, s + n[..., 1:2] * n[..., 1:2] * a, -n[..., 1:2]], axis=-1)
    return t, b


def to_local(v, t, b, n):
    """World -> tangent space; returns vector with z along n."""
    return jnp.stack(
        [dot(v, t, False), dot(v, b, False), dot(v, n, False)], axis=-1)


def from_local(v, t, b, n):
    """Tangent -> world space."""
    return v[..., 0:1] * t + v[..., 1:2] * b + v[..., 2:3] * n


# ---------------------------------------------------------------------------
# Sampling (reference: MathHelpers.hlsli)
# ---------------------------------------------------------------------------

def sample_disk_concentric(u):
    """Shirley's concentric disk mapping (MathHelpers.hlsli:288)."""
    u = 2.0 * u - 1.0
    ux, uy = u[..., 0], u[..., 1]
    ax, ay = jnp.abs(ux), jnp.abs(uy)
    use_x = ax > ay
    r = jnp.where(use_x, ux, uy)
    # guard div-by-zero; the (0,0) case is masked out below
    phi = jnp.where(
        use_x,
        (uy / jnp.where(ux == 0, 1.0, ux)) * M_PI_4,
        M_PI_2 - (ux / jnp.where(uy == 0, 1.0, uy)) * M_PI_4,
    )
    d = r[..., None] * jnp.stack([jnp.cos(phi), jnp.sin(phi)], axis=-1)
    zero = (ux == 0.0) & (uy == 0.0)
    return jnp.where(zero[..., None], u, d)


def sample_cosine_hemisphere_concentric(u):
    """Cosine-weighted hemisphere sample; returns (dir, pdf)
    (MathHelpers.hlsli:311)."""
    d = sample_disk_concentric(u)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - jnp.sum(d * d, axis=-1)))
    pdf = z * M_1_PI
    return jnp.concatenate([d, z[..., None]], axis=-1), pdf


def sample_sphere_uniform(u):
    """Uniform sphere sample (Utils.hlsli:80); pdf = 1/(4 pi)."""
    z = 1.0 - 2.0 * u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = M_2PI * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def sample_triangle_uniform(u):
    """Uniform barycentrics via sqrt parameterization; returns (b0,b1,b2)."""
    su = jnp.sqrt(u[..., 0])
    b1 = 1.0 - su
    b2 = u[..., 1] * su
    return jnp.stack([1.0 - b1 - b2, b1, b2], axis=-1)


# ---------------------------------------------------------------------------
# Octahedral normal encoding (reference: Utils.hlsli:56-77)
# ---------------------------------------------------------------------------

def oct_wrap(v):
    return (1.0 - jnp.abs(v[..., ::-1])) * jnp.where(v >= 0.0, 1.0, -1.0)


def encode_oct(n):
    n = n / (jnp.abs(n[..., 0:1]) + jnp.abs(n[..., 1:2]) + jnp.abs(n[..., 2:3]))
    xy = jnp.where(n[..., 2:3] >= 0.0, n[..., :2], oct_wrap(n[..., :2]))
    return xy * 0.5 + 0.5


def decode_oct(f):
    f = f * 2.0 - 1.0
    z = 1.0 - jnp.abs(f[..., 0:1]) - jnp.abs(f[..., 1:2])
    t = saturate(-z)
    xy = f + jnp.where(f >= 0.0, -t, t)
    return normalize(jnp.concatenate([xy, z], axis=-1))


# ---------------------------------------------------------------------------
# Robust ray-origin offsetting (PathTracerHelpers.hlsli:22-42;
# Ray Tracing Gems ch.6, Waechter & Binder)
# ---------------------------------------------------------------------------

def compute_ray_origin(pos, face_normal):
    """Offset ray origin along face normal to avoid self-intersection.

    Bit-exact port of the RTG6 scheme: integer offset of the fp32 bit pattern
    away from the surface, with a small float fallback near the origin."""
    origin = 1.0 / 16.0
    f_scale = 3.0 / 65536.0
    i_scale = 3.0 * 256.0

    i_off = (face_normal * i_scale).astype(jnp.int32)
    pos_bits = pos.view(jnp.int32) if hasattr(pos, "view") else pos
    pos_bits = jax.lax.bitcast_convert_type(pos, jnp.int32)
    shifted = pos_bits + jnp.where(pos < 0.0, -i_off, i_off)
    i_pos = jax.lax.bitcast_convert_type(shifted, F32)
    f_off = face_normal * f_scale
    return jnp.where(jnp.abs(pos) < origin, pos + f_off, i_pos)


def compute_ray_origin_dir(pos, face_normal, ray_dir):
    """compute_ray_origin with the normal flipped toward ray_dir
    (PathTracerHelpers.hlsli:38)."""
    fn = jnp.where(dot(face_normal, ray_dir) >= 0.0, face_normal, -face_normal)
    return compute_ray_origin(pos, fn)


# ---------------------------------------------------------------------------
# MIS heuristics (PathTracerNEE.hlsli:33-62, PathTracerHelpers.hlsli:55-66)
# ---------------------------------------------------------------------------

MIS_BALANCE = 0
MIS_POWER_TWO = 1


def eval_mis(n0, p0, n1, p1, heuristic: int = MIS_BALANCE):
    """MIS weight for strategy 0 of two; saturated to [0,1]."""
    if heuristic == MIS_BALANCE:
        q0 = n0 * p0
        q1 = n1 * p1
    else:
        q0 = (n0 * p0) ** 2
        q1 = (n1 * p1) ** 2
    return saturate(q0 / jnp.maximum(q0 + q1, 1e-30))


# ---------------------------------------------------------------------------
# Ray-cone / firefly heuristics (PathTracerHelpers.hlsli:155-216)
# ---------------------------------------------------------------------------

def roughness_to_spread_angle(roughness, diffuse_to_angle_factor=0.6):
    ggx_alpha = roughness * roughness
    s = jnp.minimum(ggx_alpha * ggx_alpha, 0.99)
    sigma2 = (s / (1.0 - s)) * 0.5
    return diffuse_to_angle_factor * jnp.sqrt(sigma2)


def acos_approx(x):
    """Polynomial arccos (Abramowitz-Stegun 4.4.45, |err| <= 6.8e-5 rad).

    Used by the cone-spread / firefly heuristics instead of true arccos
    so the XLA path and the Pallas shade megakernel (which has no acos
    lowering on TPU Mosaic) compute IDENTICAL values; the heuristics are
    clamp/widening factors, far less precise than 7e-5 rad themselves."""
    ax = jnp.abs(x)
    p = 1.5707288 + ax * (-0.2121144 + ax * (0.0742610
                                             + ax * -0.0187293))
    r = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * p
    return jnp.where(x >= 0.0, r, M_PI - r)


def spread_angle_from_scatter_pdf(scatter_pdf, growth_factor=0.15):
    """Cone spread expansion from a scatter pdf, uniform-cap heuristic
    (PathTracerHelpers.hlsli:189)."""
    safe = jnp.maximum(scatter_pdf, 1e-30)
    return growth_factor * 2.0 * acos_approx(
        jnp.clip(1.0 - (1.0 / safe) / M_2PI, -1.0, 1.0))


def new_scatter_firefly_filter_k(current_k, pixel_cone_spread_angle,
                                 bounce_pdf, lobe_p):
    """(PathTracerHelpers.hlsli:195-203)"""
    min_k = 0.0001
    angle = jnp.where(bounce_pdf == 0.0, 0.0,
                      spread_angle_from_scatter_pdf(bounce_pdf, 1.0))
    k = 32.0
    p = k / (k + angle * angle)
    p = p * jnp.sqrt(jnp.maximum(lobe_p, 0.0))
    return jnp.maximum(min_k, current_k * p)


def firefly_filter(signal, threshold, firefly_filter_k):
    """Biased luminance cap (PathTracerHelpers.hlsli:206-216).
    threshold <= 0 disables."""
    t = threshold * firefly_filter_k
    lum = luminance(signal)
    scaled = signal / jnp.maximum(lum, 1e-30)[..., None] * t[..., None]
    out = jnp.where((lum > t)[..., None], scaled, signal)
    return jnp.where(jnp.asarray(threshold > 0.0), out, signal)


def compute_low_grazing_angle_falloff(light_dir, vertex_n, falloff_from,
                                      falloff_range):
    """(PathTracerHelpers.hlsli:48-52)"""
    return saturate((dot(light_dir, vertex_n, False) - falloff_from)
                    / falloff_range)


def _spread_bits16(x):
    """Spread the low 16 bits of x so bit i lands at bit 2i."""
    x = x & jnp.uint32(0xFFFF)
    x = (x | (x << 8)) & jnp.uint32(0x00FF00FF)
    x = (x | (x << 4)) & jnp.uint32(0x0F0F0F0F)
    x = (x | (x << 2)) & jnp.uint32(0x33333333)
    x = (x | (x << 1)) & jnp.uint32(0x55555555)
    return x


def morton2d(px, py):
    """Z-order key from 16-bit pixel coords. Used to order wavefront
    lanes so each traversal tile holds spatially coherent rays (the
    scheduling half of the reference's SER, Sample.hlsl:122-131)."""
    return _spread_bits16(px.astype(jnp.uint32)) | (
        _spread_bits16(py.astype(jnp.uint32)) << 1)


def _spread_bits10(x):
    """Spread the low 10 bits of x so bit i lands at bit 3i."""
    x = x & jnp.uint32(0x3FF)
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def morton3d(qx, qy, qz):
    """Z-order key from 10-bit quantized 3D coords (30-bit key). Used to
    order SECONDARY wavefront lanes by scatter-ray origin cell so each
    traversal tile's cluster worklist (the union over its rays) stays
    small — the spatial half of the raystream re-sort."""
    return (_spread_bits10(qx.astype(jnp.uint32))
            | (_spread_bits10(qy.astype(jnp.uint32)) << 1)
            | (_spread_bits10(qz.astype(jnp.uint32)) << 2))
