"""Packed row-matrix state for ReSTIR neighbor gathers.

On the chip, K separate single-column gathers over (N,) arrays lower to
K serial dynamic-slice loops (~30x slower than one (N,K) multi-column
row gather; round-3 device trace — the same finding that produced
RISTiles.pack and the env alias-row fetches). Every cross-pixel access
in the ReSTIR stages (temporal reprojection, spatial taps, pairwise-MIS
neighbor surfaces) therefore goes through ONE row gather of a packed
f32 matrix built elementwise from the stage inputs. Before this, the
pairwise spatial stage tree-gathered the ENTIRE GBuffer pytree
(~40 arrays incl. the full SurfaceData) per tap — measured 116.9 ms
of the 317 ms ReSTIR share at 640x360 (tools/profile_restir.py).

  surface pack  (N,16): pos xyz | normal xyz | v xyz | view_z |
                        alpha | lum_diff | lum_spec | trans_amt |
                        lum_trans | valid
  DI reservoir  (N, 8): light | uv.x uv.y | w_sum | m | target | 0
  GI reservoir  (N,14): pos xyz | normal xyz | radiance xyz |
                        w_sum | m | target | valid | 0

The cheap resampling target evaluated from the surface pack is the same
Lambert + GGX-D + transmission-floor family as the reference's cheap
surface-BRDF target (RTXDI RAB_GetLightSampleTargetPdfForSurface;
neighbor surface reads in RTXPT/RTXDI/SpatialResampling.hlsl), computed
in world space: h_local.z == dot(normalize(v + wo), n) for any
orthonormal frame, so the packed evaluation matches the local-frame one
up to float rounding. RIS/MIS stay unbiased for ANY nonnegative target
used consistently; all stages share this one implementation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import mathutils as mu
from ..scene import envmap as EM
from ..scene import lights as LI
from .reservoir import LIGHT_ENV, LIGHT_INVALID, Reservoir

# surface pack column indices
S_POS = slice(0, 3)
S_NRM = slice(3, 6)
S_V = slice(6, 9)
S_Z = 9
S_ALPHA = 10
S_LDIFF = 11
S_LSPEC = 12
S_TRANS = 13
S_LTRANS = 14
S_VALID = 15


def pack_surface(gb) -> jnp.ndarray:
    """(N,16) resampling-surface rows from a GBuffer (pure elementwise;
    XLA CSEs the construction across stages sharing a jit)."""
    from ..pt import shading
    sd = gb.surface.sd
    b = shading.make_wavefront_bsdf(gb.surface)
    trans_amt = jnp.maximum(b.diff_trans, b.spec_trans)
    cols = [sd.pos, sd.n, sd.v,
            gb.view_z[..., None],
            b.alpha[..., None],
            mu.luminance(b.diff_albedo)[..., None],
            mu.luminance(b.spec_albedo)[..., None],
            trans_amt[..., None],
            mu.luminance(b.trans_albedo)[..., None],
            gb.valid.astype(jnp.float32)[..., None]]
    return jnp.concatenate(cols, axis=-1)


def light_radiance_at(assets, pos, light, uv):
    """Li, direction, distance of a reservoir-encoded light sample seen
    from world position `pos` (PolymorphicLight calcSample
    re-evaluation)."""
    lt = assets.lights
    is_env = light == LIGHT_ENV
    if lt is not None:
        li_idx = jnp.maximum(light, 0)
        dir_local, dist_local, li_v, _, l_ok = LI.eval_sample_at(
            lt, assets.scene.positions, assets.scene.indices, li_idx, uv,
            pos)
        li_v = jnp.where(l_ok[..., None], li_v, 0.0)
    else:
        n = light.shape[0]
        dir_local = jnp.zeros((n, 3))
        dist_local = jnp.zeros((n,))
        li_v = jnp.zeros((n, 3))
    dir_env = mu.decode_oct(uv)
    li_env = EM.eval_dir(assets.env, dir_env)
    direction = jnp.where(is_env[..., None], dir_env, dir_local)
    distance = jnp.where(is_env, mu.K_MAX_RAY_TRAVEL, dist_local)
    li = jnp.where(is_env[..., None], li_env, li_v)
    return li, direction, distance


def surface_target_cheap(assets, sp, light, uv):
    """Cheap DI resampling target p_hat at packed surface rows `sp`
    ((N,16), possibly gathered neighbor rows). World-space evaluation of
    di.eval_target_cheap's Lambert + GGX-D + transmission-floor target."""
    pos = sp[..., S_POS]
    n = sp[..., S_NRM]
    v = sp[..., S_V]
    valid = sp[..., S_VALID] > 0.5
    li, direction, _ = light_radiance_at(assets, pos, light, uv)
    wo_z = jnp.sum(direction * n, -1)
    h = mu.safe_normalize(v + direction)
    ndoth = jnp.clip(jnp.sum(h * n, -1), 0.0, 1.0)
    a2 = jnp.maximum(sp[..., S_ALPHA], 0.04) ** 2
    d_ggx = a2 / (jnp.pi * jnp.square(ndoth * ndoth * (a2 - 1.0) + 1.0))
    trans_amt = sp[..., S_TRANS]
    f_r = ((1.0 - trans_amt) * sp[..., S_LDIFF] / jnp.pi
           + sp[..., S_LSPEC] * d_ggx * 0.25) * jnp.maximum(wo_z, 0.0)
    f_t = trans_amt * jnp.maximum(sp[..., S_LTRANS], 0.25) \
        * jnp.maximum(-wo_z, 0.0) / jnp.pi
    p_hat = mu.luminance(li) * (f_r + f_t)
    return jnp.where(valid & (light != LIGHT_INVALID), p_hat, 0.0)


def gi_target_cheap(sp, pos, normal, radiance, valid):
    """Cheap GI resampling target at packed surface rows (world-space
    twin of gi.eval_target_cheap; `normal` is the sample's normal, used
    only by callers for the Jacobian — kept in the signature for parity)."""
    del normal
    spos = sp[..., S_POS]
    n = sp[..., S_NRM]
    v = sp[..., S_V]
    ok = (sp[..., S_VALID] > 0.5) & valid
    to_s = pos - spos
    dist_sq = jnp.maximum(jnp.sum(to_s * to_s, -1), 1e-9)
    direction = to_s / jnp.sqrt(dist_sq)[..., None]
    wo_z = jnp.sum(direction * n, -1)
    h = mu.safe_normalize(v + direction)
    ndoth = jnp.clip(jnp.sum(h * n, -1), 0.0, 1.0)
    a2 = jnp.maximum(sp[..., S_ALPHA], 0.04) ** 2
    d_ggx = a2 / (jnp.pi * jnp.square(ndoth * ndoth * (a2 - 1.0) + 1.0))
    trans_amt = sp[..., S_TRANS]
    f_r = ((1.0 - trans_amt) * sp[..., S_LDIFF] / jnp.pi
           + sp[..., S_LSPEC] * d_ggx * 0.25) * jnp.maximum(wo_z, 0.0)
    f_t = trans_amt * jnp.maximum(sp[..., S_LTRANS], 0.25) \
        * jnp.maximum(-wo_z, 0.0) / jnp.pi
    p_hat = mu.luminance(radiance) * (f_r + f_t)
    return jnp.where(ok, p_hat, 0.0)


# ---------------------------------------------------------------------------
# reservoir packing
# ---------------------------------------------------------------------------

def pack_reservoir(r: Reservoir) -> jnp.ndarray:
    """(N,8): light | uv | w_sum | m | target | pad. The int32 light
    index rides losslessly as raw bits in an f32 lane (bitcast, not a
    value cast — exact for ALL indices, not just < 2^24; LIGHT_ENV/-2
    and LIGHT_INVALID/-1 included). Every consumer moves these rows by
    copy (gather / concat / ppermute), never by arithmetic, so the bit
    pattern survives (restir/di.py trows gathers)."""
    n = r.light.shape[0]
    return jnp.concatenate([
        jax.lax.bitcast_convert_type(r.light, jnp.float32)[..., None],
        r.uv,
        r.w_sum[..., None], r.m[..., None], r.target[..., None],
        jnp.zeros((n, 2), jnp.float32)], axis=-1)


def unpack_reservoir(rows) -> Reservoir:
    return Reservoir(
        light=jax.lax.bitcast_convert_type(rows[..., 0], jnp.int32),
        uv=rows[..., 1:3], w_sum=rows[..., 3],
        m=rows[..., 4], target=rows[..., 5])


def pack_gi_reservoir(r) -> jnp.ndarray:
    """(N,14): pos | normal | radiance | w_sum | m | target | valid | pad."""
    n = r.w_sum.shape[0]
    return jnp.concatenate([
        r.pos, r.normal, r.radiance, r.w_sum[..., None], r.m[..., None],
        r.target[..., None], r.valid.astype(jnp.float32)[..., None],
        jnp.zeros((n, 1), jnp.float32)], axis=-1)


def unpack_gi_reservoir(rows):
    from .gi import GIReservoir
    return GIReservoir(pos=rows[..., 0:3], normal=rows[..., 3:6],
                       radiance=rows[..., 6:9], w_sum=rows[..., 9],
                       m=rows[..., 10], target=rows[..., 11],
                       valid=rows[..., 12] > 0.5)
