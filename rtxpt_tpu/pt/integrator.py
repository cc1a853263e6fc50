"""Wavefront path tracer: the RayGen megakernel restructured for TPU.

TPU-native re-architecture of the reference's device-side render loop:
  - RTXPT/Sample.hlsl:245-330 (RayGen `while(path.isActive()) nextHit(...)`)
  - RTXPT/PathTracer/PathTracer.hlsli (EmptyPathInitialize, HandleHit,
    HandleMiss, GenerateScatterRay, HandleRussianRoulette)
  - RTXPT/PathTracer/PathTracerNEE.hlsli (HandleNEE + MIS)
  - RTXPT/PathTracer/PathTracerNestedDielectrics.hlsli
  - RTXPT/PathTracer/Rendering/Volumes/HomogeneousVolumeSampler.hlsli

Architecture: one `lax.while_loop` over path segments; each iteration is a
fixed pipeline (trace -> shade -> NEE -> scatter) over the whole wavefront
with masked lanes instead of the reference's per-thread divergent loop +
SER reordering (SURVEY.md section 2.7). Path state is an SoA pytree; the
96-byte packed payload constraint disappears because state lives in HBM.

RNG streams are seeded exactly like the reference (pixel, vertexIndex,
sampleBaseIndex + subSampleIndex; effect seeds from Sampling.hlsli), so
sample sequences are reproducible and decorrelated per effect.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (MODE_REFERENCE, NEE_DISTANT_MIP_DESCENT,
                      NEE_DISTANT_PRESAMPLED, NEE_DISTANT_UNIFORM, PTConfig,
                      PTConstants)
from ..config import MODE_FILL_STABLE_PLANES as C_MODE_FILL
from ..core import mathutils as mu
from ..core import rng
from ..ops import traverse
from ..ops.bvh import BVH2
from ..ops.intersect import TriSoup
from ..scene import envmap as EM
from ..scene import lights as LI
from ..scene.camera import CameraData, compute_rays
from ..scene.types import SceneArrays
from . import bsdf as B
from . import nested
from . import shading
from . import stableplanes as SP

K_MAX_REJECTED_HITS = 16       # PathTracer.hlsli:31
K_SPECULAR_ROUGHNESS_THRESHOLD = 0.25  # PathTracer.hlsli:29
LOCAL_PDF_ESTIMATE_K = 1.0     # PathTracerNEE.hlsli:197 (half-MIS constant)


class RenderAssets(NamedTuple):
    scene: SceneArrays
    bvh: BVH2
    soup: TriSoup
    env: EM.EnvMap
    lights: Optional[LI.LightTable]
    env_presampled: Optional[EM.PresampledEnv] = None
    regir: Optional[object] = None  # restir.regir.ReGIRGrid
    dense: Optional[object] = None  # ops.mt_dense.DenseMT (small scenes)


class PathState(NamedTuple):
    """PathState SoA (PathState.hlsli:82-222); unpacked fields in HBM.

    The sp_* block is the FILL-mode stable-planes bookkeeping
    (PathTracerStablePlanes.hlsli FILL: branch tracking, per-plane
    denoiser radiance routing); None outside MODE_FILL_STABLE_PLANES."""
    origin: jnp.ndarray          # (N,3)
    direction: jnp.ndarray       # (N,3)
    thp: jnp.ndarray             # (N,3)
    radiance: jnp.ndarray        # (N,3) path.L
    active: jnp.ndarray          # (N,) bool
    vertex_index: jnp.ndarray    # (N,) i32
    diffuse_bounces: jnp.ndarray  # (N,) i32 (PackedCounters)
    rejected_hits: jnp.ndarray   # (N,) i32
    scene_length: jnp.ndarray    # (N,)
    firefly_k: jnp.ndarray       # (N,)
    cone_width: jnp.ndarray      # (N,)
    cone_spread: jnp.ndarray     # (N,)
    interior: jnp.ndarray        # (N,2) u32 nested-dielectric stack
    emissive_mis: jnp.ndarray    # (N,)
    env_mis: jnp.ndarray         # (N,)
    px: jnp.ndarray              # (N,) u32
    py: jnp.ndarray              # (N,) u32
    # ---- stable-planes FILL state (None unless FILL mode) -------------
    sp_branch: jnp.ndarray = None       # (N,) u32 stableBranchID
    sp_plane: jnp.ndarray = None        # (N,) i32 current plane index
    sp_on_plane: jnp.ndarray = None     # (N,) bool
    sp_on_branch: jnp.ndarray = None    # (N,) bool
    sp_on_dominant: jnp.ndarray = None  # (N,) bool
    sp_base_diff: jnp.ndarray = None    # (N,) bool base scatter was diffuse
    sp_base_delta: jnp.ndarray = None   # (N,) bool base scatter was delta
    sp_gi_l: jnp.ndarray = None         # (N,3) secondary L for ReSTIR GI
    sp_gi_pdf: jnp.ndarray = None       # (N,) base scatter pdf (GI init)
    sp_gi_valid: jnp.ndarray = None     # (N,) bool GI-eligible base
    sp_gi_thp: jnp.ndarray = None       # (N,3) throughput after base
    #   scatter; gi_l / sp_gi_thp = unbiased Lo(secondary->base)
    sp_delta_only: jnp.ndarray = None   # (N,) bool delta-only since plane
    sp_bounces: jnp.ndarray = None      # (N,) i32 bounces from plane
    sp_hit_t: jnp.ndarray = None        # (N,) accumulated sample hitT
    sp_pend_diff: jnp.ndarray = None    # (N,4) pending diff radiance+hitT
    sp_pend_spec: jnp.ndarray = None    # (N,4)
    sp_secondary_l: jnp.ndarray = None  # (N,3)
    sp_committed_diff: jnp.ndarray = None  # (N,P,4) per-plane channels
    sp_committed_spec: jnp.ndarray = None  # (N,P,4)
    sp_plane_branch: jnp.ndarray = None    # (N,P) u32 plane branch IDs
    sp_dominant: jnp.ndarray = None        # (N,) i32 dominant plane


def init_paths(cam: CameraData, px, py, cfg: PTConfig,
               consts: PTConstants, sub_sample_index) -> PathState:
    """EmptyPathInitialize + SetupPathPrimaryRay (PathTracer.hlsli:43-96)."""
    n = px.shape[0]
    g = rng.make(px, py, jnp.uint32(0),
                 consts.sample_base_index + jnp.uint32(sub_sample_index))
    g, u2 = rng.next_2d(g)
    origin, direction = compute_rays(cam, px, py, u2)
    f1 = lambda v: jnp.full((n,), v, jnp.float32)
    return PathState(
        origin=origin, direction=direction,
        thp=jnp.ones((n, 3), jnp.float32),
        radiance=jnp.zeros((n, 3), jnp.float32),
        active=jnp.ones((n,), bool),
        vertex_index=jnp.zeros((n,), jnp.int32),
        diffuse_bounces=jnp.zeros((n,), jnp.int32),
        rejected_hits=jnp.zeros((n,), jnp.int32),
        scene_length=f1(0.0),
        firefly_k=f1(1.0),
        cone_width=f1(0.0),
        cone_spread=jnp.broadcast_to(cam.pixel_cone_spread_angle, (n,)),
        interior=nested.empty(n),
        emissive_mis=f1(1.0 if cfg.use_emissive_lights else 0.0),
        env_mis=f1(1.0 if cfg.use_env_lights else 0.0),
        px=px, py=py)


def _sample_distant(assets: RenderAssets, cfg: PTConfig, g):
    """GenerateEnvMapSample (PathTracerNEE.hlsli:70-108)."""
    if cfg.nee_distant_type == NEE_DISTANT_UNIFORM:
        g, u2 = rng.next_2d(g, allow_ld=False)
        d, pdf, le = EM.sample_uniform(assets.env, u2)
    elif cfg.nee_distant_type == NEE_DISTANT_MIP_DESCENT:
        g, u2 = rng.next_2d(g, allow_ld=False)
        d, pdf, le = EM.sample_importance(assets.env, u2)
    else:  # presampled
        g, u1 = rng.next_1d(g, allow_ld=False)
        if assets.env_presampled is None:
            d, pdf, le = EM.sample_importance(
                assets.env, jnp.stack([u1, u1], -1))
        else:
            d, pdf, le = EM.sample_presampled(assets.env,
                                              assets.env_presampled, u1)
    li = jnp.where((pdf > 0.0)[..., None], le / jnp.maximum(
        pdf, 1e-20)[..., None], 0.0)
    return g, LI.LightSample(direction=d,
                             distance=jnp.full(pdf.shape,
                                               mu.K_MAX_RAY_TRAVEL),
                             li=li, pdf=pdf,
                             valid=jnp.any(li > 0.0, axis=-1),
                             delta=jnp.zeros(pdf.shape, bool))


def _distant_pdf(assets: RenderAssets, cfg: PTConfig, d):
    if cfg.nee_distant_type == NEE_DISTANT_UNIFORM:
        return EM.pdf_uniform(assets.env, d)
    return EM.pdf_mip_descent(assets.env, d)


def _shade_kernel_on() -> bool:
    """The fused shade+NEE megakernel runs on real TPU backends;
    RTXPT_SHADE_KERNEL_INTERPRET=1 forces the interpret-mode path on CPU
    (the equivalence tests); RTXPT_SHADE_KERNEL=0 opts out."""
    import os
    if os.environ.get("RTXPT_SHADE_KERNEL", "1") == "0":
        return False
    if os.environ.get("RTXPT_SHADE_KERNEL_INTERPRET", "0") == "1":
        return True
    return traverse._use_pallas()


def _shade_kernel_interpret() -> bool:
    import os
    return os.environ.get("RTXPT_SHADE_KERNEL_INTERPRET", "0") == "1"


def _kernel_shade_step(assets, cfg, consts, cam, path, surf, shade, thp,
                       radiance, origin, interior, vertex_index, s_arr,
                       rays, nee_distant: int, nee_local: int, sample_gen,
                       fill_ctx=None):
    """One fused shade+NEE bounce step via pt/shade_kernel.py.

    Draws the RNG streams in EXACTLY the XLA path's order, fetches the
    local light rows (pick_light + fetch_rows) and the distant env
    samples outside, runs the megakernel, then applies the parts that
    must stay outside: the batched NEE visibility trace, the env-pdf
    scatter MIS (luminance-pyramid gathers) and the nested-dielectric
    stack update. Returns a dict of the variables the XLA block
    produces.

    fill_ctx: None for plain wavefronts; for FILL-mode wavefronts a dict
    {hit_t, sp_secondary_l, sp_hit_t} — the kernel then exports the
    emission term and diffuse/specular-split NEE so the stable-plane
    routing (StablePlanesHandleNEE) happens here."""
    from . import shade_kernel as SK
    sd = surf.sd
    nb = shade.shape[0]
    fill = fill_ctx is not None

    # ---- RNG draws, XLA order (sample_gen -> RR -> scatter -> NEE)
    g = sample_gen(path._replace(vertex_index=vertex_index), s_arr)
    if cfg.enable_russian_roulette:
        g = rng.start_effect(g, rng.EFFECT_RUSSIAN_ROULETTE, False)
        g, u_rr = rng.next_1d(g, allow_ld=False)
    else:
        u_rr = jnp.ones((nb,), jnp.float32)
    g = rng.start_effect(
        g, rng.EFFECT_SCATTER_BSDF,
        path.diffuse_bounces < rng.DISABLE_LD_AFTER_DIFFUSE_BOUNCES)
    g, u3 = rng.next_3d(g)

    vals = dict(
        pos=sd.pos, n=sd.n, t=sd.t, b=sd.b, face_n=sd.face_n,
        vertex_n=sd.vertex_n, v=sd.v, emission=surf.emission,
        front_facing=sd.front_facing, thin=sd.thin_surface,
        shadow_fade=sd.shadow_nol_fadeout,
        bd_diffuse=surf.bsdf_data.diffuse,
        bd_specular=surf.bsdf_data.specular,
        bd_rough=surf.bsdf_data.roughness,
        bd_metallic=surf.bsdf_data.metallic,
        bd_eta=surf.bsdf_data.eta,
        bd_trans=surf.bsdf_data.transmission,
        bd_dtrans=surf.bsdf_data.diffuse_transmission,
        bd_strans=surf.bsdf_data.specular_transmission,
        thp=thp, radiance=radiance, origin=origin,
        direction=path.direction, firefly_k=path.firefly_k,
        emissive_mis=path.emissive_mis, env_mis=path.env_mis,
        cone_spread=path.cone_spread,
        diffuse_bounces=path.diffuse_bounces, vertex_index=vertex_index,
        shade=shade, u_rr=u_rr, u3=u3,
        # FILL: the dominant plane's base NEE is replaced by ReSTIR DI
        # (restir_covered) — its rays would be traced then discarded
        nee_skip=(path.sp_on_plane & path.sp_on_dominant
                  if fill and cfg.use_restir_di
                  else jnp.zeros((nb,), bool)))

    if nee_distant + nee_local > 0:
        g = rng.start_effect(g, rng.EFFECT_NEE, False)
    for si in range(nee_distant + nee_local):
        if si < nee_distant:
            g, ls = _sample_distant(assets, cfg, g)
            vals.update({f"ls_dir{si}": ls.direction,
                         f"ls_dist{si}": ls.distance,
                         f"ls_li{si}": ls.li, f"ls_pdf{si}": ls.pdf,
                         f"ls_valid{si}": ls.valid})
        else:
            j = si - nee_distant
            g, u3l = rng.next_3d(g, allow_ld=False)
            li_idx = LI.pick_light(assets.lights, u3l[..., 0])
            row = LI.fetch_rows(assets.lights, li_idx)
            vals.update({
                f"lrow_p0{j}": row[..., LI.LP_P0:LI.LP_P0 + 3],
                f"lrow_e1{j}": row[..., LI.LP_E1:LI.LP_E1 + 3],
                f"lrow_e2{j}": row[..., LI.LP_E2:LI.LP_E2 + 3],
                f"lrow_pos{j}": row[..., LI.LP_POS:LI.LP_POS + 3],
                f"lrow_radius{j}": row[..., LI.LP_RADIUS],
                f"lrow_rad{j}": row[..., LI.LP_RAD:LI.LP_RAD + 3],
                f"lrow_inv_area{j}": row[..., LI.LP_INV_AREA],
                f"lrow_kind{j}": row[..., LI.LP_KIND],
                f"lrow_axis{j}": row[..., LI.LP_AXIS:LI.LP_AXIS + 3],
                f"lrow_cos_cone{j}": row[..., LI.LP_COS_CONE],
                f"lrow_soft{j}": row[..., LI.LP_SOFT],
                f"pick_pdf{j}": row[..., LI.LP_POWER]
                / jnp.maximum(assets.lights.total_power, 1e-20),
                f"u3l{j}": u3l})

    Lin = SK.in_layout(nee_distant, nee_local)
    Lout = SK.out_layout(nee_distant, nee_local, fill_ctx is not None)
    planes = SK.pack_inputs(Lin, nb, vals)
    consts4 = jnp.stack([
        jnp.asarray(consts.firefly_filter_threshold, jnp.float32),
        jnp.asarray(consts.noisy_radiance_attenuation, jnp.float32),
        jnp.asarray(consts.nee_min_radiance_threshold, jnp.float32),
        jnp.asarray(cam.pixel_cone_spread_angle, jnp.float32)])
    out = SK.unpack_out(Lout, SK.shade_nee_pallas(
        planes, consts4, nee_distant=nee_distant, nee_local=nee_local,
        rr=cfg.enable_russian_roulette, max_bounces=cfg.max_bounces,
        max_diffuse_bounces=cfg.max_diffuse_bounces,
        spec_rough_threshold=K_SPECULAR_ROUGHNESS_THRESHOLD,
        local_pdf_k=LOCAL_PDF_ESTIMATE_K, fill=fill,
        interpret=_shade_kernel_interpret()))

    radiance = out["radiance"]
    thp = out["thp"]
    origin = out["origin"]
    direction = out["direction"]
    lobe = out["lobe"].astype(jnp.int32)
    will_scatter = out["will_scatter"] != 0.0
    scatter_valid = out["scatter_valid"] != 0.0
    rr_kill = out["rr_kill"] != 0.0
    is_transmission = (lobe & B.LOBE_TRANSMISSION) != 0

    # nested stack update on transmission (int packing stays outside)
    do_int = will_scatter & is_transmission & ~sd.thin_surface
    interior = jnp.where(
        do_int[..., None],
        nested.handle_intersection(interior, sd.material_id,
                                   sd.nested_priority, sd.front_facing),
        interior)

    res = {}
    if fill:
        # emission routing (StablePlanesHandleHit): on-branch emission
        # was collected by BUILD; only off-branch emission is noise
        sp_secondary_l = fill_ctx["sp_secondary_l"] + jnp.where(
            (shade & ~path.sp_on_branch)[..., None],
            out["emission_term"], 0.0)
        sp_hit_t = jnp.where(
            shade,
            SP.accumulate_hit_t(path.sp_hit_t, fill_ctx["hit_t"],
                                path.sp_bounces, path.sp_delta_only),
            fill_ctx["sp_hit_t"])

    # ---- batched NEE visibility trace + contribution apply
    k_total = nee_distant + nee_local
    if k_total > 0:
        dirs = [out[f"nee_dir{i}"] for i in range(k_total)]
        dists = [out[f"nee_dist{i}"] for i in range(k_total)]
        needs = [out[f"nee_need{i}"] != 0.0 for i in range(k_total)]
        all_o = jnp.tile(out["vis_origin"], (k_total, 1))
        all_d = jnp.concatenate(dirs, axis=0)
        all_t = jnp.concatenate(dists, axis=0)
        all_act = jnp.concatenate(needs, axis=0)
        rays = rays.at[1].add(jnp.sum(all_act.astype(jnp.float32)))
        from . import visibility as VIS
        occluded = VIS.trace_visibility(
            assets, all_o, all_d, t_min=0.0, t_max=all_t,
            active=all_act, exact=cfg.exact_alpha_test)
        visible = (~occluded).reshape(k_total, nb)
        if fill:
            # StablePlanesHandleNEE: base-vertex NEE fills the plane's
            # pending denoiser channels; deeper vertices lump into
            # secondaryL; ReSTIR DI replaces base NEE on the dominant
            cd = sum(jnp.where((visible[i] & needs[i])[..., None],
                               out[f"nee_contrib_d{i}"], 0.0)
                     for i in range(k_total))
            cs = sum(jnp.where((visible[i] & needs[i])[..., None],
                               out[f"nee_contrib_s{i}"], 0.0)
                     for i in range(k_total))
            restir_covered = jnp.asarray(cfg.use_restir_di) & \
                path.sp_on_plane & path.sp_on_dominant
            nee_dist = sum(
                jnp.where(visible[i] & needs[i], dists[i],
                          mu.K_MAX_RAY_TRAVEL)
                for i in range(k_total)) / k_total
            acc_t = SP.accumulate_hit_t(
                sp_hit_t, nee_dist, path.sp_bounces + 1,
                jnp.zeros((nb,), bool))
            on_base = path.sp_on_plane & ~restir_covered
            res["sp_pend_diff"] = jnp.where(
                on_base[..., None],
                jnp.concatenate([cd, acc_t[..., None]], -1),
                path.sp_pend_diff)
            res["sp_pend_spec"] = jnp.where(
                on_base[..., None],
                jnp.concatenate([cs, acc_t[..., None]], -1),
                path.sp_pend_spec)
            sp_secondary_l = sp_secondary_l + jnp.where(
                (~path.sp_on_plane)[..., None], cd + cs, 0.0)
        else:
            for i in range(k_total):
                radiance = radiance + jnp.where(
                    (visible[i] & needs[i])[..., None],
                    out[f"nee_contrib{i}"], 0.0)
    elif fill:
        res["sp_pend_diff"] = path.sp_pend_diff
        res["sp_pend_spec"] = path.sp_pend_spec

    # ---- scatter-side env MIS (env pdf = pyramid gathers, outside)
    env_mis = out["env_mis_pre"]
    if nee_distant > 0:
        lp = _distant_pdf(assets, cfg, direction)
        env_w = mu.eval_mis(1.0, out["bs_pdf"], float(nee_distant), lp)
        env_mis = jnp.where(out["non_delta_scatter"] != 0.0, env_w,
                            env_mis)

    if fill:
        res["sp_secondary_l"] = sp_secondary_l
        res["sp_hit_t"] = sp_hit_t
    res.update(
        radiance=radiance, thp=thp, origin=origin, direction=direction,
        firefly_k=out["firefly_k"], cone_spread=out["cone_spread"],
        diffuse_bounces=out["diffuse_bounces"].astype(jnp.int32),
        interior=interior, emissive_mis=out["emissive_mis"],
        env_mis=env_mis, will_scatter=will_scatter,
        scatter_valid=scatter_valid, rr_kill=rr_kill, rays=rays,
        lobe=lobe, bs_pdf=out["bs_pdf"],
        is_delta=(lobe & B.LOBE_DELTA) != 0,
        is_transmission=is_transmission,
        is_reflection=(lobe & B.LOBE_REFLECTION) != 0)
    # diffuse-vs-specular bounce classification (PathTracer.hlsli:196)
    alpha = surf.bsdf_data.roughness * surf.bsdf_data.roughness
    rough_props = jnp.where(alpha < B.K_MIN_GGX_ALPHA, 0.0,
                            surf.bsdf_data.roughness)
    res["is_diffuse_bounce"] = res["is_reflection"] & (
        ((lobe & B.LOBE_DIFFUSE_REFLECTION) != 0)
        | (rough_props > K_SPECULAR_ROUGHNESS_THRESHOLD))
    return res


def render_wavefront(assets: RenderAssets, cam: CameraData, px, py,
                     consts: PTConstants, *, cfg: PTConfig,
                     sub_sample_index=0, spp: int = 1):
    """Trace sample(s) for every pixel in (px, py); returns radiance
    (N,3) — the per-pixel SUM over `spp` samples when spp > 1.

    The reference's per-thread `while(path.isActive())` becomes a
    while_loop over whole-wavefront segment iterations. spp > 1 turns on
    PATH REGENERATION: a lane whose sample dies immediately starts its
    pixel's next accumulation sample in place, so the wavefront stays
    ~fully occupied across the whole batch instead of decaying 8
    separate times — the wavefront-scheduler trick the reference's
    megakernel gets from per-thread loops for free."""
    path0 = init_paths(cam, px, py, cfg, consts, sub_sample_index)
    return render_paths(assets, cam, path0, consts, cfg=cfg,
                        sub_sample_index=sub_sample_index, spp=spp)


def render_wavefront_counted(assets: RenderAssets, cam: CameraData, px,
                             py, consts: PTConstants, *, cfg: PTConfig,
                             sub_sample_index=0, spp: int = 1):
    """render_wavefront + ray statistics: returns (radiance, rays) where
    rays = [closest-hit rays, anyhit/visibility rays] actually cast
    (active lanes only). Feeds bench.py's Mrays/s (the BASELINE.json
    metric; the reference counts the same per-frame DispatchRays work,
    RTXPT/Sample.cpp:843-850)."""
    path0 = init_paths(cam, px, py, cfg, consts, sub_sample_index)
    return render_paths(assets, cam, path0, consts, cfg=cfg,
                        sub_sample_index=sub_sample_index, spp=spp,
                        return_ray_stats=True)


def render_paths(assets: RenderAssets, cam: CameraData, path0: PathState,
                 consts: PTConstants, *, cfg: PTConfig,
                 sub_sample_index=0, capture_first_hit: bool = False,
                 injected_hit=None, spp: int = 1,
                 return_ray_stats: bool = False):
    """Run the bounce loop from an arbitrary initial PathState (used by
    the realtime FILL pass to continue paths from the primary surface,
    PathTracerStablePlanes firstHitFromBasePlane semantics).

    capture_first_hit=True additionally returns the first TRUE hit of each
    path (position, oriented normal, found mask) -- the secondary-surface
    export consumed by ReSTIR GI (u_SecondarySurfacePositionNormal,
    RTXPT/Sample.hlsl:279)."""
    n = path0.px.shape[0]
    mat_iors = assets.scene.materials.ior
    vol_abs = assets.scene.materials.volume_absorption
    nee_local = cfg.nee_local_samples if assets.lights is not None else 0
    nee_distant = cfg.nee_distant_samples if cfg.use_env_lights else 0
    fill = cfg.mode == C_MODE_FILL and path0.sp_branch is not None
    regen = spp > 1
    if regen:
        assert not fill and not capture_first_hit and \
            injected_hit is None, \
            "path regeneration supports plain reference renders only"
    max_iters = spp * (cfg.max_bounces + 2) + K_MAX_REJECTED_HITS + 2 \
        if regen else cfg.max_bounces + K_MAX_REJECTED_HITS + 2

    def sample_gen(path: PathState, s_arr=None):
        base = consts.sample_base_index + jnp.uint32(sub_sample_index)
        if s_arr is not None:
            # path regeneration: each lane's CURRENT accumulation sample
            # seeds its streams, or every regenerated sample would replay
            # sample 0's randoms
            base = base + s_arr.astype(jnp.uint32)
        return rng.make(path.px, path.py,
                        path.vertex_index.astype(jnp.uint32), base,
                        hq=cfg.rng_quality == "hq")

    def body(carry, hit_override=None):
        path, it, first, _, s_arr, accum, rays = carry
        # ray accounting (BASELINE.json metric "Mrays/sec": closest-hit
        # rays in slot 0, anyhit/visibility rays in slot 1); two scalar
        # reductions per bounce — negligible next to the trace itself
        if hit_override is None:
            rays = rays.at[0].add(jnp.sum(path.active.astype(jnp.float32)))
        nb = path.px.shape[0]   # width-agnostic: the tail-compacted
        #                         narrow loop re-traces this body at a
        #                         smaller wavefront width
        if hit_override is not None:
            hit = hit_override
        else:
            hit = traverse.trace_closest(
                assets.bvh, assets.soup, path.origin, path.direction,
                t_min=0.0, t_max=mu.K_MAX_RAY_TRAVEL, active=path.active,
                leaf_size=cfg.leaf_size, dense=assets.dense)
        is_hit = path.active & hit.valid
        is_miss = path.active & ~hit.valid

        # --- UpdatePathTravelled (PathTracer.hlsli:267-277)
        t_travel = jnp.where(hit.valid, hit.t, mu.K_MAX_RAY_TRAVEL)
        vertex_index = path.vertex_index + path.active.astype(jnp.int32)
        cone_width = path.cone_width + path.cone_spread * t_travel
        scene_length = jnp.minimum(path.scene_length + t_travel,
                                   mu.K_MAX_RAY_TRAVEL)
        path = path._replace(vertex_index=vertex_index,
                             cone_width=jnp.where(path.active, cone_width,
                                                  path.cone_width),
                             scene_length=jnp.where(path.active,
                                                    scene_length,
                                                    path.scene_length))

        # --- HandleMiss (PathTracer.hlsli:287-368)
        env_le = EM.eval_dir(assets.env, path.direction)
        env_emission = path.env_mis[..., None] * env_le
        env_emission = mu.firefly_filter(env_emission,
                                         consts.firefly_filter_threshold,
                                         path.firefly_k)
        env_emission = env_emission * consts.noisy_radiance_attenuation
        if fill:
            # FILL: sky on a stable branch was collected by BUILD
            # (StablePlanesHandleMiss); off-branch sky goes to secondaryL
            radiance = path.radiance
            sp_secondary_l = path.sp_secondary_l + jnp.where(
                (is_miss & ~path.sp_on_branch)[..., None],
                jnp.maximum(path.thp * env_emission, 0.0), 0.0)
            sp_hit_t = jnp.where(
                is_miss,
                SP.accumulate_hit_t(path.sp_hit_t, mu.K_MAX_RAY_TRAVEL,
                                    path.sp_bounces, path.sp_delta_only),
                path.sp_hit_t)
            sp_pend_diff = path.sp_pend_diff
            sp_pend_spec = path.sp_pend_spec
        else:
            radiance = path.radiance + jnp.where(
                is_miss[..., None],
                jnp.maximum(path.thp * env_emission, 0.0), 0.0)

        # --- HandleHit (PathTracer.hlsli:371-525)
        surf = shading.load_surface(assets.scene, hit.prim, hit.bary,
                                    path.direction,
                                    cone_width=cone_width)
        sd = surf.sd

        # volume absorption (Beer-Lambert; PathTracer.hlsli:406-415)
        in_medium = ~nested.is_empty(path.interior)
        top_mat = jnp.minimum(nested.top_material(path.interior),
                              jnp.uint32(mat_iors.shape[0] - 1)
                              ).astype(jnp.int32)
        sigma = vol_abs[top_mat]
        # injected base hits carry camera->base length in t (for cone /
        # sceneLength); absorption along that chain was applied by BUILD
        absorb_t = jnp.zeros_like(hit.t) if hit_override is not None \
            else hit.t
        transmittance = jnp.exp(-sigma * absorb_t[..., None])
        thp = jnp.where((is_hit & in_medium)[..., None],
                        path.thp * transmittance, path.thp)

        # alpha test (AnyHit / Bridge::AlphaTest equivalent,
        # Sample.hlsl:408-413): MASK-mode materials below the cutoff are
        # treated as rejected hits and the path continues through
        alpha_reject = is_hit & (surf.alpha_mode == 1) & \
            (sd.opacity < surf.alpha_cutoff)
        # alpha BLEND -> stochastic transparency (hit kept with
        # probability = opacity; deterministic counter-based draw)
        blend_base = consts.sample_base_index + \
            (s_arr.astype(jnp.uint32) if regen else jnp.uint32(0))
        u_blend = rng.hash32_to_float(rng.hash32_combine(
            rng.hash32_combine(rng.hash32(hit.prim.astype(jnp.uint32)),
                               (path.px << 16) | path.py),
            vertex_index.astype(jnp.uint32)
            + blend_base * jnp.uint32(0x9E37)))
        alpha_reject = alpha_reject | (
            is_hit & (surf.alpha_mode == 2) & (u_blend >= sd.opacity))
        # glTF single-sided: backface hits pass through (culled)
        alpha_reject = alpha_reject | (
            is_hit & ~sd.front_facing & ~surf.double_sided)

        # nested dielectrics: reject false hits
        # (PathTracerNestedDielectrics.hlsli:48-91)
        true_int = nested.is_true_intersection(path.interior,
                                               sd.nested_priority)
        reject = is_hit & (~true_int | alpha_reject)
        can_reject = reject & (path.rejected_hits < K_MAX_REJECTED_HITS)
        kill_reject = reject & ~can_reject
        interior = jnp.where(
            (can_reject & ~alpha_reject)[..., None],
            nested.handle_intersection(path.interior, sd.material_id,
                                       sd.nested_priority, sd.front_facing),
            path.interior)
        origin = jnp.where(can_reject[..., None],
                           sd.compute_new_ray_origin(jnp.zeros(nb, bool)),
                           path.origin)
        vertex_index = vertex_index - can_reject.astype(jnp.int32)
        rejected_hits = path.rejected_hits + can_reject.astype(jnp.int32)
        # alpha-rejected MASK hits must not shade (they re-queue); round-1
        # allowed a lane with true_int & alpha_reject to do both
        shade = is_hit & true_int & ~alpha_reject

        # first true-hit capture (secondary-surface export for ReSTIR GI)
        first_pos, first_nrm, first_found = first
        cap = shade & ~first_found
        if fill:
            # stable planes: the GI secondary surface is the first hit
            # after scattering off the DOMINANT plane base
            # (Bridge::StoreSecondarySurfacePositionAndNormal gate)
            cap = cap & (path.sp_bounces == 1) & path.sp_on_dominant
        first = (jnp.where(cap[..., None], sd.pos, first_pos),
                 jnp.where(cap[..., None],
                           jnp.where(sd.front_facing[..., None], sd.face_n,
                                     -sd.face_n), first_nrm),
                 first_found | cap)

        outside_ior = nested.compute_outside_ior(
            path.interior, sd.material_id, sd.front_facing, mat_iors)
        surf = shading.update_outside_ior(surf, outside_ior)
        sd = surf.sd

        use_shade_kernel = (
            cfg.shade_megakernel and cfg.nee_enabled
            and (nee_local == 0 or cfg.nee_local_type != 2)
            and cfg.rng_quality == "ld"
            and _shade_kernel_on())
        if use_shade_kernel:
            # fused shade+NEE megakernel (pt/shade_kernel.py) — ONE
            # Pallas dispatch replaces the emission/RR/BSDF/NEE XLA
            # chain (VERDICT r3 next #3; RTXPT/Sample.hlsl:368-393)
            fill_ctx = dict(hit_t=hit.t, sp_secondary_l=sp_secondary_l,
                            sp_hit_t=sp_hit_t) if fill else None
            ks = _kernel_shade_step(
                assets, cfg, consts, cam, path, surf, shade, thp,
                radiance, origin, interior, vertex_index,
                s_arr if regen else None, rays, nee_distant,
                nee_local, sample_gen, fill_ctx=fill_ctx)
            (radiance, thp, origin, direction, firefly_k, cone_spread,
             diffuse_bounces, interior, emissive_mis, env_mis,
             will_scatter, scatter_valid, rr_kill, rays) = (
                ks["radiance"], ks["thp"], ks["origin"], ks["direction"],
                ks["firefly_k"], ks["cone_spread"], ks["diffuse_bounces"],
                ks["interior"], ks["emissive_mis"], ks["env_mis"],
                ks["will_scatter"], ks["scatter_valid"], ks["rr_kill"],
                ks["rays"])
            is_delta = ks["is_delta"]
            is_transmission = ks["is_transmission"]
            is_diffuse_bounce = ks["is_diffuse_bounce"]

            class _BS(NamedTuple):
                pdf: jnp.ndarray
            bs = _BS(pdf=ks["bs_pdf"])
            if fill:
                sp_secondary_l = ks["sp_secondary_l"]
                sp_hit_t = ks["sp_hit_t"]
                sp_pend_diff = ks["sp_pend_diff"]
                sp_pend_spec = ks["sp_pend_spec"]
        else:
            # emission with MIS weight (PathTracer.hlsli:456-468)
            surface_emission = surf.emission * path.emissive_mis[..., None]
            surface_emission = mu.firefly_filter(
                surface_emission, consts.firefly_filter_threshold,
                path.firefly_k) * consts.noisy_radiance_attenuation
            if fill:
                # emission on the stable tree was collected by BUILD; only
                # off-branch emission is noise to denoise (secondaryL)
                sp_secondary_l = sp_secondary_l + jnp.where(
                    (shade & ~path.sp_on_branch)[..., None],
                    jnp.maximum(thp * surface_emission, 0.0), 0.0)
                sp_hit_t = jnp.where(
                    shade,
                    SP.accumulate_hit_t(path.sp_hit_t, hit.t, path.sp_bounces,
                                        path.sp_delta_only),
                    sp_hit_t)
            else:
                radiance = radiance + jnp.where(
                    shade[..., None],
                    jnp.maximum(thp * surface_emission, 0.0), 0.0)

            # HasFinishedSurfaceBounces (PathTracer.hlsli:103-109)
            finished = (vertex_index > cfg.max_bounces) | \
                (path.diffuse_bounces > cfg.max_diffuse_bounces)

            g = sample_gen(path._replace(vertex_index=vertex_index),
                           s_arr if regen else None)

            # Russian roulette (PathTracer.hlsli:125-149)
            if cfg.enable_russian_roulette:
                g = rng.start_effect(g, rng.EFFECT_RUSSIAN_ROULETTE, False)
                g, u_rr = rng.next_1d(g, allow_ld=False)
                rr_val = mu.luminance(thp)
                prob = mu.saturate(0.8 - rr_val) ** 4
                rr_kill = u_rr < prob
                thp = jnp.where((shade & ~rr_kill)[..., None],
                                thp / (1.0 - prob)[..., None], thp)
            else:
                rr_kill = jnp.zeros(nb, bool)

            pre_scatter_thp = thp
            pre_scatter_firefly_k = path.firefly_k
            will_scatter = shade & ~finished & ~rr_kill

            # --- GenerateScatterRay (PathTracer.hlsli:158-264)
            g = rng.start_effect(
                g, rng.EFFECT_SCATTER_BSDF,
                (path.diffuse_bounces < rng.DISABLE_LD_AFTER_DIFFUSE_BOUNCES)
                if cfg.rng_quality == "ld" else False)
            g, u3 = rng.next_3d(g)
            bsdf = shading.make_wavefront_bsdf(surf)
            wi_local = sd.to_local(sd.v)
            bs = B.bsdf_sample(bsdf, wi_local, u3)
            wo_world = sd.from_local(bs.wo)

            is_delta = (bs.lobe & B.LOBE_DELTA) != 0
            is_transmission = (bs.lobe & B.LOBE_TRANSMISSION) != 0
            is_reflection = (bs.lobe & B.LOBE_REFLECTION) != 0
            scatter_thp = thp * bs.weight
            scatter_valid = bs.valid & jnp.any(scatter_thp > 0.0, axis=-1)

            # diffuse-vs-specular bounce classification (PathTracer.hlsli:196)
            rough_props = jnp.where(bsdf.alpha < B.K_MIN_GGX_ALPHA, 0.0,
                                    bsdf.roughness)
            is_diffuse_bounce = is_reflection & (
                ((bs.lobe & B.LOBE_DIFFUSE_REFLECTION) != 0)
                | (rough_props > K_SPECULAR_ROUGHNESS_THRESHOLD))
            diffuse_bounces = path.diffuse_bounces + (
                will_scatter & is_diffuse_bounce).astype(jnp.int32)

            # interior list update on transmission (NestedDielectrics:95-103)
            do_int = will_scatter & is_transmission & ~sd.thin_surface
            interior = jnp.where(
                do_int[..., None],
                nested.handle_intersection(interior, sd.material_id,
                                           sd.nested_priority, sd.front_facing),
                interior)

            # ray cone + firefly bookkeeping (PathTracer.hlsli:219-231)
            cone_spread = jnp.where(
                will_scatter & ~is_delta,
                jnp.minimum(path.cone_spread
                            + mu.spread_angle_from_scatter_pdf(bs.pdf),
                            mu.M_2PI),
                path.cone_spread)
            firefly_k = jnp.where(
                will_scatter,
                mu.new_scatter_firefly_filter_k(path.firefly_k,
                                                cam.pixel_cone_spread_angle,
                                                bs.pdf, bs.lobe_p),
                path.firefly_k)

            new_origin = sd.compute_new_ray_origin(is_reflection)
            origin = jnp.where(will_scatter[..., None], new_origin, origin)
            direction = jnp.where(will_scatter[..., None], wo_world,
                                  path.direction)
            thp = jnp.where(will_scatter[..., None], scatter_thp, thp)

            # --- HandleNEE (PathTracerNEE.hlsli:155-346)
            emissive_mis = jnp.where(shade, 1.0, path.emissive_mis)
            env_mis = jnp.where(shade, 1.0, path.env_mis)
            if cfg.nee_enabled and (nee_distant + nee_local) > 0:
                g = rng.start_effect(g, rng.EFFECT_NEE, False)
                nee_dirs, nee_dists, nee_diff, nee_spec, nee_pdf = \
                    [], [], [], [], []
                for si in range(nee_distant + nee_local):
                    if si < nee_distant:
                        sample_weight = 1.0 / nee_distant
                        g, ls = _sample_distant(assets, cfg, g)
                        light_mis_pdf = ls.pdf
                    else:
                        sample_weight = 1.0 / nee_local
                        g, u3l = rng.next_3d(g, allow_ld=False)
                        if cfg.nee_local_type == 2 and \
                                assets.regir is not None:
                            from ..restir import regir as RG
                            ls = RG.sample_regir(
                                assets.regir, assets.lights,
                                assets.scene.positions, assets.scene.indices,
                                sd.pos, u3l[..., :2])
                        else:
                            ls = LI.sample_local_lights(
                                assets.lights, assets.scene.positions,
                                assets.scene.indices, sd.pos, u3l)
                        light_mis_pdf = jnp.full((nb,), LOCAL_PDF_ESTIMATE_K)
                    wo_nee = sd.to_local(ls.direction)
                    fd, fs, scatter_pdf_for_dir = B.bsdf_eval_split_pdf(
                        bsdf, wi_local, wo_nee)
                    # delta lights (point/spot/directional) cannot be hit
                    # by scatter rays: MIS weight 1, else the balance
                    # heuristic systematically loses their energy (caught
                    # by tests/test_analytic_oracles.py)
                    mis = jnp.where(
                        ls.delta, 1.0,
                        mu.eval_mis(1.0, light_mis_pdf / sample_weight, 1.0,
                                    scatter_pdf_for_dir))
                    li = ls.li * (mis * sample_weight)[..., None]
                    pdf_for_firefly = ls.pdf / sample_weight
                    lum = mu.luminance((fd + fs) * li)
                    need_ray = will_scatter_nee(shade, finished, rr_kill) & \
                        ls.valid & (lum > consts.nee_min_radiance_threshold)
                    if fill and cfg.use_restir_di:
                        # the dominant plane's base NEE is replaced by
                        # ReSTIR DI (restir_covered routing below) —
                        # don't cast rays whose contribution is dropped
                        need_ray = need_ray & ~(path.sp_on_plane
                                                & path.sp_on_dominant)
                    nee_k = mu.new_scatter_firefly_filter_k(
                        pre_scatter_firefly_k, cam.pixel_cone_spread_angle,
                        pdf_for_firefly, jnp.ones((nb,)))
                    grazing = jnp.where(
                        sd.shadow_nol_fadeout > 0.0,
                        mu.compute_low_grazing_angle_falloff(
                            ls.direction, sd.vertex_n, sd.shadow_nol_fadeout,
                            2.0 * sd.shadow_nol_fadeout), 1.0)
                    dr = grazing[..., None] * mu.firefly_filter(
                        fd * li, consts.firefly_filter_threshold, nee_k)
                    sr = grazing[..., None] * mu.firefly_filter(
                        fs * li, consts.firefly_filter_threshold, nee_k)
                    nee_dirs.append(ls.direction)
                    nee_dists.append(ls.distance)
                    nee_diff.append(jnp.where(need_ray[..., None], dr, 0.0))
                    nee_spec.append(jnp.where(need_ray[..., None], sr, 0.0))
                    nee_pdf.append(need_ray)
                # one batched visibility trace for all NEE samples
                k_total = len(nee_dirs)
                vis_o = sd.compute_new_ray_origin(jnp.ones(nb, bool))
                all_o = jnp.tile(vis_o, (k_total, 1))
                all_d = jnp.concatenate(nee_dirs, axis=0)
                all_t = jnp.concatenate(nee_dists, axis=0) * (1.0 - 1e-4)
                all_act = jnp.concatenate(nee_pdf, axis=0)
                rays = rays.at[1].add(jnp.sum(all_act.astype(jnp.float32)))
                from . import visibility as VIS
                occluded = VIS.trace_visibility(
                    assets, all_o, all_d, t_min=0.0, t_max=all_t,
                    active=all_act, exact=cfg.exact_alpha_test)
                visible = (~occluded).reshape(k_total, nb)
                contrib_d = sum(
                    jnp.where(visible[i][..., None], nee_diff[i], 0.0)
                    for i in range(k_total))
                contrib_s = sum(
                    jnp.where(visible[i][..., None], nee_spec[i], 0.0)
                    for i in range(k_total))
                atten = consts.noisy_radiance_attenuation
                if fill:
                    # StablePlanesHandleNEE: at the plane base the diff/spec
                    # NEE goes straight into the plane's pending denoiser
                    # channels; deeper vertices lump into secondaryL. ReSTIR
                    # DI replaces the base NEE on the dominant plane.
                    cd = jnp.maximum(pre_scatter_thp * contrib_d * atten, 0.0)
                    cs = jnp.maximum(pre_scatter_thp * contrib_s * atten, 0.0)
                    restir_covered = jnp.asarray(cfg.use_restir_di) & \
                        path.sp_on_plane & path.sp_on_dominant
                    nee_dist = sum(
                        jnp.where(visible[i] & nee_pdf[i], nee_dists[i],
                                  mu.K_MAX_RAY_TRAVEL)
                        for i in range(k_total)) / k_total
                    acc_t = SP.accumulate_hit_t(
                        sp_hit_t, nee_dist, path.sp_bounces + 1,
                        jnp.zeros((nb,), bool))
                    on_base = path.sp_on_plane & ~restir_covered
                    sp_pend_diff = jnp.where(
                        on_base[..., None],
                        jnp.concatenate([cd, acc_t[..., None]], -1),
                        path.sp_pend_diff)
                    sp_pend_spec = jnp.where(
                        on_base[..., None],
                        jnp.concatenate([cs, acc_t[..., None]], -1),
                        path.sp_pend_spec)
                    off_base = ~path.sp_on_plane
                    sp_secondary_l = sp_secondary_l + jnp.where(
                        off_base[..., None], cd + cs, 0.0)
                else:
                    contrib = (contrib_d + contrib_s) * \
                        consts.noisy_radiance_attenuation
                    radiance = radiance + jnp.maximum(
                        pre_scatter_thp * contrib, 0.0)

                # scatter-side MIS for the NEXT segment (NEE.hlsli:248-280)
                non_delta_scatter = scatter_valid & ~is_delta
                if nee_distant > 0:
                    lp = _distant_pdf(assets, cfg, wo_world)
                    env_w = mu.eval_mis(1.0, bs.pdf, float(nee_distant), lp)
                    env_mis = jnp.where(shade & non_delta_scatter, env_w,
                                        env_mis)
                if nee_local > 0:
                    em_w = mu.eval_mis(1.0, bs.pdf, float(nee_local),
                                       LOCAL_PDF_ESTIMATE_K)
                    emissive_mis = jnp.where(shade & non_delta_scatter, em_w,
                                             emissive_mis)

        active = (path.active & ~is_miss & ~kill_reject) & \
            (can_reject | (shade & will_scatter & scatter_valid))

        sp_fields = {}
        if fill:
            # ---- StablePlanesOnScatter (PathTracerStablePlanes:269-...)
            scattered = will_scatter & scatter_valid
            was_on_plane = path.sp_on_plane & shade
            sp_base_diff = jnp.where(was_on_plane & scattered,
                                     is_diffuse_bounce, path.sp_base_diff)
            sp_base_delta = jnp.where(was_on_plane & scattered, is_delta,
                                      path.sp_base_delta)
            lobe_id = jnp.where(is_transmission, SP.LOBE_ID_TRANSMISSION,
                                SP.LOBE_ID_REFLECTION)
            can_adv = path.sp_on_branch & scattered & is_delta & \
                (vertex_index + 1 <= SP.MAX_VERTEX)
            new_branch = jnp.where(
                can_adv, SP.advance_branch_id(path.sp_branch, lobe_id),
                SP.INVALID_BRANCH)
            P = path.sp_plane_branch.shape[1]
            onp = [SP.is_on_plane(path.sp_plane_branch[:, p], new_branch)
                   for p in range(P)]
            on_path = [SP.is_on_stable_path(path.sp_plane_branch[:, p],
                                            new_branch, vertex_index + 1)
                       for p in range(P)]
            transfer_plane = sum(
                jnp.where(onp[p], p, 0) for p in range(P))
            transfer = sum(o.astype(jnp.int32) for o in onp) > 0
            on_branch2 = can_adv & (
                sum(o.astype(jnp.int32) for o in on_path) > 0)

            # commits happen at (a) transfer onto a new plane and
            # (b) path death this iteration
            died = path.active & ~active
            do_commit = (transfer & scattered) | died
            gi_capture = jnp.asarray(cfg.use_restir_gi) & \
                path.sp_on_dominant & ~path.sp_base_delta
            d4 = sp_pend_diff
            s4 = sp_pend_spec
            sec = jnp.where((do_commit & ~gi_capture)[..., None],
                            sp_secondary_l, 0.0)
            d4 = jnp.where((do_commit & path.sp_base_diff)[..., None],
                           SP.combine_hit_t(d4, sec, sp_hit_t), d4)
            s4 = jnp.where((do_commit & ~path.sp_base_diff)[..., None],
                           SP.combine_hit_t(s4, sec, sp_hit_t), s4)
            sp_gi_l = path.sp_gi_l + jnp.where(
                (do_commit & gi_capture)[..., None], sp_secondary_l, 0.0)
            gi_base = was_on_plane & scattered & path.sp_on_dominant & \
                ~is_delta & ~is_transmission & (bs.pdf > 0.0)
            sp_gi_pdf = jnp.where(gi_base, bs.pdf, path.sp_gi_pdf)
            sp_gi_valid = path.sp_gi_valid | gi_base
            sp_gi_thp = jnp.where(gi_base[..., None], thp, path.sp_gi_thp)
            plane_oh = (jnp.arange(P)[None, :] == path.sp_plane[:, None]) \
                & do_commit[:, None]                      # (N,P)
            cd = path.sp_committed_diff
            cs_ = path.sp_committed_spec
            cd = jnp.where(plane_oh[..., None],
                           SP.combine_hit_t(cd, d4[:, None, :3]
                                            * jnp.ones((1, P, 1)),
                                            d4[:, None, 3]), cd)
            cs_ = jnp.where(plane_oh[..., None],
                            SP.combine_hit_t(cs_, s4[:, None, :3]
                                             * jnp.ones((1, P, 1)),
                                             s4[:, None, 3]), cs_)
            # reset pending state on transfer; update plane bookkeeping
            reset = transfer & scattered
            zero4 = jnp.zeros((nb, 4))
            sp_fields = dict(
                sp_branch=jnp.where(scattered, new_branch, path.sp_branch),
                sp_plane=jnp.where(reset, transfer_plane, path.sp_plane),
                sp_on_plane=jnp.where(can_reject, path.sp_on_plane,
                                      reset),
                sp_on_branch=jnp.where(scattered, on_branch2,
                                       path.sp_on_branch),
                sp_on_dominant=jnp.where(
                    reset, transfer_plane == path.sp_dominant,
                    path.sp_on_dominant),
                sp_base_diff=sp_base_diff,
                sp_base_delta=sp_base_delta,
                sp_delta_only=path.sp_delta_only & (is_delta | ~scattered),
                sp_bounces=jnp.where(
                    reset, 0,
                    path.sp_bounces + scattered.astype(jnp.int32)),
                sp_hit_t=jnp.where(reset, 0.0, sp_hit_t),
                sp_pend_diff=jnp.where(reset[..., None] |
                                       died[..., None], zero4,
                                       sp_pend_diff),
                sp_pend_spec=jnp.where(reset[..., None] |
                                       died[..., None], zero4,
                                       sp_pend_spec),
                sp_secondary_l=jnp.where((reset | died)[..., None], 0.0,
                                         sp_secondary_l),
                sp_gi_l=sp_gi_l, sp_gi_pdf=sp_gi_pdf,
                sp_gi_valid=sp_gi_valid, sp_gi_thp=sp_gi_thp,
                sp_committed_diff=cd, sp_committed_spec=cs_,
                sp_plane_branch=path.sp_plane_branch,
                sp_dominant=path.sp_dominant)

        new_path = PathState(
            origin=origin, direction=direction, thp=thp, radiance=radiance,
            active=active, vertex_index=vertex_index,
            diffuse_bounces=diffuse_bounces, rejected_hits=rejected_hits,
            scene_length=path.scene_length, firefly_k=firefly_k,
            cone_width=path.cone_width, cone_spread=cone_spread,
            interior=interior, emissive_mis=emissive_mis, env_mis=env_mis,
            px=path.px, py=path.py, **sp_fields)

        # --- wavefront coherence (the SER equivalent, SURVEY section
        # 2.7). Default "none": the morton primary order is kept for the
        # whole path — the dense-MT tracer's per-tile cluster worklists
        # already scale per-tile work with what its LIVE rays overlap,
        # so the full-pytree permute (~40 XLA gathers per bounce, the
        # round-2 "state plumbing" gap) is not paid. "octant"
        # additionally stable-partitions live lanes to the front and
        # sorts by direction octant (helps the BVH kernels' worst-lane
        # iteration counts on big scenes; NvReorderThread's job).
        if regen:
            # ---- PATH REGENERATION: a finished sample's lane starts
            # its pixel's next accumulation sample immediately
            died = path.active & ~active
            accum = accum + jnp.where(died[..., None],
                                      new_path.radiance, 0.0)
            s_new = s_arr + died.astype(jnp.int32)
            do_regen = died & (s_new < spp)
            samp = consts.sample_base_index \
                + jnp.uint32(sub_sample_index) \
                + s_new.astype(jnp.uint32)
            g0 = rng.make(path.px, path.py, jnp.uint32(0), samp)
            g0, u2aa = rng.next_2d(g0)
            fidx = samp.astype(jnp.float32)
            a1 = jnp.float32(0.7548776662466927)
            a2 = jnp.float32(0.5698402909980532)
            jx = ((0.5 + a1 * fidx) % 1.0) - 0.5
            jy = ((0.5 + a2 * fidx) % 1.0) - 0.5
            cam0 = cam._replace(jitter=jnp.zeros(2, jnp.float32))
            o0, d0 = compute_rays(cam0,
                                  path.px.astype(jnp.float32) + jx,
                                  path.py.astype(jnp.float32) + jy, u2aa)
            m = do_regen[..., None]
            rz = lambda cur, v: jnp.where(do_regen,
                                          jnp.full_like(cur, v), cur)
            new_path = new_path._replace(
                origin=jnp.where(m, o0, new_path.origin),
                direction=jnp.where(m, d0, new_path.direction),
                thp=jnp.where(m, 1.0, new_path.thp),
                radiance=jnp.where(died[..., None], 0.0,
                                   new_path.radiance),
                active=new_path.active | do_regen,
                vertex_index=rz(new_path.vertex_index, 0),
                diffuse_bounces=rz(new_path.diffuse_bounces, 0),
                rejected_hits=rz(new_path.rejected_hits, 0),
                scene_length=rz(new_path.scene_length, 0.0),
                firefly_k=rz(new_path.firefly_k, 1.0),
                cone_width=rz(new_path.cone_width, 0.0),
                cone_spread=jnp.where(do_regen,
                                      cam.pixel_cone_spread_angle,
                                      new_path.cone_spread),
                interior=jnp.where(m, nested.empty(nb),
                                   new_path.interior),
                emissive_mis=rz(new_path.emissive_mis,
                                1.0 if cfg.use_emissive_lights else 0.0),
                env_mis=rz(new_path.env_mis,
                           1.0 if cfg.use_env_lights else 0.0))
            s_arr = s_new

        if cfg.wavefront_sort in ("octant", "material", "raystream"):
            if cfg.wavefront_sort == "octant":
                octant = ((direction[..., 0] < 0).astype(jnp.int32)
                          + 2 * (direction[..., 1] < 0).astype(jnp.int32)
                          + 4 * (direction[..., 2] < 0).astype(jnp.int32))
                sort_key = jnp.where(active, octant, 8)
            elif cfg.wavefront_sort == "raystream":
                # RAYSTREAM re-sort (round 5): secondary bounces cost
                # ~4x the cluster visits of coherent primaries (57.5 vs
                # 14.1 visits/tile, ROADMAP r5 microprofile) because a
                # tile's traversal cost is the cluster UNION of its
                # rays. Key = morton3d(origin cell) * 8 + direction
                # octant: lanes starting in the same scene cell heading
                # the same way share worklists. The reference gets this
                # from hardware SER hit-coherence reordering
                # (NvReorderThread, Sample.hlsl:122-131); on TPU the
                # argsort+gather IS the reorder unit. Uses the NEW
                # scatter ray (post-regen), so regenerated camera lanes
                # sort with the primaries of their cell.
                if assets.dense is not None:
                    lo = jnp.min(assets.dense.aabb[:, 0:3], axis=0)
                    hi = jnp.max(assets.dense.aabb[:, 3:6], axis=0)
                else:
                    p0 = assets.soup.verts[:, 0:3]
                    lo = jnp.min(jnp.minimum(
                        p0, jnp.minimum(p0 + assets.soup.verts[:, 3:6],
                                        p0 + assets.soup.verts[:, 6:9])),
                        axis=0)
                    hi = jnp.max(jnp.maximum(
                        p0, jnp.maximum(p0 + assets.soup.verts[:, 3:6],
                                        p0 + assets.soup.verts[:, 6:9])),
                        axis=0)
                scale = 31.999 / jnp.maximum(hi - lo, 1e-6)
                q = jnp.clip((new_path.origin - lo) * scale,
                             0.0, 31.999).astype(jnp.uint32)
                octant = ((new_path.direction[..., 0] < 0)
                          .astype(jnp.uint32)
                          + 2 * (new_path.direction[..., 1] < 0)
                          .astype(jnp.uint32)
                          + 4 * (new_path.direction[..., 2] < 0)
                          .astype(jnp.uint32))
                key = (mu.morton3d(q[..., 0], q[..., 1], q[..., 2])
                       * jnp.uint32(8) + octant).astype(jnp.int32)
                sort_key = jnp.where(new_path.active, key,
                                     jnp.int32(1 << 30))
            else:
                # SER material-coherence half (VERDICT r4 next #7): the
                # reference reorders threads by a 16-bit material/
                # sub-instance key before shading (ComputeSubInstanceData
                # key build, RTXPT/Sample.cpp:1087-1113; NvReorderThread
                # Sample.hlsl:122-131). TPU translation: stable-sort the
                # wavefront by the LAST shaded material id — paths
                # leaving the same material cluster spatially, so the
                # next bounce's loads (textures, material rows) and
                # traversal worklists coherce. A/B harness:
                # tools/profile_matsort_ab.py.
                mat_key = sd.material_id.astype(jnp.int32)
                sort_key = jnp.where(active, mat_key, jnp.int32(1 << 30))
            perm = jnp.argsort(sort_key, stable=True)
            new_path = jax.tree_util.tree_map(lambda a: a[perm], new_path)
            first = jax.tree_util.tree_map(lambda a: a[perm], first)
            lane0 = carry[3][perm]
            if regen:
                # regen lanes carry per-lane sample counters and an
                # accumulator: they ride the same permutation
                s_arr = s_arr[perm]
                accum = accum[perm]
        else:
            lane0 = carry[3]
        return (new_path, it + 1, first, lane0, s_arr, accum, rays)

    def cond(carry):
        path, it = carry[0], carry[1]
        return jnp.any(path.active) & (it < max_iters)

    first0 = (jnp.zeros((n, 3), jnp.float32),
              jnp.zeros((n, 3), jnp.float32),
              jnp.zeros((n,), bool))
    # morton-order the wavefront so each traversal TILE holds spatially
    # coherent rays (fewer worst-lane iterations per tile); the lane0
    # permutation already rides the compaction machinery and un-permutes
    # at the end
    perm0 = jnp.argsort(mu.morton2d(path0.px, path0.py))
    path0 = jax.tree_util.tree_map(lambda a: a[perm0], path0)
    lane0 = perm0.astype(jnp.int32)
    carry = (path0, jnp.asarray(0, jnp.int32), first0, lane0,
             jnp.zeros((n,), jnp.int32), jnp.zeros((n, 3), jnp.float32),
             jnp.zeros((2,), jnp.float32))
    if injected_hit is not None:
        # FILL resumes from the BUILD-stored plane-0 base hit without
        # re-tracing the camera->base chain (firstHitFromBasePlane,
        # RTXPT/Sample.hlsl:67): run the first bounce outside the loop
        # with the stored hit
        inj = jax.tree_util.tree_map(lambda a: a[perm0], injected_hit)
        carry = body(carry, hit_override=inj)

    # ---- tail compaction (wavefront width shrink). Measured occupancy
    # decay (realtime FILL, 30-bounce config): live fraction is <1% from
    # iteration ~6 but the while_loop still paid ~24 FULL-width
    # iterations chasing rare delta chains — most of the realtime
    # frame's stage-1 cost. Stage A runs full width until the live set
    # fits in n//8 lanes (the cond guarantees no overflow), then the
    # SAME body continues over the gathered survivors at narrow width
    # and the results merge back positionally. The narrow program is a
    # second trace of `body`, cached by jit like any other shape.
    can_compact = (not regen and cfg.wavefront_sort == "none"
                   and cfg.wavefront_compaction
                   and n >= cfg.wavefront_compaction_min)
    # regen multi-STAGE compaction (round 5): with path regeneration,
    # lanes go dead only when their pixel exhausts all spp samples, so
    # occupancy decays to ~30-40% over the chunk — and the measured
    # scattered-dead trace cost is ~FULL cost (a tile's cost is the
    # cluster union of its live rays, ops/mt_dense.py), so tile gating
    # recovers nothing. Width shrink is the lever that pays: halve the
    # wavefront each time the live set fits (n -> n/2 -> n/4 -> n/8),
    # one argsort + pytree gather per stage, merge back positionally.
    # (sort + regen compose in the plain while_loop below — the carry's
    # lane0 rides every permutation — but the STAGED compaction unwind
    # merges narrow results positionally, which a sorting body breaks,
    # so staged compaction requires sort "none")
    can_compact_regen = (regen and cfg.wavefront_sort == "none"
                         and cfg.wavefront_compaction
                         and n >= cfg.wavefront_compaction_min)
    if can_compact:
        n_small = max(n // 8, 1024)
        k_min = 4

        def cond_a(carry):
            path, it = carry[0], carry[1]
            live = jnp.sum(path.active.astype(jnp.int32))
            return jnp.any(path.active) & (it < max_iters) & \
                ((it < k_min) | (live > n_small))

        carry = jax.lax.while_loop(cond_a, body, carry)
        path_a, it_a, first_a, lane0_a, s_a, accum_a, rays_a = carry
        perm = jnp.argsort(~path_a.active, stable=True)[:n_small]
        gath = lambda a: a[perm]
        carry_n = (jax.tree_util.tree_map(gath, path_a), it_a,
                   jax.tree_util.tree_map(gath, first_a),
                   lane0_a[perm], s_a[perm], accum_a[perm], rays_a)
        path_n, _, first_n, _, _, _, rays = jax.lax.while_loop(cond, body,
                                                               carry_n)
        put = lambda full, nar: full.at[perm].set(nar)
        path = jax.tree_util.tree_map(put, path_a, path_n)
        first = jax.tree_util.tree_map(put, first_a, first_n)
        lane0 = lane0_a      # the narrow loop never permutes (sort none)
        accum = accum_a
    elif can_compact_regen:
        k_min = 4
        widths = []
        wcur = n
        while wcur // 2 >= max(n // 8, 1024):
            wcur //= 2
            widths.append(wcur)

        def stage_cond(w_next):
            def cond_s(c):
                p, it = c[0], c[1]
                live = jnp.sum(p.active.astype(jnp.int32))
                return jnp.any(p.active) & (it < max_iters) & \
                    ((it < k_min) | (live > w_next))
            return cond_s

        tm = jax.tree_util.tree_map
        saved = []
        for w_next in widths:
            carry = jax.lax.while_loop(stage_cond(w_next), body, carry)
            path_c, it_c, first_c, lane0_c, s_c, accum_c, rays_c = carry
            perm = jnp.argsort(~path_c.active, stable=True)[:w_next]
            saved.append((perm, path_c, first_c, accum_c))
            carry = (tm(lambda a, p=perm: a[p], path_c), it_c,
                     tm(lambda a, p=perm: a[p], first_c),
                     lane0_c[perm], s_c[perm], accum_c[perm], rays_c)
        carry = jax.lax.while_loop(cond, body, carry)
        path, _, first, _, _, accum, rays = carry
        # unwind narrow results back out through each saved full state
        for perm, path_f, first_f, accum_f in reversed(saved):
            put = lambda full, nar, p=perm: full.at[p].set(nar)
            path = tm(put, path_f, path)
            first = tm(put, first_f, first)
            accum = accum_f.at[perm].set(accum)
        lane0 = perm0.astype(jnp.int32)  # sort "none": never permuted
    else:
        path, _, first, lane0, _, accum, rays = jax.lax.while_loop(
            cond, body, carry)

    def unperm(a):
        return jnp.zeros_like(a).at[lane0].set(a)

    if regen:
        # lanes cut off by the iteration cap contribute their partial
        # sample, matching the non-regen cap behavior
        acc = unperm(accum + jnp.where(path.active[..., None],
                                       path.radiance, 0.0))
        return (acc, rays) if return_ray_stats else acc
    radiance = unperm(path.radiance)
    if fill:
        out = dict(
            committed_diff=unperm(path.sp_committed_diff),
            committed_spec=unperm(path.sp_committed_spec),
            gi_l=unperm(path.sp_gi_l),
            gi_pdf=unperm(path.sp_gi_pdf),
            gi_valid=unperm(path.sp_gi_valid),
            gi_thp=unperm(path.sp_gi_thp),
            ray_stats=rays)
        if capture_first_hit:
            out["first"] = tuple(unperm(a) for a in first)
        return out
    if capture_first_hit:
        first_out = tuple(unperm(a) for a in first)
        return (radiance, first_out, rays) if return_ray_stats \
            else (radiance, first_out)
    return (radiance, rays) if return_ray_stats else radiance


def will_scatter_nee(shade, finished, rr_kill):
    """NEE applies at the pre-scatter vertex even if the scatter itself
    terminates the path; but not past max bounces / RR kill (reference:
    HandleHit returns before NEE when pathStopping)."""
    return shade & ~finished & ~rr_kill
