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


class PathState(NamedTuple):
    """PathState SoA (PathState.hlsli:82-222); unpacked fields in HBM."""
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
        g, u2 = rng.next_2d(g)
        d, pdf, le = EM.sample_uniform(assets.env, u2)
    elif cfg.nee_distant_type == NEE_DISTANT_MIP_DESCENT:
        g, u2 = rng.next_2d(g)
        d, pdf, le = EM.sample_mip_descent(assets.env, u2)
    else:  # presampled
        g, u1 = rng.next_1d(g)
        if assets.env_presampled is None:
            d, pdf, le = EM.sample_mip_descent(
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
                             valid=jnp.any(li > 0.0, axis=-1))


def _distant_pdf(assets: RenderAssets, cfg: PTConfig, d):
    if cfg.nee_distant_type == NEE_DISTANT_UNIFORM:
        return EM.pdf_uniform(assets.env, d)
    return EM.pdf_mip_descent(assets.env, d)


def render_wavefront(assets: RenderAssets, cam: CameraData, px, py,
                     consts: PTConstants, *, cfg: PTConfig,
                     sub_sample_index=0):
    """Trace one sample for every pixel in (px, py); returns radiance (N,3).

    The reference's per-thread `while(path.isActive())` becomes a
    while_loop over whole-wavefront segment iterations."""
    path0 = init_paths(cam, px, py, cfg, consts, sub_sample_index)
    return render_paths(assets, cam, path0, consts, cfg=cfg,
                        sub_sample_index=sub_sample_index)


def render_paths(assets: RenderAssets, cam: CameraData, path0: PathState,
                 consts: PTConstants, *, cfg: PTConfig,
                 sub_sample_index=0, capture_first_hit: bool = False):
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
    max_iters = cfg.max_bounces + K_MAX_REJECTED_HITS + 2

    def sample_gen(path: PathState):
        return rng.make(path.px, path.py,
                        path.vertex_index.astype(jnp.uint32),
                        consts.sample_base_index
                        + jnp.uint32(sub_sample_index))

    def body(carry):
        path, it, first, _ = carry
        hit = traverse.trace_closest(
            assets.bvh, assets.soup, path.origin, path.direction,
            t_min=0.0, t_max=mu.K_MAX_RAY_TRAVEL, active=path.active,
            leaf_size=cfg.leaf_size)
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
        radiance = path.radiance + jnp.where(
            is_miss[..., None], jnp.maximum(path.thp * env_emission, 0.0),
            0.0)

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
        transmittance = jnp.exp(-sigma * hit.t[..., None])
        thp = jnp.where((is_hit & in_medium)[..., None],
                        path.thp * transmittance, path.thp)

        # alpha test (AnyHit / Bridge::AlphaTest equivalent,
        # Sample.hlsl:408-413): MASK-mode materials below the cutoff are
        # treated as rejected hits and the path continues through
        alpha_reject = is_hit & \
            (assets.scene.materials.alpha_mode[sd.material_id] == 1) & \
            (sd.opacity < assets.scene.materials.alpha_cutoff[
                sd.material_id])

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
                           sd.compute_new_ray_origin(jnp.zeros(n, bool)),
                           path.origin)
        vertex_index = vertex_index - can_reject.astype(jnp.int32)
        rejected_hits = path.rejected_hits + can_reject.astype(jnp.int32)
        shade = is_hit & true_int

        # first true-hit capture (secondary-surface export for ReSTIR GI)
        first_pos, first_nrm, first_found = first
        cap = shade & ~first_found
        first = (jnp.where(cap[..., None], sd.pos, first_pos),
                 jnp.where(cap[..., None],
                           jnp.where(sd.front_facing[..., None], sd.face_n,
                                     -sd.face_n), first_nrm),
                 first_found | cap)

        outside_ior = nested.compute_outside_ior(
            path.interior, sd.material_id, sd.front_facing, mat_iors)
        surf = shading.update_outside_ior(surf, outside_ior)
        sd = surf.sd

        # emission with MIS weight (PathTracer.hlsli:456-468)
        surface_emission = surf.emission * path.emissive_mis[..., None]
        surface_emission = mu.firefly_filter(
            surface_emission, consts.firefly_filter_threshold,
            path.firefly_k) * consts.noisy_radiance_attenuation
        radiance = radiance + jnp.where(shade[..., None],
                                        jnp.maximum(thp * surface_emission,
                                                    0.0), 0.0)

        # HasFinishedSurfaceBounces (PathTracer.hlsli:103-109)
        finished = (vertex_index > cfg.max_bounces) | \
            (path.diffuse_bounces > cfg.max_diffuse_bounces)

        g = sample_gen(path._replace(vertex_index=vertex_index))

        # Russian roulette (PathTracer.hlsli:125-149)
        if cfg.enable_russian_roulette:
            g = rng.start_effect(g, rng.EFFECT_RUSSIAN_ROULETTE, False)
            g, u_rr = rng.next_1d(g)
            rr_val = mu.luminance(thp)
            prob = mu.saturate(0.8 - rr_val) ** 4
            rr_kill = u_rr < prob
            thp = jnp.where((shade & ~rr_kill)[..., None],
                            thp / (1.0 - prob)[..., None], thp)
        else:
            rr_kill = jnp.zeros(n, bool)

        pre_scatter_thp = thp
        pre_scatter_firefly_k = path.firefly_k
        will_scatter = shade & ~finished & ~rr_kill

        # --- GenerateScatterRay (PathTracer.hlsli:158-264)
        g = rng.start_effect(
            g, rng.EFFECT_SCATTER_BSDF,
            path.diffuse_bounces < rng.DISABLE_LD_AFTER_DIFFUSE_BOUNCES)
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
                    g, u3l = rng.next_3d(g)
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
                    light_mis_pdf = jnp.full((n,), LOCAL_PDF_ESTIMATE_K)
                scatter_pdf_for_dir = B.bsdf_eval_pdf(
                    bsdf, wi_local, sd.to_local(ls.direction))
                mis = mu.eval_mis(1.0, light_mis_pdf / sample_weight, 1.0,
                                  scatter_pdf_for_dir)
                li = ls.li * (mis * sample_weight)[..., None]
                pdf_for_firefly = ls.pdf / sample_weight
                fd, fs = B.bsdf_eval_split(bsdf, wi_local,
                                           sd.to_local(ls.direction))
                lum = mu.luminance((fd + fs) * li)
                need_ray = will_scatter_nee(shade, finished, rr_kill) & \
                    ls.valid & (lum > consts.nee_min_radiance_threshold)
                nee_k = mu.new_scatter_firefly_filter_k(
                    pre_scatter_firefly_k, cam.pixel_cone_spread_angle,
                    pdf_for_firefly, jnp.ones((n,)))
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
            vis_o = sd.compute_new_ray_origin(jnp.ones(n, bool))
            all_o = jnp.tile(vis_o, (k_total, 1))
            all_d = jnp.concatenate(nee_dirs, axis=0)
            all_t = jnp.concatenate(nee_dists, axis=0) * (1.0 - 1e-4)
            all_act = jnp.concatenate(nee_pdf, axis=0)
            occluded = traverse.trace_anyhit(
                assets.bvh, assets.soup, all_o, all_d, t_min=0.0,
                t_max=all_t, active=all_act, leaf_size=cfg.leaf_size)
            visible = (~occluded).reshape(k_total, n)
            contrib = sum(
                jnp.where(visible[i][..., None], nee_diff[i] + nee_spec[i],
                          0.0) for i in range(k_total))
            contrib = contrib * consts.noisy_radiance_attenuation
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

        new_path = PathState(
            origin=origin, direction=direction, thp=thp, radiance=radiance,
            active=active, vertex_index=vertex_index,
            diffuse_bounces=diffuse_bounces, rejected_hits=rejected_hits,
            scene_length=path.scene_length, firefly_k=firefly_k,
            cone_width=path.cone_width, cone_spread=cone_spread,
            interior=interior, emissive_mis=emissive_mis, env_mis=env_mis,
            px=path.px, py=path.py)

        # --- wavefront stream compaction (the SER equivalent, SURVEY
        # section 2.7): stable-partition live paths to the FRONT of the
        # wavefront so traversal tiles whose lanes are all dead exit
        # their while_loop immediately. Pixel order is restored at the
        # end via `lane0` (original lane ids ride the permutation).
        # Cost: one bool argsort + a ~34-array gather (~0.3 ms at 480k
        # lanes) vs trace cost proportional to live-lane tiles.
        perm = jnp.argsort(~active, stable=True)
        new_path = jax.tree_util.tree_map(lambda a: a[perm], new_path)
        first = jax.tree_util.tree_map(lambda a: a[perm], first)
        lane0 = carry[3][perm]
        return (new_path, it + 1, first, lane0)

    def cond(carry):
        path, it = carry[0], carry[1]
        return jnp.any(path.active) & (it < max_iters)

    first0 = (jnp.zeros((n, 3), jnp.float32),
              jnp.zeros((n, 3), jnp.float32),
              jnp.zeros((n,), bool))
    lane0 = jnp.arange(n, dtype=jnp.int32)
    path, _, first, lane0 = jax.lax.while_loop(
        cond, body, (path0, jnp.asarray(0, jnp.int32), first0, lane0))
    # un-permute back to caller lane order
    radiance = jnp.zeros((n, 3), jnp.float32).at[lane0].set(path.radiance)
    if capture_first_hit:
        first_out = tuple(
            jnp.zeros_like(a).at[lane0].set(a) for a in first)
        return radiance, first_out
    return radiance


def will_scatter_nee(shade, finished, rr_kill):
    """NEE applies at the pre-scatter vertex even if the scatter itself
    terminates the path; but not past max bounces / RR kill (reference:
    HandleHit returns before NEE when pathStopping)."""
    return shade & ~finished & ~rr_kill
