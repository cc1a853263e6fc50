"""Real-time renderer: 1spp + ReSTIR DI + denoiser + TAA + tonemap.

TPU-native re-architecture of the reference's real-time frame
(Sample::Render orchestration, Sample.cpp:1660-2269):

  stable/BUILD pass -> trace_gbuffer (primary surface, plane 0 of the
                       stable-planes decomposition + motion vectors)
  RTXDI BeginFrame/Execute -> restir/di.py candidates/temporal/spatial/
                       final (reservoir feedback across frames)
  FILL pass          -> one BSDF bounce at the primary surface, then the
                       shared wavefront bounce loop (integrator.
                       render_paths) for indirect, NEE at secondary+
                       vertices; primary-vertex direct illumination comes
                       from ReSTIR so next-segment emissive/env MIS
                       weights start at 0 for reflections
                       (PathTracerNEE.hlsli:321-330)
  Denoise            -> denoise/relax.py per channel (diffuse/specular,
                       demodulated by albedo)
  PostProcessAA      -> post/taa.py; tonemap -> post/tonemap.py

The whole GPU frame is two jitted stages; all temporal state (reservoirs,
denoiser history, TAA history, previous camera) is an explicit pytree, so
a frame is a pure function -- checkpointable and reproducible.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as C
from ..core import mathutils as mu
from ..core import rng
from ..denoise import reblur, relax
from ..post import taa as taa_mod
from ..post import tonemap
from ..pt import bsdf as B
from ..pt import gbuffer as GB
from ..pt import integrator, nested
from ..restir import di, gi
from ..restir.reservoir import Reservoir
from ..scene import envmap as EM
from ..scene.camera import CameraData
from .renderer import Renderer, realtime_config, r2_jitter

K_SPEC_ROUGH = integrator.K_SPECULAR_ROUGHNESS_THRESHOLD


class FrameOutputs(NamedTuple):
    color: jnp.ndarray          # (H,W,3) linear, pre-TAA
    di_diffuse: jnp.ndarray
    di_specular: jnp.ndarray
    indirect_diffuse: jnp.ndarray
    indirect_specular: jnp.ndarray
    motion: jnp.ndarray
    normal: jnp.ndarray
    view_z: jnp.ndarray
    diffuse_albedo: jnp.ndarray
    specular_albedo: jnp.ndarray
    roughness: jnp.ndarray
    emission_bg: jnp.ndarray
    psr_thp: jnp.ndarray
    reservoir: Reservoir
    gi_reservoir: gi.GIReservoir
    gb_normal: jnp.ndarray
    gb_view_z: jnp.ndarray


def _pt_frame(assets, cam: CameraData, prev_cam: CameraData,
              prev_res: Optional[Reservoir],
              prev_gi: "Optional[gi.GIReservoir]", prev_gb_normal,
              prev_gb_z, px, py, consts, y0=0, *, cfg: C.PTConfig,
              width: int, height: int, has_prev: bool,
              rows: Optional[int] = None,
              prev_rows: Optional[int] = None):
    """Stage 1 (ray tracing): G-buffer, ReSTIR DI, indirect paths.

    Sharded stage 1 (meshutils.pt_frame_sharded) calls this per shard
    with a row window: y0 = first global row, rows = local rows, and
    prev buffers carrying prev_rows = rows + 2*halo exchanged rows."""
    rows = height if rows is None else rows
    prev_rows = rows if prev_rows is None else prev_rows
    prev_y0 = y0 - (prev_rows - rows) // 2
    n = px.shape[0]
    gb = GB.trace_gbuffer(assets, cam, prev_cam, px, py)
    frame = consts.sample_base_index

    # ---- ReSTIR DI (RtxdiPass::Execute). NOTE: the temporal-stage
    # output (NOT the post-spatial reservoir) is fed back to the next
    # frame, like RTXDI -- feeding back spatially-merged reservoirs
    # creates a self-reinforcing energy loop.
    if cfg.use_restir_di:
        ris = di.presample_lights(assets, frame)
        r = di.generate_candidates(assets, gb, px, py, frame, ris=ris)
        if has_prev and prev_res is not None:
            class _PrevGB(NamedTuple):
                normal: jnp.ndarray
                view_z: jnp.ndarray
            r = di.temporal_resample(assets, gb, r, prev_res,
                                     _PrevGB(prev_gb_normal, prev_gb_z),
                                     px, py, width, height, frame,
                                     y0=y0, rows=rows, prev_y0=prev_y0,
                                     prev_rows=prev_rows)
        r_feedback = r
        r = di.spatial_resample(assets, gb, r, px, py, width, height,
                                frame, y0=y0, rows=rows)
        if not cfg.use_restir_gi:
            di_d, di_s = di.final_shade(assets, gb, r,
                                        exact_alpha=cfg.exact_alpha_test)
        # else: fused DI+GI final below (one batched visibility trace,
        # RtxdiPass::ExecuteFusedDIGIFinal)
    else:
        r_feedback = r = Reservoir.empty(n)
        di_d = jnp.zeros((n, 3))
        di_s = jnp.zeros((n, 3))

    # ---- indirect: one BSDF bounce at the primary surface, then the
    # shared bounce loop (FILL semantics)
    sd = gb.surface.sd
    g = rng.make(px, py, jnp.uint32(1), frame)
    g = rng.start_effect(g, rng.EFFECT_SCATTER_BSDF, True)
    g, u3 = rng.next_3d(g)
    bsdf = B.make_bsdf(gb.surface.bsdf_data,
                       jnp.sum(sd.v * sd.n, -1), sd.thin_surface)
    bs = B.bsdf_sample(bsdf, sd.to_local(sd.v), u3)
    wo_world = sd.from_local(bs.wo)
    is_delta = (bs.lobe & B.LOBE_DELTA) != 0
    is_trans = (bs.lobe & B.LOBE_TRANSMISSION) != 0
    is_refl = (bs.lobe & B.LOBE_REFLECTION) != 0
    rough = jnp.where(bsdf.alpha < B.K_MIN_GGX_ALPHA, 0.0, bsdf.roughness)
    primary_diffuse = is_refl & (((bs.lobe & B.LOBE_DIFFUSE_REFLECTION)
                                  != 0) | (rough > K_SPEC_ROUGH))

    active = gb.valid & bs.valid & jnp.any(bs.weight > 0.0, -1)
    interior = gb.interior  # nested stack after the PSR delta chain
    do_int = active & is_trans & ~sd.thin_surface
    interior = jnp.where(
        do_int[..., None],
        nested.handle_intersection(interior, sd.material_id,
                                   sd.nested_priority, sd.front_facing),
        interior)
    # ReSTIR DI covers primary direct lighting for non-delta REFLECTION
    # lobes only: di.final_shade offsets its visibility rays to the view
    # side of the surface, so reservoir samples for a transmitted lobe
    # would self-occlude against the primary surface and contribute ~0
    # (energy loss). The reference likewise keeps transmission out of
    # RTXDI coverage; rough-transmission primaries take direct light via
    # the continuation's BSDF-sampled emissive/env MIS instead
    # (PathTracerNEE.hlsli:321-330). Delta lobes evaluate to zero under
    # light sampling, so mirror/glass keep their BSDF-sampled
    # contribution too.
    restir_covers = jnp.asarray(cfg.use_restir_di) & ~is_delta & ~is_trans
    mis0 = jnp.where(restir_covers, 0.0, 1.0)
    cone_spread = jnp.where(
        is_delta, cam.pixel_cone_spread_angle,
        cam.pixel_cone_spread_angle
        + mu.spread_angle_from_scatter_pdf(jnp.maximum(bs.pdf, 1e-8)))
    path0 = integrator.PathState(
        origin=sd.compute_new_ray_origin(is_refl),
        direction=wo_world,
        thp=bs.weight,
        radiance=jnp.zeros((n, 3)),
        active=active,
        vertex_index=jnp.ones((n,), jnp.int32),
        diffuse_bounces=primary_diffuse.astype(jnp.int32),
        rejected_hits=jnp.zeros((n,), jnp.int32),
        scene_length=gb.t,
        firefly_k=mu.new_scatter_firefly_filter_k(
            jnp.ones((n,)), cam.pixel_cone_spread_angle, bs.pdf,
            bs.lobe_p),
        cone_width=gb.t * cam.pixel_cone_spread_angle,
        cone_spread=cone_spread,
        interior=interior,
        emissive_mis=mis0,
        env_mis=mis0,
        px=px, py=py)
    # unit initial throughput: the loop returns Lo(secondary->primary);
    # composition applies either bs.weight (plain PT) or the ReSTIR GI
    # reservoir weight (GenerateScatterRay pdf split,
    # PathTracer.hlsli:170-175)
    path0 = path0._replace(thp=jnp.ones((n, 3), jnp.float32))
    lo, (sec_pos, sec_nrm, sec_found) = integrator.render_paths(
        assets, cam, path0, consts, cfg=cfg, capture_first_hit=True)

    plain_ind = bs.weight * lo
    gi_eligible = (active & sec_found & ~is_delta & ~is_trans
                   & (bs.pdf > 0.0) & jnp.asarray(cfg.use_restir_gi))
    if cfg.use_restir_gi:
        gr = gi.make_initial(gb, sec_pos, sec_nrm,
                             gi_eligible, lo, bs.pdf)
        if has_prev and prev_gi is not None:
            gr = gi.temporal_resample(gb, gr, prev_gi, prev_gb_normal,
                                      prev_gb_z, px, py, width, height,
                                      frame, y0=y0, rows=rows,
                                      prev_y0=prev_y0,
                                      prev_rows=prev_rows)
        gi_feedback = gr
        gr = gi.spatial_resample(gb, gr, px, py, width, height, frame,
                                 y0=y0, rows=rows)
        if cfg.use_restir_di:
            di_d, di_s, gi_d, gi_s = di.fused_final_shade(
                assets, gb, r, gr, exact_alpha=cfg.exact_alpha_test)
        else:
            gi_d, gi_s = gi.final_shade(
                assets, gb, gr, exact_alpha=cfg.exact_alpha_test)
        ind_d = jnp.where(gi_eligible[..., None], gi_d,
                          jnp.where((primary_diffuse
                                     | ~gb.valid)[..., None],
                                    plain_ind, 0.0))
        ind_s = jnp.where(gi_eligible[..., None], gi_s,
                          jnp.where((primary_diffuse
                                     | ~gb.valid)[..., None], 0.0,
                                    plain_ind))
    else:
        gi_feedback = gi.GIReservoir.empty(n)
        ind_d = jnp.where((primary_diffuse | ~gb.valid)[..., None],
                          plain_ind, 0.0)
        ind_s = jnp.where((primary_diffuse | ~gb.valid)[..., None], 0.0,
                          plain_ind)

    # ---- background + primary emission; sky seen through a PSR delta
    # chain is attenuated by the chain throughput
    env_bg = jnp.where(gb.valid[..., None], 0.0,
                       gb.psr_thp * EM.eval_dir(assets.env, gb.view_dir))
    emission_bg = gb.emission + env_bg

    shp = (rows, width)
    r3 = lambda a: a.reshape(shp + (3,))
    r1 = lambda a: a.reshape(shp)
    return FrameOutputs(
        color=jnp.zeros(shp + (3,)),
        di_diffuse=r3(di_d), di_specular=r3(di_s),
        indirect_diffuse=r3(ind_d), indirect_specular=r3(ind_s),
        motion=gb.motion.reshape(shp + (2,)),
        normal=r3(gb.normal), view_z=r1(gb.view_z),
        diffuse_albedo=r3(gb.diffuse_albedo),
        specular_albedo=r3(gb.specular_albedo),
        roughness=r1(gb.roughness),
        emission_bg=r3(emission_bg), psr_thp=r3(gb.psr_thp),
        reservoir=r_feedback, gi_reservoir=gi_feedback,
        gb_normal=gb.normal, gb_view_z=gb.view_z)


def _pt_frame_stable(assets, cam: CameraData, prev_cam: CameraData,
                     prev_res: Optional[Reservoir],
                     prev_gi: "Optional[gi.GIReservoir]", prev_gb_normal,
                     prev_gb_z, px, py, consts, y0=0, *,
                     cfg: C.PTConfig,
                     width: int, height: int, has_prev: bool,
                     rows: Optional[int] = None,
                     prev_rows: Optional[int] = None):
    """Stage 1 with the full stable-planes decomposition:
    BUILD (delta tree -> up to P planes) -> ReSTIR DI/GI on the dominant
    plane -> FILL (noisy paths deposit per-plane diff/spec radiance).
    Mirrors Sample::PathTrace + RtxdiPass::Execute (Sample.cpp:2281-2384).

    y0/rows/prev_rows: see _pt_frame — the sharded stage 1 row window.
    """
    import dataclasses

    rows = height if rows is None else rows
    prev_rows = rows if prev_rows is None else prev_rows
    prev_y0 = y0 - (prev_rows - rows) // 2

    from ..ops.intersect import Hit
    from ..pt import shading, stableplanes as SPM

    n = px.shape[0]
    P = cfg.stable_plane_count
    sp = SPM.build_stable_planes(
        assets, cam, prev_cam, px, py, plane_count=P,
        max_vertex_depth=cfg.max_stable_plane_vertex_depth,
        compaction=cfg.wavefront_compaction,
        compaction_min=cfg.wavefront_compaction_min)
    dom = sp.dominant

    def dsel(arr):
        idx = dom.reshape((n,) + (1,) * (arr.ndim - 1))
        return jnp.take_along_axis(arr, idx, axis=1)[:, 0]

    d_prim = dsel(sp.prim)
    d_bary = dsel(sp.bary)
    d_dir = dsel(sp.ray_dir)
    surf_d = shading.load_surface(assets.scene, jnp.maximum(d_prim, 0),
                                  d_bary, d_dir)
    d_valid = d_prim >= 0
    # dominant-plane G-buffer: the RTXDI SurfaceData export
    # (ExportVisibilityBuffer.hlsl reading the dominant plane)
    gb = GB.GBuffer(
        valid=d_valid, prim=d_prim, bary=d_bary, t=dsel(sp.scene_length),
        pos=surf_d.sd.pos, normal=surf_d.sd.n,
        face_normal=surf_d.sd.face_n, view_z=dsel(sp.view_z),
        roughness=dsel(sp.roughness),
        diffuse_albedo=dsel(sp.diff_est),
        specular_albedo=dsel(sp.spec_est),
        emission=jnp.zeros((n, 3)), motion=dsel(sp.motion),
        view_dir=d_dir, psr_thp=dsel(sp.thp), interior=dsel(sp.interior),
        surface=surf_d)
    frame = consts.sample_base_index

    # ---- ReSTIR DI on the dominant plane
    if cfg.use_restir_di:
        ris = di.presample_lights(assets, frame)
        r = di.generate_candidates(assets, gb, px, py, frame, ris=ris)
        if has_prev and prev_res is not None:
            class _PrevGB(NamedTuple):
                normal: jnp.ndarray
                view_z: jnp.ndarray
            r = di.temporal_resample(assets, gb, r, prev_res,
                                     _PrevGB(prev_gb_normal, prev_gb_z),
                                     px, py, width, height, frame,
                                     y0=y0, rows=rows, prev_y0=prev_y0,
                                     prev_rows=prev_rows)
        r_feedback = r
        r = di.spatial_resample(assets, gb, r, px, py, width, height,
                                frame, y0=y0, rows=rows)
        if not cfg.use_restir_gi:
            di_d, di_s = di.final_shade(assets, gb, r,
                                        exact_alpha=cfg.exact_alpha_test)
        # else: fused DI+GI final below (ExecuteFusedDIGIFinal)
    else:
        r_feedback = Reservoir.empty(n)
        di_d = jnp.zeros((n, 3))
        di_s = jnp.zeros((n, 3))

    # ---- FILL pass from the plane-0 base (firstHitFromBasePlane)
    fill_cfg = dataclasses.replace(cfg, mode=C.MODE_FILL_STABLE_PLANES)
    z1 = jnp.zeros((n,), jnp.float32)
    z3 = jnp.zeros((n, 3), jnp.float32)
    z4 = jnp.zeros((n, 4), jnp.float32)
    base_valid = sp.prim[:, 0] >= 0
    path0 = integrator.PathState(
        origin=jnp.zeros((n, 3)), direction=sp.ray_dir[:, 0],
        thp=sp.thp[:, 0], radiance=z3, active=base_valid,
        vertex_index=sp.vertex_index[:, 0] - 1,
        diffuse_bounces=jnp.zeros((n,), jnp.int32),
        rejected_hits=jnp.zeros((n,), jnp.int32),
        scene_length=z1, firefly_k=jnp.ones((n,)),
        cone_width=z1,
        cone_spread=jnp.broadcast_to(cam.pixel_cone_spread_angle, (n,)),
        interior=sp.interior[:, 0],
        emissive_mis=jnp.ones((n,)), env_mis=jnp.ones((n,)),
        px=px, py=py,
        sp_branch=sp.branch_id[:, 0],
        sp_plane=jnp.zeros((n,), jnp.int32),
        sp_on_plane=base_valid,
        sp_on_branch=base_valid,
        sp_on_dominant=dom == 0,
        sp_base_diff=jnp.zeros((n,), bool),
        sp_base_delta=jnp.zeros((n,), bool),
        sp_gi_l=z3, sp_gi_pdf=z1,
        sp_gi_valid=jnp.zeros((n,), bool), sp_gi_thp=jnp.ones((n, 3)),
        sp_delta_only=jnp.ones((n,), bool),
        sp_bounces=jnp.zeros((n,), jnp.int32), sp_hit_t=z1,
        sp_pend_diff=z4, sp_pend_spec=z4, sp_secondary_l=z3,
        sp_committed_diff=jnp.zeros((n, P, 4)),
        sp_committed_spec=jnp.zeros((n, P, 4)),
        sp_plane_branch=sp.branch_id, sp_dominant=dom)
    injected = Hit(t=sp.scene_length[:, 0], prim=sp.prim[:, 0],
                   bary=sp.bary[:, 0])
    fill = integrator.render_paths(
        assets, cam, path0, consts, cfg=fill_cfg,
        capture_first_hit=cfg.use_restir_gi, injected_hit=injected)

    committed_diff = fill["committed_diff"]          # (N,P,4)
    committed_spec = fill["committed_spec"]

    # ---- ReSTIR GI on the dominant plane
    if cfg.use_restir_gi:
        sec_pos, sec_nrm, sec_found = fill["first"]
        lo = fill["gi_l"] / jnp.maximum(fill["gi_thp"], 1e-6)
        gi_ok = fill["gi_valid"] & sec_found
        gr = gi.make_initial(gb, sec_pos, sec_nrm, gi_ok, lo,
                             fill["gi_pdf"])
        if has_prev and prev_gi is not None:
            gr = gi.temporal_resample(gb, gr, prev_gi, prev_gb_normal,
                                      prev_gb_z, px, py, width, height,
                                      frame, y0=y0, rows=rows,
                                      prev_y0=prev_y0,
                                      prev_rows=prev_rows)
        gi_feedback = gr
        gr = gi.spatial_resample(gb, gr, px, py, width, height, frame,
                                 y0=y0, rows=rows)
        if cfg.use_restir_di:
            di_d, di_s, gi_d, gi_s = di.fused_final_shade(
                assets, gb, r, gr, exact_alpha=cfg.exact_alpha_test)
        else:
            gi_d, gi_s = gi.final_shade(
                assets, gb, gr, exact_alpha=cfg.exact_alpha_test)
    else:
        gi_feedback = gi.GIReservoir.empty(n)
        gi_d = jnp.zeros((n, 3))
        gi_s = jnp.zeros((n, 3))

    # fold ReSTIR DI/GI radiance (at the dominant base, thp-weighted like
    # the committed channels) into the dominant plane's channels
    dom_oh = jnp.arange(P)[None, :] == dom[:, None]           # (N,P)
    thp_dom = dsel(sp.thp)
    add_d = (di_d + gi_d) * thp_dom
    add_s = (di_s + gi_s) * thp_dom
    hit_td = dsel(sp.view_z)
    committed_diff = jnp.where(
        dom_oh[..., None],
        SPM.combine_hit_t(committed_diff, add_d[:, None] *
                          jnp.ones((1, P, 1)), hit_td[:, None]),
        committed_diff)
    committed_spec = jnp.where(
        dom_oh[..., None],
        SPM.combine_hit_t(committed_spec, add_s[:, None] *
                          jnp.ones((1, P, 1)), hit_td[:, None]),
        committed_spec)

    # hitT-based specular virtual reprojection (NRD virtual motion): a
    # mirror-like surface's specular history lives at the REFLECTED
    # point; reproject pos + viewDir*hitT with the previous camera and
    # blend toward plain surface motion as roughness grows
    spec_hit_t = committed_spec[..., 3]                      # (N,P)
    virt_pos = sp.pos + sp.ray_dir * spec_hit_t[..., None]
    prev_xy_virt, _ = GB.project_to_screen(prev_cam, virt_pos)
    cur_xy = jnp.stack([px.astype(jnp.float32),
                        py.astype(jnp.float32)], -1)[:, None, :]
    virt_motion = prev_xy_virt - cur_xy
    w_virt = jnp.clip(1.0 - sp.roughness * 4.0, 0.0, 1.0) * \
        (spec_hit_t > 0.0)
    spec_motion = sp.motion + (virt_motion - sp.motion) * \
        w_virt[..., None]

    return (sp, committed_diff, committed_spec, spec_motion, r_feedback,
            gi_feedback, gb.normal, gb.view_z)


def _post_frame_stable(sp, committed_diff, committed_spec, spec_motion,
                       den_states, taa_state, *, width: int, height: int,
                       use_den: bool, use_taa: bool,
                       method: str = "relax"):
    """Stage 2 for stable planes: per-plane demodulate -> denoise ->
    remodulate -> merge (+stable radiance) -> TAA. Mirrors
    Sample::Denoise (Sample.cpp:2398-2440) + PostProcess final merge."""
    from ..pt import stableplanes as SPM

    P = committed_diff.shape[1]
    shp = (height, width)
    eps = 1e-3
    color = sp.stable_radiance.reshape(shp + (3,))
    new_den = []
    plane_diff_out = []      # per-plane (de)noised remodulated radiance
    plane_spec_out = []      # (debug views StablePlane*RadianceDenoised)
    # dominant-plane motion drives TAA; per-plane motion drives denoising
    for p in range(P):
        d_in = (committed_diff[:, p, :3]
                / jnp.maximum(sp.diff_est[:, p], eps)).reshape(shp + (3,))
        s_in = (committed_spec[:, p, :3]
                / jnp.maximum(sp.spec_est[:, p], eps)).reshape(shp + (3,))
        normal = sp.normal[:, p].reshape(shp + (3,))
        view_z = sp.view_z[:, p].reshape(shp)
        motion = sp.motion[:, p].reshape(shp + (2,))
        valid = (sp.branch_id[:, p]
                 != SPM.INVALID_BRANCH).reshape(shp)
        if use_den:
            dd, ds = den_states[p]
            den = reblur if method == "reblur" else relax
            extra_d = {}
            extra_s = {}
            if method == "reblur":
                # hit-distance channel drives the ReBLUR kernel radius
                extra_d = dict(hit_t=committed_diff[:, p, 3].reshape(shp))
                extra_s = dict(hit_t=committed_spec[:, p, 3].reshape(shp))
            d_f, dd = den.denoise(dd, d_in, normal, view_z, motion,
                                  **extra_d)
            s_f, ds = den.denoise(ds, s_in, normal, view_z,
                                  spec_motion[:, p].reshape(shp + (2,)),
                                  roughness=sp.roughness[:, p].reshape(
                                      shp), iterations=3, **extra_s)
            new_den.append((dd, ds))
        else:
            d_f, s_f = d_in, s_in
            new_den.append(den_states[p] if den_states else None)
        pd = jnp.where(valid[..., None],
                       d_f * sp.diff_est[:, p].reshape(shp + (3,)), 0.0)
        ps = jnp.where(valid[..., None],
                       s_f * sp.spec_est[:, p].reshape(shp + (3,)), 0.0)
        plane_diff_out.append(pd)
        plane_spec_out.append(ps)
        color = color + pd + ps
    if use_taa:
        dom_oh = (jnp.arange(P)[None, :] == sp.dominant[:, None])
        motion_dom = jnp.sum(sp.motion * dom_oh[..., None],
                             axis=1).reshape(shp + (2,))
        relax_mask = None
        if use_den and new_den and new_den[0] is not None:
            # dominant-plane diffuse history drives the clamp relax;
            # plane 0 approximates dominant (it exists for every pixel)
            relax_mask = jnp.clip(2.0 - new_den[0][0].history, 0.0, 1.0)
        color, taa_state = taa_mod.resolve(taa_state, color, motion_dom,
                                           relax_mask=relax_mask)
    plane_out = (jnp.stack(plane_diff_out), jnp.stack(plane_spec_out))
    return color, new_den, taa_state, plane_out


def _post_frame(out: FrameOutputs, den_diff, den_spec, taa_state, *,
                use_den: bool, use_taa: bool, method: str = "relax"):
    """Stage 2 (post pipeline): demodulate, denoise (ReLAX), compose,
    TAA. Pure function of (frame outputs, temporal states)."""
    eps = 1e-3
    diff_in = (out.di_diffuse + out.indirect_diffuse) / \
        jnp.maximum(out.diffuse_albedo, eps)
    spec_in = (out.di_specular + out.indirect_specular) / \
        jnp.maximum(out.specular_albedo, eps)
    relax_mask = None
    if use_den:
        den = reblur if method == "reblur" else relax
        diff_f, den_diff = den.denoise(den_diff, diff_in, out.normal,
                                       out.view_z, out.motion)
        spec_f, den_spec = den.denoise(den_spec, spec_in, out.normal,
                                       out.view_z, out.motion,
                                       roughness=out.roughness,
                                       iterations=3)
        # disocclusion/history-reset signal -> TAA clamp relax
        relax_mask = jnp.clip(2.0 - den_diff.history, 0.0, 1.0)
    else:
        diff_f, spec_f = diff_in, spec_in
    color = out.emission_bg + out.psr_thp * (
        diff_f * out.diffuse_albedo + spec_f * out.specular_albedo)
    if use_taa:
        color, taa_state = taa_mod.resolve(taa_state, color, out.motion,
                                           relax_mask=relax_mask)
    return color, den_diff, den_spec, taa_state


class RealtimeRenderer(Renderer):
    """Stateful frame-loop driver (DeviceManager::RunMessageLoop +
    Sample::Render equivalents)."""

    def __init__(self, host_scene, camera, cfg: Optional[C.PTConfig] = None,
                 mesh=None, **kw):
        """mesh: optional jax.sharding.Mesh — when it spans >1 device the
        post pipeline (denoise+TAA) runs row-sharded with halo exchange
        (parallel/meshutils.denoise_taa_sharded)."""
        # reference realtime default: 3-plane stable-planes decomposition
        # (RTXPT/PathTracer/Config.h:81); PSR-lite single-plane G-buffer
        # remains available via use_stable_planes=False
        cfg = cfg or realtime_config(use_restir_di=True,
                                     use_restir_gi=True,
                                     denoiser_enabled=True,
                                     use_stable_planes=True)
        super().__init__(host_scene, camera, cfg, **kw)
        self.mesh = mesh
        self.frame_index = 0
        self.prev_cam = camera
        self.prev_reservoir = None
        self.prev_gi = None
        self.prev_gb_normal = None
        self.prev_gb_z = None
        self.den_diff = None
        self.den_spec = None
        self.den_states = None     # stable-planes: per-plane (diff, spec)
        self.taa_state = None
        self.taau_state = None     # display-res upscaler history
        self._frame_jit = None
        self._post_jit = {}
        # debug-view sources (ShaderDebug): the PSR-lite path fills
        # last_outputs, the stable-planes path fills last_stable_planes
        self.last_outputs = None
        self.last_stable_planes = None
        self.last_plane_radiance = None    # (cdiff, cspec) (N,P,4)
        self.last_plane_denoised = None    # (P,H,W,3) diff/spec stacks

    def _shard_stage1(self, height: int) -> bool:
        """Stage 1 shards over the mesh when the rows divide evenly
        (pt_frame_sharded); otherwise it stays single-device and only
        post shards (the round-2 behavior)."""
        return (self.mesh is not None and self.mesh.devices.size > 1
                and height % self.mesh.devices.size == 0)

    def _stage1_tile_rows(self, width: int, height: int):
        """Single-device row tiling (VERDICT r3 next #1): at 1080p the
        2M-lane stage-1 program crashes the tunnel's tpu_compile_helper,
        so the frame runs as T sequential row-tile dispatches reusing ONE
        compiled program (the same y0/rows row-window contract the
        sharded stage 1 uses). Returns rows-per-tile, or None to run the
        whole frame as one program."""
        import os
        limit = int(os.environ.get("RTXPT_STAGE1_TILE_PIXELS",
                                   str(1 << 19)))
        if width * height <= limit:
            return None
        for t in range(2, height + 1):
            if height % t == 0 and (height // t) * width <= limit:
                return height // t
        return 1

    def _stage1_tiled(self, kind: str, rows: int, width: int, height: int,
                      cam, px, py, consts, has_prev, gbn, gbz):
        """Run stage 1 as height/rows sequential row-tile dispatches of
        one compiled program. Prev-frame temporal buffers are padded by
        STAGE1_HALO clamp rows so every tile sees the same
        (prev_y0 = y0-halo, prev_rows = rows+2*halo) window the sharded
        path provides; window_flat clamps reads to valid global rows, so
        pad content outside the frame is never consumed. Tiles dispatch
        asynchronously, so trace/ReSTIR work pipelines across tiles."""
        from ..parallel.meshutils import STAGE1_HALO
        halo = min(STAGE1_HALO, max(rows - 1, 1))
        fn = _pt_frame if kind == "psr" else _pt_frame_stable
        key = (kind + "_tiled", rows, width, height, has_prev, halo)
        if key not in self._frame_jit:
            self._frame_jit[key] = jax.jit(functools.partial(
                fn, cfg=self.cfg, width=width, height=height,
                has_prev=has_prev, rows=rows,
                prev_rows=rows + 2 * halo))
        jfn = self._frame_jit[key]

        def pad_full(a):
            if a is None or not hasattr(a, "ndim"):
                return a
            img = a.reshape((height, width) + a.shape[1:])
            top = jnp.repeat(img[:1], halo, 0)
            bot = jnp.repeat(img[-1:], halo, 0)
            return jnp.concatenate([top, img, bot], 0).reshape(
                (-1,) + a.shape[1:])

        tm = jax.tree_util.tree_map
        prev_res = tm(pad_full, self.prev_reservoir)
        prev_gi = tm(pad_full, self.prev_gi)
        gbn_p = pad_full(gbn)
        gbz_p = pad_full(gbz)
        outs = []
        for t in range(height // rows):
            y0 = t * rows
            sl = slice(y0 * width, (y0 + rows) * width)
            # padded row 0 is global row -halo, so the window starts at
            # padded row y0 (= global y0 - halo)
            psl = slice(y0 * width, (y0 + rows + 2 * halo) * width)
            win = lambda a: a[psl] if hasattr(a, "ndim") else a
            outs.append(jfn(
                self.assets, cam, self.prev_cam, tm(win, prev_res),
                tm(win, prev_gi), win(gbn_p), win(gbz_p),
                px[sl], py[sl], consts, jnp.asarray(y0, jnp.int32)))
        return tm(lambda *xs: jnp.concatenate(xs, axis=0), *outs)

    def render_frame(self, width: int, height: int,
                     camera: Optional[CameraData] = None,
                     denoise: Optional[bool] = None,
                     taa: bool = True,
                     display_size: Optional[tuple] = None):
        """Render one frame at (width, height); when `display_size`
        = (Wd, Hd) is given, the frame is temporally upscaled to display
        resolution by the TAAU slot (the DLSS-slot contract: render size
        != display size, Sample.cpp:1733-1781)."""
        cam = camera or self.camera
        jit = r2_jitter(self.frame_index) if self.cfg.realtime_noise \
            else (0.0, 0.0)
        cam = cam._replace(jitter=jnp.asarray(jit, jnp.float32),
                           viewport=jnp.asarray([width, height],
                                                jnp.float32))
        px, py = self._pixel_grid(width, height)
        consts = C.default_constants(sample_base_index=self.frame_index)
        has_prev = self.prev_reservoir is not None
        if self._frame_jit is None:
            self._frame_jit = {}
        taa = taa and display_size is None   # TAAU replaces TAA
        if self.cfg.use_stable_planes:
            color = self._render_frame_stable(width, height, cam, px, py,
                                              consts, has_prev, denoise,
                                              taa)
            if display_size is not None:
                sp = self.last_stable_planes
                P = self.cfg.stable_plane_count
                dom_oh = (jnp.arange(P)[None, :]
                          == sp.dominant[:, None])
                motion = jnp.sum(sp.motion * dom_oh[..., None],
                                 axis=1).reshape(height, width, 2)
                color = self._apply_taau(color, motion, display_size,
                                         jit)
            return color
        gbn = self.prev_gb_normal if has_prev else \
            jnp.zeros((width * height, 3))
        gbz = self.prev_gb_z if has_prev else \
            jnp.zeros((width * height,))
        tile_rows = self._stage1_tile_rows(width, height)
        if self._shard_stage1(height):
            from ..parallel import meshutils
            out = meshutils.pt_frame_sharded(
                self.mesh, "psr", self.cfg, self.assets, cam,
                self.prev_cam, self.prev_reservoir, self.prev_gi,
                gbn, gbz, px, py, consts, width=width, height=height,
                has_prev=has_prev)
        elif tile_rows is not None:
            out = self._stage1_tiled("psr", tile_rows, width, height,
                                     cam, px, py, consts, has_prev,
                                     gbn, gbz)
        else:
            key = (width, height, has_prev)
            if key not in self._frame_jit:
                self._frame_jit[key] = jax.jit(functools.partial(
                    _pt_frame, cfg=self.cfg, width=width, height=height,
                    has_prev=has_prev))
            out = self._frame_jit[key](
                self.assets, cam, self.prev_cam, self.prev_reservoir,
                self.prev_gi, gbn, gbz, px, py, consts)

        # ---- stage 2: denoise + compose + TAA (post pipeline)
        use_den = self.cfg.denoiser_enabled if denoise is None else denoise
        if self.mesh is not None and self.mesh.devices.size > 1 and \
                use_den:
            # multi-chip: row-sharded post with halo exchange
            color, self.den_diff, self.den_spec, self.taa_state = \
                self._post_sharded(out, taa)
        else:
            # stage 2 fused into one jit (PostProcess + Denoise + TAA):
            # one device dispatch instead of ~10 (the axon tunnel
            # charges per dispatch)
            post_key = (width, height, use_den, taa,
                        self.den_diff is not None,
                        self.taa_state is not None)
            if post_key not in self._post_jit:
                self._post_jit[post_key] = jax.jit(functools.partial(
                    _post_frame, use_den=use_den, use_taa=taa,
                    method=self.cfg.denoiser_method))
            color, self.den_diff, self.den_spec, self.taa_state = \
                self._post_jit[post_key](out, self.den_diff,
                                         self.den_spec, self.taa_state)

        # feedback state
        self.last_outputs = out  # debug-view source (ShaderDebug views)
        self.prev_cam = cam
        self.prev_reservoir = out.reservoir
        self.prev_gi = out.gi_reservoir
        self.prev_gb_normal = out.gb_normal
        self.prev_gb_z = out.gb_view_z
        self.frame_index += 1
        if display_size is not None:
            color = self._apply_taau(
                color, out.motion, display_size, jit)
        return color

    def _post_sharded(self, out: FrameOutputs, taa: bool):
        """Multi-chip post: demodulate, then halo-exchanged sharded
        denoise per channel, compose, sharded TAA (the production
        consumer of parallel/halo.py)."""
        from ..parallel import meshutils
        eps = 1e-3
        diff_in = (out.di_diffuse + out.indirect_diffuse) / \
            jnp.maximum(out.diffuse_albedo, eps)
        spec_in = (out.di_specular + out.indirect_specular) / \
            jnp.maximum(out.specular_albedo, eps)
        diff_f, den_diff, _ = meshutils.denoise_taa_sharded(
            self.mesh, self.den_diff, None, diff_in, out.normal,
            out.view_z, out.motion, use_taa=False)
        spec_f, den_spec, _ = meshutils.denoise_taa_sharded(
            self.mesh, self.den_spec, None, spec_in, out.normal,
            out.view_z, out.motion, roughness=out.roughness,
            iterations=3, use_taa=False)
        color = out.emission_bg + out.psr_thp * (
            diff_f * out.diffuse_albedo + spec_f * out.specular_albedo)
        taa_state = self.taa_state
        if taa:
            from ..post import taa as taa_mod
            if taa_state is None:
                taa_state = taa_mod.TAAState(
                    history=jnp.zeros_like(color),
                    valid=jnp.asarray(False))
            color, taa_state = taa_mod.resolve(taa_state, color,
                                               out.motion)
        return color, den_diff, den_spec, taa_state

    def _post_sharded_stable(self, sp, committed_diff, committed_spec,
                             spec_motion, width, height, taa):
        """Multi-chip stage 2 for the stable-planes pipeline: each
        plane's diffuse/specular channels run the halo-exchanged sharded
        denoiser (parallel/meshutils.denoise_taa_sharded); merge + TAA
        stay local (cheap single-pixel-stencil work)."""
        from ..parallel import meshutils
        from ..pt import stableplanes as SPM
        P = self.cfg.stable_plane_count
        shp = (height, width)
        eps = 1e-3
        color = sp.stable_radiance.reshape(shp + (3,))
        new_den = []
        for p in range(P):
            d_in = (committed_diff[:, p, :3]
                    / jnp.maximum(sp.diff_est[:, p], eps)
                    ).reshape(shp + (3,))
            s_in = (committed_spec[:, p, :3]
                    / jnp.maximum(sp.spec_est[:, p], eps)
                    ).reshape(shp + (3,))
            normal = sp.normal[:, p].reshape(shp + (3,))
            view_z = sp.view_z[:, p].reshape(shp)
            motion = sp.motion[:, p].reshape(shp + (2,))
            dd, ds = self.den_states[p]
            d_f, dd, _ = meshutils.denoise_taa_sharded(
                self.mesh, dd, None, d_in, normal, view_z, motion,
                use_taa=False)
            s_f, ds, _ = meshutils.denoise_taa_sharded(
                self.mesh, ds, None, s_in, normal, view_z,
                spec_motion[:, p].reshape(shp + (2,)),
                roughness=sp.roughness[:, p].reshape(shp),
                iterations=3, use_taa=False)
            new_den.append((dd, ds))
            valid = (sp.branch_id[:, p]
                     != SPM.INVALID_BRANCH).reshape(shp)
            plane_col = d_f * sp.diff_est[:, p].reshape(shp + (3,)) \
                + s_f * sp.spec_est[:, p].reshape(shp + (3,))
            color = color + jnp.where(valid[..., None], plane_col, 0.0)
        self.den_states = new_den
        if taa:
            dom_oh = (jnp.arange(P)[None, :] == sp.dominant[:, None])
            motion_dom = jnp.sum(sp.motion * dom_oh[..., None],
                                 axis=1).reshape(shp + (2,))
            if self.taa_state is None:
                self.taa_state = taa_mod.TAAState(
                    history=jnp.zeros_like(color),
                    valid=jnp.asarray(False))
            color, self.taa_state = taa_mod.resolve(self.taa_state,
                                                    color, motion_dom)
        return color

    def _apply_taau(self, color, motion, display_size, jitter):
        """DLSS-slot upscaler: render-res color -> display-res output."""
        from ..post import taau
        key = ("taau", color.shape, tuple(display_size),
               self.taau_state is not None)
        if key not in self._post_jit:
            self._post_jit[key] = jax.jit(functools.partial(
                taau.resolve, display_size=tuple(display_size)))
        out, self.taau_state = self._post_jit[key](
            self.taau_state, color, motion,
            jitter=jnp.asarray(jitter, jnp.float32))
        return out

    def _render_frame_stable(self, width, height, cam, px, py, consts,
                             has_prev, denoise, taa):
        """Frame driver for the 3-plane stable-planes pipeline."""
        n = width * height
        gbn = self.prev_gb_normal if has_prev else jnp.zeros((n, 3))
        gbz = self.prev_gb_z if has_prev else jnp.zeros((n,))
        tile_rows = self._stage1_tile_rows(width, height)
        if self._shard_stage1(height):
            from ..parallel import meshutils
            (sp, cdiff, cspec, smot, r_fb, gi_fb, gb_normal, gb_z) = \
                meshutils.pt_frame_sharded(
                    self.mesh, "stable", self.cfg, self.assets, cam,
                    self.prev_cam, self.prev_reservoir, self.prev_gi,
                    gbn, gbz, px, py, consts, width=width,
                    height=height, has_prev=has_prev)
        elif tile_rows is not None:
            (sp, cdiff, cspec, smot, r_fb, gi_fb, gb_normal, gb_z) = \
                self._stage1_tiled("stable", tile_rows, width, height,
                                   cam, px, py, consts, has_prev,
                                   gbn, gbz)
        else:
            key = ("sp", width, height, has_prev)
            if key not in self._frame_jit:
                self._frame_jit[key] = jax.jit(functools.partial(
                    _pt_frame_stable, cfg=self.cfg, width=width,
                    height=height, has_prev=has_prev))
            (sp, cdiff, cspec, smot, r_fb, gi_fb, gb_normal, gb_z) = \
                self._frame_jit[key](
                    self.assets, cam, self.prev_cam, self.prev_reservoir,
                    self.prev_gi, gbn, gbz, px, py, consts)

        use_den = self.cfg.denoiser_enabled if denoise is None else denoise
        P = self.cfg.stable_plane_count
        if self.den_states is None:
            self.den_states = [(None, None)] * P
        if self.mesh is not None and self.mesh.devices.size > 1 and \
                use_den:
            color = self._post_sharded_stable(sp, cdiff, cspec, smot,
                                              width, height, taa)
            self.last_plane_radiance = (cdiff, cspec)
            self.last_stable_planes = sp
            self.prev_cam = cam
            self.prev_reservoir = r_fb
            self.prev_gi = gi_fb
            self.prev_gb_normal = gb_normal
            self.prev_gb_z = gb_z
            self.frame_index += 1
            return color
        post_key = ("sp", width, height, use_den, taa,
                    self.den_states[0][0] is not None,
                    self.taa_state is not None)
        if post_key not in self._post_jit:
            self._post_jit[post_key] = jax.jit(functools.partial(
                _post_frame_stable, width=width, height=height,
                use_den=use_den, use_taa=taa,
                method=self.cfg.denoiser_method))
        (color, self.den_states, self.taa_state,
         self.last_plane_denoised) = self._post_jit[post_key](
            sp, cdiff, cspec, smot, self.den_states, self.taa_state)

        self.last_plane_radiance = (cdiff, cspec)
        self.last_stable_planes = sp
        self.prev_cam = cam
        self.prev_reservoir = r_fb
        self.prev_gi = gi_fb
        self.prev_gb_normal = gb_normal
        self.prev_gb_z = gb_z
        self.frame_index += 1
        return color
