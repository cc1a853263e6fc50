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
from ..denoise import relax
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
    emission_bg: jnp.ndarray
    psr_thp: jnp.ndarray
    reservoir: Reservoir
    gi_reservoir: gi.GIReservoir
    gb_normal: jnp.ndarray
    gb_view_z: jnp.ndarray


def _pt_frame(assets, cam: CameraData, prev_cam: CameraData,
              prev_res: Optional[Reservoir],
              prev_gi: "Optional[gi.GIReservoir]", prev_gb_normal,
              prev_gb_z, px, py, consts, *, cfg: C.PTConfig,
              width: int, height: int, has_prev: bool):
    """Stage 1 (ray tracing): G-buffer, ReSTIR DI, indirect paths."""
    n = px.shape[0]
    gb = GB.trace_gbuffer(assets, cam, prev_cam, px, py)
    frame = consts.sample_base_index

    # ---- ReSTIR DI (RtxdiPass::Execute). NOTE: the temporal-stage
    # output (NOT the post-spatial reservoir) is fed back to the next
    # frame, like RTXDI -- feeding back spatially-merged reservoirs
    # creates a self-reinforcing energy loop.
    if cfg.use_restir_di:
        r = di.generate_candidates(assets, gb, px, py, frame)
        if has_prev and prev_res is not None:
            class _PrevGB(NamedTuple):
                normal: jnp.ndarray
                view_z: jnp.ndarray
            r = di.temporal_resample(assets, gb, r, prev_res,
                                     _PrevGB(prev_gb_normal, prev_gb_z),
                                     px, py, width, height, frame)
        r_feedback = r
        r = di.spatial_resample(assets, gb, r, px, py, width, height,
                                frame)
        di_d, di_s = di.final_shade(assets, gb, r)
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
    # ReSTIR DI covers primary direct lighting for ALL non-delta lobes:
    # di.eval_target evaluates the full split BSDF (reflection AND rough
    # transmission), so the continuation's emissive/env MIS weight must be
    # zeroed for every non-delta lobe or rough-transmission paths would
    # double-count direct light. Delta lobes evaluate to zero under light
    # sampling, so mirror/glass keep their BSDF-sampled contribution (the
    # reference routes those through dedicated stable planes instead;
    # PathTracerNEE.hlsli:321-330)
    restir_covers = jnp.asarray(cfg.use_restir_di) & ~is_delta
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
                                      frame)
        gi_feedback = gr
        gr = gi.spatial_resample(gb, gr, px, py, width, height, frame)
        gi_d, gi_s = gi.final_shade(assets, gb, gr)
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

    shp = (height, width)
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
        emission_bg=r3(emission_bg), psr_thp=r3(gb.psr_thp),
        reservoir=r_feedback, gi_reservoir=gi_feedback,
        gb_normal=gb.normal, gb_view_z=gb.view_z)


def _post_frame(out: FrameOutputs, den_diff, den_spec, taa_state, *,
                use_den: bool, use_taa: bool):
    """Stage 2 (post pipeline): demodulate, denoise (ReLAX), compose,
    TAA. Pure function of (frame outputs, temporal states)."""
    eps = 1e-3
    diff_in = (out.di_diffuse + out.indirect_diffuse) / \
        jnp.maximum(out.diffuse_albedo, eps)
    spec_in = (out.di_specular + out.indirect_specular) / \
        jnp.maximum(out.specular_albedo, eps)
    if use_den:
        diff_f, den_diff = relax.denoise(den_diff, diff_in, out.normal,
                                         out.view_z, out.motion)
        spec_f, den_spec = relax.denoise(den_spec, spec_in, out.normal,
                                         out.view_z, out.motion,
                                         roughness=None, iterations=3)
    else:
        diff_f, spec_f = diff_in, spec_in
    color = out.emission_bg + out.psr_thp * (
        diff_f * out.diffuse_albedo + spec_f * out.specular_albedo)
    if use_taa:
        color, taa_state = taa_mod.resolve(taa_state, color, out.motion)
    return color, den_diff, den_spec, taa_state


class RealtimeRenderer(Renderer):
    """Stateful frame-loop driver (DeviceManager::RunMessageLoop +
    Sample::Render equivalents)."""

    def __init__(self, host_scene, camera, cfg: Optional[C.PTConfig] = None,
                 **kw):
        cfg = cfg or realtime_config(use_restir_di=True,
                                     use_restir_gi=True,
                                     denoiser_enabled=True)
        super().__init__(host_scene, camera, cfg, **kw)
        self.frame_index = 0
        self.prev_cam = camera
        self.prev_reservoir = None
        self.prev_gi = None
        self.prev_gb_normal = None
        self.prev_gb_z = None
        self.den_diff = None
        self.den_spec = None
        self.taa_state = None
        self._frame_jit = None
        self._post_jit = {}

    def render_frame(self, width: int, height: int,
                     camera: Optional[CameraData] = None,
                     denoise: Optional[bool] = None,
                     taa: bool = True):
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
        key = (width, height, has_prev)
        if key not in self._frame_jit:
            self._frame_jit[key] = jax.jit(functools.partial(
                _pt_frame, cfg=self.cfg, width=width, height=height,
                has_prev=has_prev))
        out = self._frame_jit[key](
            self.assets, cam, self.prev_cam, self.prev_reservoir,
            self.prev_gi,
            self.prev_gb_normal if has_prev else jnp.zeros((width * height,
                                                            3)),
            self.prev_gb_z if has_prev else jnp.zeros((width * height,)),
            px, py, consts)

        # ---- stage 2: denoise + compose + TAA (post pipeline)
        use_den = self.cfg.denoiser_enabled if denoise is None else denoise
        # stage 2 fused into one jit (PostProcess + Denoise + TAA): one
        # device dispatch instead of ~10 (the axon tunnel charges per
        # dispatch)
        post_key = (width, height, use_den, taa,
                    self.den_diff is not None, self.taa_state is not None)
        if post_key not in self._post_jit:
            self._post_jit[post_key] = jax.jit(functools.partial(
                _post_frame, use_den=use_den, use_taa=taa))
        color, self.den_diff, self.den_spec, self.taa_state = \
            self._post_jit[post_key](out, self.den_diff, self.den_spec,
                                     self.taa_state)

        # feedback state
        self.last_outputs = out  # debug-view source (ShaderDebug views)
        self.prev_cam = cam
        self.prev_reservoir = out.reservoir
        self.prev_gi = out.gi_reservoir
        self.prev_gb_normal = out.gb_normal
        self.prev_gb_z = out.gb_view_z
        self.frame_index += 1
        return color
