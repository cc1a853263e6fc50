"""Debug visualization: render any internal channel as an image.

TPU-native equivalent of the reference's ~50 DebugViewType channels
(RTXPT/PathTracer/ShaderDebug.hlsli:24-80) + per-pixel pick/inspect
readback (DebugContext::Print :263, feedback buffers Sample.cpp:287-358).
On TPU "readback" is trivial: every buffer is already an array — the
inspect API just indexes it.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..core import mathutils as mu

# DebugViewType coverage (ShaderDebug.hlsli:24-80 naming)
VIEWS = [
    "FirstHitBarycentrics", "FirstHitFaceNormal", "FirstHitShadingNormal",
    "FirstHitShadingTangent", "FirstHitShadingBitangent",
    "FirstHitFrontFacing", "FirstHitThinSurface",
    "FirstHitShaderPermutation",
    "FirstHitDiffuse", "FirstHitSpecular", "FirstHitRoughness",
    "FirstHitMetallic", "FirstHitEmissive", "FirstHitOpacity",
    "FirstHitThp", "FirstHitViewDir", "MaterialID", "ViewZ",
    "MotionVectors", "Depth", "ImagePlaneRayLength",
    "VBufferMotionVectors", "VBufferDepth",
    "FirstHitOpacityMicroMapInWorld", "FirstHitOpacityMicroMapOverlay",
    "DenoiserDiffRadiance",
    "DenoiserSpecRadiance", "ReSTIRDIOutput", "ReSTIRGIOutput",
    # ReSTIR DI per-stage outputs (ShaderDebug.hlsli:71-76); Initial and
    # Spatial recompute the stage on the retraced G-buffer, Temporal
    # shades the frame's feedback reservoir (post-temporal, pre-spatial)
    "ReSTIRDIInitialOutput", "ReSTIRDITemporalOutput",
    "ReSTIRDISpatialOutput", "ReSTIRDIFinalContribution",
    "ReGIRIndirectOutput",
    # ReSTIR GI secondary surface (ShaderDebug.hlsli:67-69)
    "SecondarySurfacePosition", "SecondarySurfaceRadiance",
    # stable-planes explorer (StablePlaneDebugVizColor + per-plane data;
    # needs stable_planes= from RealtimeRenderer.last_stable_planes;
    # plane_index=-1 follows the dominant plane, >=0 picks one —
    # the reference's DebugViewStablePlaneIndex (SampleUI.h:192)
    "StablePlaneCount", "StablePlaneDominant", "StablePlaneBranchViz",
    "StablePlaneVirtualDepth", "StableRadiance",
    "StablePlaneNormals", "StablePlaneRoughness",
    "StablePlaneMotionVectors", "StablePlaneViewZ",
    "StablePlaneVirtualRayLength",
    "StablePlaneDiffBSDFEstimate", "StablePlaneSpecBSDFEstimate",
    "StablePlaneDiffRadiance", "StablePlaneSpecRadiance",
    "StablePlaneDiffHitDist", "StablePlaneSpecHitDist",
    "StablePlaneDiffRadianceDenoised", "StablePlaneSpecRadianceDenoised",
    "StablePlaneCombinedRadianceDenoised",
    "StablePlaneRelaxedDisocclusion", "StablePlaneDenoiserValidation",
    # NaN/Inf sanitizer (Sample.hlsl:217-243 cross pattern)
    "NaNSanitizer",
]

# reference names that map onto an existing channel 1:1 (the repo's
# G-buffer IS the V-buffer resolve; post-PSR they coincide on
# non-delta surfaces)
_ALIASES = {
    "VBufferMotionVectors": "MotionVectors",
    "VBufferDepth": "Depth",
    "DominantStablePlaneIndex": "StablePlaneDominant",
    # the frame's captured di_diffuse+di_specular IS the final
    # contribution of the fused final-shade pass
    "ReSTIRDIFinalOutput": "ReSTIRDIOutput",
    "ReSTIRDIFinalContribution": "ReSTIRDIOutput",
}


def _normalize01(x):
    lo = jnp.min(x)
    hi = jnp.max(x)
    return (x - lo) / jnp.maximum(hi - lo, 1e-9)


def render_debug_view(view: str, assets, cam, width: int, height: int,
                      frame_outputs=None, stable_planes=None,
                      color=None, plane_index: int = -1,
                      plane_radiance=None, plane_denoised=None,
                      den_states=None, frame_index: int = 0):
    """Render one debug channel of the primary surface to (H,W,3).

    Pipeline-output views (Denoiser*/ReSTIR*) read from `frame_outputs`
    (a models.realtime.FrameOutputs, e.g. RealtimeRenderer.last_outputs);
    StablePlane* views read `stable_planes` (a pt.stableplanes.
    StablePlanes, e.g. RealtimeRenderer.last_stable_planes);
    per-plane radiance views read `plane_radiance` (the (N,P,4)
    committed diff/spec pair, RealtimeRenderer.last_plane_radiance) and
    `plane_denoised` ((P,H,W,3) stacks, .last_plane_denoised);
    denoiser-history views read `den_states` (list of per-plane
    (diff,spec) DenoiserState, RealtimeRenderer.den_states);
    `plane_index` selects the stable plane (-1 = dominant), the
    reference's DebugViewStablePlaneIndex.
    NaNSanitizer paints non-finite pixels of `color` with the
    reference's cross pattern; surface views retrace the G-buffer."""
    import jax
    from ..pt import gbuffer as GB
    view = _ALIASES.get(view, view)
    shp2 = (height, width)
    if view == "NaNSanitizer":
        if color is None:
            raise ValueError("NaNSanitizer needs color=")
        img = color.reshape(shp2 + (3,))
        bad = ~jnp.isfinite(img).all(-1)
        # dilate into a cross pattern so single pixels are visible
        cross = bad
        for d in range(1, 4):
            cross = cross | jnp.roll(bad, d, 0) | jnp.roll(bad, -d, 0) \
                | jnp.roll(bad, d, 1) | jnp.roll(bad, -d, 1)
        mark = jnp.asarray([1.0, 0.0, 1.0])
        safe = jnp.where(jnp.isfinite(img), img, 0.0)
        return jnp.where(cross[..., None], mark,
                         jnp.clip(safe / (1.0 + safe), 0.0, 1.0))
    if view in ("StablePlaneDiffRadianceDenoised",
                "StablePlaneSpecRadianceDenoised",
                "StablePlaneCombinedRadianceDenoised"):
        if plane_denoised is None:
            raise ValueError(
                f"debug view {view} needs plane_denoised (render a "
                "denoised stable-planes frame first; "
                "RealtimeRenderer.last_plane_denoised)")
        dstack, sstack = plane_denoised          # (P,H,W,3) each
        p = max(plane_index, 0)
        if view == "StablePlaneDiffRadianceDenoised":
            out = dstack[p]
        elif view == "StablePlaneSpecRadianceDenoised":
            out = sstack[p]
        else:
            out = dstack[p] + sstack[p]
        return jnp.clip(out / (1.0 + out), 0.0, 1.0)
    if view in ("StablePlaneRelaxedDisocclusion",
                "StablePlaneDenoiserValidation"):
        if not den_states or den_states[0][0] is None:
            raise ValueError(
                f"debug view {view} needs den_states (render a denoised "
                "realtime frame first; RealtimeRenderer.den_states)")
        dd, ds = den_states[max(plane_index, 0)]
        if view == "StablePlaneRelaxedDisocclusion":
            # fresh history (disocclusion / clamp reset) in red, settled
            # history in green — the NRD validation overlay scheme
            relax = jnp.clip(2.0 - dd.history, 0.0, 1.0)
            out = jnp.stack([relax, 1.0 - relax,
                             jnp.zeros_like(relax)], -1)
        else:
            h = jnp.minimum(dd.history / 32.0, 1.0)
            hs = jnp.minimum(ds.history / 32.0, 1.0)
            out = jnp.stack([1.0 - h, h * hs, 1.0 - hs], -1)
        return jnp.clip(out, 0.0, 1.0)
    if view.startswith("StablePlane") or view == "StableRadiance":
        from ..pt import stableplanes as SPM
        if stable_planes is None:
            raise ValueError(
                f"debug view {view} needs stable_planes (render a "
                "stable-planes realtime frame first)")
        sp = stable_planes
        P = sp.count
        valid = sp.branch_id != SPM.INVALID_BRANCH      # (N,P)

        def pick(arr):
            """(N,P,...) -> (N,...) at plane_index (-1 = dominant)."""
            if plane_index >= 0:
                return arr[:, plane_index]
            oh = (jnp.arange(P)[None, :] == sp.dominant[:, None])
            return jnp.sum(arr * oh.reshape(oh.shape + (1,) *
                                            (arr.ndim - 2)), axis=1)

        pvalid = (valid[:, plane_index] if plane_index >= 0
                  else jnp.ones(valid.shape[0], bool))
        if view == "StablePlaneCount":
            c = valid.sum(-1).astype(jnp.float32) / P
            out = jnp.stack([c, 1.0 - c, jnp.zeros_like(c)], -1)
        elif view == "StablePlaneDominant":
            cols = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
            out = cols[jnp.clip(sp.dominant, 0, 2)]
        elif view == "StablePlaneBranchViz":
            # plane presence as RGB channels (DebugVizColor scheme)
            out = jnp.stack(
                [valid[:, p].astype(jnp.float32) if p < P
                 else jnp.zeros(valid.shape[0]) for p in range(3)], -1)
        elif view == "StablePlaneVirtualDepth":
            z = jnp.where(valid, sp.scene_length, 0.0).max(-1)
            out = jnp.tile(_normalize01(z)[..., None], (1, 3))
        elif view == "StablePlaneNormals":
            out = pick(sp.normal) * 0.5 + 0.5
        elif view == "StablePlaneRoughness":
            out = jnp.tile(pick(sp.roughness)[..., None], (1, 3))
        elif view == "StablePlaneMotionVectors":
            m = pick(sp.motion)
            out = jnp.stack([jnp.abs(m[..., 0]), jnp.abs(m[..., 1]),
                             jnp.zeros_like(m[..., 0])], -1) * 0.1
        elif view == "StablePlaneViewZ":
            out = jnp.tile(_normalize01(pick(sp.view_z))[..., None],
                           (1, 3))
        elif view == "StablePlaneVirtualRayLength":
            out = jnp.tile(_normalize01(pick(sp.scene_length))[..., None],
                           (1, 3))
        elif view == "StablePlaneDiffBSDFEstimate":
            out = pick(sp.diff_est)
        elif view == "StablePlaneSpecBSDFEstimate":
            out = pick(sp.spec_est)
        elif view in ("StablePlaneDiffRadiance", "StablePlaneSpecRadiance",
                      "StablePlaneDiffHitDist", "StablePlaneSpecHitDist"):
            if plane_radiance is None:
                raise ValueError(
                    f"debug view {view} needs plane_radiance (render a "
                    "stable-planes frame first; "
                    "RealtimeRenderer.last_plane_radiance)")
            cdiff, cspec = plane_radiance        # (N,P,4)
            src = cdiff if "Diff" in view else cspec
            if view.endswith("HitDist"):
                out = jnp.tile(_normalize01(pick(src[..., 3]))[..., None],
                               (1, 3))
            else:
                rad = pick(src[..., :3])
                out = jnp.clip(rad / (1.0 + rad), 0.0, 1.0)
        else:  # StableRadiance
            sr = sp.stable_radiance
            out = jnp.clip(sr / (1.0 + sr), 0.0, 1.0)
        out = jnp.where(pvalid[..., None], out, 0.0)
        return jnp.clip(out.reshape(shp2 + (3,)), 0.0, 1.0)
    if view in ("SecondarySurfacePosition", "SecondarySurfaceRadiance"):
        if frame_outputs is None:
            raise ValueError(f"debug view {view} needs frame_outputs")
        gr = frame_outputs.gi_reservoir
        if view == "SecondarySurfacePosition":
            out = jnp.where(gr.valid[..., None],
                            _normalize01(gr.pos), 0.0)
        else:
            out = jnp.where(gr.valid[..., None],
                            gr.radiance / (1.0 + gr.radiance), 0.0)
        return jnp.clip(out.reshape(shp2 + (3,)), 0.0, 1.0)
    if view in ("DenoiserDiffRadiance", "DenoiserSpecRadiance",
                "ReSTIRDIOutput", "ReSTIRGIOutput"):
        if frame_outputs is None:
            raise ValueError(
                f"debug view {view} needs frame_outputs (render a "
                "realtime frame first; RealtimeRenderer.last_outputs)")
        fo = frame_outputs
        if view == "DenoiserDiffRadiance":
            out = fo.di_diffuse + fo.indirect_diffuse
        elif view == "DenoiserSpecRadiance":
            out = fo.di_specular + fo.indirect_specular
        elif view == "ReSTIRDIOutput":
            out = fo.di_diffuse + fo.di_specular
        else:  # ReSTIRGIOutput
            out = fo.indirect_diffuse + fo.indirect_specular
        out = out.reshape(shp2 + (3,))
        return jnp.clip(out / (1.0 + out), 0.0, 1.0)  # reinhard for viz
    yy, xx = np.mgrid[0:height, 0:width]
    px = jnp.asarray(xx.reshape(-1).astype(np.uint32))
    py = jnp.asarray(yy.reshape(-1).astype(np.uint32))
    gb = GB.trace_gbuffer(assets, cam, cam, px, py)
    shp = (height, width)

    def img3(a):
        return a.reshape(shp + (3,))

    if view.startswith("ReSTIRDI") or view == "ReGIRIndirectOutput":
        from ..restir import di
        if view == "ReSTIRDIInitialOutput":
            r = di.generate_candidates(assets, gb, px, py, frame_index)
        elif view == "ReSTIRDITemporalOutput":
            if frame_outputs is None:
                raise ValueError(f"{view} needs frame_outputs (the "
                                 "feedback reservoir is post-temporal)")
            r = frame_outputs.reservoir
        elif view == "ReSTIRDISpatialOutput":
            base = (frame_outputs.reservoir if frame_outputs is not None
                    else di.generate_candidates(assets, gb, px, py,
                                                frame_index))
            r = di.spatial_resample(assets, gb, base, px, py, width,
                                    height, frame_index)
        elif view == "ReGIRIndirectOutput":
            # one unshadowed ReGIR draw at the primary surface — shows
            # the local-light grid's output field
            # (LightSamplingLocal.hlsli ReGIR debug)
            from ..core import rng as _rng
            from ..restir import regir as RG
            grid = assets.regir
            if grid is None:
                if assets.lights is None:
                    raise ValueError("ReGIRIndirectOutput needs local "
                                     "lights (assets.lights)")
                lo = jnp.min(assets.scene.positions, 0) - 1e-3
                hi = jnp.max(assets.scene.positions, 0) + 1e-3
                grid = RG.build_regir(assets.lights,
                                      assets.scene.positions,
                                      assets.scene.indices, lo, hi,
                                      frame_index)
            g = _rng.make(px, py, jnp.uint32(0), jnp.uint32(frame_index))
            g, u2 = _rng.next_2d(g)
            ls = RG.sample_regir(grid, assets.lights,
                                 assets.scene.positions,
                                 assets.scene.indices, gb.pos, u2)
            nol = jnp.maximum(
                jnp.sum(gb.normal * ls.direction, -1), 0.0)
            out = jnp.where((gb.valid & ls.valid)[..., None],
                            ls.li * nol[..., None], 0.0)
            out = out / (1.0 + out)
            return img3(jnp.clip(jnp.where(gb.valid[..., None], out,
                                           0.0), 0.0, 1.0))
        else:
            raise ValueError(f"unknown debug view {view}")
        d, s = di.final_shade(assets, gb, r)
        out = d + s
        out = out / (1.0 + out)
        return img3(jnp.clip(jnp.where(gb.valid[..., None], out, 0.0),
                             0.0, 1.0))

    if view == "FirstHitBarycentrics":
        b = gb.bary
        out = jnp.stack([b[..., 0], b[..., 1],
                         1.0 - b[..., 0] - b[..., 1]], -1)
    elif view == "FirstHitFaceNormal":
        out = gb.face_normal * 0.5 + 0.5
    elif view == "FirstHitShadingNormal":
        out = gb.normal * 0.5 + 0.5
    elif view == "FirstHitDiffuse":
        out = gb.diffuse_albedo
    elif view == "FirstHitSpecular":
        out = gb.specular_albedo
    elif view == "FirstHitRoughness":
        out = jnp.tile(gb.roughness[..., None], (1, 3))
    elif view == "FirstHitMetallic":
        out = jnp.tile(
            gb.surface.bsdf_data.metallic[..., None], (1, 3))
    elif view == "FirstHitEmissive":
        out = gb.emission
    elif view == "FirstHitOpacity":
        out = jnp.tile(gb.surface.sd.opacity[..., None], (1, 3))
    elif view == "FirstHitThp":
        out = gb.psr_thp
    elif view == "FirstHitViewDir":
        out = gb.view_dir * 0.5 + 0.5
    elif view == "FirstHitShadingTangent":
        out = gb.surface.sd.t * 0.5 + 0.5
    elif view == "FirstHitShadingBitangent":
        out = gb.surface.sd.b * 0.5 + 0.5
    elif view == "FirstHitFrontFacing":
        ff = gb.surface.sd.front_facing.astype(jnp.float32)
        out = jnp.stack([1.0 - ff, ff, jnp.zeros_like(ff)], -1)
    elif view == "FirstHitThinSurface":
        th = gb.surface.sd.thin_surface.astype(jnp.float32)
        out = jnp.tile(th[..., None], (1, 3))
    elif view == "FirstHitShaderPermutation":
        # color by static shading class — the jit-specialization
        # equivalent of the reference's shader permutation id
        bd = gb.surface.bsdf_data
        key = ((bd.metallic > 0.5).astype(jnp.uint32)
               | ((bd.specular_transmission > 0.0)
                  .astype(jnp.uint32) << 1)
               | (gb.surface.sd.thin_surface.astype(jnp.uint32) << 2))
        if gb.surface.alpha_mode is not None:
            key = key | (gb.surface.alpha_mode.astype(jnp.uint32) << 3)
        from ..core import rng as _rng
        h = _rng.hash32(key)
        out = jnp.stack([(h & 255) / 255.0, ((h >> 8) & 255) / 255.0,
                         ((h >> 16) & 255) / 255.0], -1)
    elif view == "ImagePlaneRayLength":
        out = jnp.tile(_normalize01(
            jnp.where(gb.valid, gb.t, 0.0))[..., None], (1, 3))
    elif view in ("FirstHitOpacityMicroMapInWorld",
                  "FirstHitOpacityMicroMapOverlay"):
        out = _omm_view(assets, gb, overlay=view.endswith("Overlay"))
    elif view == "MaterialID":
        mid = gb.surface.sd.material_id.astype(jnp.uint32)
        from ..core import rng as _rng
        h = _rng.hash32(mid)
        out = jnp.stack([(h & 255) / 255.0, ((h >> 8) & 255) / 255.0,
                         ((h >> 16) & 255) / 255.0], -1)
    elif view in ("ViewZ", "Depth"):
        z = jnp.where(gb.valid, gb.view_z, 0.0)
        out = jnp.tile(_normalize01(z)[..., None], (1, 3))
    elif view == "MotionVectors":
        m = gb.motion
        out = jnp.stack([jnp.abs(m[..., 0]), jnp.abs(m[..., 1]),
                         jnp.zeros_like(m[..., 0])], -1) * 0.1
    else:
        raise ValueError(f"unknown debug view {view}; options: {VIEWS}")
    out = jnp.where(gb.valid[..., None], out, 0.0)
    return img3(jnp.clip(out, 0.0, 1.0))


def _omm_view(assets, gb, overlay: bool):
    """Opacity micro-mask state at the first hit: green = opaque cell,
    red = transparent cell, gray = triangle carries no mask
    (FirstHitOpacityMicroMapInWorld / ...Overlay,
    ShaderDebug.hlsli:64-65). Overlay blends with the surface albedo."""
    bvh = assets.bvh
    lt = getattr(bvh, "leaf_tris", None)
    lo = getattr(bvh, "leaf_omm", None)
    n = gb.valid.shape[0]
    if lt is None or lo is None:
        return jnp.tile(jnp.asarray([[0.25, 0.25, 0.3]]), (n, 1))
    # per-prim mask table: scatter the BVH leaf slots back to prim ids
    # (leaf_tris/leaf_omm are slot-aligned; Hit.prim comes from
    # leaf_tris, so the index spaces agree)
    lt_np = np.asarray(lt).reshape(-1).astype(np.int64)
    lo_np = np.asarray(lo).reshape(-1).astype(np.int64)
    ntp = int(lt_np.max()) + 1 if lt_np.size else 1
    prim_mask = np.full(max(ntp, 1), 0xFFFF, np.int64)
    ok = (lt_np >= 0) & (lt_np < ntp)
    prim_mask[lt_np[ok]] = lo_np[ok]
    pm = jnp.asarray(prim_mask, jnp.int32)
    mask = pm[jnp.clip(gb.prim, 0, pm.shape[0] - 1)]
    has = (mask != 0xFFFF) & gb.valid
    ci = jnp.clip((gb.bary[..., 0] * 4.0).astype(jnp.int32), 0, 3)
    cj = jnp.clip((gb.bary[..., 1] * 4.0).astype(jnp.int32), 0, 3)
    bit = ((mask >> (ci * 4 + cj)) & 1) != 0
    green = jnp.asarray([0.1, 0.85, 0.1])
    red = jnp.asarray([0.9, 0.08, 0.08])
    gray = jnp.asarray([0.3, 0.3, 0.35])
    out = jnp.where(has[..., None],
                    jnp.where(bit[..., None], green, red), gray)
    if overlay:
        out = 0.55 * gb.diffuse_albedo + 0.45 * out
    return jnp.where(gb.valid[..., None], out, 0.0)


def inspect_pixel(assets, cam, width: int, height: int, x: int, y: int
                  ) -> Dict:
    """Per-pixel pick readback (the reference's pick-pixel feedback
    struct, Sample.cpp:2207-2225)."""
    from ..pt import gbuffer as GB
    px = jnp.asarray([x], jnp.uint32)
    py = jnp.asarray([y], jnp.uint32)
    gb = GB.trace_gbuffer(assets, cam, cam, px, py)
    sd = gb.surface.sd
    return dict(
        valid=bool(gb.valid[0]),
        prim=int(gb.prim[0]),
        t=float(gb.t[0]),
        position=np.asarray(gb.pos[0]).tolist(),
        normal=np.asarray(gb.normal[0]).tolist(),
        material_id=int(sd.material_id[0]),
        roughness=float(gb.roughness[0]),
        diffuse_albedo=np.asarray(gb.diffuse_albedo[0]).tolist(),
        view_z=float(gb.view_z[0]),
    )
