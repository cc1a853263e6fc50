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

# DebugViewType subset (ShaderDebug.hlsli naming)
VIEWS = [
    "FirstHitBarycentrics", "FirstHitFaceNormal", "FirstHitShadingNormal",
    "FirstHitDiffuse", "FirstHitSpecular", "FirstHitRoughness",
    "FirstHitMetallic", "FirstHitEmissive", "FirstHitOpacity",
    "FirstHitThp", "FirstHitViewDir", "MaterialID", "ViewZ",
    "MotionVectors", "Depth", "DenoiserDiffRadiance",
    "DenoiserSpecRadiance", "ReSTIRDIOutput", "ReSTIRGIOutput",
    # stable-planes explorer (StablePlaneDebugVizColor + per-plane data;
    # needs stable_planes= from RealtimeRenderer.last_stable_planes)
    "StablePlaneCount", "StablePlaneDominant", "StablePlaneBranchViz",
    "StablePlaneVirtualDepth", "StableRadiance",
    # NaN/Inf sanitizer (Sample.hlsl:217-243 cross pattern)
    "NaNSanitizer",
]


def _normalize01(x):
    lo = jnp.min(x)
    hi = jnp.max(x)
    return (x - lo) / jnp.maximum(hi - lo, 1e-9)


def render_debug_view(view: str, assets, cam, width: int, height: int,
                      frame_outputs=None, stable_planes=None,
                      color=None):
    """Render one debug channel of the primary surface to (H,W,3).

    Pipeline-output views (Denoiser*/ReSTIR*) read from `frame_outputs`
    (a models.realtime.FrameOutputs, e.g. RealtimeRenderer.last_outputs);
    StablePlane* views read `stable_planes` (a pt.stableplanes.
    StablePlanes, e.g. RealtimeRenderer.last_stable_planes);
    NaNSanitizer paints non-finite pixels of `color` with the
    reference's cross pattern; surface views retrace the G-buffer."""
    import jax
    from ..pt import gbuffer as GB
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
    if view.startswith("StablePlane") or view == "StableRadiance":
        from ..pt import stableplanes as SPM
        if stable_planes is None:
            raise ValueError(
                f"debug view {view} needs stable_planes (render a "
                "stable-planes realtime frame first)")
        sp = stable_planes
        P = sp.count
        valid = sp.branch_id != SPM.INVALID_BRANCH      # (N,P)
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
        else:  # StableRadiance
            sr = sp.stable_radiance
            out = jnp.clip(sr / (1.0 + sr), 0.0, 1.0)
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
