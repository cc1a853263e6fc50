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
    "FirstHitMetallic", "FirstHitEmissive", "ViewZ", "MotionVectors",
    "Depth", "DenoiserDiffRadiance", "DenoiserSpecRadiance",
    "ReSTIRDIOutput", "ReSTIRGIOutput",
]


def _normalize01(x):
    lo = jnp.min(x)
    hi = jnp.max(x)
    return (x - lo) / jnp.maximum(hi - lo, 1e-9)


def render_debug_view(view: str, assets, cam, width: int, height: int,
                      frame_outputs=None):
    """Render one debug channel of the primary surface to (H,W,3).

    Pipeline-output views (Denoiser*/ReSTIR*) read from `frame_outputs`
    (a models.realtime.FrameOutputs, e.g. RealtimeRenderer.last_outputs);
    surface views retrace the G-buffer."""
    import jax
    from ..pt import gbuffer as GB
    shp2 = (height, width)
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
