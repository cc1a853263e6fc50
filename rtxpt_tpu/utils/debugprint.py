"""Per-pixel shader Print: the reference's DebugPrint slot buffer.

TPU-native analog of RTXPT/PathTracer/ShaderDebug.hlsli Print(slot, val)
+ MAX_DEBUG_PRINT_SLOTS (:97,263-275) and the SampleUI feedback readback
that displays them. The reference's path tracer writes float4 slots from
the shader for the picked pixel; here the wavefront owns no per-pixel
side channel, so the probe RE-WALKS the picked pixel's deterministic
bounce chain (same walk as debuglines.lines_for_path) and fills the
slot buffer host-side: one header slot, then two slots per path vertex
(hit geometry, then shading/throughput). `format_slots` renders the
table the way SampleUI prints the feedback struct.
"""
from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np

MAX_DEBUG_PRINT_SLOTS = 16


def print_path(assets, cam, x: int, y: int, *, max_bounces: int = 6
               ) -> List[Dict]:
    """Fill the print-slot buffer from pixel (x, y)'s bounce chain.

    Returns a list of slot dicts: {"slot": i, "label": str,
    "value": (4,) float}. Slot 0 is the pixel header; each path vertex
    d contributes slots 1+2d (t, prim, materialID, roughness) and
    2+2d (throughput rgb, NEE visibility). Stops at
    MAX_DEBUG_PRINT_SLOTS like the reference's bounded UAV writes.
    """
    from .. import config as C
    from ..models.renderer import reference_config
    from ..ops import traverse
    from ..pt import integrator, shading

    px = jnp.asarray([x], jnp.uint32)
    py = jnp.asarray([y], jnp.uint32)
    cfg = reference_config(max_bounces=max_bounces)
    consts = C.default_constants(0)
    p = integrator.init_paths(cam, px, py, cfg, consts, 0)
    origin, direction = p.origin, p.direction
    active = p.active

    slots: List[Dict] = [dict(
        slot=0, label="pixel",
        value=np.array([float(x), float(y), float(max_bounces), 0.0],
                       np.float32))]
    thp = jnp.ones((1, 3))
    for depth in range(max_bounces + 1):
        if len(slots) + 2 > MAX_DEBUG_PRINT_SLOTS:
            break
        hit = traverse.trace_closest(assets.bvh, assets.soup, origin,
                                     direction, active=active,
                                     dense=assets.dense)
        valid = bool(np.asarray(hit.valid)[0]) and bool(
            np.asarray(active)[0])
        if not valid:
            t_miss = float(np.asarray(hit.t)[0])
            slots.append(dict(
                slot=len(slots), label=f"v{depth}.miss",
                value=np.array([t_miss if t_miss < 1e29 else -1.0,
                                -1.0, -1.0, 0.0], np.float32)))
            break
        surf = shading.load_surface(assets.scene,
                                    jnp.maximum(hit.prim, 0), hit.bary,
                                    direction)
        sd = surf.sd
        slots.append(dict(
            slot=len(slots), label=f"v{depth}.hit",
            value=np.array([float(np.asarray(hit.t)[0]),
                            float(np.asarray(hit.prim)[0]),
                            float(np.asarray(sd.material_id)[0]),
                            float(np.asarray(surf.bsdf_data.roughness)[0])],
                           np.float32)))
        t3 = np.asarray(thp)[0]
        slots.append(dict(
            slot=len(slots), label=f"v{depth}.thp",
            value=np.array([t3[0], t3[1], t3[2],
                            float(np.asarray(sd.n)[0, 1])], np.float32)))
        # deterministic mirror continuation (matches debuglines' glyph
        # walk); throughput picks up the specular albedo each vertex
        thp = thp * jnp.clip(surf.bsdf_data.specular, 0.0, 1.0)
        d_new = direction - 2.0 * jnp.sum(
            direction * sd.n, -1, keepdims=True) * sd.n
        origin = sd.compute_new_ray_origin(jnp.ones(1, bool))
        direction = d_new / jnp.maximum(
            jnp.linalg.norm(d_new, axis=-1, keepdims=True), 1e-9)
        active = active & hit.valid
    return slots


def format_slots(slots: List[Dict]) -> str:
    """SampleUI-style debug print table."""
    lines = [f"debug print ({len(slots)}/{MAX_DEBUG_PRINT_SLOTS} slots)"]
    for s in slots:
        v = s["value"]
        lines.append(
            f"  [{s['slot']:2d}] {s['label']:<10s} "
            f"{v[0]:10.4f} {v[1]:10.4f} {v[2]:10.4f} {v[3]:10.4f}")
    return "\n".join(lines)
