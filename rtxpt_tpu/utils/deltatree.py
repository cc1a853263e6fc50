"""Debug delta-tree explorer: the reference's interactive stable-planes
debugging tool, host-driven.

TPU-native analog of RTXPT/Sample.hlsl:332-357 DeltaTreeVizExplorePixel
+ RTXPT/PathTracer/ShaderDebug.hlsli:102-157 (DeltaTreeVizPathVertex /
DeltaTreeVizHeader, DeltaSearchStackPush/Pop :302-330): for ONE picked
pixel, walk the pure-delta tree depth-first — every vertex records its
delta lobes (reflection / transmission throughputs), the non-delta mass,
accumulated throughput, volume absorption and stable branch ID — then
stamp which branches the BUILD pass actually assigned to plane slots and
which one is dominant. The reference drives the DFS with an in-shader
payload stack capped at cDeltaTreeVizMaxStackSize; here the stack is a
Python list and each node is one tiny (1-lane) trace + load_surface, so
the tool shares every production code path it is meant to debug
(traverse, shading, nested dielectrics, stableplanes._delta_lobes).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

# ignore delta subpaths below 0.1% potential contribution
# (cDeltaTreeVizThpIgnoreThreshold, ShaderDebug.hlsli:135)
THP_IGNORE_THRESHOLD = 1e-3
MAX_VERTICES = 256            # cDeltaTreeVizMaxVertices
LOBE_TRANSMISSION = 0         # LOBE_ID_TRANSMISSION (base-4 digit 0)
LOBE_REFLECTION = 1


@dataclass
class DeltaNode:
    """One DeltaTreeVizPathVertex (ShaderDebug.hlsli:102-132)."""
    vertex_index: int            # 0 = camera, 1 = first hit, ...
    branch_id: int               # PathState::stableBranchID encoding
    material_id: int             # -1 for sky / miss
    throughput: np.ndarray       # (3,) camera -> this vertex
    volume_absorption: float     # 1 - luminance(transmittance) last seg
    world_pos: np.ndarray        # (3,)
    non_delta_part: float        # mass routed to non-delta lobes
    # (lobe_id, luminance(lobe throughput)) for significant delta lobes
    lobes: List[Tuple[int, float]] = field(default_factory=list)
    is_miss: bool = False
    plane_slot: int = -1         # BUILD slot whose branch ends here
    on_stable_path: bool = False  # lies on some plane's branch prefix
    is_dominant: bool = False


@dataclass
class DeltaTreeViz:
    """DeltaTreeVizHeader + node list."""
    pixel: Tuple[int, int]
    nodes: List[DeltaNode]
    plane_branch_ids: List[int]  # per BUILD slot (INVALID -> -1)
    dominant_plane: int


def _lum(rgb) -> float:
    r, g, b = [float(v) for v in np.asarray(rgb).reshape(3)]
    return 0.2126 * r + 0.7152 * g + 0.0722 * b


def explore_pixel(assets, cam, x: int, y: int, *, max_vertex_depth: int = 6,
                  plane_count: int = 3) -> DeltaTreeViz:
    """DFS the delta tree at pixel (x, y) against the loaded scene.

    Mirrors DeltaTreeVizExplorePixel: start from the camera ray, and at
    every hit decompose the BSDF into delta lobes
    (stableplanes._delta_lobes = evalDeltaLobes equivalent); each
    significant lobe pushes a subpath continuing with
    branch = (branch << 2) | lobe_id. Runs the BUILD pass for the same
    pixel to stamp plane assignments (GetBranchIDCenter / dominant index,
    Sample.hlsl:352-355).
    """
    from .. import config as C
    from ..ops import traverse
    from ..pt import bsdf as B
    from ..pt import integrator, nested, shading
    from ..pt import stableplanes as SP
    from ..scene import envmap as EM

    px = jnp.asarray([x], jnp.uint32)
    py = jnp.asarray([y], jnp.uint32)
    from ..models.renderer import reference_config
    cfg = reference_config(max_bounces=max_vertex_depth)
    consts = C.default_constants(0)
    p0 = integrator.init_paths(cam, px, py, cfg, consts, 0)

    # BUILD-pass ground truth for this pixel (1-lane wavefront)
    sp = SP.build_stable_planes(assets, cam, cam, px, py,
                                plane_count=plane_count,
                                max_vertex_depth=max_vertex_depth,
                                compaction=False)
    inval = int(np.uint32(0xFFFFFFFF))
    plane_ids = [int(np.asarray(sp.branch_id)[0, s])
                 for s in range(plane_count)]
    plane_ids = [(-1 if b == inval else b) for b in plane_ids]
    dominant = int(np.asarray(sp.dominant)[0])

    mat_iors = assets.scene.materials.ior
    vol_abs = assets.scene.materials.volume_absorption

    nodes: List[DeltaNode] = []
    # stack entries: (origin(1,3), direction(1,3), thp(1,3), branch,
    #                 vertex_index, interior(1,2))
    stack = [(p0.origin, p0.direction, jnp.ones((1, 3)), 1, 1,
              nested.empty(1))]
    while stack and len(nodes) < MAX_VERTICES:
        origin, direction, thp, branch, vtx, interior = stack.pop()
        hit = traverse.trace_closest(assets.bvh, assets.soup, origin,
                                     direction, dense=assets.dense)
        valid = bool(np.asarray(hit.valid)[0])

        def _stamp(node: DeltaNode):
            for s, b in enumerate(plane_ids):
                if b == node.branch_id:
                    node.plane_slot = s
                    node.is_dominant = (s == dominant)
                # prefix test: on the stable path of plane s
                # (is_on_stable_path, StablePlanes.hlsli logic)
                if b > 0:
                    pb = b
                    while pb > 0:
                        if pb == node.branch_id:
                            node.on_stable_path = True
                        pb >>= 2
            nodes.append(node)

        if not valid:
            _stamp(DeltaNode(
                vertex_index=vtx, branch_id=branch, material_id=-1,
                throughput=np.asarray(thp)[0],
                volume_absorption=0.0,
                world_pos=np.asarray(origin + direction * 1e4)[0],
                non_delta_part=0.0, is_miss=True))
            continue

        surf = shading.load_surface(assets.scene,
                                    jnp.maximum(hit.prim, 0), hit.bary,
                                    direction)
        sd = surf.sd
        # volume absorption along the incoming segment (Beer-Lambert,
        # PathTracer.hlsli:406-415) — mirrors DeltaTreeVizHandleHit's
        # volumeAbsorption argument
        in_medium = ~nested.is_empty(interior)
        top = jnp.minimum(nested.top_material(interior),
                          jnp.uint32(mat_iors.shape[0] - 1)).astype(
                              jnp.int32)
        transmittance = jnp.exp(-vol_abs[top] * hit.t[..., None])
        thp_here = jnp.where(in_medium[..., None], thp * transmittance,
                             thp)
        vol_loss = 1.0 - _lum(np.where(bool(np.asarray(in_medium)[0]),
                                       np.asarray(transmittance)[0], 1.0))

        outside_ior = nested.compute_outside_ior(
            interior, sd.material_id.astype(jnp.uint32),
            sd.front_facing, mat_iors)
        surf = shading.update_outside_ior(surf, outside_ior)
        bsdf = shading.make_wavefront_bsdf(surf)
        refl_dir, refl_thp, trans_dir, trans_thp, non_delta = \
            SP._delta_lobes(surf, bsdf)

        node = DeltaNode(
            vertex_index=vtx, branch_id=branch,
            material_id=int(np.asarray(sd.material_id)[0]),
            throughput=np.asarray(thp_here)[0],
            volume_absorption=max(0.0, vol_loss),
            world_pos=np.asarray(sd.pos)[0],
            non_delta_part=float(np.asarray(non_delta)[0]))

        interior2 = nested.handle_intersection(
            interior, sd.material_id.astype(jnp.uint32),
            sd.nested_priority, sd.front_facing)

        for lobe_id, ldir, lthp in (
                (LOBE_REFLECTION, refl_dir, refl_thp),
                (LOBE_TRANSMISSION, trans_dir, trans_thp)):
            lum = _lum(np.asarray(lthp * thp_here)[0])
            if lum <= 0.0:
                continue
            node.lobes.append((lobe_id, lum))
            if lum < THP_IGNORE_THRESHOLD or vtx >= max_vertex_depth:
                continue
            child_branch = (branch << 2) | lobe_id
            o = sd.compute_new_ray_origin(
                jnp.asarray([lobe_id == LOBE_REFLECTION]))
            stack.append((o, ldir, thp_here * lthp, child_branch,
                          vtx + 1,
                          interior2 if lobe_id == LOBE_TRANSMISSION
                          else interior))
        _stamp(node)

    nodes.sort(key=lambda n: (n.vertex_index, n.branch_id))
    return DeltaTreeViz(pixel=(x, y), nodes=nodes,
                        plane_branch_ids=plane_ids,
                        dominant_plane=dominant)


def format_tree(viz: DeltaTreeViz) -> str:
    """Indented text rendering of the explored tree (the UI panel the
    reference draws from deltaPathTreeUAV)."""
    out = [f"delta tree @ pixel {viz.pixel}  "
           f"planes={['%x' % b if b >= 0 else '-' for b in viz.plane_branch_ids]}"
           f"  dominant=sp{viz.dominant_plane}"]
    for n in viz.nodes:
        indent = "  " * n.vertex_index
        tag = "MISS(sky)" if n.is_miss else f"mat {n.material_id}"
        lobes = " ".join(
            f"{'R' if l == 1 else 'T'}:{v:.3f}" for l, v in n.lobes)
        marks = []
        if n.plane_slot >= 0:
            marks.append(f"<= sp{n.plane_slot}"
                         + (" DOMINANT" if n.is_dominant else ""))
        elif n.on_stable_path:
            marks.append("(on stable path)")
        out.append(
            f"{indent}v{n.vertex_index} branch={n.branch_id:x} {tag} "
            f"thp={_lum(n.throughput):.4f} nonDelta={n.non_delta_part:.3f}"
            + (f" vol={n.volume_absorption:.3f}"
               if n.volume_absorption > 1e-4 else "")
            + (f" [{lobes}]" if lobes else "")
            + ("  " + " ".join(marks) if marks else ""))
    return "\n".join(out)
