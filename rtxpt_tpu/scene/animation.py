"""Animation: glTF keyframe tracks + skeletal skinning + geometry update.

TPU-native equivalent of the reference's animation stack:
  - donut SceneGraph keyframe animations (donut/src/engine/SceneGraph.cpp;
    per-frame transform refresh driven from Scene::Refresh,
    Sample.cpp:1980)
  - compute-shader skinning (donut/src/engine/Scene.cpp:745-800
    skinning_cs) -> one fused jnp matmul over skinned vertices
  - per-frame BLAS refit (Sample.cpp:1353-1380) -> ops/bvh.refit (BVH2) /
    refit_bvh8 below (device-side leaf rebuild + level-sweep bounds)

Host-side keyframe evaluation is numpy (cheap); vertex transforms and
skinning run on device.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class Channel:
    """One animation channel: node target + keyframe samplers."""
    node: int
    path: str                 # "translation" | "rotation" | "scale"
    times: np.ndarray         # (K,)
    values: np.ndarray        # (K, 3|4)
    interpolation: str = "LINEAR"


def parse_animations(gf) -> List[List[Channel]]:
    """Parse glTF animations from a gltf.GltfFile."""
    out = []
    for anim in gf.json.get("animations", []):
        channels = []
        for ch in anim.get("channels", []):
            tgt = ch.get("target", {})
            if tgt.get("path") not in ("translation", "rotation", "scale"):
                continue
            smp = anim["samplers"][ch["sampler"]]
            channels.append(Channel(
                node=tgt["node"], path=tgt["path"],
                times=gf.accessor(smp["input"]).astype(np.float32),
                values=gf.accessor(smp["output"]).astype(np.float32),
                interpolation=smp.get("interpolation", "LINEAR")))
        out.append(channels)
    return out


def _slerp(q0, q1, t):
    d = np.dot(q0, q1)
    if d < 0:
        q1, d = -q1, -d
    if d > 0.9995:
        q = q0 + t * (q1 - q0)
        return q / np.linalg.norm(q)
    th = np.arccos(np.clip(d, -1, 1))
    return (np.sin((1 - t) * th) * q0 + np.sin(t * th) * q1) / np.sin(th)


def sample_channel(ch: Channel, t: float) -> np.ndarray:
    """Evaluate a channel at time t (clamped; LINEAR or STEP)."""
    times = ch.times
    if t <= times[0]:
        return ch.values[0]
    if t >= times[-1]:
        return ch.values[-1]
    i = int(np.searchsorted(times, t) - 1)
    if ch.interpolation == "STEP":
        return ch.values[i]
    f = (t - times[i]) / max(times[i + 1] - times[i], 1e-9)
    if ch.path == "rotation":
        return _slerp(ch.values[i], ch.values[i + 1], float(f))
    return ch.values[i] * (1 - f) + ch.values[i + 1] * f


def apply_animation(nodes: list, channels: List[Channel], t: float):
    """Write sampled TRS values back into glTF node dicts (host)."""
    for ch in channels:
        nodes[ch.node][ch.path] = [float(v) for v in sample_channel(ch, t)]


# ---------------------------------------------------------------------------
# Skinning (device): one matmul per frame over skinned vertices
# ---------------------------------------------------------------------------

def skin_vertices(rest_positions, rest_normals, joints, weights,
                  joint_matrices):
    """Linear-blend skinning (skinning_cs equivalent, Scene.cpp:745-800).

    rest_*: (V,3); joints (V,4) i32; weights (V,4); joint_matrices
    (J,3,4) world*inverseBind. Fused gather + weighted transform."""
    m = joint_matrices[joints]                     # (V,4,3,4)
    w = weights[..., None, None]                   # (V,4,1,1)
    blended = jnp.sum(m * w, axis=1)               # (V,3,4)
    p = jnp.einsum("vij,vj->vi", blended[..., :3], rest_positions) \
        + blended[..., 3]
    nrm = jnp.einsum("vij,vj->vi", blended[..., :3], rest_normals)
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True),
                            1e-20)
    return p, nrm


# ---------------------------------------------------------------------------
# BVH8 device refit after vertex animation
# ---------------------------------------------------------------------------

def refit_bvh8(bvh8, positions, indices):
    """Rebuild leaf triangle rows + refit node bounds on device after
    vertex animation (topology unchanged). The per-frame equivalent of the
    skinned-BLAS update (Sample.cpp:1355-1380).

    Requires the BVH8 to carry refit topology (node child codes + levels),
    produced by ops.bvh.collapse_bvh8 (refit_info)."""
    from ..ops.bvh import LEAF_MAX
    table = bvh8.table
    leaf = bvh8.leaf_size
    rows = table.shape[0]

    # --- leaf rows: re-expand (p0, e1, e2) per slot
    tri_ids = bvh8.leaf_tris.reshape(rows, leaf)         # (R, leaf)
    valid = tri_ids >= 0
    tid = jnp.maximum(tri_ids, 0)
    tri = indices[tid]                                    # (R, leaf, 3)
    p0 = positions[tri[..., 0]]
    e1 = positions[tri[..., 1]] - p0
    e2 = positions[tri[..., 2]] - p0
    tri_rows = jnp.concatenate([p0, e1, e2], axis=-1)     # (R, leaf, 9)
    tri_rows = jnp.where(valid[..., None], tri_rows, 0.0)
    leaf_data = tri_rows.reshape(rows, leaf * 9)
    is_leaf_row = jnp.any(valid, axis=-1) & (
        jnp.arange(rows) >= bvh8.num_nodes)
    width = table.shape[1]
    if leaf * 9 < width:
        leaf_data = jnp.pad(leaf_data, ((0, 0), (0, width - leaf * 9)))
    table = jnp.where(is_leaf_row[:, None], leaf_data, table)

    # --- leaf AABBs
    pts = positions[tri]                                  # (R, leaf, 3, 3)
    big = 1e30
    lo = jnp.where(valid[..., None, None], pts, big).min(axis=(1, 2))
    hi = jnp.where(valid[..., None, None], pts, -big).max(axis=(1, 2))

    info = bvh8.refit_info
    node_codes = jnp.asarray(info["codes"])               # (Nn, 8) i32
    # bottom-up level sweep over node rows
    row_lo, row_hi = lo, hi    # per-row total AABB (leaf rows valid now)
    for level in info["levels"][::-1]:
        ids = jnp.asarray(level)
        codes = node_codes[ids]                           # (L, 8)
        slot_bounds = []
        tot_lo = jnp.full((ids.shape[0], 3), big)
        tot_hi = jnp.full((ids.shape[0], 3), -big)
        for k in range(8):
            c = codes[:, k]
            empty = c == -1
            is_lf = c < -1
            lrow = jnp.where(is_lf, (-c - 1) >> 5, 0)
            nrow = jnp.where(c >= 0, c, 0)
            src = jnp.where(is_lf, lrow, nrow)
            s_lo = jnp.where(empty[:, None], big, row_lo[src])
            s_hi = jnp.where(empty[:, None], -big, row_hi[src])
            slot_bounds.append((s_lo, s_hi))
            tot_lo = jnp.minimum(tot_lo, s_lo)
            tot_hi = jnp.maximum(tot_hi, s_hi)
        node_row = jnp.concatenate(
            [jnp.concatenate([b[0], b[1]], axis=-1) for b in slot_bounds],
            axis=-1)                                      # (L, 48)
        keep = table[ids][:, 48:]
        table = table.at[ids].set(jnp.concatenate([node_row, keep],
                                                  axis=-1))
        row_lo = row_lo.at[ids].set(tot_lo)
        row_hi = row_hi.at[ids].set(tot_hi)

    return bvh8.replace_table(table)


# ---------------------------------------------------------------------------
# Per-frame skinned-scene refresh (Scene::Refresh equivalent)
# ---------------------------------------------------------------------------

def joint_matrices(world, skin: dict) -> np.ndarray:
    """(J,3,4) world * inverseBind per joint (skinning_cs constants)."""
    out = np.zeros((len(skin["joints"]), 3, 4), np.float32)
    for k, node_id in enumerate(skin["joints"]):
        w = world[node_id]
        ib = skin["inverse_bind"][k]
        out[k, :, :3] = w[:, :3] @ ib[:, :3]
        out[k, :, 3] = w[:, :3] @ ib[:, 3] + w[:, 3]
    return out


def refresh_skinned(host: dict, info: dict, scene, bvh8, time: float,
                    animation_index: int = 0):
    """Animate node TRS -> recompute joint matrices -> skin vertex
    ranges on device -> refit the BVH8. Returns (scene', bvh8').

    The per-frame equivalent of Scene::Refresh + skinned-BLAS updates
    (donut Scene.cpp:98,745-800; RTXPT Sample.cpp:1355-1380)."""
    import copy

    from .gltf import compute_world_transforms

    gf = info["gltf"]
    nodes = copy.deepcopy(gf.json.get("nodes", []))
    anims = parse_animations(gf)
    if anims and animation_index < len(anims):
        apply_animation(nodes, anims[animation_index], time)
    world = compute_world_transforms(gf.json, nodes)

    positions = scene.positions
    normals = scene.normals
    vert_pack = scene.vert_pack
    for b in host.get("skin_bindings", []):
        skin = info["skins"][b["skin"]]
        jm = jnp.asarray(joint_matrices(world, skin))
        p, n = skin_vertices(jnp.asarray(b["rest_positions"]),
                             jnp.asarray(b["rest_normals"]),
                             jnp.asarray(b["joints"]),
                             jnp.asarray(b["weights"]), jm)
        s, c = b["vertex_start"], b["vertex_count"]
        positions = positions.at[s:s + c].set(p)
        normals = normals.at[s:s + c].set(n)
        if vert_pack is not None:
            vert_pack = vert_pack.at[s:s + c, 0:3].set(p)
            vert_pack = vert_pack.at[s:s + c, 3:6].set(n)

    # rigid node animation: re-flatten the vertex range of any instance
    # whose source node transform moved (donut SceneGraph transform
    # refresh; RTXPT per-frame TLAS rebuild, Sample.cpp:1353-1421). The
    # transform happens in host numpy (cheap: V*10 floats) and uploads
    # as one .set per moved instance.
    moved = []
    for b in host.get("rigid_bindings", []):
        xf = np.asarray(world[b["node"]], np.float32)
        if np.allclose(xf, b["baked_transform"], atol=1e-7):
            continue
        moved.append((b["instance"], xf))
        lin = xf[:, :3]
        p = b["rest_positions"] @ lin.T + xf[:, 3]
        nrm_m = np.linalg.inv(lin).T
        n = b["rest_normals"] @ nrm_m.T
        n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
        t = b["rest_tangents"].copy()
        t[:, :3] = t[:, :3] @ lin.T
        t[:, :3] /= np.maximum(
            np.linalg.norm(t[:, :3], axis=-1, keepdims=True), 1e-20)
        p = p.astype(np.float32)
        n = n.astype(np.float32)
        s, c = b["vertex_start"], b["vertex_count"]
        positions = positions.at[s:s + c].set(p)
        normals = normals.at[s:s + c].set(n)
        if vert_pack is not None:
            vert_pack = vert_pack.at[s:s + c, 0:3].set(p)
            vert_pack = vert_pack.at[s:s + c, 3:6].set(n)
            vert_pack = vert_pack.at[s:s + c, 6:10].set(t)
        inst = host.get("instancing")
        if inst is not None:
            # keep the retained instance table in sync so instanced-TLAS
            # consumers (ops/instanced.set_instance_transform) and later
            # rebuilds see the animated pose
            inst["transforms"][b["instance"]] = xf
    from .types import tri_geom_pack as _tg
    tri_geom = _tg(positions, scene.uvs, scene.indices, jnp) \
        if scene.tri_geom_pack is not None else None
    scene = scene._replace(positions=positions, normals=normals,
                           vert_pack=vert_pack, tri_geom_pack=tri_geom)
    if scene.vert_gp is not None:
        # the MXU gather planes are derived data — refresh them or
        # load_surface shades the REST pose after skinning
        from ..ops import gather_pallas as GPL
        scene = scene._replace(
            vert_gp=GPL.pack_f32_device(vert_pack),
            tri_geom_gp=(GPL.pack_f32_device(tri_geom)
                         if tri_geom is not None else None))
    if hasattr(bvh8, "refit_info") and bvh8.refit_info is not None:
        bvh8 = refit_bvh8(bvh8, positions, scene.indices)
    elif hasattr(bvh8, "inst_inv"):
        # instanced TLAS: rigid motion is a row update, no BLAS touch
        # (RTXPT per-frame TLAS build over static BLASes)
        from ..ops.instanced import set_instance_transform
        for iid, xf in moved:
            bvh8 = set_instance_transform(bvh8, host["instancing"],
                                          iid, xf)
    elif moved or host.get("skin_bindings"):
        import warnings
        warnings.warn("animated geometry over a BVH type without a "
                      "refit path (two-level soup): acceleration "
                      "structure is stale this frame")
    return scene, bvh8
