"""Host-side scene assembly (numpy): mesh pool + instance flattening.

Equivalent of donut::engine::Scene::CreateMeshBuffers + SceneGraph transform
refresh (donut/src/engine/Scene.cpp, SceneGraph.cpp) in numpy. Instances are
flattened to world space; the result uploads as one SceneArrays pytree.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from .types import MaterialTable, SceneArrays, default_material_table


@dataclasses.dataclass
class Mesh:
    """One geometry in object space."""
    positions: np.ndarray            # (V,3)
    indices: np.ndarray              # (T,3)
    normals: Optional[np.ndarray] = None
    tangents: Optional[np.ndarray] = None   # (V,4)
    uvs: Optional[np.ndarray] = None
    material: int = 0                # material id
    joints: Optional[np.ndarray] = None     # (V,4) i32 skin joints
    weights: Optional[np.ndarray] = None    # (V,4) f32 skin weights


@dataclasses.dataclass
class Instance:
    mesh: int                        # mesh id
    transform: np.ndarray            # (3,4) affine, row-major
    material_override: int = -1
    skin: int = -1                   # skin id (scene/gltf skins list)
    node: int = -1                   # source scene-graph node (rigid
    #                                  animation retargets this instance)


def compute_vertex_normals(positions: np.ndarray,
                           indices: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals."""
    p0 = positions[indices[:, 0]]
    p1 = positions[indices[:, 1]]
    p2 = positions[indices[:, 2]]
    fn = np.cross(p1 - p0, p2 - p0)
    n = np.zeros_like(positions)
    for k in range(3):
        np.add.at(n, indices[:, k], fn)
    l = np.linalg.norm(n, axis=-1, keepdims=True)
    return (n / np.maximum(l, 1e-20)).astype(np.float32)


def compute_tangents(positions, normals, uvs, indices) -> np.ndarray:
    """MikkTSpace-style averaged tangents from UV derivatives; falls back to
    an arbitrary frame where UVs are degenerate."""
    v = positions.shape[0]
    tan = np.zeros((v, 3), np.float64)
    p = [positions[indices[:, k]] for k in range(3)]
    t = [uvs[indices[:, k]] for k in range(3)]
    e1, e2 = p[1] - p[0], p[2] - p[0]
    du1, dv1 = t[1][:, 0] - t[0][:, 0], t[1][:, 1] - t[0][:, 1]
    du2, dv2 = t[2][:, 0] - t[0][:, 0], t[2][:, 1] - t[0][:, 1]
    r = du1 * dv2 - du2 * dv1
    r = np.where(np.abs(r) < 1e-12, 1.0, r)
    tdir = ((dv2[:, None] * e1 - dv1[:, None] * e2) / r[:, None])
    for k in range(3):
        np.add.at(tan, indices[:, k], tdir)
    # Gram-Schmidt against the normal
    tan -= normals * np.sum(tan * normals, axis=-1, keepdims=True)
    l = np.linalg.norm(tan, axis=-1, keepdims=True)
    bad = l[:, 0] < 1e-8
    # fallback frame for degenerate UVs
    alt = np.cross(normals, np.array([0.0, 1.0, 0.0]))
    alt2 = np.cross(normals, np.array([1.0, 0.0, 0.0]))
    alt = np.where(np.linalg.norm(alt, axis=-1, keepdims=True) < 1e-4,
                   alt2, alt)
    tan = np.where(bad[:, None], alt, tan / np.maximum(l, 1e-20))
    w = np.ones((v, 1), np.float32)
    return np.concatenate([tan.astype(np.float32), w], axis=-1)


class SceneBuilder:
    """Accumulates meshes/instances/materials; `finish()` flattens to world
    space and returns host-side numpy SceneArrays fields."""

    def __init__(self):
        self.meshes: List[Mesh] = []
        self.instances: List[Instance] = []
        self.material_fields: dict = {k: [] for k in
                                      default_material_table(0)}
        self._nmat = 0

    def add_material(self, **kwargs) -> int:
        defaults = default_material_table(1)
        for k, arr in defaults.items():
            v = kwargs.pop(k, arr[0])
            self.material_fields[k].append(np.asarray(v, arr.dtype))
        if kwargs:
            raise ValueError(f"unknown material fields: {list(kwargs)}")
        self._nmat += 1
        return self._nmat - 1

    def add_mesh(self, mesh: Mesh) -> int:
        self.meshes.append(mesh)
        return len(self.meshes) - 1

    def add_instance(self, mesh: int, transform: Optional[np.ndarray] = None,
                     material_override: int = -1, skin: int = -1,
                     node: int = -1) -> int:
        if transform is None:
            transform = np.eye(3, 4, dtype=np.float32)
        self.instances.append(Instance(mesh, np.asarray(transform,
                                                        np.float32),
                                       material_override, skin, node))
        return len(self.instances) - 1

    def finish(self) -> dict:
        if self._nmat == 0:
            self.add_material()
        pos_l, nrm_l, tan_l, uv_l, idx_l, mat_l, inst_l = \
            [], [], [], [], [], [], []
        skin_bindings = []
        rigid_bindings = []
        voffset = 0
        for iid, inst in enumerate(self.instances):
            m = self.meshes[inst.mesh]
            xf = inst.transform
            p = m.positions @ xf[:, :3].T + xf[:, 3]
            # normal matrix = inverse-transpose of linear part
            lin = xf[:, :3]
            nrm_m = np.linalg.inv(lin).T
            n = m.normals if m.normals is not None else \
                compute_vertex_normals(m.positions, m.indices)
            n = n @ nrm_m.T
            n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
            uv = m.uvs if m.uvs is not None else \
                np.zeros((p.shape[0], 2), np.float32)
            if m.tangents is not None:
                t4 = m.tangents.copy()
                t4[:, :3] = t4[:, :3] @ lin.T
                t4[:, :3] /= np.maximum(
                    np.linalg.norm(t4[:, :3], axis=-1, keepdims=True), 1e-20)
            else:
                t4 = compute_tangents(p, n, uv, m.indices)
            pos_l.append(p.astype(np.float32))
            nrm_l.append(n.astype(np.float32))
            tan_l.append(t4.astype(np.float32))
            uv_l.append(uv.astype(np.float32))
            inst_idx = m.indices.astype(np.int32)
            if np.linalg.det(lin) < 0.0:
                # mirroring transform: flip winding so geometric face
                # normals stay consistent with the transformed shading
                # normals (emission sidedness depends on winding)
                inst_idx = inst_idx[:, ::-1]
            idx_l.append(inst_idx + voffset)
            mid = (inst.material_override if inst.material_override >= 0
                   else m.material)
            mat_l.append(np.full((m.indices.shape[0],), mid, np.int32))
            inst_l.append(np.full((m.indices.shape[0],), iid, np.int32))
            if inst.skin >= 0 and m.joints is not None:
                # skinned instance: remember object-space rest pose +
                # joints/weights; per-frame skinning replaces this vertex
                # range (donut Scene::Refresh skinning_cs path)
                skin_bindings.append(dict(
                    instance=iid, skin=inst.skin,
                    vertex_start=voffset, vertex_count=p.shape[0],
                    rest_positions=np.asarray(m.positions, np.float32),
                    rest_normals=np.asarray(
                        m.normals if m.normals is not None else
                        compute_vertex_normals(m.positions, m.indices),
                        np.float32),
                    joints=np.asarray(m.joints, np.int32),
                    weights=np.asarray(m.weights, np.float32)))
            elif inst.node >= 0:
                # rigid instance rooted at a scene-graph node: remember
                # the object-space rest geometry + baked transform so a
                # node-TRS animation can re-flatten just this vertex
                # range per frame (donut SceneGraph transform refresh,
                # SceneGraph.cpp; RTXPT rebuilds the TLAS row instead —
                # the flattened path re-bakes the range)
                rest_n = (m.normals if m.normals is not None else
                          compute_vertex_normals(m.positions, m.indices))
                if m.tangents is not None:
                    rest_t = np.asarray(m.tangents, np.float32)
                else:
                    rest_uv = (m.uvs if m.uvs is not None else
                               np.zeros((m.positions.shape[0], 2),
                                        np.float32))
                    rest_t = compute_tangents(
                        np.asarray(m.positions, np.float32),
                        np.asarray(rest_n, np.float32), rest_uv,
                        m.indices)
                rigid_bindings.append(dict(
                    instance=iid, node=inst.node,
                    vertex_start=voffset, vertex_count=p.shape[0],
                    baked_transform=np.asarray(xf, np.float32).copy(),
                    rest_positions=np.asarray(m.positions, np.float32),
                    rest_normals=np.asarray(rest_n, np.float32),
                    rest_tangents=np.asarray(rest_t, np.float32)))
            voffset += p.shape[0]

        mats = {k: np.stack(v) if np.ndim(v[0]) else np.array(v)
                for k, v in self.material_fields.items()}
        if not idx_l:
            # degenerate never-hit triangle so gathers stay well-formed in
            # empty scenes (Moller-Trumbore rejects zero-area triangles)
            pos_l = [np.zeros((3, 3), np.float32)]
            nrm_l = [np.tile(np.asarray([[0, 1, 0]], np.float32), (3, 1))]
            tan_l = [np.tile(np.asarray([[1, 0, 0, 1]], np.float32),
                             (3, 1))]
            uv_l = [np.zeros((3, 2), np.float32)]
            idx_l = [np.asarray([[0, 1, 2]], np.int32)]
            mat_l = [np.zeros((1,), np.int32)]
            inst_l = [np.zeros((1,), np.int32)]
        # instancing metadata: the un-flattened structure the instanced
        # TLAS/BLAS path needs (ops/instanced.py) — per-instance mesh id
        # + transform + flat-triangle offset, and the object-space
        # geometry of each unique mesh (RTXPT/Sample.cpp:1353-1421's
        # TLAS-over-BLAS shape)
        tri_offsets = []
        off = 0
        for inst in self.instances:
            tri_offsets.append(off)
            off += self.meshes[inst.mesh].indices.shape[0]
        instancing = dict(
            mesh_of_instance=np.asarray(
                [i.mesh for i in self.instances], np.int32),
            transforms=(np.stack([i.transform for i in self.instances])
                        .astype(np.float32) if self.instances
                        else np.zeros((0, 3, 4), np.float32)),
            tri_offset=np.asarray(tri_offsets, np.int32),
            meshes=[dict(positions=np.asarray(m.positions, np.float32),
                         indices=np.asarray(m.indices, np.int32))
                    for m in self.meshes],
        ) if self.instances else None
        return dict(
            instancing=instancing,
            positions=np.concatenate(pos_l) if pos_l
            else np.zeros((0, 3), np.float32),
            normals=np.concatenate(nrm_l) if nrm_l
            else np.zeros((0, 3), np.float32),
            tangents=np.concatenate(tan_l) if tan_l
            else np.zeros((0, 4), np.float32),
            uvs=np.concatenate(uv_l) if uv_l
            else np.zeros((0, 2), np.float32),
            indices=np.concatenate(idx_l) if idx_l
            else np.zeros((0, 3), np.int32),
            tri_mat=np.concatenate(mat_l) if mat_l
            else np.zeros((0,), np.int32),
            tri_instance=np.concatenate(inst_l) if inst_l
            else np.zeros((0,), np.int32),
            materials=mats,
            skin_bindings=skin_bindings,
            rigid_bindings=rigid_bindings,
        )


def to_device(host: dict, textures=None) -> SceneArrays:
    """Upload host dict from SceneBuilder.finish() as a SceneArrays pytree."""
    import numpy as _np
    import jax.numpy as jnp
    from .types import pack_gather_planes
    mt = MaterialTable(**{k: jnp.asarray(v)
                          for k, v in host["materials"].items()})
    # packed planes computed host-side (numpy broadcasting through the
    # jnp API would be eager per-op dispatches on the TPU tunnel)
    mt_np = MaterialTable(**{k: _np.asarray(v)
                             for k, v in host["materials"].items()})
    vp, tp, tg, mp = pack_gather_planes(
        _np.asarray(host["positions"]), _np.asarray(host["normals"]),
        _np.asarray(host["tangents"]), _np.asarray(host["uvs"]),
        _np.asarray(host["indices"]), _np.asarray(host["tri_mat"]), mt_np)
    from ..ops import gather_pallas as GP
    vert_gp = GP.pack_f32(vp) if GP.supported(vp.shape[0]) else None
    tri_gp = GP.pack_i32(tp) if GP.supported(tp.shape[0]) else None
    tri_geom_gp = GP.pack_f32(tg) if GP.supported(tg.shape[0]) else None
    mat_gp = GP.pack_f32(mp) if GP.supported(mp.shape[0]) else None
    return SceneArrays(
        positions=jnp.asarray(host["positions"]),
        normals=jnp.asarray(host["normals"]),
        tangents=jnp.asarray(host["tangents"]),
        uvs=jnp.asarray(host["uvs"]),
        indices=jnp.asarray(host["indices"]),
        tri_mat=jnp.asarray(host["tri_mat"]),
        tri_instance=jnp.asarray(host["tri_instance"]),
        materials=mt,
        textures=textures,
        vert_pack=jnp.asarray(vp),
        tri_pack=jnp.asarray(tp),
        tri_geom_pack=jnp.asarray(tg),
        mat_pack=jnp.asarray(mp),
        vert_gp=vert_gp, tri_gp=tri_gp, tri_geom_gp=tri_geom_gp,
        mat_gp=mat_gp,
    )
