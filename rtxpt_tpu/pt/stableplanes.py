"""Stable-planes path-space decomposition (up to 3 planes).

TPU-native re-architecture of the reference's denoising decomposition:
  - RTXPT/PathTracer/StablePlanes.hlsli (StablePlane struct, branch IDs,
    hitT accumulation, plane headers)
  - RTXPT/PathTracer/PathTracerStablePlanes.hlsli (BUILD-pass delta-tree
    exploration :95-246, FILL-pass routing :248-462)
  - driven from RTXPT/Sample.cpp:2281-2440 (BUILD -> export -> FILL ->
    per-plane denoise -> merge)

The BUILD pass walks the pure-delta tree of each pixel (mirror/glass
chains), choosing up to P stable vertices ("planes"): the wavefront
version processes plane slots sequentially; pending branch forks are
enqueued into later slots with masked writes (the reference uses a
per-pixel payload queue, Sample.hlsl nextHit loop). Branch IDs use the
reference encoding exactly: root=1, advance = (id << 2) | lobe_id, so a
plane's ID is a base-4 prefix code of the delta path that reaches it.

The FILL pass (pt/integrator.py, cfg.mode == MODE_FILL_STABLE_PLANES)
traces noisy paths that deposit diffuse/specular radiance + hitT onto the
plane whose branch they travel; per-plane denoisers then run on clean
per-plane guides (models/realtime.py).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import mathutils as mu
from ..ops import traverse
from ..scene import envmap as EM
from ..scene.camera import CameraData, compute_rays
from . import bsdf as B
from . import nested
from . import shading

INVALID_BRANCH = jnp.uint32(0xFFFFFFFF)
ROOT_BRANCH = jnp.uint32(1)
MAX_VERTEX = 15                  # cStablePlaneMaxVertexIndex
# delta lobe ids (reference: evalDeltaLobes order; 2 bits per vertex)
LOBE_ID_TRANSMISSION = jnp.uint32(0)
LOBE_ID_REFLECTION = jnp.uint32(1)

K_DELTA_IGNORE = 0.001           # deltaIgnoreThreshold
K_NON_DELTA_IGNORE = 1e-5        # nonDeltaIgnoreThreshold


def advance_branch_id(branch_id, lobe_id):
    """StablePlanesAdvanceBranchID (StablePlanes.hlsli:300)."""
    return (branch_id << 2) | lobe_id


def branch_vertex_index(branch_id):
    """StablePlanesVertexIndexFromBranchID: firstbithigh(id)/2+1."""
    safe = jnp.maximum(branch_id, 1)
    high = 31 - jax.lax.clz(safe.astype(jnp.uint32)).astype(jnp.int32)
    return high // 2 + 1


def is_on_plane(plane_branch, vertex_branch):
    return (plane_branch == vertex_branch) & (plane_branch != INVALID_BRANCH)


def is_on_stable_path(plane_branch, vertex_branch, vertex_index):
    """Prefix test (StablePlanes.hlsli:323-328)."""
    pvi = branch_vertex_index(plane_branch)
    shift = jnp.maximum(pvi - vertex_index, 0).astype(jnp.uint32) * 2
    ok = (plane_branch >> shift) == vertex_branch
    return ok & (vertex_index <= pvi) & (plane_branch != INVALID_BRANCH)


def accumulate_hit_t(current, segment_t, bounces_from_plane, delta_only):
    """StablePlaneAccumulateSampleHitT (StablePlanes.hlsli:339-349):
    first bounce from the plane records hitT; one glass-like entry/exit
    pair is allowed to pass through; later bounces keep the value."""
    return jnp.where(
        bounces_from_plane == 1, segment_t,
        jnp.where((bounces_from_plane > 1) & (bounces_from_plane <= 3)
                  & delta_only, current + segment_t, current))


def combine_hit_t(cur4, new3, new_t):
    """StablePlaneCombineWithHitTCompensation: sum radiance, blend hitT
    by luminance weight."""
    lc = mu.luminance(cur4[..., :3])
    ln = mu.luminance(new3)
    tot = lc + ln
    t = jnp.where(tot > 1e-9,
                  (cur4[..., 3] * lc + new_t * ln) / jnp.maximum(tot, 1e-9),
                  jnp.maximum(cur4[..., 3], new_t))
    return jnp.concatenate([cur4[..., :3] + new3, t[..., None]], -1)


class StablePlanes(NamedTuple):
    """Per-pixel plane SoA; every array is (N, P) or (N, P, C)."""
    branch_id: jnp.ndarray       # (N,P) u32; INVALID_BRANCH = empty
    vertex_index: jnp.ndarray    # (N,P) i32
    prim: jnp.ndarray            # (N,P) i32 base hit (-1 = sky plane)
    bary: jnp.ndarray            # (N,P,2)
    ray_dir: jnp.ndarray         # (N,P,3) incoming dir at the base
    scene_length: jnp.ndarray    # (N,P)
    thp: jnp.ndarray             # (N,P,3) throughput camera->base
    interior: jnp.ndarray        # (N,P,2) u32 nested stack at the base
    normal: jnp.ndarray          # (N,P,3) denoiser guide
    roughness: jnp.ndarray       # (N,P)
    diff_est: jnp.ndarray        # (N,P,3) thp-weighted diffuse BSDF est.
    spec_est: jnp.ndarray        # (N,P,3)
    view_z: jnp.ndarray          # (N,P) linear depth (first-hit frame)
    motion: jnp.ndarray          # (N,P,2) screen-space motion (px)
    pos: jnp.ndarray             # (N,P,3) base world position
    dominant: jnp.ndarray        # (N,) i32 dominant plane index
    first_hit_t: jnp.ndarray     # (N,)
    stable_radiance: jnp.ndarray  # (N,3) emission along the delta tree

    @property
    def count(self) -> int:
        return self.branch_id.shape[1]


def _delta_lobes(surf, bsdf):
    """Per-lane delta lobes of the standard BSDF (evalDeltaLobes
    equivalent): returns (refl_dir, refl_thp, trans_dir, trans_thp,
    non_delta_mass). Thin surfaces transmit straight through."""
    sd = surf.sd
    n = sd.n
    cos_i = jnp.sum(sd.v * n, -1)
    f, cos_t = B.fresnel_dielectric(bsdf.eta, cos_i)
    # NB: Falcor's dielectric interface lobe (SpecularReflectionTrans-
    # missionMicrofacet) handles BOTH reflect and refract: a smooth
    # transmissive surface has p_specular == 0 but still reflects via
    # Fresnel inside the transmission lobe
    is_delta_t = (bsdf.alpha_t == 0.0) & (bsdf.p_specular_t > 0.0)
    is_delta_r = ((bsdf.alpha == 0.0) & (bsdf.p_specular > 0.0)) \
        | is_delta_t

    refl_dir = mu.reflect(-sd.v, n)
    thin = sd.thin_surface
    refr_dir = mu.safe_normalize(
        (bsdf.eta * cos_i - cos_t)[..., None] * n
        - bsdf.eta[..., None] * sd.v)
    trans_dir = jnp.where(thin[..., None], -sd.v, refr_dir)

    is_metal = bsdf.p_specular > bsdf.p_specular_t
    metal_w = B.fresnel_schlick(bsdf.spec_albedo, 1.0, cos_i[..., None])
    refl_thp = jnp.where(is_metal[..., None], metal_w,
                         f[..., None] * jnp.ones_like(metal_w))
    refl_thp = jnp.where(is_delta_r[..., None], refl_thp, 0.0)
    trans_thp = jnp.where(is_delta_t[..., None],
                          (1.0 - f)[..., None] * bsdf.trans_albedo, 0.0)
    non_delta = bsdf.p_diffuse + bsdf.p_diffuse_t \
        + jnp.where(bsdf.alpha > 0.0, bsdf.p_specular, 0.0) \
        + jnp.where(bsdf.alpha_t > 0.0, bsdf.p_specular_t, 0.0)
    return refl_dir, refl_thp, trans_dir, trans_thp, non_delta


def _bsdf_estimates(surf, bsdf):
    """estimateSpecDiffBSDF guide albedos (StandardBSDF.hlsli:116-121)."""
    d = surf.bsdf_data
    diff = (1.0 - d.diffuse_transmission[..., None]) * \
        (1.0 - d.specular_transmission[..., None]) * d.diffuse
    spec = (1.0 - d.specular_transmission[..., None]) * d.specular \
        + d.specular_transmission[..., None] * d.transmission
    return diff, spec


def build_stable_planes(assets, cam: CameraData, prev_cam: CameraData,
                        px, py, *, plane_count: int = 3,
                        max_vertex_depth: int = 6,
                        compaction: bool = True,
                        compaction_min: int = 16384) -> StablePlanes:
    """BUILD pass: per-pixel delta-tree walk choosing up to plane_count
    stable vertices (PathTracerStablePlanes.hlsli:95-246).

    Wavefront structure: plane slots are processed sequentially; each
    slot walks its pending branch's delta chain to a base vertex,
    enqueueing significant sibling delta lobes into later free slots."""
    from .gbuffer import project_to_screen

    n = px.shape[0]
    P = plane_count
    origin0, dir0 = compute_rays(cam, px, py)

    f1 = lambda shape, v=0.0: jnp.full(shape, v, jnp.float32)
    # pending-branch queue (slot p): ray + path state to explore
    q_origin = jnp.zeros((n, P, 3))
    q_dir = jnp.zeros((n, P, 3))
    q_thp = jnp.zeros((n, P, 3))
    q_branch = jnp.full((n, P), INVALID_BRANCH, jnp.uint32)
    q_interior = jnp.zeros((n, P, 2), jnp.uint32)
    q_scene_len = f1((n, P))
    q_vertex = jnp.zeros((n, P), jnp.int32)
    q_valid = jnp.zeros((n, P), bool)

    q_origin = q_origin.at[:, 0].set(origin0)
    q_dir = q_dir.at[:, 0].set(dir0)
    q_thp = q_thp.at[:, 0].set(1.0)
    q_branch = q_branch.at[:, 0].set(ROOT_BRANCH)
    q_valid = q_valid.at[:, 0].set(True)

    # plane outputs
    sp = StablePlanes(
        branch_id=jnp.full((n, P), INVALID_BRANCH, jnp.uint32),
        vertex_index=jnp.zeros((n, P), jnp.int32),
        prim=jnp.full((n, P), -1, jnp.int32),
        bary=jnp.zeros((n, P, 2)),
        ray_dir=jnp.zeros((n, P, 3)),
        scene_length=f1((n, P)),
        thp=jnp.zeros((n, P, 3)),
        interior=jnp.zeros((n, P, 2), jnp.uint32),
        normal=jnp.zeros((n, P, 3)),
        roughness=f1((n, P)),
        diff_est=jnp.zeros((n, P, 3)),
        spec_est=jnp.zeros((n, P, 3)),
        view_z=f1((n, P), mu.K_MAX_RAY_TRAVEL),
        motion=jnp.zeros((n, P, 2)),
        pos=jnp.zeros((n, P, 3)),
        dominant=jnp.zeros((n,), jnp.int32),
        first_hit_t=f1((n,), mu.K_MAX_RAY_TRAVEL),
        stable_radiance=jnp.zeros((n, 3)))
    next_free = jnp.ones((n,), jnp.int32)   # slot 0 occupied

    cur_xy0 = jnp.stack([px.astype(jnp.float32),
                         py.astype(jnp.float32)], -1)

    def store_plane(sp, slot_idx, lanes, branch, vertex, prim, bary,
                    ray_dir, scene_len, thp, interior, normal, rough,
                    diff_e, spec_e, pos, is_sky, cur_xy):
        """Masked write of plane `slot_idx` (static) for `lanes`.
        Width-agnostic: all lane args (incl. cur_xy) may be narrower
        than the full wavefront when the compacted walk calls it."""
        w1 = lanes
        w2 = lanes[:, None]
        upd = lambda arr, val: arr.at[:, slot_idx].set(
            jnp.where(w2 if arr.ndim == 3 else w1,
                      val, arr[:, slot_idx]))
        sp = sp._replace(
            branch_id=upd(sp.branch_id, branch),
            vertex_index=upd(sp.vertex_index, vertex),
            prim=upd(sp.prim, jnp.where(is_sky, -1, prim)),
            bary=upd(sp.bary, bary),
            ray_dir=upd(sp.ray_dir, ray_dir),
            scene_length=upd(sp.scene_length, scene_len),
            thp=upd(sp.thp, thp),
            interior=upd(sp.interior, interior),
            normal=upd(sp.normal, normal),
            roughness=upd(sp.roughness, rough),
            diff_est=upd(sp.diff_est, jnp.clip(diff_e * thp, 0.04, 6.5e4)),
            spec_est=upd(sp.spec_est, jnp.clip(spec_e * thp, 0.04, 6.5e4)))
        # motion + view_z from the base world position (sky: max depth,
        # env motion from direction reprojection)
        prev_xy, _ = project_to_screen(prev_cam, pos)
        _, view_z = project_to_screen(cam, pos)
        big = mu.K_MAX_RAY_TRAVEL
        sky_pos_xy, _ = project_to_screen(
            prev_cam._replace(pos=cam.pos), pos)  # env: rotation only
        motion = jnp.where(is_sky[:, None], sky_pos_xy - cur_xy,
                           prev_xy - cur_xy)
        sp = sp._replace(
            view_z=upd(sp.view_z, jnp.where(is_sky, big, view_z)),
            motion=upd(sp.motion, motion),
            pos=upd(sp.pos, pos))
        return sp

    env = assets.env

    for slot in range(P):
        # walk the pending branch in queue slot `slot`
        origin = q_origin[:, slot]
        direction = q_dir[:, slot]
        thp = q_thp[:, slot]
        branch = q_branch[:, slot]
        interior = q_interior[:, slot]
        scene_len = q_scene_len[:, slot]
        vertex = q_vertex[:, slot]
        walking = q_valid[:, slot]

        def walk_body(carry):
            (origin, direction, thp, branch, interior, scene_len, vertex,
             walking, sp, q_origin, q_dir, q_thp, q_branch, q_interior,
             q_scene_len, q_vertex, q_valid, next_free, cur_xy,
             it) = carry
            nb = origin.shape[0]   # width-agnostic: the compacted walk
            #                        re-traces this body at narrow width
            hit = traverse.trace_closest(assets.bvh, assets.soup, origin,
                                         direction, active=walking,
                                         dense=assets.dense)
            vertex = vertex + walking.astype(jnp.int32)
            seg_t = jnp.where(hit.valid, hit.t, mu.K_MAX_RAY_TRAVEL)
            scene_len = jnp.where(walking,
                                  scene_len + seg_t, scene_len)
            if slot == 0:
                sp = sp._replace(first_hit_t=jnp.where(
                    walking & (it == 0), seg_t, sp.first_hit_t))

            # miss -> sky plane (StablePlanesHandleMiss BUILD)
            missed = walking & ~hit.valid
            env_le = EM.eval_dir(env, direction)
            sp = sp._replace(stable_radiance=sp.stable_radiance + jnp.where(
                missed[:, None], thp * env_le, 0.0))
            sp = store_plane(
                sp, slot, missed, branch, vertex, hit.prim, hit.bary,
                direction, scene_len, thp, interior, -direction,
                jnp.ones((nb,)), jnp.ones((nb, 3)), jnp.ones((nb, 3)),
                origin + direction, jnp.ones((nb,), bool), cur_xy)

            surf = shading.load_surface(assets.scene,
                                        jnp.maximum(hit.prim, 0), hit.bary,
                                        direction)
            sd = surf.sd
            hit_lane = walking & hit.valid

            # Beer-Lambert absorption along chain segments inside media
            in_medium = ~nested.is_empty(interior)
            top_mat = jnp.minimum(
                nested.top_material(interior),
                jnp.uint32(assets.scene.materials.ior.shape[0] - 1)
            ).astype(jnp.int32)
            sigma = assets.scene.materials.volume_absorption[top_mat]
            thp = jnp.where((hit_lane & in_medium)[:, None],
                            thp * jnp.exp(-sigma * hit.t[..., None]), thp)

            # emission along the stable tree is collected ONCE here
            # (FILL paths on stable branches skip it)
            sp = sp._replace(stable_radiance=sp.stable_radiance + jnp.where(
                hit_lane[:, None], thp * surf.emission, 0.0))

            bsdf = shading.make_wavefront_bsdf(surf)
            refl_dir, refl_thp, trans_dir, trans_thp, non_delta = \
                _delta_lobes(surf, bsdf)
            path_lum = mu.luminance(thp)
            refl_sig = path_lum * mu.luminance(refl_thp) > K_DELTA_IGNORE
            trans_sig = path_lum * mu.luminance(trans_thp) > K_DELTA_IGNORE
            has_non_delta = non_delta > K_NON_DELTA_IGNORE
            n_lobes = refl_sig.astype(jnp.int32) + \
                trans_sig.astype(jnp.int32)

            depth_ok = (vertex < max_vertex_depth) & \
                (vertex < MAX_VERTEX)
            # continue rules (PathTracerStablePlanes.hlsli:150-155):
            # plane 0 may continue only as pure PSR (single delta lobe);
            # later planes continue on any delta lobe; any non-delta
            # lobe forces a base
            can_continue = hit_lane & depth_ok & ~has_non_delta & (
                (n_lobes == 1) if slot == 0 else (n_lobes >= 1))
            if slot == 0:
                can_continue = can_continue & (n_lobes == 1)

            # reuse lobe: reference pops the LAST significant lobe
            # (list order: transmission, reflection -> reuse=reflection
            # when both; here prefer the higher-throughput lobe, which
            # keeps glass view-through on the denoised dominant path)
            take_trans = trans_sig & (
                ~refl_sig | (mu.luminance(trans_thp)
                             >= mu.luminance(refl_thp)))
            cont_dir = jnp.where(take_trans[:, None], trans_dir, refl_dir)
            cont_thp = jnp.where(take_trans[:, None], trans_thp, refl_thp)
            cont_lobe = jnp.where(take_trans, LOBE_ID_TRANSMISSION,
                                  LOBE_ID_REFLECTION)

            # ---- enqueue delta-lobe forks into free plane slots.
            # The reference enqueues EVERY significant delta lobe except
            # the one the current path reuses — including at junctions
            # that become a base (e.g. a glass surface forks both its
            # reflection and refraction as planes 1/2 while itself being
            # base plane 0). (PathTracerStablePlanes.hlsli:195-211)
            if slot < P - 1:
                primary_sig = jnp.where(take_trans, trans_sig, refl_sig)
                sib_sig = jnp.where(take_trans, refl_sig, trans_sig)
                enq_ok = hit_lane & depth_ok

                def enqueue(args, want, use_primary):
                    (q_origin, q_dir, q_thp, q_branch, q_interior,
                     q_scene_len, q_vertex, q_valid, next_free) = args
                    if use_primary:
                        e_dir, e_thp_f = cont_dir, cont_thp
                        e_lobe = cont_lobe
                        e_trans = take_trans
                    else:
                        e_dir = jnp.where(take_trans[:, None], refl_dir,
                                          trans_dir)
                        e_thp_f = jnp.where(take_trans[:, None], refl_thp,
                                            trans_thp)
                        e_lobe = jnp.where(take_trans, LOBE_ID_REFLECTION,
                                           LOBE_ID_TRANSMISSION)
                        e_trans = ~take_trans
                    fork = want & (next_free < P)
                    e_thp = thp * e_thp_f
                    e_branch = advance_branch_id(branch, e_lobe)
                    e_origin = sd.compute_new_ray_origin(~e_trans)
                    e_interior = jnp.where(
                        (fork & e_trans & ~sd.thin_surface)[:, None],
                        nested.handle_intersection(
                            interior, sd.material_id, sd.nested_priority,
                            sd.front_facing), interior)
                    for tgt in range(slot + 1, P):
                        m = fork & (next_free == tgt)
                        m2 = m[:, None]
                        q_origin = q_origin.at[:, tgt].set(
                            jnp.where(m2, e_origin, q_origin[:, tgt]))
                        q_dir = q_dir.at[:, tgt].set(
                            jnp.where(m2, e_dir, q_dir[:, tgt]))
                        q_thp = q_thp.at[:, tgt].set(
                            jnp.where(m2, e_thp, q_thp[:, tgt]))
                        q_branch = q_branch.at[:, tgt].set(
                            jnp.where(m, e_branch, q_branch[:, tgt]))
                        q_interior = q_interior.at[:, tgt].set(
                            jnp.where(m2, e_interior, q_interior[:, tgt]))
                        q_scene_len = q_scene_len.at[:, tgt].set(
                            jnp.where(m, scene_len, q_scene_len[:, tgt]))
                        q_vertex = q_vertex.at[:, tgt].set(
                            jnp.where(m, vertex, q_vertex[:, tgt]))
                        q_valid = q_valid.at[:, tgt].set(
                            q_valid[:, tgt] | m)
                    next_free = next_free + fork.astype(jnp.int32)
                    return (q_origin, q_dir, q_thp, q_branch, q_interior,
                            q_scene_len, q_vertex, q_valid, next_free)

                args = (q_origin, q_dir, q_thp, q_branch, q_interior,
                        q_scene_len, q_vertex, q_valid, next_free)
                # base junctions fork the primary lobe too
                args = enqueue(args, enq_ok & ~can_continue & primary_sig,
                               True)
                # the sibling lobe forks in both cases
                args = enqueue(args, enq_ok & sib_sig, False)
                (q_origin, q_dir, q_thp, q_branch, q_interior,
                 q_scene_len, q_vertex, q_valid, next_free) = args

            # base vertex: store the plane
            set_base = hit_lane & ~can_continue
            diff_e, spec_e = _bsdf_estimates(surf, bsdf)
            rough = jnp.where(bsdf.alpha < B.K_MIN_GGX_ALPHA, 0.0,
                              surf.bsdf_data.roughness)
            sp = store_plane(
                sp, slot, set_base, branch, vertex, hit.prim, hit.bary,
                direction, scene_len, thp, interior, sd.n, rough, diff_e,
                spec_e, sd.pos, jnp.zeros((nb,), bool), cur_xy)

            # step the chain along the reuse lobe
            stepping = can_continue
            new_interior = jnp.where(
                (stepping & take_trans & ~sd.thin_surface)[:, None],
                nested.handle_intersection(interior, sd.material_id,
                                           sd.nested_priority,
                                           sd.front_facing), interior)
            origin = jnp.where(stepping[:, None],
                               sd.compute_new_ray_origin(~take_trans),
                               origin)
            direction = jnp.where(stepping[:, None], cont_dir, direction)
            thp = jnp.where(stepping[:, None], thp * cont_thp, thp)
            branch = jnp.where(stepping,
                               advance_branch_id(branch, cont_lobe),
                               branch)
            interior = jnp.where(stepping[:, None], new_interior, interior)
            walking = stepping
            return (origin, direction, thp, branch, interior, scene_len,
                    vertex, walking, sp, q_origin, q_dir, q_thp, q_branch,
                    q_interior, q_scene_len, q_vertex, q_valid, next_free,
                    cur_xy, it + 1)

        def walk_cond(carry):
            return jnp.any(carry[7]) & (carry[-1] < max_vertex_depth)

        # the delta-chain walk is a while_loop (round 3): the unrolled
        # version compiled 18 trace+shade bodies (P x depth) and always
        # paid max depth; the loop compiles P bodies and exits when the
        # last lane stops walking
        carry = (origin, direction, thp, branch, interior, scene_len,
                 vertex, walking, sp, q_origin, q_dir, q_thp, q_branch,
                 q_interior, q_scene_len, q_vertex, q_valid, next_free,
                 cur_xy0, jnp.asarray(0, jnp.int32))
        if compaction and n >= compaction_min:
            # ---- tail compaction (same scheme as render_paths): delta
            # chains collapse occupancy after the first segment (slot 0)
            # or start near-empty (forked slots 1..P-1), yet each
            # full-width iteration pays trace+shade over all n lanes.
            # Stage A runs full width only while the live set exceeds
            # n//8; the walk then continues over the gathered survivors
            # and scatters back positionally.
            n_small = max(n // 8, 1024)

            def walk_cond_a(c):
                live = jnp.sum(c[7].astype(jnp.int32))
                return walk_cond(c) & (live > n_small)

            carry = jax.lax.while_loop(walk_cond_a, walk_body, carry)
            perm = jnp.argsort(~carry[7], stable=True)[:n_small]
            lane = lambda a: (hasattr(a, "ndim") and a.ndim >= 1
                              and a.shape[0] == n)
            carry_n = jax.tree_util.tree_map(
                lambda a: a[perm] if lane(a) else a, carry)
            carry_n = jax.lax.while_loop(walk_cond, walk_body, carry_n)
            carry = jax.tree_util.tree_map(
                lambda full, nar: full.at[perm].set(nar)
                if lane(full) else nar, carry, carry_n)
        else:
            carry = jax.lax.while_loop(walk_cond, walk_body, carry)
        (origin, direction, thp, branch, interior, scene_len, vertex,
         walking, sp, q_origin, q_dir, q_thp, q_branch, q_interior,
         q_scene_len, q_vertex, q_valid, next_free, _, _) = carry

        # chain ran out of depth: force-store whatever we were on (the
        # reference clamps via maxStablePlaneVertexDepth the same way)
        # -> handled because depth_ok turns can_continue off at the cap.

    # dominant plane: highest perceived contribution (reference marks
    # the dominant branch at fork time via fresnel weight; equivalent
    # greedy choice here: plane throughput x total BSDF estimate)
    score = mu.luminance(sp.diff_est + sp.spec_est)          # (N,P)
    score = jnp.where(sp.branch_id != INVALID_BRANCH, score, -1.0)
    dominant = jnp.argmax(score, axis=1).astype(jnp.int32)
    sp = sp._replace(dominant=dominant)
    return sp
