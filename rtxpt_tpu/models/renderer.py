"""Renderer: frame orchestration (the Sample class equivalent).

TPU-native replacement for the reference's host orchestration
(RTXPT/Sample.cpp Render/PathTrace/PreUpdatePathTracing): owns device scene
arrays + BVH + env map + light table, compiles the frame function once per
(config, resolution) like the reference builds pipeline permutations, and
drives reference-mode accumulation (Sample.cpp:1530-1566, 2469-2474).
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as C
from ..core import rng
from ..ops import bvh as bvh_mod
from ..ops.intersect import TriSoup
from ..post import accumulation, tonemap
from ..pt import integrator
from ..scene import envmap as EM
from ..scene import lights as LI
from ..scene.build import to_device
from ..scene.camera import CameraData


def reference_config(**overrides) -> C.PTConfig:
    """Reference (accumulation) mode defaults (SampleUI.h:162-167)."""
    base = dict(mode=C.MODE_REFERENCE, max_bounces=30,
                max_diffuse_bounces=6, enable_russian_roulette=True)
    base.update(overrides)
    return C.PTConfig(**base)


def realtime_config(**overrides) -> C.PTConfig:
    """Real-time mode defaults (SampleUI.h:158-168)."""
    base = dict(mode=C.MODE_REFERENCE, max_bounces=30,
                max_diffuse_bounces=3, enable_russian_roulette=True,
                use_restir_di=False, use_restir_gi=False)
    base.update(overrides)
    return C.PTConfig(**base)


def r2_jitter(index: int):
    """R2 low-discrepancy AA jitter sequence in [-0.5, 0.5)^2
    (reference jitter options, TemporalAntiAliasingPass + NoiseAndSequences
    R2seq)."""
    a1, a2 = 0.7548776662466927, 0.5698402909980532
    return (((0.5 + a1 * index) % 1.0) - 0.5,
            ((0.5 + a2 * index) % 1.0) - 0.5)


class Renderer:
    def __init__(self, host_scene: dict, camera: CameraData,
                 cfg: Optional[C.PTConfig] = None,
                 env_radiance=None, analytic_lights=None,
                 env_intensity: float = 1.0, textures=None):
        self.cfg = cfg or reference_config()
        self.camera = camera
        self.host_scene = host_scene
        # texture-stack build is deferred to the END of __init__: with
        # async decode (scene/texcache.py) the image list holds futures
        # that keep decoding on the pool while the BVH/dense builds run
        build_textures_late = (textures is None
                               and bool(host_scene.get("texture_images")))
        self.scene = to_device(host_scene, textures=textures)
        self.bvh2 = bvh_mod.build_bvh(host_scene["positions"],
                                      host_scene["indices"],
                                      leaf_size=self.cfg.leaf_size)
        self.soup = TriSoup.build(self.scene.positions, self.scene.indices,
                                  self.bvh2.order)
        # unified 8-wide layout: Pallas MXU-gather traversal on TPU,
        # one-gather-per-step XLA loop elsewhere; alpha-MASK triangles
        # carry baked opacity micro-masks (the OMM equivalent)
        from ..scene.omm import bake_opacity_masks
        tri_omm = bake_opacity_masks(host_scene)
        # exact alpha re-test only matters when MASK materials exist
        import numpy as _np
        has_mask = bool(
            (_np.asarray(host_scene["materials"]["alpha_mode"]) == 1)
            .any()) and bool(host_scene.get("texture_images"))
        if self.cfg.exact_alpha_test and not has_mask:
            import dataclasses as _dc
            self.cfg = _dc.replace(self.cfg, exact_alpha_test=False)
        n_tris = host_scene["indices"].shape[0]
        inst = host_scene.get("instancing")
        import os as _os
        # the per-mesh-rounds TLAS traversal tests instances in chunks of
        # ops/instanced.INST_CHUNK, so the entry-distance matrix stays
        # N*256 regardless of scene instance count. Round-5 A/B
        # (tools/profile_city_ab.py, city 640x360 reference 1spp):
        # flattened-soup bvh2l 1.89 s/sample vs instanced mesh-rounds
        # 17.09 s/sample (9x; identical image mean) — the per-
        # (mesh,chunk,round) dispatch ladder is the wall, so STATIC
        # scenes always take the soup path and the instanced TLAS is
        # kept for rigid-animated scenes, where it is the only big-scene
        # structure with a refit path (ops/instanced.
        # set_instance_transform = the reference's per-frame TLAS build
        # over static BLASes, RTXPT/Sample.cpp:1353-1421).
        # RTXPT_INSTANCED=1/0 forces either way.
        has_rigid_anim = bool(host_scene.get("animations"))
        use_instanced = (
            inst is not None and not host_scene.get("skin_bindings")
            and _os.environ.get("RTXPT_INSTANCED", "auto") != "0"
            and (_os.environ.get("RTXPT_INSTANCED") == "1"
                 or (n_tris > 45_000 and has_rigid_anim
                     and len(inst["mesh_of_instance"]) <= 8192
                     and max(m["indices"].shape[0]
                             for m in inst["meshes"]) <= 25_000)))
        if use_instanced:
            # real TLAS over deduplicated object-space BLASes
            # (ops/instanced.py; RTXPT/Sample.cpp:1353-1421)
            from ..ops import instanced as inst_mod
            self.bvh = inst_mod.build_instanced(
                inst, leaf_size=self.cfg.leaf_size)
        elif n_tris > 45_000:
            # Bistro-scale: the single table would blow the VMEM budget;
            # two-level TLAS/BLAS-style partition (ops/bvh2l.py)
            from ..ops import bvh2l
            self.bvh = bvh2l.build_two_level(
                host_scene["positions"], host_scene["indices"],
                leaf_size=self.cfg.leaf_size, tri_omm=tri_omm)
        else:
            self.bvh = bvh_mod.collapse_bvh8(
                self.bvh2, self.scene.positions, self.scene.indices,
                tri_omm=tri_omm)
        if env_radiance is None:
            env_radiance = EM.bake_procedural_sky()
        self.env = EM.make_envmap(env_radiance, intensity=env_intensity,
                                  enabled=self.cfg.use_env_lights)
        self._analytic_lights = analytic_lights
        self.lights = (LI.build_light_table(host_scene, analytic_lights)
                       if self.cfg.use_emissive_lights else None)
        # dense matmul-MT planes: the preferred TPU trace path for
        # small/medium scenes (ops/mt_dense.py); BVH kernels remain the
        # fallback + the big-scene path
        from ..ops import mt_dense
        import os
        self.dense = None
        if mt_dense.supported(n_tris) and \
                os.environ.get("RTXPT_NO_DENSE", "0") != "1":
            self.dense = mt_dense.build_dense(
                host_scene["positions"], host_scene["indices"],
                tri_omm=tri_omm)
        if build_textures_late:
            from ..scene.textures import build_texture_stack
            textures = build_texture_stack(
                host_scene["texture_images"],
                srgb=host_scene.get("texture_srgb"))
            self.scene = self.scene._replace(textures=textures)
        self.assets = integrator.RenderAssets(
            scene=self.scene, bvh=self.bvh, soup=self.soup, env=self.env,
            lights=self.lights, dense=self.dense)
        self._render_jit = jax.jit(functools.partial(
            integrator.render_wavefront, cfg=self.cfg))
        self._batch_jit = {}
        # accumulation state (resumable: buffer + index are the checkpoint)
        self.accum = None
        self.sample_index = 0

    def _render_batch_fn(self, k: int):
        """k accumulation samples in ONE device dispatch (lax.scan over
        sample indices — the reference loops dispatchRays per sample;
        the tunnel charges ~10 ms per dispatch, so batching matters)."""
        cfg = self.cfg

        def fn(assets, cam0, px, py, start):
            a1 = jnp.float32(0.7548776662466927)
            a2 = jnp.float32(0.5698402909980532)

            def body(total, s):
                idx = (start + s).astype(jnp.float32)
                jit = jnp.stack([((0.5 + a1 * idx) % 1.0) - 0.5,
                                 ((0.5 + a2 * idx) % 1.0) - 0.5])
                cam = cam0._replace(jitter=jit)
                consts = C.PTConstants(
                    firefly_filter_threshold=jnp.float32(0.0),
                    nee_min_radiance_threshold=jnp.float32(1e-5),
                    texlod_bias=jnp.float32(0.0),
                    sample_base_index=(start + s).astype(jnp.uint32),
                    noisy_radiance_attenuation=jnp.float32(1.0))
                rad = integrator.render_wavefront(assets, cam, px, py,
                                                  consts, cfg=cfg)
                return total + rad, None

            total, _ = jax.lax.scan(
                body, jnp.zeros((px.shape[0], 3), jnp.float32),
                jnp.arange(k, dtype=jnp.uint32))
            return total
        return jax.jit(fn)

    def _pixel_grid(self, width: int, height: int):
        yy, xx = np.mgrid[0:height, 0:width]
        return (jnp.asarray(xx.reshape(-1).astype(np.uint32)),
                jnp.asarray(yy.reshape(-1).astype(np.uint32)))

    def render_sample(self, width: int, height: int, sample_index: int,
                      jitter_aa: bool = True):
        """One sample per pixel at the given accumulation index."""
        px, py = self._pixel_grid(width, height)
        jit = r2_jitter(sample_index) if jitter_aa else (0.0, 0.0)
        cam = self.camera._replace(
            jitter=jnp.asarray(jit, jnp.float32),
            viewport=jnp.asarray([width, height], jnp.float32))
        consts = C.default_constants(sample_base_index=sample_index)
        assets = self.assets
        if self.cfg.nee_local_type == C.NEE_LOCAL_REGIR and \
                self.lights is not None:
            from ..restir import regir as RG
            lo = jnp.min(self.scene.positions, axis=0) - 1e-3
            hi = jnp.max(self.scene.positions, axis=0) + 1e-3
            assets = assets._replace(regir=RG.build_regir(
                self.lights, self.scene.positions, self.scene.indices,
                lo, hi, sample_index, layout=self.cfg.regir_layout,
                center=self.camera.pos))
        if self.cfg.nee_distant_type == C.NEE_DISTANT_PRESAMPLED:
            # per-frame presampled env light list (EnvMapImportance-
            # SamplingBaker presampling; Config.h:86)
            assets = assets._replace(
                env_presampled=EM.presample(self.env, sample_index))
        radiance = self._render_jit(assets, cam, px, py, consts=consts)
        return radiance.reshape(height, width, 3)

    def render(self, width: int, height: int, spp: int,
               jitter_aa: bool = True, progress=None,
               batch: int = 1):
        """Reference-mode accumulation of `spp` samples -> HDR (H,W,3).

        batch > 1 runs scan-batches of samples per dispatch; measured on
        the tunnel this LOSES to the default pipelined per-sample
        dispatches (async dispatch already hides the launch latency), so
        it is opt-in — useful on backends with expensive launches."""
        if self.accum is None:
            self.accum = jnp.zeros((height, width, 3), jnp.float32)
            self.sample_index = 0
        can_batch = (jitter_aa and batch > 1
                     and self.cfg.nee_local_type != C.NEE_LOCAL_REGIR
                     and self.cfg.nee_distant_type
                     != C.NEE_DISTANT_PRESAMPLED)
        # path regeneration (integrator spp>1): dead lanes start their
        # pixel's next sample in place, keeping the wavefront occupied
        # across the whole chunk — ~2x over pipelined per-sample
        # dispatches whose wavefronts decay individually
        can_regen = (jitter_aa and self.cfg.mode == C.MODE_REFERENCE
                     and self.cfg.wavefront_sort == "none"
                     and self.cfg.nee_local_type != C.NEE_LOCAL_REGIR
                     and self.cfg.nee_distant_type
                     != C.NEE_DISTANT_PRESAMPLED
                     and __import__("os").environ.get(
                         "RTXPT_NO_REGEN", "0") != "1")
        REGEN_CHUNK = 8
        remaining = spp
        while remaining > 0:
            if can_regen and remaining >= 2 and not can_batch:
                k = min(remaining, REGEN_CHUNK)
                key = ("regen", k)
                if key not in self._batch_jit:
                    self._batch_jit[key] = jax.jit(functools.partial(
                        integrator.render_wavefront, cfg=self.cfg,
                        spp=k))
                px, py = self._pixel_grid(width, height)
                cam = self.camera._replace(
                    jitter=jnp.asarray(r2_jitter(self.sample_index),
                                       jnp.float32),
                    viewport=jnp.asarray([width, height], jnp.float32))
                consts = C.default_constants(
                    sample_base_index=self.sample_index)
                total = self._batch_jit[key](
                    self.assets, cam, px, py, consts)
                n0 = self.sample_index
                self.accum = (self.accum * n0
                              + total.reshape(height, width, 3)) \
                    / (n0 + k)
                self.sample_index += k
                remaining -= k
                if progress is not None:
                    progress(self.sample_index)
                continue
            if can_batch and remaining >= batch:
                k = batch
                if k not in self._batch_jit:
                    self._batch_jit[k] = self._render_batch_fn(k)
                px, py = self._pixel_grid(width, height)
                cam = self.camera._replace(
                    jitter=jnp.zeros(2, jnp.float32),
                    viewport=jnp.asarray([width, height], jnp.float32))
                total = self._batch_jit[k](
                    self.assets, cam, px, py,
                    jnp.asarray(self.sample_index, jnp.uint32))
                n0 = self.sample_index
                self.accum = (self.accum * n0
                              + total.reshape(height, width, 3)) \
                    / (n0 + k)
                self.sample_index += k
                remaining -= k
                if progress is not None:
                    progress(self.sample_index)
            else:
                s = self.render_sample(width, height, self.sample_index,
                                       jitter_aa)
                self.accum = accumulation.accumulate(
                    self.accum, s, self.sample_index)
                self.sample_index += 1
                remaining -= 1
                if progress is not None:
                    progress(self.sample_index)
        return self.accum

    def reset_accumulation(self):
        self.accum = None
        self.sample_index = 0

    # ---- checkpoint/resume: reference-mode accumulation is resumable by
    # construction (buffer + sample index; SURVEY.md section 5)
    def save_checkpoint(self, path: str):
        if self.accum is None:
            return
        np.savez(path, accum=np.asarray(self.accum),
                 sample_index=self.sample_index)

    def load_checkpoint(self, path: str) -> bool:
        import os
        if not os.path.exists(path):
            return False
        data = np.load(path)
        self.accum = jnp.asarray(data["accum"])
        self.sample_index = int(data["sample_index"])
        return True

    def animate(self, info: dict, time: float,
                animation_index: int = 0):
        """Per-frame skinned/animated geometry refresh (Scene::Refresh +
        skinned BLAS updates): skins vertex ranges on device and refits
        the BVH8 in place; subsequent renders see the new pose."""
        from ..scene.animation import refresh_skinned
        from ..scene import lights as LI
        self.scene, self.bvh = refresh_skinned(
            self.host_scene, info, self.scene, self.bvh, time,
            animation_index)
        if self.dense is not None:
            # dense-MT planes hold baked triangle coefficients — refresh
            # on device or the tracer intersects the rest pose
            from ..ops import mt_dense
            self.dense = mt_dense.refresh_dense(
                self.dense, self.scene.positions, self.scene.indices)
            self.assets = self.assets._replace(dense=self.dense)
        if self.lights is not None:
            # re-bake packed emissive-triangle verts from the skinned
            # positions (light side of Scene::Refresh)
            self.lights = LI.refresh_pack(self.lights, self.scene.positions,
                                          self.scene.indices)
        self.assets = self.assets._replace(scene=self.scene, bvh=self.bvh,
                                           lights=self.lights)

    def update_environment(self, env_radiance, intensity: float = 1.0):
        """Per-frame env re-bake (EnvMapBaker::Update, Sample.cpp:1495-
        1521): rebuilds the importance pyramid + alias tables from a new
        equirect radiance map and swaps it into the running assets — an
        animated sun is `bake_procedural_sky(sun_dir=...)` (plus
        envmap.bake_with_directional for analytic directional splats)
        fed here each frame; no other scene state is touched."""
        self.env = EM.make_envmap(env_radiance, intensity=intensity,
                                  enabled=self.cfg.use_env_lights)
        self.assets = self.assets._replace(env=self.env)

    def set_material(self, index: int, base_color=None, roughness=None,
                     metalness=None, emissive=None):
        """Live material edit (the SampleUI material editor,
        RTXPT/SampleUI.cpp:1254,1382): updates the material SoA + packed
        row ON DEVICE — no scene/BVH rebuild, the running jitted frame
        functions see the new table on their next dispatch. An emissive
        change additionally re-preps the light table (the reference's
        PrepareLightsPass re-runs per frame)."""
        from ..ops import gather_pallas as GPL
        from ..scene import types as T
        m = self.scene.materials
        mp = self.scene.mat_pack
        f32 = lambda v: jnp.asarray(v, jnp.float32)
        if base_color is not None:
            m = m._replace(base_color=m.base_color.at[index].set(
                f32(base_color)))
            mp = mp.at[index, T.MP_BASE:T.MP_BASE + 3].set(f32(base_color))
        if roughness is not None:
            m = m._replace(roughness=m.roughness.at[index].set(
                f32(roughness)))
            mp = mp.at[index, T.MP_ROUGH].set(f32(roughness))
        if metalness is not None:
            m = m._replace(metalness=m.metalness.at[index].set(
                f32(metalness)))
            mp = mp.at[index, T.MP_METAL].set(f32(metalness))
        if emissive is not None:
            m = m._replace(emissive=m.emissive.at[index].set(f32(emissive)))
            mp = mp.at[index, T.MP_EMISSIVE:T.MP_EMISSIVE + 3].set(
                f32(emissive))
        mat_gp = (GPL.pack_f32_device(mp)
                  if self.scene.mat_gp is not None else None)
        self.scene = self.scene._replace(materials=m, mat_pack=mp,
                                         mat_gp=mat_gp)
        if emissive is not None and self.cfg.use_emissive_lights:
            # emissive edits change light selection power: re-prep the
            # light table from the edited host materials
            self.host_scene["materials"]["emissive"] = np.asarray(
                self.host_scene["materials"]["emissive"])
            self.host_scene["materials"]["emissive"][index] = np.asarray(
                emissive, np.float32)
            self.lights = LI.build_light_table(self.host_scene,
                                               self._analytic_lights)
        self.assets = self.assets._replace(scene=self.scene,
                                           lights=self.lights)

    def material_info(self):
        """Editable material list for UI surfaces (names + parameters)."""
        m = self.scene.materials
        names = self.host_scene.get("material_names") or \
            [f"material {i}" for i in range(m.count)]
        return [dict(index=i, name=str(names[i]),
                     base_color=np.asarray(m.base_color[i]).tolist(),
                     roughness=float(m.roughness[i]),
                     metalness=float(m.metalness[i]),
                     emissive=np.asarray(m.emissive[i]).tolist())
                for i in range(m.count)]

    def tonemapped(self, hdr, exposure: float = 1.0,
                   auto_expose: bool = True):
        return tonemap.tonemap(hdr, exposure=exposure,
                               auto_expose=auto_expose)
