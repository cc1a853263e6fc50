"""Layered configuration (defaults < scene settings < CLI overrides).

Collapses the reference's 4-tier config system (SURVEY.md section 5):
compile-time Config.h + shader permutations, CMake options, runtime
SampleUIData (RTXPT/SampleUI.h:127+) and per-scene SampleSettings
(RTXPT/ExtendedScene.h:83), and CLI flags (RTXPT/CommandLine.h:16-34).

`PTConfig` is hashable/frozen so it can feed `jax.jit` static args: a config
change re-specializes the kernels exactly like the reference's shader
permutations (shaders.cfg PATH_TRACER_MODE x USE_HIT_OBJECT_EXTENSION).
`PTConstants` are the "volatile constant buffer" values that can change per
frame without recompiling (SampleConstantBuffer.h PathTracerConstants).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp

# Path tracer modes (reference: PathTracer/Config.h:41-43)
MODE_REFERENCE = 0
MODE_BUILD_STABLE_PLANES = 1
MODE_FILL_STABLE_PLANES = 2

# NEE distant sampler types (SampleUI.h:147)
NEE_DISTANT_UNIFORM = 0
NEE_DISTANT_MIP_DESCENT = 1
NEE_DISTANT_PRESAMPLED = 2

# NEE local sampler types (SampleUI NEELocalType)
NEE_LOCAL_POWER = 1
NEE_LOCAL_REGIR = 2


@dataclasses.dataclass(frozen=True)
class PTConfig:
    """Static (jit-specializing) configuration."""
    mode: int = MODE_REFERENCE
    max_bounces: int = 30                 # SampleUI BounceCount default
    max_diffuse_bounces: int = 6          # reference-mode default (UI:163)
    nee_enabled: bool = True
    nee_distant_type: int = NEE_DISTANT_MIP_DESCENT
    nee_distant_samples: int = 2          # SampleUI.h:149
    nee_local_samples: int = 2            # SampleUI.h:152
    nee_local_type: int = NEE_LOCAL_POWER
    regir_layout: str = "grid"        # "grid" | "onion" (LightSamplingLocal
    #   .hlsli:555 onion cell layout; camera-centred log shells)
    enable_russian_roulette: bool = True
    use_env_lights: bool = True           # PathTracer.hlsli:22
    use_emissive_lights: bool = True
    use_analytic_lights: bool = True
    stable_plane_count: int = 3           # Config.h:81
    use_stable_planes: bool = False       # realtime: 3-plane BUILD/FILL
    #   decomposition (False = single-plane PSR-lite G-buffer)
    max_stable_plane_vertex_depth: int = 6
    leaf_size: int = 4
    # realtime-spine toggles (later phases)
    use_restir_di: bool = False
    use_restir_gi: bool = False
    denoiser_enabled: bool = False
    realtime_noise: bool = True           # Sample.cpp:1572 determinism switch
    # per-bounce wavefront reorder (the SER coherence translation).
    # "none": keep morton primary order only — the dense-MT trace path's
    #   per-tile cluster worklists recover ray coherence without paying a
    #   full-pytree XLA permute (~40 gathers/bounce) every bounce;
    # "octant": stable-partition live lanes to the front + direction-
    #   octant sort, permuting the whole PathState (round-2 behavior;
    #   helps the BVH kernels on big scenes at permute-gather cost);
    # "material": stable-sort by last-shaded material id (the SER
    #   material-coherence key, Sample.cpp:1087-1113) — A/B harness
    #   tools/profile_matsort_ab.py;
    # "raystream": morton3d(scatter origin cell)*8 + direction octant —
    #   rebuilds SPATIAL tile coherence for secondary bounces, the
    #   dominant dense-MT cost driver (cluster-union worklists); the
    #   only sort mode that composes with path regeneration.
    wavefront_sort: str = "none"
    # tail compaction: once the live set of a non-regen wavefront fits
    # in n//8 lanes, gather survivors and continue the bounce loop at
    # narrow width (kills the <1%-occupancy full-width tail the FILL
    # 30-bounce loop pays; see ROADMAP round-3 decomposition)
    wavefront_compaction: bool = True
    wavefront_compaction_min: int = 16384  # only compact wavefronts
    #   at least this wide (below it the full-width tail is cheap)
    # fused shade+NEE Pallas megakernel (pt/shade_kernel.py): one kernel
    # per bounce runs emission/RR/BSDF-sample/NEE math instead of the
    # XLA chain (the reference's one-ubershader-invocation shape,
    # RTXPT/Sample.hlsl:368-393). TPU-only (CPU keeps the XLA path);
    # applies to non-FILL wavefronts with <=1 distant + <=1 local NEE
    # sample and non-ReGIR local sampling.
    shade_megakernel: bool = True
    # sample-generator quality tier (reference SampleUI "sample
    # generator" setting): "ld" = Owen-scrambled Sobol low-discrepancy
    # (StatelessLowDiscrepancySampleGenerator, default), "hq" =
    # high-quality uniform (StatelessHQUniformSampleGenerator.hlsli:20
    # — reference-mode tier; extra output mixing round, no LD), or
    # "uniform" = plain hash streams (cheapest). A/B convergence gate:
    # tests/test_rng_tiers.py
    rng_quality: str = "ld"
    # NRD-slot denoiser selection (Sample.cpp:1461-1466): "relax"
    # (a-trous variance-guided, denoise/relax.py) or "reblur"
    # (hit-distance-driven kernel scaling, denoise/reblur.py)
    denoiser_method: str = "relax"
    # exact per-hit texture alpha test for visibility rays hitting
    # OMM-unknown cells of MASK materials (pt/visibility.py; the
    # Renderer clears it for scenes without MASK materials)
    exact_alpha_test: bool = True


class PTConstants(NamedTuple):
    """Per-frame dynamic constants (PathTracerConstants equivalent,
    SampleConstantBuffer.h:20-46). All 0-d arrays: changing them does NOT
    retrigger compilation."""
    firefly_filter_threshold: jnp.ndarray   # 0 disables (Sample.cpp:1605)
    nee_min_radiance_threshold: jnp.ndarray
    texlod_bias: jnp.ndarray
    sample_base_index: jnp.ndarray          # accumulation sample index
    noisy_radiance_attenuation: jnp.ndarray  # Bridge::getNoisyRadianceAtten.


def default_constants(sample_base_index: int = 0) -> PTConstants:
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return PTConstants(
        firefly_filter_threshold=f32(0.0),
        nee_min_radiance_threshold=f32(1e-5),
        texlod_bias=f32(0.0),
        sample_base_index=jnp.asarray(sample_base_index, jnp.uint32),
        noisy_radiance_attenuation=f32(1.0),
    )


def apply_scene_settings(cfg: PTConfig, settings: dict) -> PTConfig:
    """Apply a .scene.json SampleSettings node (ExtendedScene.h:83,
    consumed at Sample.cpp:629-649)."""
    mapping = {
        "MaxBounces": "max_bounces",
        "MaxDiffuseBounces": "max_diffuse_bounces",
        "RealtimeMode": None,
        "EnableRussianRoulette": "enable_russian_roulette",
    }
    updates = {}
    for k, v in settings.items():
        field = mapping.get(k, k if k in {f.name for f in
                                          dataclasses.fields(cfg)} else None)
        if field:
            updates[field] = v
    return dataclasses.replace(cfg, **updates) if updates else cfg
