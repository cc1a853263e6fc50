"""rtxpt_tpu: a TPU-native real-time path tracing framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
NVIDIAGameWorks/RTX-Path-Tracing (RTXPT): wavefront path tracing over
HBM-resident SoA scene arrays, LBVH build + traversal kernels, the Falcor
standard BSDF with nested dielectrics and volumes, environment-map importance
sampling with MIS, ReSTIR DI/GI, stable-planes decomposition, an
NRD-style denoiser, TAA and tone mapping — all compiled by XLA and sharded
over TPU meshes with pixel-tile data parallelism.

Layer map (bottom-up), mirroring SURVEY.md section 1:
  core/      math, stateless RNG (Hash32 + Owen-Sobol), ray cones, packing
  ops/       device kernels: BVH build/traverse, intersection, compaction
  scene/     glTF 2.0 + .scene.json loading, flat SoA scene, env maps, lights
  pt/        the path tracer proper: BSDF, NEE/MIS, nested dielectrics,
             wavefront integrator, stable planes
  restir/    ReSTIR DI/GI reservoir pipelines
  denoise/   ReLAX-style temporal+a-trous denoiser
  post/      accumulation, TAA, tone mapping
  parallel/  device meshes, pixel-tile sharding, halo exchange
  models/    named end-to-end renderer configurations
  app/       headless CLI frame-loop driver (golden-image contract)
"""

__version__ = "0.1.0"
