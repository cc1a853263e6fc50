"""Benchmark: reference-mode path throughput + realtime frame time on the
real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
secondary keys (realtime ms/frame at 1080p and a small-res control) so
every round records the BASELINE realtime metric too (VERDICT r2 #2).

Measured:
  * value: steady-state full-material reference-mode samples/sec at
    800x600 on the programmer-art scene (BASELINE configs 1-3 class
    workload), reported as Mpaths/s (one path = one full multi-bounce
    sample incl. NEE shadow rays).
  * realtime_ms_per_frame_1080p / _360p: steady-state frame time of the
    default realtime pipeline (ReSTIR DI/GI + denoiser + TAA), matching
    the reference's frame-time contract (RTXPT/Sample.cpp:843-850).

vs_baseline: ratio against the driver-mandated end target of 30 fps at
1080p 1spp realtime (BASELINE.md config 5) = 62.2 Mpaths/s. No reference-
published numbers exist (BASELINE.json published={}).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

WIDTH, HEIGHT = 800, 600
ITERS = 8
RT_ITERS = 6
TARGET_PATHS_PER_SEC = 1920 * 1080 * 30  # 62.2M (config 5 goal)


def _realtime_ms(host, w, h, frames):
    """Steady-state ms/frame of the default realtime pipeline."""
    import numpy as np
    from rtxpt_tpu.models.realtime import RealtimeRenderer
    from rtxpt_tpu.scene import procedural
    cam = procedural.default_camera(w, h)
    r = RealtimeRenderer(host, cam)
    np.asarray(r.render_frame(w, h))     # compile (no-history variant)
    np.asarray(r.render_frame(w, h))     # compile (history variant)
    t0 = time.time()
    out = None
    for _ in range(frames):
        out = r.render_frame(w, h)
    np.asarray(out)
    return (time.time() - t0) / frames * 1e3


def main():
    import numpy as np
    from rtxpt_tpu.models.renderer import Renderer, reference_config
    from rtxpt_tpu.scene import envmap as EM
    from rtxpt_tpu.scene import procedural

    cfg = reference_config(max_bounces=6, max_diffuse_bounces=4,
                           nee_distant_samples=1, nee_local_samples=1)
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(WIDTH, HEIGHT)
    r = Renderer(host, cam, cfg,
                 env_radiance=EM.bake_procedural_sky(height=64))

    # NOTE: materialize to host (np.asarray) — on the axon TPU tunnel,
    # block_until_ready alone does not reliably synchronize. Samples are
    # accumulated WITHOUT per-sample sync (the production accumulation
    # loop pipelines dispatches); one materialization closes the batch.
    np.asarray(r.render(WIDTH, HEIGHT, ITERS))      # compile + warm
    t0 = time.time()
    np.asarray(r.render(WIDTH, HEIGHT, ITERS))      # regeneration batch
    dt = (time.time() - t0) / ITERS
    paths_per_sec = WIDTH * HEIGHT / dt

    extras = {}
    # realtime measurements respect a wall-clock budget so the driver
    # always gets the JSON line even on a cold compile cache (the
    # stable-planes frame compiles take minutes on the tunnel; the
    # persistent cache makes later runs cheap)
    budget = float(os.environ.get("RTXPT_BENCH_BUDGET_S", "2400"))
    t_start = time.time()
    if os.environ.get("RTXPT_BENCH_SKIP_REALTIME", "0") != "1":
        try:
            extras["realtime_ms_per_frame_360p"] = round(
                _realtime_ms(host, 640, 360, RT_ITERS), 1)
            if time.time() - t_start < budget * 0.6:
                extras["realtime_ms_per_frame_1080p"] = round(
                    _realtime_ms(host, 1920, 1080, RT_ITERS), 1)
                extras["realtime_fps_1080p"] = round(
                    1e3 / extras["realtime_ms_per_frame_1080p"], 2)
            else:
                extras["realtime_1080p"] = "skipped (bench budget)"
        except Exception as e:                      # keep the primary
            extras["realtime_error"] = repr(e)[:200]  # metric alive

    print(json.dumps({
        "metric": "reference-mode path throughput (800x600, full BSDF, "
                  "NEE 1+1, 6 bounces, programmer-art)",
        "value": round(paths_per_sec / 1e6, 4),
        "unit": "Mpaths/s",
        "vs_baseline": round(paths_per_sec / TARGET_PATHS_PER_SEC, 5),
        **extras,
    }))


if __name__ == "__main__":
    main()
