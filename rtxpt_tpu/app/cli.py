"""Headless render CLI — the golden-image harness.

Mirrors the reference's CLI contract (RTXPT/CommandLine.h:16-34:
--scene/--width/--height/--nonInteractive/--noWindow/--screenshotFileName/
--screenshotFrameIndex): renders headless, saves the image, exits 0/1.
This is the de-facto integration-test entry point (SURVEY.md section 4.2).
"""
from __future__ import annotations

import argparse
import sys
import time


def build_arg_parser():
    p = argparse.ArgumentParser("rtxpt_tpu headless renderer")
    p.add_argument("--scene", default="programmer-art",
                   help="'programmer-art' | 'city' (Bistro-class, "
                   "~400k tris) | path to .gltf/.glb/.scene.json")
    p.add_argument("--width", type=int, default=800)
    p.add_argument("--height", type=int, default=600)
    p.add_argument("--spp", type=int, default=16,
                   help="samples per pixel (reference accumulation target)")
    p.add_argument("--mode", choices=["reference", "realtime"],
                   default="reference")
    p.add_argument("--output", default="out.png",
                   help="screenshot file name (PNG)")
    p.add_argument("--dump-npy", default=None,
                   help="also dump linear HDR as .npy")
    p.add_argument("--screenshot-frame-index", type=int, default=None,
                   help="render this many frames then save+exit "
                   "(reference --screenshotFrameIndex contract); "
                   "overrides --spp in reference mode")
    p.add_argument("--diffuse-only", action="store_true",
                   help="BASELINE config 1: diffuse-only BSDF")
    p.add_argument("--max-bounces", type=int, default=30)
    p.add_argument("--max-diffuse-bounces", type=int, default=None)
    p.add_argument("--nee-distant-samples", type=int, default=2)
    p.add_argument("--nee-local-samples", type=int, default=2)
    p.add_argument("--no-nee", action="store_true")
    p.add_argument("--no-jitter", action="store_true")
    p.add_argument("--exposure", type=float, default=1.0)
    p.add_argument("--no-auto-expose", action="store_true")
    p.add_argument("--sky-scale", type=float, default=1.0)
    p.add_argument("--env", default=None,
                   help="equirect environment texture (.hdr/.exr/.png) "
                   "instead of the procedural sky")
    p.add_argument("--photo-denoise", action="store_true",
                   help="reference mode: run the offline photo-mode "
                   "denoiser on the result (the OptiX/OIDN slot)")
    p.add_argument("--preset", choices=["ref-vs-realtime"], default=None,
                   help="named config preset (LocalConfig equivalent); "
                   "ref-vs-realtime: realtime stripped to match the "
                   "reference estimator (A/B oracle)")
    p.add_argument("--stable-planes",
                   action=argparse.BooleanOptionalAction, default=True,
                   help="realtime: full 3-plane stable-planes "
                   "decomposition (BUILD/FILL) instead of PSR-lite")
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--debug-lines-pixel", default=None, metavar="X,Y",
                   help="overlay the traced bounce chain of pixel X,Y "
                   "as debug lines on the output (the reference's "
                   "pick-pixel DebugLines visualization)")
    p.add_argument("--debug-print-pixel", default=None, metavar="X,Y",
                   help="print the DebugPrint slot table for pixel X,Y "
                   "(ShaderDebug.hlsli Print + feedback readback)")
    p.add_argument("--debug-delta-tree", default=None, metavar="X,Y",
                   help="explore pixel (x,y)'s delta tree and print the "
                   "indented branch/plane assignment report (the "
                   "reference's DeltaTreeVizExplorePixel, "
                   "Sample.hlsl:332-357)")
    p.add_argument("--debug-view", default=None,
                   help="render a debug channel instead of the beauty "
                   "pass (ShaderDebug DebugViewType equivalent); see "
                   "rtxpt_tpu.utils.debugviews.VIEWS")
    p.add_argument("--checkpoint", default=None,
                   help="accumulation checkpoint file (.npz): resumes if "
                   "it exists, saves on exit (reference-mode only)")
    p.add_argument("--animate-time", type=float, default=None,
                   help="pose glTF animations at this time (seconds) "
                   "before rendering (reference mode; SampleUI's "
                   "animation scrubber)")
    p.add_argument("--animate", action="store_true",
                   help="realtime mode: advance glTF animations every "
                   "frame at --animate-fps")
    p.add_argument("--animate-fps", type=float, default=60.0)
    p.add_argument("--animation-index", type=int, default=0)
    return p


def load_scene(args):
    from ..scene import procedural
    if args.scene == "programmer-art":
        sb = procedural.build_programmer_art(diffuse_only=args.diffuse_only)
        host = sb.finish()
        cam = procedural.default_camera(args.width, args.height)
        return host, cam, None
    if args.scene == "city":
        # Bistro-class stress scene (BASELINE config 5 fixture, ~400k tris)
        host = procedural.build_city().finish()
        cam = procedural.city_camera(args.width, args.height)
        return host, cam, None
    if args.scene.endswith((".gltf", ".glb")):
        from ..scene import gltf
        from ..scene.texcache import TextureCache
        host, cam_info = gltf.load_gltf(args.scene,
                                        texture_cache=TextureCache())
        if cam_info.get("textures"):
            host["texture_images"] = cam_info["textures"]
            host["texture_srgb"] = cam_info.get("texture_srgb")
        cam = gltf.camera_from_info(cam_info, args.width, args.height)
        extra = dict(analytic_lights=gltf.analytic_lights_from_info(
            cam_info), anim_info=cam_info)
        return host, cam, extra
    if args.scene.endswith(".json"):
        from ..scene import scene_json
        return scene_json.load_scene_json(args.scene, args.width,
                                          args.height)
    raise SystemExit(f"unknown scene: {args.scene}")


def _run_realtime(args, host, cam, env, frames: int,
                  anim_info=None) -> int:
    """Real-time mode: run `frames` frames of the 1spp + ReSTIR DI +
    denoise + TAA pipeline, save the last frame (the reference's
    --screenshotFrameIndex contract with denoiser warm-up)."""
    import numpy as np
    import jax
    from ..models.realtime import RealtimeRenderer
    from ..models.renderer import realtime_config
    from ..post.tonemap import tonemap
    from ..utils import image as IM

    if args.preset == "ref-vs-realtime":
        # LocalConfig REF_VS_REALTIME (LocalConfig.cpp:40-57): realtime
        # stripped to be the same estimator as reference mode
        cfg = realtime_config(use_restir_di=False, use_restir_gi=False,
                              denoiser_enabled=False,
                              use_stable_planes=args.stable_planes,
                              max_bounces=args.max_bounces,
                              max_diffuse_bounces=args.max_diffuse_bounces
                              or 3,
                              nee_distant_samples=1, nee_local_samples=1)
    else:
        cfg = realtime_config(use_restir_di=True, use_restir_gi=True,
                              denoiser_enabled=True,
                              use_stable_planes=args.stable_planes,
                              max_bounces=args.max_bounces,
                              max_diffuse_bounces=args.max_diffuse_bounces
                              or 3,
                              nee_distant_samples=1, nee_local_samples=1)
    r = RealtimeRenderer(host, cam, cfg, env_radiance=env)
    t0 = time.time()
    times = [t0]
    img = None
    for i in range(max(frames, 1)):
        if args.animate and anim_info is not None:
            # per-frame animation tick (DeviceManager Animate+Render)
            r.animate(anim_info, i / args.animate_fps,
                      args.animation_index)
        taa_on = args.preset != "ref-vs-realtime"
        img = r.render_frame(args.width, args.height, taa=taa_on)
        jax.block_until_ready(img)
        times.append(time.time())
        if not args.quiet and (i % max(1, frames // 8) == 0
                               or i == frames - 1):
            print(f"  frame {i + 1}/{frames} "
                  f"({(times[-1] - times[-2]) * 1000:.0f} ms)", flush=True)
    hdr = np.asarray(img)
    steady = (times[-1] - times[1]) / max(len(times) - 2, 1) if \
        len(times) > 2 else times[-1] - t0
    if not args.quiet:
        print(f"realtime {args.width}x{args.height}: steady "
              f"{steady * 1000:.0f} ms/frame ({1.0 / max(steady, 1e-9):.1f}"
              f" fps)")
    srgb = np.asarray(tonemap(img, exposure=args.exposure,
                              auto_expose=not args.no_auto_expose))
    IM.save_png(args.output, srgb)
    if args.dump_npy:
        IM.save_npy(args.dump_npy, hdr)
    if not args.quiet:
        print(f"wrote {args.output}")
    return 0


def main(argv=None) -> int:
    args = build_arg_parser().parse_args(argv)
    from ..models.renderer import Renderer, reference_config, \
        realtime_config
    from ..scene import envmap as EM
    from ..utils import image as IM

    host, cam, extra = load_scene(args)
    cfg_fn = reference_config if args.mode == "reference" else \
        realtime_config
    cfg = cfg_fn(
        max_bounces=args.max_bounces,
        nee_enabled=not args.no_nee,
        nee_distant_samples=args.nee_distant_samples,
        nee_local_samples=args.nee_local_samples,
    )
    if args.max_diffuse_bounces is not None:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, max_diffuse_bounces=args.max_diffuse_bounces)

    extra = extra or {}
    if extra.get("settings"):
        from ..config import apply_scene_settings
        cfg = apply_scene_settings(cfg, extra["settings"])
    env = extra.get("env_radiance")
    if args.env:
        env = EM.load_equirect(args.env)
    if env is None:
        env = EM.bake_procedural_sky(sky_scale=args.sky_scale)
    analytic = extra.get("analytic_lights")

    spp = args.spp
    if args.screenshot_frame_index is not None:
        spp = args.screenshot_frame_index

    if args.mode == "realtime":
        return _run_realtime(args, host, cam, env, spp,
                             anim_info=extra.get("anim_info"))

    r = Renderer(host, cam, cfg, env_radiance=env,
                 analytic_lights=analytic,
                 env_intensity=extra.get("env_intensity", 1.0))

    if args.animate_time is not None and extra.get("anim_info"):
        # pose skinned + rigid-node animations (Scene::Refresh) at T
        r.animate(extra["anim_info"], args.animate_time,
                  args.animation_index)

    if args.debug_view:
        from ..utils import debugviews
        import numpy as np
        import jax.numpy as jnp
        cam_dv = cam._replace(viewport=jnp.asarray(
            [args.width, args.height], jnp.float32))
        img = debugviews.render_debug_view(args.debug_view, r.assets,
                                           cam_dv, args.width, args.height)
        IM.save_png(args.output, np.asarray(img))
        if not args.quiet:
            print(f"wrote debug view {args.debug_view} -> {args.output}")
        return 0

    if args.checkpoint:
        r.load_checkpoint(args.checkpoint)

    t0 = time.time()
    times = []

    def progress(i):
        times.append(time.time())
        if not args.quiet and (i % max(1, spp // 8) == 0 or i == spp):
            dt = times[-1] - (times[-2] if len(times) > 1 else t0)
            print(f"  sample {i}/{spp}  ({dt * 1000:.0f} ms/sample)",
                  flush=True)

    hdr = r.render(args.width, args.height, spp, not args.no_jitter,
                   progress)
    if args.photo_denoise:
        from ..denoise.offline import photo_denoise_auto
        hdr = photo_denoise_auto(r, hdr, args.width, args.height)
        if not args.quiet:
            print("photo-mode denoise applied (offline OIDN-slot)")
    srgb = r.tonemapped(hdr, exposure=args.exposure,
                        auto_expose=not args.no_auto_expose)
    import jax
    jax.block_until_ready(srgb)
    total = time.time() - t0
    # per-sample timing excluding compile (first sample)
    steady = (times[-1] - times[0]) / max(len(times) - 1, 1) if \
        len(times) > 1 else total
    n_rays = args.width * args.height
    if not args.quiet:
        print(f"rendered {args.width}x{args.height} @ {spp}spp in "
              f"{total:.1f}s; steady-state {steady * 1000:.0f} ms/sample "
              f"({n_rays / max(steady, 1e-9) / 1e6:.2f} Mpaths/s)")

    if args.debug_print_pixel:
        from ..utils import debugprint as DP
        import jax.numpy as jnp
        dx, dy = (int(v) for v in args.debug_print_pixel.split(","))
        cam_dp = cam._replace(viewport=jnp.asarray(
            [args.width, args.height], jnp.float32))
        print(DP.format_slots(DP.print_path(r.assets, cam_dp, dx, dy)))

    if args.debug_delta_tree:
        from ..utils import deltatree as DT
        import jax.numpy as jnp
        dx, dy = (int(v) for v in args.debug_delta_tree.split(","))
        cam_dt = cam._replace(viewport=jnp.asarray(
            [args.width, args.height], jnp.float32))
        print(DT.format_tree(DT.explore_pixel(r.assets, cam_dt, dx, dy)))

    if args.debug_lines_pixel:
        from ..utils import debuglines as DL
        import jax.numpy as jnp
        import numpy as np
        dx, dy = (int(v) for v in args.debug_lines_pixel.split(","))
        cam_dl = cam._replace(viewport=jnp.asarray(
            [args.width, args.height], jnp.float32))
        buf = DL.lines_for_path(r.assets, cam_dl, dx, dy)
        srgb = np.asarray(DL.rasterize_overlay(jnp.asarray(srgb), buf,
                                               cam_dl))
        if not args.quiet:
            print(f"debug lines: pixel ({dx},{dy}) path overlay")

    IM.save_png(args.output, srgb)
    if args.dump_npy:
        IM.save_npy(args.dump_npy, hdr)
    if args.checkpoint:
        r.save_checkpoint(args.checkpoint)
    if not args.quiet:
        print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
