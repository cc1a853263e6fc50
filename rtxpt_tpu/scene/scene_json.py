"""Scene description files (.scene.json) — ExtendedScene equivalent.

Mirrors the reference's scene-json extensions over glTF
(RTXPT/ExtendedScene.h: EnvironmentLight :20, PerspectiveCameraEx :35,
SampleSettings :83 consumed at Sample.cpp:629-649): a JSON wrapper that
references glTF assets and adds environment, camera, analytic lights and
per-scene renderer settings.

Schema:
{
  "models": ["relative/path.gltf", ...],         # merged into one scene
  "environment": {"type": "procedural-sky",      # or "constant"
                  "intensity": 1.0, "sun_dir": [x,y,z],
                  "sun_radiance": [r,g,b], "sky_scale": 1.0},
  "camera": {"position": [..], "target"|"direction": [..], "up": [..],
             "fov_y_degrees": 60, "aperture": 0.0,
             "focal_distance": 1.0},
  "lights": [{"type": "point"|"directional"|"sphere", ...}],
  "settings": {"max_bounces": 30, ...}           # PTConfig overrides
}
"""
from __future__ import annotations

import json
import math
import os

import numpy as np


def load_scene_json(path: str, width: int, height: int):
    """Returns (host_scene, camera, extra) where extra carries
    env_radiance, analytic_lights and settings overrides."""
    from . import envmap as EM
    from . import gltf as G
    from .build import SceneBuilder
    from .camera import look_at, make_camera

    with open(path) as f:
        doc = json.load(f)
    base = os.path.dirname(os.path.abspath(path))

    sb = SceneBuilder()
    analytic = []
    for rel in doc.get("models", []):
        _, info = G.load_gltf(os.path.join(base, rel), sb)
        analytic += G.analytic_lights_from_info(info)

    host = sb.finish()

    env_cfg = doc.get("environment", {})
    kind = env_cfg.get("type", "procedural-sky")
    if kind == "constant":
        import jax.numpy as jnp
        val = np.asarray(env_cfg.get("radiance", [1, 1, 1]), np.float32)
        env = jnp.tile(jnp.asarray(val), (64, 128, 1))
    else:
        kwargs = {}
        for k_json, k_py in [("sun_dir", "sun_dir"),
                             ("sun_radiance", "sun_radiance"),
                             ("sky_scale", "sky_scale")]:
            if k_json in env_cfg:
                kwargs[k_py] = env_cfg[k_json]
        env = EM.bake_procedural_sky(**kwargs)

    cam_cfg = doc.get("camera", {})
    pos = cam_cfg.get("position", [4, 3, 4])
    fov = math.radians(cam_cfg.get("fov_y_degrees", 60.0))
    common = dict(fov_y=fov,
                  aperture_radius=cam_cfg.get("aperture", 0.0),
                  focal_distance=cam_cfg.get("focal_distance", 1.0))
    if "direction" in cam_cfg:
        cam = make_camera(width, height, pos, cam_cfg["direction"],
                          cam_cfg.get("up", (0, 1, 0)), **common)
    else:
        cam = look_at(width, height, eye=pos,
                      target=cam_cfg.get("target", [0, 0, 0]),
                      up=tuple(cam_cfg.get("up", (0, 1, 0))), **common)

    from . import lights as LI
    kind_map = {"point": LI.LIGHT_POINT,
                "directional": LI.LIGHT_DIRECTIONAL,
                "sphere": LI.LIGHT_SPHERE}
    for l in doc.get("lights", []):
        analytic.append(dict(
            kind=kind_map.get(l.get("type", "point"), LI.LIGHT_POINT),
            position=l.get("position", l.get("direction", [0, 1, 0])),
            radiance=l.get("radiance", [1, 1, 1]),
            radius=l.get("radius", 0.0)))

    extra = dict(env_radiance=env,
                 env_intensity=env_cfg.get("intensity", 1.0),
                 analytic_lights=analytic,
                 settings=doc.get("settings", {}))
    return host, cam, extra
