"""Closed-form light-transport oracles (VERDICT r4 weak #4).

The white furnace (test_integrator.py) checks the env path; these check
the NEE/analytic-light path against textbook closed forms that do NOT
come from the renderer:

  1. inverse-square law: a point light (delta, zero-variance NEE) at
     height h over a Lambertian-at-normal-incidence plane gives the
     on-axis pixel exactly  L = albedo/pi * I / h^2.
  2. cosine law + Frostbite grazing term: off-axis light at distance r,
     incident angle theta ->  L = albedo/pi * I/r^2 * cos(theta) *
     (1 - (1-cos)^5)  (the Frostbite diffuse weight at roughness 0,
     from the published equation the reference uses,
     RTXPT BxDF.hlsli:198-209 — written out here independently).

Geometry is arranged so every BSDF factor except the one under test is
exactly 1: odd image size puts the center pixel's ray exactly on the
camera axis (NDC 0 -> direction == look_dir bit-exactly), the camera
looks straight down the plane normal (view cosine 1), roughness=0 kills
the energy-bias/energy-factor roughness terms and ior=1 makes the
dielectric specular F0 zero, so only the diffuse lobe remains.
These are delta-light single-bounce renders: spp=1, no jitter, no MC
noise — any deviation is a real transport bug, so tolerances are f32
rounding only.
"""
import math

import numpy as np

from rtxpt_tpu import config as C
from rtxpt_tpu.models.renderer import Renderer, reference_config
from rtxpt_tpu.scene import lights as LI
from rtxpt_tpu.scene import procedural
from rtxpt_tpu.scene.build import SceneBuilder
from rtxpt_tpu.scene.camera import look_at

W = H = 33          # odd: center pixel (16,16) center sits at NDC (0,0)
ALBEDO = (0.6, 0.4, 0.2)
CAM_H = 3.0


def _plane_scene():
    sb = SceneBuilder()
    sb.add_material(base_color=ALBEDO, roughness=0.0, metalness=0.0,
                    ior=1.0)
    sb.add_instance(sb.add_mesh(procedural.make_quad(size=(60.0, 60.0))))
    return sb.finish()


def _render_center(light_pos, intensity=1.0):
    host = _plane_scene()
    cam = look_at(W, H, eye=(0.0, CAM_H, 0.0), target=(0.0, 0.0, 0.0),
                  up=(0.0, 0.0, 1.0), fov_y=math.radians(60.0))
    cfg = reference_config(nee_distant_samples=0, nee_local_samples=1,
                           max_bounces=2, enable_russian_roulette=False)
    lights = [dict(kind=LI.LIGHT_POINT, position=light_pos,
                   radiance=(intensity,) * 3)]
    env = np.zeros((16, 32, 3), np.float32)
    r = Renderer(host, cam, cfg, env_radiance=env,
                 analytic_lights=lights)
    img = np.asarray(r.render(W, H, 1, jitter_aa=False))
    return img[H // 2, W // 2]


def test_point_light_inverse_square_exact():
    intensity = 5.0
    for h in (1.0, 2.0):
        got = _render_center((0.0, h, 0.0), intensity)
        want = np.asarray(ALBEDO) / np.pi * intensity / h ** 2
        np.testing.assert_allclose(got, want, rtol=2e-4)


def test_point_light_cosine_law_exact():
    # light on a sphere of radius r around the on-axis hit point, at
    # incident angle theta from the plane normal
    r_l, theta = 2.0, math.radians(40.0)
    pos = (r_l * math.sin(theta), r_l * math.cos(theta), 0.0)
    intensity = 5.0
    got = _render_center(pos, intensity)
    cos_t = math.cos(theta)
    frostbite = 1.0 - (1.0 - cos_t) ** 5      # BxDF.hlsli:198-209, r=0
    want = (np.asarray(ALBEDO) / np.pi * intensity / r_l ** 2
            * cos_t * frostbite)
    np.testing.assert_allclose(got, want, rtol=2e-4)
