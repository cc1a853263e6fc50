"""Spot lights + cone shaping (VERDICT r3 missing #3): the sampled
radiance must match the reference falloff formula analytically
(RTXPT/RTXDI/LightShaping.hlsli:67-85 evaluateLightShaping;
PolymorphicLight.hlsli:73,138; packing PrepareLightsPass.cpp:249-277)."""
import numpy as np
import jax.numpy as jnp

from rtxpt_tpu.scene import lights as LI
from rtxpt_tpu.scene import procedural


def _table(inner, outer, axis=(0.0, -1.0, 0.0), intensity=100.0):
    host = procedural.build_programmer_art(with_emissive=False).finish()
    spot = [dict(kind=LI.LIGHT_SPOT, position=(0.0, 4.0, 0.0), axis=axis,
                 radiance=(intensity,) * 3,
                 inner_angle=inner, outer_angle=outer)]
    return LI.build_light_table(host, spot)


def _smoothstep(e0, e1, x):
    t = np.clip((x - e0) / max(e1 - e0, 1e-9), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def test_spot_falloff_matches_reference_formula():
    inner, outer = 0.3, 0.6
    lt = _table(inner, outer)
    assert lt is not None and int(np.asarray(lt.kind)[-1]) == LI.LIGHT_SPOT

    # surface points on a ring below the light at varying angles theta
    # from the spot axis (0,-1,0)
    thetas = np.asarray([0.0, 0.2, 0.35, 0.45, 0.55, 0.7, 1.0])
    d = 2.0
    pts = np.stack([d * np.sin(thetas), 4.0 - d * np.cos(thetas),
                    np.zeros_like(thetas)], -1).astype(np.float32)
    n = pts.shape[0]
    u3 = jnp.tile(jnp.asarray([[0.0, 0.5, 0.5]], jnp.float32), (n, 1))
    ls = LI.sample_local_lights(lt, None, None, jnp.asarray(pts), u3)
    li = np.asarray(ls.li)[:, 0] * np.asarray(ls.pdf)  # undo 1/pick_pdf

    # reference: intensity/d^2 * smoothstep(cosOuter, cosOuter+soft, cosT)
    soft = 1.0 - inner / outer
    expect = 100.0 / d**2 * _smoothstep(
        np.cos(outer), np.cos(outer) + soft, np.cos(thetas))
    np.testing.assert_allclose(li, expect, rtol=1e-4, atol=1e-6)

    # inside the inner cone: full intensity; outside outer: zero
    assert li[0] > 0 and li[-1] == 0.0

    # eval_sample_at (the ReSTIR/ReGIR re-evaluation path) agrees
    idx = jnp.full((n,), lt.count - 1, jnp.int32)
    uv = jnp.full((n, 2), 0.5, jnp.float32)
    _, _, li2, _, ok = LI.eval_sample_at(lt, None, None, idx, uv,
                                         jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(li2)[:, 0], expect,
                               rtol=1e-4, atol=1e-6)


def test_spot_power_uses_flux_factor():
    """Selection power must scale by the shaping flux factor
    (getShapingFluxFactor, LightShaping.hlsli:151-165)."""
    lt_spot = _table(0.0, np.pi / 3)
    lt_wide = _table(0.0, np.pi / 2)
    p_spot = float(np.asarray(lt_spot.power)[-1])
    p_wide = float(np.asarray(lt_wide.power)[-1])
    lum = 100.0
    for outer, p in ((np.pi / 3, p_spot), (np.pi / 2, p_wide)):
        ff = (1.0 - np.cos(outer)) * (1.0 - 0.5 * 1.0) * 0.5
        assert abs(p - lum * 4 * np.pi * ff) < 1e-3 * max(p, 1.0)
    assert p_spot < p_wide


def test_gltf_spot_import():
    """KHR_lights_punctual spot -> analytic list with -Z axis rotated by
    the node transform (GltfImporter.cpp:978-985)."""
    from rtxpt_tpu.scene import gltf as G
    xf = np.eye(3, 4, dtype=np.float32)
    xf[:, 3] = (1.0, 2.0, 3.0)
    light = {"type": "spot", "intensity": 7.0, "color": [1, 0.5, 1],
             "spot": {"innerConeAngle": 0.1, "outerConeAngle": 0.5}}
    out = G.analytic_lights_from_info({"lights": [(light, xf)]})
    assert len(out) == 1 and out[0]["kind"] == LI.LIGHT_SPOT
    np.testing.assert_allclose(out[0]["axis"], [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(out[0]["position"], [1, 2, 3])
    assert out[0]["inner_angle"] == 0.1
    assert out[0]["outer_angle"] == 0.5
