"""Single-device row-tiled realtime stage 1 (VERDICT r3 next #1): the
1080p frame runs as sequential row-tile dispatches of one compiled
program. Equivalence contract mirrors
test_parallel.py::test_stage1_sharded_matches_single_device: identical
off-seam, estimator-equal at seams."""
import numpy as np
import pytest

from rtxpt_tpu.models import realtime as RT
from rtxpt_tpu.models.renderer import realtime_config
from rtxpt_tpu.scene import envmap as EM, procedural


@pytest.mark.slow           # ~27 min on the 8-CPU mesh (2 heavy compiles
@pytest.mark.parametrize("stable", [False, True])   # x 2 variants)
def test_stage1_tiled_matches_single(monkeypatch, stable):
    w, h = 32, 96         # tiles of 48 rows with the env override below
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(w, h)
    cfg = realtime_config(use_restir_di=True, use_restir_gi=not stable,
                          denoiser_enabled=False,
                          use_stable_planes=stable,
                          max_bounces=3, max_diffuse_bounces=2)
    env = EM.bake_procedural_sky(height=32)

    single = RT.RealtimeRenderer(host, cam, cfg, env_radiance=env)
    for _ in range(2):
        img_1 = np.asarray(single.render_frame(w, h, taa=False))

    monkeypatch.setenv("RTXPT_STAGE1_TILE_PIXELS", str(48 * w))
    tiled = RT.RealtimeRenderer(host, cam, cfg, env_radiance=env)
    assert tiled._stage1_tile_rows(w, h) == 48
    for _ in range(2):
        img_t = np.asarray(tiled.render_frame(w, h, taa=False))

    assert np.isfinite(img_t).all()
    rows = 48
    seam_band = np.zeros(h, bool)
    for s in range(rows, h, rows):
        seam_band[max(s - 21, 0):min(s + 21, h)] = True
    np.testing.assert_allclose(img_t[~seam_band], img_1[~seam_band],
                               rtol=1e-4, atol=1e-5)
    a, b = img_t[seam_band].mean(), img_1[seam_band].mean()
    assert abs(a - b) < 0.15 * max(abs(b), 1e-3), (a, b)
