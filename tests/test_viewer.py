"""Interactive viewer (the DeviceManager window + SampleUI surface):
HTTP server round-trips — page, state, frames with camera input, config
changes, screenshot (reference: donut DeviceManager RunMessageLoop +
RTXPT/SampleUI.cpp panel)."""
import http.client
import json

import numpy as np
import pytest

from rtxpt_tpu.app.viewer import ViewerApp, serve
from rtxpt_tpu.scene import envmap as EM, procedural

W, H = 48, 32


def _start(**overrides):
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(W, H)
    env = EM.bake_procedural_sky(height=32)
    app = ViewerApp(host, cam, W, H, env=env,
                    realtime_overrides=overrides)
    srv, _ = serve(app, 0)
    return app, srv, srv.server_address[1]


def _req(port, method, path, body=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
    conn.request(method, path,
                 body=json.dumps(body) if body is not None else None)
    r = conn.getresponse()
    data = r.read()
    hdrs = dict(r.getheaders())
    conn.close()
    return r.status, data, hdrs


def test_viewer_end_to_end(tmp_path):
    # reference mode keeps the CPU-tier compile small; the realtime
    # pipeline behind the viewer is covered by test_psr/test_ref_vs_
    # realtime, and the realtime viewer round-trip by the slow tier
    app, srv, port = _start(mode="reference", max_bounces=2)
    try:
        status, page, _ = _req(port, "GET", "/")
        assert status == 200 and b"canvas" in page

        status, state, _ = _req(port, "GET", "/api/state")
        state = json.loads(state)
        assert state["width"] == W
        assert "FirstHitShadingNormal" in state["debug_views"]

        # frame with forward-motion input -> PNG + stats header,
        # camera moved
        eye0 = app.eye.copy()
        status, png, hdrs = _req(port, "POST", "/api/frame",
                                 {"keys": ["w"], "dx": 3, "dy": 0})
        assert status == 200 and png[:4] == b"\x89PNG"
        assert "X-Stats" in hdrs
        assert not np.allclose(app.eye, eye0)

        # two still frames accumulate reference spp
        _req(port, "POST", "/api/frame", {"keys": []})
        _req(port, "POST", "/api/frame", {"keys": []})
        assert app._renderer.sample_index == 3

        # debug view renders through the same frame endpoint
        _req(port, "POST", "/api/config",
             {"debug_view": "FirstHitShadingNormal", "exposure": 1.0})
        status, png, hdrs = _req(port, "POST", "/api/frame", {"keys": []})
        assert status == 200 and png[:4] == b"\x89PNG"

        # screenshot endpoint writes the last frame
        app.screenshot_path = str(tmp_path / "shot.png")
        status, out, _ = _req(port, "POST", "/api/screenshot")
        assert json.loads(out)["saved"] == app.screenshot_path
        assert (tmp_path / "shot.png").exists()

        # material editor (SampleUI.cpp:1254,1382): state lists
        # materials; an edit re-uploads the table without rebuild and
        # the next frame reflects it
        assert len(state["materials"]) > 0
        rend0 = app._renderer
        _req(port, "POST", "/api/config", {"debug_view": "none"})
        _req(port, "POST", "/api/material",
             {"index": 0, "base_color": [1.0, 0.0, 0.0],
              "roughness": 0.9})
        assert app._renderer is rend0, "material edit rebuilt renderer"
        mp = np.asarray(app._renderer.scene.mat_pack)
        np.testing.assert_allclose(mp[0, 0:3], [1.0, 0.0, 0.0])
        np.testing.assert_allclose(mp[0, 4], 0.9)
        status, png, _ = _req(port, "POST", "/api/frame", {"keys": []})
        assert status == 200 and png[:4] == b"\x89PNG"
    finally:
        srv.shutdown()


@pytest.mark.slow
def test_viewer_realtime_and_mode_switch(tmp_path):
    """Realtime viewer frames + settings-panel renderer rebuild."""
    app, srv, port = _start(stable_planes=False, denoiser=False,
                            max_bounces=3)
    try:
        status, png, _ = _req(port, "POST", "/api/frame",
                              {"keys": ["w"]})
        assert status == 200 and png[:4] == b"\x89PNG"
        status, _, _ = _req(port, "POST", "/api/config",
                            {"mode": "reference", "max_bounces": 2,
                             "exposure": 1.0})
        assert status == 200
        assert app.settings["mode"] == "reference"
        _req(port, "POST", "/api/frame", {"keys": []})
        assert app._renderer.sample_index == 1
    finally:
        srv.shutdown()
