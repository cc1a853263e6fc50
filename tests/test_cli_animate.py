"""CLI animation flags: --animate-time poses glTF node animations
before a reference render (SampleUI animation scrubber analog)."""
import base64
import json

import numpy as np

from rtxpt_tpu.app import cli


def _animated_gltf(path):
    """A quad whose node translates +2x over t in [0,1], plus a camera
    looking down -z from z=4."""
    pos = np.asarray([[-0.5, -0.5, 0], [0.5, -0.5, 0],
                      [-0.5, 0.5, 0], [0.5, 0.5, 0]], np.float32)
    idx = np.asarray([0, 1, 2, 2, 1, 3], np.uint16)
    times = np.asarray([0.0, 1.0], np.float32)
    vals = np.asarray([[0, 0, 0], [2, 0, 0]], np.float32)
    buf = pos.tobytes() + idx.tobytes() + times.tobytes() + vals.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0, "scenes": [{"nodes": [0, 1]}],
        "nodes": [{"mesh": 0},
                  {"camera": 0, "translation": [0, 0, 4]}],
        "cameras": [{"type": "perspective",
                     "perspective": {"yfov": 0.9, "znear": 0.01}}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0},
                                    "indices": 1, "material": 0}]}],
        "materials": [{"pbrMetallicRoughness": {
            "baseColorFactor": [0.9, 0.2, 0.2, 1.0],
            "metallicFactor": 0.0, "roughnessFactor": 0.8}}],
        "animations": [{
            "channels": [{"sampler": 0,
                          "target": {"node": 0, "path": "translation"}}],
            "samplers": [{"input": 2, "output": 3,
                          "interpolation": "LINEAR"}]}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
            {"bufferView": 2, "componentType": 5126, "count": 2,
             "type": "SCALAR"},
            {"bufferView": 3, "componentType": 5126, "count": 2,
             "type": "VEC3"}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 12},
            {"buffer": 0, "byteOffset": 60, "byteLength": 8},
            {"buffer": 0, "byteOffset": 68, "byteLength": 24}],
        "buffers": [{"byteLength": 92,
                     "uri": "data:application/octet-stream;base64,"
                     + base64.b64encode(buf).decode()}],
    }
    path.write_text(json.dumps(doc))


def test_cli_animate_time_moves_geometry(tmp_path):
    scene = tmp_path / "anim.gltf"
    _animated_gltf(scene)
    common = ["--scene", str(scene), "--width", "48", "--height", "36",
              "--spp", "1", "--mode", "reference", "--max-bounces", "2",
              "--no-jitter", "--no-auto-expose", "--quiet"]

    out0 = tmp_path / "t0.npy"
    assert cli.main(common + ["--animate-time", "0.0",
                              "--output", str(tmp_path / "t0.png"),
                              "--dump-npy", str(out0)]) == 0
    out1 = tmp_path / "t1.npy"
    assert cli.main(common + ["--animate-time", "1.0",
                              "--output", str(tmp_path / "t1.png"),
                              "--dump-npy", str(out1)]) == 0

    a = np.load(out0)
    b = np.load(out1)
    assert a.shape == b.shape and np.isfinite(a).all() \
        and np.isfinite(b).all()
    # the quad moved: at t=0 it covers the image center; at t=1 the
    # center ray escapes to the sky
    h, w = a.shape[:2]
    assert not np.allclose(a[h // 2, w // 2], b[h // 2, w // 2])
