"""glTF 2.0 loader: synthetic .gltf / .glb round-trips."""
import base64
import json
import struct

import numpy as np

from rtxpt_tpu.scene import gltf


def _make_doc():
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]],
                     np.float32)
    idx = np.asarray([0, 1, 2, 2, 1, 3], np.uint16)
    buf = pos.tobytes() + idx.tobytes()
    return {
        "asset": {"version": "2.0"},
        "scene": 0, "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": [1, 2, 3], "children": [1]},
                  {"camera": 0}],
        "cameras": [{"type": "perspective",
                     "perspective": {"yfov": 0.8, "znear": 0.01}}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0},
                                    "indices": 1, "material": 0}]}],
        "materials": [{
            "pbrMetallicRoughness": {
                "baseColorFactor": [0.9, 0.8, 0.7, 1.0],
                "metallicFactor": 0.0, "roughnessFactor": 0.1},
            "emissiveFactor": [1, 0, 0],
            "extensions": {
                "KHR_materials_transmission": {"transmissionFactor": 1.0},
                "KHR_materials_ior": {"ior": 1.45},
                "KHR_materials_emissive_strength":
                    {"emissiveStrength": 5.0}}}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 6,
             "type": "SCALAR"}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 12}],
        "buffers": [{"byteLength": 60,
                     "uri": "data:application/octet-stream;base64,"
                     + base64.b64encode(buf).decode()}],
    }


def test_gltf_json(tmp_path):
    path = tmp_path / "t.gltf"
    path.write_text(json.dumps(_make_doc()))
    host, info = gltf.load_gltf(str(path))
    assert host["positions"].shape == (4, 3)
    assert host["indices"].shape == (2, 3)
    np.testing.assert_allclose(host["positions"][0], [1, 2, 3])
    m = host["materials"]
    np.testing.assert_allclose(m["base_color"][0], [0.9, 0.8, 0.7])
    assert m["transmission"][0] == 1.0
    assert abs(m["ior"][0] - 1.45) < 1e-6
    np.testing.assert_allclose(m["emissive"][0], [5, 0, 0])
    cam = gltf.camera_from_info(info, 64, 48)
    np.testing.assert_allclose(np.asarray(cam.pos), [1, 2, 3])


def test_glb(tmp_path):
    doc = _make_doc()
    js = json.dumps(doc).encode()
    js += b" " * ((4 - len(js) % 4) % 4)
    glb = struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(js)) + \
        struct.pack("<II", len(js), 0x4E4F534A) + js
    path = tmp_path / "t.glb"
    path.write_bytes(glb)
    host, _ = gltf.load_gltf(str(path))
    assert host["positions"].shape == (4, 3)
