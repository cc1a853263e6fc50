"""Async texture loads: decode futures overlap scene/BVH builds and
resolve to the same texel data as the sync path (donut TextureCache
LoadTextureFromFileAsync + taskflow executor)."""
import base64
import io
import json

import numpy as np

from rtxpt_tpu.scene import gltf
from rtxpt_tpu.scene.texcache import TextureCache, resolve_images


def _textured_gltf(path):
    from PIL import Image
    img = Image.fromarray(
        (np.random.RandomState(0).uniform(0, 255, (8, 8, 4)))
        .astype(np.uint8))
    bio = io.BytesIO()
    img.save(bio, format="PNG")
    png = bio.getvalue()
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    uv = np.asarray([[0, 0], [1, 0], [0, 1]], np.float32)
    idx = np.asarray([0, 1, 2], np.uint16)
    buf = pos.tobytes() + uv.tobytes() + idx.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0, "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "TEXCOORD_0": 1},
            "indices": 2, "material": 0}]}],
        "materials": [{"pbrMetallicRoughness": {
            "baseColorTexture": {"index": 0}}}],
        "textures": [{"source": 0}, {"source": 0}],   # dedup: same src
        "images": [{"uri": "data:image/png;base64,"
                    + base64.b64encode(png).decode()}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 3,
             "type": "VEC2"},
            {"bufferView": 2, "componentType": 5123, "count": 3,
             "type": "SCALAR"}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 24},
            {"buffer": 0, "byteOffset": 60, "byteLength": 6}],
        "buffers": [{"byteLength": 66,
                     "uri": "data:application/octet-stream;base64,"
                     + base64.b64encode(buf).decode()}],
    }
    path.write_text(json.dumps(doc))


def test_async_decode_matches_sync(tmp_path):
    p = tmp_path / "tex.gltf"
    _textured_gltf(p)
    host_s, info_s = gltf.load_gltf(str(p))
    cache = TextureCache()
    host_a, info_a = gltf.load_gltf(str(p), texture_cache=cache)
    from concurrent.futures import Future
    assert all(isinstance(t, Future) for t in info_a["textures"])
    # dedup: both textures share one image source -> same future
    assert info_a["textures"][0] is info_a["textures"][1]
    got = resolve_images(info_a["textures"])
    for a, b in zip(got, info_s["textures"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_renderer_end_to_end(tmp_path):
    p = tmp_path / "tex.gltf"
    _textured_gltf(p)
    from rtxpt_tpu.models.renderer import Renderer, reference_config
    from rtxpt_tpu.scene.camera import make_camera
    cache = TextureCache()
    host, info = gltf.load_gltf(str(p), texture_cache=cache)
    host["texture_images"] = info["textures"]
    host["texture_srgb"] = info.get("texture_srgb")
    cam = make_camera(16, 12, pos=(0.3, 0.3, 3), look_dir=(0, 0, -1))
    r = Renderer(host, cam, reference_config(max_bounces=2))
    assert r.scene.textures is not None
    img = np.asarray(r.render(16, 12, 1))
    assert np.isfinite(img).all()
