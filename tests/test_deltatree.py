"""Debug delta-tree explorer (utils/deltatree.py).

Reference tool: RTXPT/Sample.hlsl:332-357 DeltaTreeVizExplorePixel +
ShaderDebug.hlsli:102-157/302-330 — interactive stable-branch explorer.
These tests drive it on the programmer-art glass sphere: the tree must
fork at the dielectric (reflection + transmission lobes), branch IDs
must follow the (id << 2) | lobe encoding, and the BUILD pass's chosen
plane branches must appear among explored nodes.
"""
import numpy as np
import pytest

from rtxpt_tpu.models.renderer import Renderer, reference_config
from rtxpt_tpu.scene import envmap as EM, procedural
from rtxpt_tpu.utils import deltatree


@pytest.fixture(scope="module")
def scene():
    host = procedural.build_programmer_art().finish()
    W, H = 160, 120
    cam = procedural.default_camera(W, H)
    r = Renderer(host, cam, reference_config(max_bounces=6),
                 env_radiance=EM.bake_procedural_sky(height=32))
    return r, W, H


def _find_glass_pixel(r, W, H):
    """Probe around the glass sphere (world (1.3, 0.55, 0.9) projects
    to ~(88, 73) at 160x120 under default_camera) for a forking tree."""
    for y in (73, 71, 75):
        for x in (88, 86, 90, 84, 92):
            viz = deltatree.explore_pixel(r.assets, r.camera, x, y,
                                          max_vertex_depth=3)
            if any(len(n.lobes) >= 2 for n in viz.nodes):
                return viz
    return None


def test_tree_forks_on_glass(scene):
    r, W, H = scene
    viz = _find_glass_pixel(r, W, H)
    assert viz is not None, "no forking delta tree found on glass row"
    fork = next(n for n in viz.nodes if len(n.lobes) >= 2)
    lobe_ids = {l for l, _ in fork.lobes}
    assert lobe_ids == {deltatree.LOBE_REFLECTION,
                        deltatree.LOBE_TRANSMISSION}
    # children continue with (branch << 2) | lobe encoding
    child_ids = {n.branch_id for n in viz.nodes
                 if n.vertex_index == fork.vertex_index + 1}
    expect = {(fork.branch_id << 2) | l for l, _ in fork.lobes}
    assert expect & child_ids, (child_ids, expect)


def test_plane_branches_are_explored(scene):
    r, W, H = scene
    cam = r.camera
    viz = deltatree.explore_pixel(r.assets, cam, W // 2, H // 2,
                                  max_vertex_depth=4)
    explored = {n.branch_id for n in viz.nodes}
    for b in viz.plane_branch_ids:
        if b > 0:
            assert b in explored, (b, sorted(explored))
    # exactly the dominant plane's node is flagged
    dom = [n for n in viz.nodes if n.is_dominant]
    if viz.plane_branch_ids[viz.dominant_plane] > 0:
        assert len(dom) == 1
        assert dom[0].branch_id == \
            viz.plane_branch_ids[viz.dominant_plane]


def test_format_tree_renders(scene):
    r, W, H = scene
    viz = deltatree.explore_pixel(r.assets, r.camera,
                                  W // 2, H // 2, max_vertex_depth=3)
    txt = deltatree.format_tree(viz)
    assert "delta tree @ pixel" in txt
    assert "v1" in txt
    # every node line carries a hex branch id
    assert all("branch=" in line for line in txt.splitlines()[1:])
