"""Stable-planes decomposition: BUILD delta tree, branch IDs, FILL
routing, and the realtime stable pipeline (VERDICT round-1 item 3;
reference RTXPT/PathTracer/StablePlanes.hlsli +
PathTracerStablePlanes.hlsli)."""
import numpy as np
import pytest
import jax.numpy as jnp

from rtxpt_tpu import config as C
from rtxpt_tpu.models.realtime import RealtimeRenderer
from rtxpt_tpu.models.renderer import (Renderer, realtime_config,
                                       reference_config)
from rtxpt_tpu.pt import stableplanes as SP
from rtxpt_tpu.scene import procedural
from rtxpt_tpu.scene.build import SceneBuilder, Mesh


def _quad(z=0.0):
    pos = np.asarray([[-1, -1, z], [1, -1, z], [1, 1, z], [-1, 1, z]],
                     np.float32)
    idx = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    return pos, idx


def _glass_wall_scene():
    """A big glass wall in front of a diffuse back wall: primary hits are
    a 2-delta-lobe junction -> base plane 0 + reflection/refraction
    planes."""
    sb = SceneBuilder()
    white = sb.add_material(base_color=(0.7, 0.7, 0.7), roughness=1.0)
    glass = sb.add_material(base_color=(0.98, 0.98, 0.98), roughness=0.0,
                            transmission=1.0, ior=1.5)
    pos, idx = _quad()
    wall = sb.add_mesh(Mesh(positions=pos * 8.0, indices=idx))
    gl = sb.add_mesh(Mesh(positions=pos * 4.0, indices=idx, material=1))
    import numpy as _np
    back = _np.eye(3, 4, dtype=_np.float32)
    back[2, 3] = -3.0
    front = _np.eye(3, 4, dtype=_np.float32)
    front[2, 3] = -1.0
    sb.add_instance(wall, back, white)
    sb.add_instance(gl, front, glass)
    return sb.finish()


def _camera(w, h):
    from rtxpt_tpu.scene.camera import make_camera
    return make_camera(w, h, pos=(0.0, 0.0, 2.0),
                       look_dir=(0.0, 0.0, -1.0))


def test_branch_id_encoding():
    b = SP.ROOT_BRANCH
    assert int(SP.branch_vertex_index(jnp.asarray([b], jnp.uint32))[0]) == 1
    b2 = SP.advance_branch_id(jnp.asarray([b], jnp.uint32),
                              jnp.uint32(1))
    assert int(b2[0]) == 0b101
    assert int(SP.branch_vertex_index(b2)[0]) == 2
    # prefix test: vertex at depth 1 with root id is on the path to b2
    assert bool(SP.is_on_stable_path(
        b2, jnp.asarray([1], jnp.uint32), jnp.asarray([1]))[0])
    assert not bool(SP.is_on_stable_path(
        b2, jnp.asarray([0b100], jnp.uint32), jnp.asarray([2]))[0])
    assert bool(SP.is_on_plane(b2, b2)[0])


def test_build_forks_glass_junction():
    host = _glass_wall_scene()
    cam = _camera(32, 24)
    r = Renderer(host, cam, reference_config(max_bounces=4))
    px, py = np.meshgrid(np.arange(32, dtype=np.uint32),
                         np.arange(24, dtype=np.uint32))
    sp = SP.build_stable_planes(
        r.assets, cam, cam, jnp.asarray(px.reshape(-1)),
        jnp.asarray(py.reshape(-1)), plane_count=3, max_vertex_depth=4)
    bid = np.asarray(sp.branch_id)
    used1 = (bid[:, 1] != 0xFFFFFFFF).mean()
    used2 = (bid[:, 2] != 0xFFFFFFFF).mean()
    # most pixels see the glass wall -> reflection + refraction planes
    assert used1 > 0.4, used1
    assert used2 > 0.4, used2
    # refraction plane should reach the diffuse back wall: some plane
    # with nonzero roughness
    rough = np.asarray(sp.roughness)
    assert (rough[:, 1:][bid[:, 1:] != 0xFFFFFFFF] > 0.5).any()


def test_build_psr_mirror_chain():
    """A mirror (single delta lobe) continues as PSR on plane 0."""
    sb = SceneBuilder()
    sb.add_material(base_color=(0.7, 0.7, 0.7), roughness=1.0)
    mirror = sb.add_material(base_color=(0.95, 0.95, 0.95), metalness=1.0,
                             roughness=0.0)
    pos, idx = _quad()
    import numpy as _np
    wall = sb.add_mesh(Mesh(positions=pos * 8.0, indices=idx))
    mr = sb.add_mesh(Mesh(positions=pos * 4.0, indices=idx, material=1))
    back = _np.eye(3, 4, dtype=_np.float32)
    back[2, 3] = -3.0
    front = _np.eye(3, 4, dtype=_np.float32)
    front[2, 3] = -1.0
    sb.add_instance(wall, back, 0)
    sb.add_instance(mr, front, mirror)
    host = sb.finish()
    cam = _camera(32, 24)
    r = Renderer(host, cam, reference_config(max_bounces=4))
    px, py = np.meshgrid(np.arange(32, dtype=np.uint32),
                         np.arange(24, dtype=np.uint32))
    sp = SP.build_stable_planes(
        r.assets, cam, cam, jnp.asarray(px.reshape(-1)),
        jnp.asarray(py.reshape(-1)), plane_count=3, max_vertex_depth=4)
    bid = np.asarray(sp.branch_id)
    vtx = np.asarray(sp.vertex_index)
    # PSR: plane 0 of mirror pixels sits at vertex 2 (behind the mirror)
    psr = (vtx[:, 0] >= 2).mean()
    assert psr > 0.3, psr


def test_stable_fill_fast_gate():
    """Reduced fast-tier A/B (ADVICE r2, VERDICT r3 weak #4): the
    stable-planes FILL estimator vs reference mode at tiny scale — this
    MUST run in the default tier (no slow marker) so the default suite
    contains an estimator-correctness gate; the full-strength version
    below stays in the slow tier."""
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(32, 24)
    spp = 6
    ref = np.asarray(Renderer(host, cam, reference_config(
        max_bounces=3, max_diffuse_bounces=2)).render(32, 24, spp))
    cfg = realtime_config(use_restir_di=False, use_restir_gi=False,
                          denoiser_enabled=False, use_stable_planes=True,
                          max_bounces=3, max_diffuse_bounces=2)
    r = RealtimeRenderer(host, cam, cfg)
    acc = np.zeros_like(ref)
    for _ in range(spp):
        acc += np.asarray(r.render_frame(32, 24, taa=False,
                                         denoise=False))
    acc /= spp
    assert abs(acc.mean() - ref.mean()) / ref.mean() < 0.3, \
        (acc.mean(), ref.mean())


@pytest.mark.slow
def test_stable_fill_matches_reference():
    """The decomposed FILL output (sum of planes + stable radiance) must
    estimate the same integral as reference mode (the A/B oracle of
    LocalConfig REF_VS_REALTIME, applied to the stable-planes path)."""
    host = procedural.build_programmer_art().finish()
    cam = procedural.default_camera(48, 32)
    spp = 24
    ref = np.asarray(Renderer(host, cam, reference_config(
        max_bounces=4, max_diffuse_bounces=2)).render(48, 32, spp))
    cfg = realtime_config(use_restir_di=False, use_restir_gi=False,
                          denoiser_enabled=False, use_stable_planes=True,
                          max_bounces=4, max_diffuse_bounces=2)
    r = RealtimeRenderer(host, cam, cfg)
    acc = np.zeros_like(ref)
    for _ in range(spp):
        acc += np.asarray(r.render_frame(48, 32, taa=False,
                                         denoise=False))
    acc /= spp
    rel = np.abs(acc.mean(-1) - ref.mean(-1)) / (ref.mean(-1) + 0.05)
    assert np.median(rel) < 0.25, np.median(rel)
    assert abs(acc.mean() - ref.mean()) / ref.mean() < 0.12, \
        (acc.mean(), ref.mean())


@pytest.mark.slow
def test_glass_secondary_surface_denoises():
    """VERDICT item 3 'Done': a glass-refraction scene denoises on its
    SECONDARY surface — the refraction plane carries the back wall and
    its per-plane denoiser smooths the noisy fill radiance there."""
    host = _glass_wall_scene()
    cam = _camera(48, 36)
    cfg = realtime_config(use_restir_di=False, use_restir_gi=False,
                          denoiser_enabled=True, use_stable_planes=True,
                          max_bounces=4, max_diffuse_bounces=2)
    r = RealtimeRenderer(host, cam, cfg)
    raw_cfg = realtime_config(use_restir_di=False, use_restir_gi=False,
                              denoiser_enabled=False,
                              use_stable_planes=True,
                              max_bounces=4, max_diffuse_bounces=2)
    r_raw = RealtimeRenderer(host, cam, raw_cfg)
    for _ in range(6):
        den = np.asarray(r.render_frame(48, 36, taa=False))
    raw = np.asarray(r_raw.render_frame(48, 36, taa=False,
                                        denoise=False))
    # planes 1/2 are in use (reflection + refraction of the glass wall)
    bid = np.asarray(r.last_stable_planes.branch_id)
    assert (bid[:, 1] != 0xFFFFFFFF).mean() > 0.3
    # center region sees the back wall through the glass; the denoised
    # output there must be much smoother than a raw 1-frame fill
    reg = (slice(12, 24), slice(16, 32))
    var_den = den[reg].std()
    var_raw = raw[reg].std()
    assert np.isfinite(den).all()
    assert var_den < 0.6 * var_raw, (var_den, var_raw)


def _stable_compaction_ab(base, frames=1):
    """Render `frames` stable-planes frames with tail compaction on vs
    off; images must match (same per-lane math, narrower dispatches)."""
    import dataclasses
    w, h = 64, 48
    host = _glass_wall_scene()
    cam = _camera(w, h)
    imgs = []
    for on in (True, False):
        cfg = dataclasses.replace(base, wavefront_compaction=on)
        rt = RealtimeRenderer(host, cam, cfg)
        img = rt.render_frame(w, h)
        for _ in range(frames - 1):
            img = rt.render_frame(w, h)
        imgs.append(np.asarray(img))
    assert np.isfinite(imgs[0]).all()
    np.testing.assert_allclose(imgs[0], imgs[1], rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_build_walk_compaction_equivalence():
    """The BUILD delta-walk's tail compaction (narrow continuation of
    each slot's while_loop) must produce bit-identical stable planes.
    Slow tier: tracing the 3-slot walk twice per config costs ~2 min of
    CPU compile; the fast tier's render_paths compaction gate covers
    the shared two-stage machinery."""
    w, h = 64, 48
    host = _glass_wall_scene()
    cam = _camera(w, h)
    r = Renderer(host, cam, reference_config(max_bounces=4))
    px, py = np.meshgrid(np.arange(w, dtype=np.uint32),
                         np.arange(h, dtype=np.uint32))
    px = jnp.asarray(px.reshape(-1))
    py = jnp.asarray(py.reshape(-1))
    sps = [SP.build_stable_planes(r.assets, cam, cam, px, py,
                                  plane_count=3, max_vertex_depth=4,
                                  compaction=on, compaction_min=1024)
           for on in (True, False)]
    for a, b in zip(sps[0], sps[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_stable_frame_compaction_equivalence_full_pipeline():
    """Full-pipeline A/B (DI+GI+denoise+TAA, history frame included)."""
    _stable_compaction_ab(realtime_config(
        use_restir_di=True, use_restir_gi=True, denoiser_enabled=True,
        use_stable_planes=True, wavefront_compaction_min=1024),
        frames=2)
