"""Post pipeline units: TAAU upscaler slot (VERDICT item 10) and the
denoiser anti-lag history clamp (item 7)."""
import numpy as np
import jax.numpy as jnp

from rtxpt_tpu.denoise import relax
from rtxpt_tpu.models.renderer import r2_jitter
from rtxpt_tpu.post import taau


FREQ = 12.0   # cycles across width: half the render Nyquist rate


def _render_pattern(hr, wr, jitter):
    """Analytic 'render' of a horizontal sinusoid, point-sampled at
    render resolution with the camera jitter applied (detail the R2
    jitter sequence can recover at display res)."""
    yy, xx = np.mgrid[0:hr, 0:wr]
    u = (xx + 0.5 + jitter[0]) / wr
    img = (0.5 + 0.5 * np.sin(2 * np.pi * FREQ * u)).astype(np.float32)
    return jnp.asarray(np.repeat(img[..., None], 3, axis=-1))


def test_taau_upscales_and_converges():
    hr, wr = 36, 48
    hd, wd = 72, 96
    state = None
    out = None
    for i in range(32):
        jit = r2_jitter(i)
        frame = _render_pattern(hr, wr, jit)
        motion = jnp.zeros((hr, wr, 2))
        out, state = taau.resolve(state, frame, motion, (wd, hd),
                                  jitter=jit)
    assert out.shape == (hd, wd, 3)
    o = np.asarray(out)
    assert np.isfinite(o).all()
    # converged output reconstructs the true display-res signal more
    # accurately than a single jittered frame's upsample
    # (superresolution: the R2 jitter scans sub-pixel positions)
    xxd = (np.arange(wd) + 0.5) / wd
    truth = np.repeat(
        (0.5 + 0.5 * np.sin(2 * np.pi * FREQ * xxd)
         ).astype(np.float32)[None, :], hd, 0)
    single, _ = taau.resolve(None, _render_pattern(hr, wr, (0.3, 0.1)),
                             jnp.zeros((hr, wr, 2)), (wd, hd),
                             jitter=(0.3, 0.1))
    mae_taau = np.abs(o[..., 0] - truth).mean()
    mae_single = np.abs(np.asarray(single)[..., 0] - truth).mean()
    assert mae_taau < mae_single / 1.1, (mae_taau, mae_single)


def test_history_clamp_kills_ghosts():
    """A bright ghost in the history must be clamped toward the current
    frame's neighborhood (anti-lag color box) instead of lingering."""
    h, w = 32, 32
    dark = jnp.full((h, w, 3), 0.1)
    nrm = jnp.tile(jnp.asarray([0.0, 1.0, 0.0]), (h, w, 1))
    z = jnp.ones((h, w))
    mot = jnp.zeros((h, w, 2))
    # history state holding a bright blob (a stale reflection ghost)
    ghost = dark.at[10:16, 10:16].set(25.0)
    state = relax.DenoiserState(
        radiance=ghost, moments=jnp.zeros((h, w, 2)),
        history=jnp.full((h, w), 16.0), normal=nrm, view_z=z)
    out, new_state = relax.denoise(state, dark, nrm, z, mot,
                                   iterations=1)
    # with the clamp, the blended result stays near the current frame
    assert float(np.asarray(out)[12, 12].max()) < 1.0
    # and the history length was cut so recovery is fast
    assert float(np.asarray(new_state.history)[12, 12]) < 16.0
