"""Row-window addressing for sharded per-pixel buffers.

When realtime stage 1 runs row-sharded over a device mesh
(parallel/meshutils.pt_frame_sharded), every per-pixel buffer a shard
holds is a contiguous row window of the global frame: `rows` rows
starting at global row `y0` (prev-frame temporal buffers carry extra
halo rows exchanged over the ICI ring). All ReSTIR cross-pixel gathers
(temporal reprojection, spatial taps) address those buffers through
this helper; with y0=0, rows=gheight it reduces to the plain full-frame
clamp + flatten, so the unsharded path is bit-identical."""
import jax.numpy as jnp


def window_flat(ix, iy, width: int, y0, rows: int, gheight: int):
    """Flat index into a row-window buffer laid out (rows*width, ...)
    with global row y0 at local row 0.

    ix, iy: GLOBAL pixel coords (any int dtype). iy clamps to the
    window rows that are also inside the global frame (halo rows past
    the frame edge wrap garbage from the ring exchange and must never
    be read). y0 may be a traced scalar (lax.axis_index * rows)."""
    ixc = jnp.clip(ix, 0, width - 1)
    lo = jnp.maximum(y0, 0)
    hi = jnp.minimum(y0 + rows, gheight) - 1
    iyc = jnp.clip(iy, lo, hi)
    return (iyc - y0) * width + ixc
