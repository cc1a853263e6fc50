"""Ray cones for texture LOD (reference: TexLODHelpers.hlsli RayCone,
PathTracer.hlsli:227,276).

A cone is (width, spread_angle), both float32 lanes; stored unpacked (the
reference packs to 2xfp16 in the 96B payload; HBM SoA makes packing optional).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class RayCone(NamedTuple):
    width: jnp.ndarray         # cone width at current hit
    spread_angle: jnp.ndarray  # current spread angle

    @staticmethod
    def make(width, spread_angle) -> "RayCone":
        return RayCone(jnp.asarray(width, jnp.float32),
                       jnp.asarray(spread_angle, jnp.float32))

    def propagate_distance(self, hit_t) -> "RayCone":
        """Grow footprint over a segment: width += spreadAngle * t
        (TexLODHelpers.hlsli propagateDistance)."""
        return RayCone(self.width + self.spread_angle * hit_t,
                       self.spread_angle)


def pixel_spread_angle(fov_y: float, height: int) -> float:
    """Per-pixel cone spread angle for the primary rays
    (reference computes atan(2*tan(fov/2)/height))."""
    import math
    return math.atan(2.0 * math.tan(fov_y * 0.5) / height)
