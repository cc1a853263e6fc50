"""Weighted reservoir sampling primitives (ReSTIR).

TPU-native equivalent of the RTXDI SDK reservoir
(RTXDI_DIReservoir; consumed via RTXPT/RTXDI/*.hlsl and the in-path
variant at PathTracer/LightSampling/LightSamplingLocal.hlsli:58).

A reservoir stores one light sample per pixel:
  light: i32  >=0 local light index; -2 env-map sample; -1 invalid
  uv:    (2,) area sample for local lights, oct-encoded direction for env
  w_sum: running RIS weight sum
  m:     candidate count (float; temporal reuse accumulates fractions)
  w:     unbiased contribution weight W = w_sum / (M * p_hat(y))
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

LIGHT_INVALID = -1
LIGHT_ENV = -2


class Reservoir(NamedTuple):
    light: jnp.ndarray   # (N,) i32
    uv: jnp.ndarray      # (N,2) f32
    w_sum: jnp.ndarray   # (N,)
    m: jnp.ndarray       # (N,)
    target: jnp.ndarray  # (N,) p_hat of the stored sample (cached)

    @staticmethod
    def empty(n: int) -> "Reservoir":
        return Reservoir(
            light=jnp.full((n,), LIGHT_INVALID, jnp.int32),
            uv=jnp.zeros((n, 2), jnp.float32),
            w_sum=jnp.zeros((n,), jnp.float32),
            m=jnp.zeros((n,), jnp.float32),
            target=jnp.zeros((n,), jnp.float32))

    def contribution_weight(self):
        """W = w_sum / (M * p_hat); 0 for invalid/zero-target."""
        denom = self.m * self.target
        return jnp.where((self.light != LIGHT_INVALID) & (denom > 0.0),
                         self.w_sum / jnp.maximum(denom, 1e-20), 0.0)


def update(r: Reservoir, light, uv, weight, target, u,
           count=1.0) -> Reservoir:
    """Stream one candidate into the reservoir (RIS update)."""
    w_sum = r.w_sum + weight
    take = (u * w_sum < weight) & (weight > 0.0)
    return Reservoir(
        light=jnp.where(take, light, r.light),
        uv=jnp.where(take[..., None], uv, r.uv),
        w_sum=w_sum,
        m=r.m + count,
        target=jnp.where(take, target, r.target))


def merge(r: Reservoir, other: Reservoir, other_target_at_center,
          u) -> Reservoir:
    """Merge another reservoir (temporal/spatial reuse): the incoming
    sample is re-weighted by its target value at the receiving pixel."""
    w_in = other_target_at_center * other.contribution_weight() * other.m
    merged = update(r, other.light, other.uv, w_in,
                    other_target_at_center, u, count=other.m)
    return merged
