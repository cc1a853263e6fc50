"""Nested dielectrics: priority-based interior list (Falcor scheme).

TPU-native port of:
  - RTXPT/PathTracer/Rendering/Materials/InteriorList.hlsli (2-slot packed
    stack: priority in the top 4 bits, materialID in the low 28, kept sorted
    so slot0 is the highest-priority medium)
  - RTXPT/PathTracer/PathTracerNestedDielectrics.hlsli (false-hit rejection,
    outside-IoR resolution, stack update on transmission)

The list is an (N,2) uint32 array lane-parallel over the wavefront; all
stack manipulation is branch-free selects + one compare-swap.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

K_NO_MATERIAL = np.uint32(0xFFFFFFFF)
K_MATERIAL_BITS = 28
K_PRIORITY_OFFSET = K_MATERIAL_BITS
K_MATERIAL_MASK = np.uint32((1 << K_MATERIAL_BITS) - 1)
K_MAX_NESTED_PRIORITY = np.uint32((1 << 4) - 1)
K_MAX_REJECTED_HITS = 16  # PathTracer.hlsli:31


def empty(n: int) -> jnp.ndarray:
    return jnp.zeros((n, 2), jnp.uint32)


def make_slot(material_id, priority):
    return ((priority.astype(jnp.uint32) << K_PRIORITY_OFFSET)
            | (material_id.astype(jnp.uint32) & K_MATERIAL_MASK))


def slot_priority(slot):
    return slot >> K_PRIORITY_OFFSET


def slot_material(slot):
    return slot & K_MATERIAL_MASK


def is_empty(slots):
    return slots[..., 0] == 0


def top_priority(slots):
    return slot_priority(slots[..., 0])


def top_material(slots):
    return jnp.where(slots[..., 0] != 0, slot_material(slots[..., 0]),
                     K_NO_MATERIAL)


def next_material(slots):
    return jnp.where(slots[..., 1] != 0, slot_material(slots[..., 1]),
                     K_NO_MATERIAL)


def is_true_intersection(slots, nested_priority):
    """InteriorList::isTrueIntersection (:128-132). nested_priority here is
    the already-remapped value in [1, 15] (0 would mean highest)."""
    p = nested_priority.astype(jnp.uint32)
    return (p == 0) | (p >= top_priority(slots))


def handle_intersection(slots, material_id, nested_priority, entering):
    """InteriorList::handleIntersection (:141-213) + sortSlots, branch-free
    over the wavefront. entering: bool array."""
    prio = jnp.where(nested_priority.astype(jnp.uint32) == 0,
                     K_MAX_NESTED_PRIORITY,
                     nested_priority.astype(jnp.uint32))
    mid = material_id.astype(jnp.uint32)
    s0 = slots[..., 0]
    s1 = slots[..., 1]
    new = make_slot(mid, prio)
    c0 = entering & (s0 == 0)
    c1 = (~entering) & (s0 != 0) & (slot_material(s0) == (mid &
                                                          K_MATERIAL_MASK))
    c2 = (~c0) & (~c1) & entering & (s1 == 0)
    c3 = (~c0) & (~c1) & (~c2) & (~entering) & (s1 != 0) & \
        (slot_material(s1) == (mid & K_MATERIAL_MASK))
    s0 = jnp.where(c0, new, jnp.where(c1, 0, s0))
    s1 = jnp.where(c2, new, jnp.where(c3, 0, s1))
    # sort: keep the larger (higher priority) slot first
    lo = jnp.minimum(s0, s1)
    hi = jnp.maximum(s0, s1)
    return jnp.stack([hi, lo], axis=-1)


def compute_outside_ior(slots, material_id, entering, material_iors):
    """ComputeOutsideIoR (PathTracerNestedDielectrics.hlsli:24-43):
    resolve the IoR of the medium outside the intersected interface.
    material_iors: (M,) table for Bridge::loadIoR."""
    outside = top_material(slots)
    exiting_top = (~entering) & (outside == (material_id.astype(jnp.uint32)
                                             & K_MATERIAL_MASK))
    outside = jnp.where(exiting_top, next_material(slots), outside)
    no_mat = outside == K_NO_MATERIAL
    safe = jnp.minimum(outside, material_iors.shape[0] - 1).astype(jnp.int32)
    return jnp.where(no_mat, 1.0, material_iors[safe])
