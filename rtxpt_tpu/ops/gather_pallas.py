"""MXU one-hot row gather: the TPU-native replacement for XLA's gather.

XLA row gathers on the target TPU sustain ~1.5 GB/s (measured round 1);
a one-hot matmul against a VMEM-resident table runs the same fetch at
MXU speed (~100x for scene-sized tables). Same trick as the BVH
traversal kernel (ops/traverse_pallas.py), generalized for the shading /
light / texture tables:

  * the f32 table is packed once into 3 bf16 residual planes
    (h1+h2+h3 carries the full 24-bit mantissa; ops/bvh.py rationale),
    transposed to (3W, R) for the gather matmul;
  * integer tables use a 3x8-bit digit split with a +2^23 bias, which a
    single-pass bf16 one-hot matmul reproduces exactly;
  * gather_rows(planes, idx) runs a grid over TILE-lane blocks:
    onehot(idx) on lanes, planes @ onehot on the MXU, h1+h2+h3
    recombination on the VPU, output (W, N) -> transposed to (N, W).

Used when rows <= MAX_ROWS (VMEM/MXU budget) on a TPU backend;
callers fall back to plain XLA indexing otherwise.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024
MAX_ROWS = 8192
INT_BIAS = 1 << 23


@jax.tree_util.register_pytree_node_class
class GatherPlanes:
    """bf16 gather planes + static shape/kind metadata (jit-static aux)."""

    def __init__(self, planes, width: int, rows: int, is_int: bool):
        self.planes = planes    # (3W, R) bf16
        self.width = width
        self.rows = rows
        self.is_int = is_int

    def tree_flatten(self):
        return (self.planes,), (self.width, self.rows, self.is_int)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)


def supported(rows: int) -> bool:
    return rows <= MAX_ROWS


def pack_f32(table) -> GatherPlanes:
    """(R, W) f32 -> 3-way bf16 residual planes (host numpy)."""
    t = np.asarray(table, np.float32)
    import ml_dtypes
    bf = np.dtype(ml_dtypes.bfloat16)
    h1 = t.astype(bf)
    r1 = t - h1.astype(np.float32)
    h2 = r1.astype(bf)
    r2 = r1 - h2.astype(np.float32)
    h3 = r2.astype(bf)
    # contiguous plane blocks [h1; h2; h3] so the kernel recombines with
    # plain (aligned) row slices — Mosaic has no strided vector slice
    planes = np.concatenate([h1, h2, h3], axis=1).T
    return GatherPlanes(jnp.asarray(np.ascontiguousarray(planes)),
                        width=t.shape[1], rows=t.shape[0], is_int=False)


def pack_f32_device(table) -> GatherPlanes:
    """(R, W) f32 -> residual planes, computed ON DEVICE (jnp).

    The device analog of pack_f32 for per-frame table refreshes
    (skinned vertices, refit dense tri rows): bf16 round-to-nearest on
    device matches numpy's ml_dtypes cast bit-for-bit, so refreshed
    planes equal a from-scratch host pack."""
    t = jnp.asarray(table, jnp.float32)
    h1 = t.astype(jnp.bfloat16)
    r1 = t - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    r2 = r1 - h2.astype(jnp.float32)
    h3 = r2.astype(jnp.bfloat16)
    planes = jnp.concatenate([h1, h2, h3], axis=1).T
    return GatherPlanes(planes, width=t.shape[1], rows=t.shape[0],
                        is_int=False)


def pack_i32(table) -> GatherPlanes:
    """(R, W) int32 in (-2^23, 2^23) -> biased 3x8-bit digit planes."""
    t = np.asarray(table, np.int64) + INT_BIAS
    assert (t >= 0).all() and (t < (1 << 24)).all(), "int out of range"
    import ml_dtypes
    bf = np.dtype(ml_dtypes.bfloat16)
    digits = np.concatenate([(t >> 16), (t >> 8) & 255, t & 255],
                            axis=1).astype(bf).T
    return GatherPlanes(jnp.asarray(np.ascontiguousarray(digits)),
                        width=t.shape[1], rows=t.shape[0], is_int=True)


def _make_kernel(rows: int, width: int, is_int: bool):
    def kernel(planes_ref, idx_ref, out_ref):
        idx = idx_ref[0]                              # (TILE,) i32
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (rows, TILE), 0)
                  == idx[None, :]).astype(jnp.bfloat16)
        g = jnp.dot(planes_ref[:], onehot,
                    preferred_element_type=jnp.float32)   # (3W, TILE)
        w = width
        if is_int:
            out = (g[0:w] * 65536.0 + g[w:2 * w] * 256.0 + g[2 * w:3 * w]
                   - float(INT_BIAS))
        else:
            out = g[0:w] + g[w:2 * w] + g[2 * w:3 * w]
        out_ref[:] = out                               # (W, TILE)
    return kernel


@functools.partial(jax.jit, static_argnames=("rows", "width", "is_int"))
def _gather(planes, idx, rows: int, width: int, is_int: bool):
    n = idx.shape[0]
    n_pad = (max(n, TILE) + TILE - 1) // TILE * TILE
    idx_p = jnp.pad(idx.astype(jnp.int32), (0, n_pad - n))[None, :]
    out = pl.pallas_call(
        _make_kernel(rows, width, is_int),
        out_shape=jax.ShapeDtypeStruct((width, n_pad), jnp.float32),
        grid=(n_pad // TILE,),
        in_specs=[
            pl.BlockSpec((3 * width, rows), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((width, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(planes, idx_p)
    return out[:, :n]


def _make_interp_kernel(rows: int, width: int):
    """Gather 3 rows per lane and blend with per-lane weights in-kernel:
    out[:, lane] = sum_v w_v * table[idx_v[lane]].  Replaces the XLA
    chain gather(3n rows) -> transpose -> reshape -> mul -> reduce that
    dominated load_surface (round-3 device trace: ~12 ms/bounce of data
    formatting at 480k lanes)."""
    def kernel(planes_ref, i0_ref, i1_ref, i2_ref, w0_ref, w1_ref,
               w2_ref, out_ref):
        w = width
        acc = jnp.zeros((w, TILE), jnp.float32)
        for idx_ref, wgt_ref in ((i0_ref, w0_ref), (i1_ref, w1_ref),
                                 (i2_ref, w2_ref)):
            idx = idx_ref[0]                          # (TILE,) i32
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (rows, TILE),
                                               0)
                      == idx[None, :]).astype(jnp.bfloat16)
            g = jnp.dot(planes_ref[:], onehot,
                        preferred_element_type=jnp.float32)  # (3W,TILE)
            val = g[0:w] + g[w:2 * w] + g[2 * w:3 * w]
            acc = acc + val * wgt_ref[0][None, :]
        out_ref[:] = acc
    return kernel


@functools.partial(jax.jit,
                   static_argnames=("rows", "width", "interpret"))
def _gather_interp(planes, idx3, wgt3, rows: int, width: int,
                   interpret: bool = False):
    n = idx3.shape[0]
    n_pad = (max(n, TILE) + TILE - 1) // TILE * TILE
    pads = ((0, n_pad - n),)
    ins = []
    for v in range(3):
        ins.append(jnp.pad(idx3[:, v].astype(jnp.int32), pads)[None, :])
    for v in range(3):
        ins.append(jnp.pad(wgt3[:, v].astype(jnp.float32),
                           pads)[None, :])
    lane_spec = lambda: pl.BlockSpec((1, TILE), lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_interp_kernel(rows, width),
        out_shape=jax.ShapeDtypeStruct((width, n_pad), jnp.float32),
        grid=(n_pad // TILE,),
        in_specs=[pl.BlockSpec((3 * width, rows), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)] +
                 [lane_spec() for _ in range(6)],
        out_specs=pl.BlockSpec((width, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(planes, *ins)
    return out[:, :n]


def gather_rows_interp(gp: GatherPlanes, idx3, wgt3,
                       interpret: bool = False):
    """Barycentric-weighted row gather: (N,3) indices + (N,3) f32
    weights -> (N, W) f32 with W = gp.width."""
    assert not gp.is_int
    out = _gather_interp(gp.planes, idx3, wgt3, rows=gp.rows,
                         width=gp.width, interpret=interpret)  # (W, N)
    return out.T


def gather_rows(gp: GatherPlanes, idx):
    """Gather rows by (.., ) integer index array; returns (..., W) f32
    (or the exact integer values as f32 for int planes)."""
    shape = idx.shape
    flat = idx.reshape(-1)
    out = _gather(gp.planes, flat, rows=gp.rows, width=gp.width,
                  is_int=gp.is_int)                   # (W, n)
    return out.T.reshape(shape + (gp.width,))
