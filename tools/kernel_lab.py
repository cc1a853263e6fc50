"""Microbenchmarks of the traversal kernel's ingredients, each run in an
isolated Pallas loop on the real chip. Drives kernel-design decisions
(what actually dominates a traversal iteration: gather matmul, stack ops,
leaf MT, sort network, or vector->scalar syncs)."""
import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024
ROWS = 640
WIDTH = 144
STACK = 48
ITERS = 20000


def timeit(fn, *args, n=3):
    np.asarray(fn(*args))   # compile+warm; tunnel needs materialization
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / n


def run(name, kernel_body, extra_in=(), n_carry_vec=1):
    """Build a kernel that runs `kernel_body` ITERS times in a fori_loop.
    kernel_body(i, carry, refs) -> carry; carry is a tuple of (TILE,) f32."""
    def kernel(*refs):
        out = refs[-1]
        ins = refs[:-1]
        init = tuple(jnp.full((TILE,), 1.0 + k, jnp.float32)
                     for k in range(n_carry_vec))

        vals = tuple(r[:] for r in ins)

        def body(i, c):
            return kernel_body(i, c, vals)

        c = jax.lax.fori_loop(0, ITERS, body, init)
        out[0] = sum(c)

    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in extra_in]
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, TILE), jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    jf = jax.jit(lambda *a: f(*a))
    dt = timeit(jf, *extra_in)
    print(f"{name:42s} {dt/ITERS*1e6:8.3f} us/iter")
    return dt / ITERS


def main():
    key = jax.random.PRNGKey(0)
    tab = jax.random.uniform(key, (WIDTH, ROWS), jnp.float32)

    # 0) empty loop baseline
    def empty(i, c, ins):
        return tuple(x + 1.0 for x in c)
    run("empty loop (carry add)", empty)

    # 1) onehot build only
    def onehot_only(i, c, ins):
        fetch = (c[0].astype(jnp.int32) + i) % ROWS
        oh = (jax.lax.broadcasted_iota(jnp.int32, (ROWS, TILE), 0)
              == fetch[None, :]).astype(jnp.float32)
        w = jax.lax.broadcasted_iota(jnp.int32, (ROWS, TILE), 0).astype(jnp.float32)
        return (c[0] + jnp.max(oh * w, axis=0) * 1e-6,)
    run("onehot build (rows,TILE)", onehot_only)

    # 2) onehot + full-width f32 HIGHEST matmul
    def gather_hi(i, c, ins):
        tab_t, = ins
        fetch = (c[0].astype(jnp.int32) + i) % ROWS
        oh = (jax.lax.broadcasted_iota(jnp.int32, (ROWS, TILE), 0)
              == fetch[None, :]).astype(jnp.float32)
        row = jnp.dot(tab_t, oh, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        return (c[0] + jnp.max(row, axis=0),)
    run("onehot+matmul 144 cols HIGHEST", gather_hi, (tab,))

    # 3) same with DEFAULT precision
    def gather_def(i, c, ins):
        tab_t, = ins
        fetch = (c[0].astype(jnp.int32) + i) % ROWS
        oh = (jax.lax.broadcasted_iota(jnp.int32, (ROWS, TILE), 0)
              == fetch[None, :]).astype(jnp.float32)
        row = jnp.dot(tab_t, oh, preferred_element_type=jnp.float32)
        return (c[0] + jnp.max(row, axis=0),)
    run("onehot+matmul 144 cols DEFAULT", gather_def, (tab,))

    # 4) 56-col matmul (node slice) HIGHEST
    tab56 = tab[:56]
    def gather56(i, c, ins):
        tab_t, = ins
        fetch = (c[0].astype(jnp.int32) + i) % ROWS
        oh = (jax.lax.broadcasted_iota(jnp.int32, (ROWS, TILE), 0)
              == fetch[None, :]).astype(jnp.float32)
        row = jnp.dot(tab_t, oh, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        return (c[0] + jnp.max(row, axis=0),)
    run("onehot+matmul 56 cols HIGHEST", gather56, (tab56,))

    # 5) bf16 operands single-pass matmul, full width
    tabbf = tab.astype(jnp.bfloat16)
    def gatherbf(i, c, ins):
        tab_t, = ins
        fetch = (c[0].astype(jnp.int32) + i) % ROWS
        oh = (jax.lax.broadcasted_iota(jnp.int32, (ROWS, TILE), 0)
              == fetch[None, :]).astype(jnp.bfloat16)
        row = jnp.dot(tab_t, oh, preferred_element_type=jnp.float32)
        return (c[0] + jnp.max(row, axis=0),)
    run("onehot+matmul 144 cols bf16", gatherbf, (tabbf,))

    # 6) stack top-read + masked pop, (STACK, TILE) layout
    def stack_ops(i, c, ins):
        slot_rows = jax.lax.broadcasted_iota(jnp.int32, (STACK, TILE), 0)
        stack = jnp.zeros((STACK, TILE), jnp.int32) + i
        sp = c[0].astype(jnp.int32) % STACK
        top_row = jnp.maximum(sp - 1, 0)
        top = jnp.sum(jnp.where(slot_rows == top_row[None, :], stack, 0),
                      axis=0)
        return (c[0] + top.astype(jnp.float32),)
    run("stack top-read (48,TILE)", stack_ops)

    # 7) stack 8x masked push
    def stack_push(i, c, ins):
        slot_rows = jax.lax.broadcasted_iota(jnp.int32, (STACK, TILE), 0)
        stack = jnp.zeros((STACK, TILE), jnp.int32)
        sp = c[0].astype(jnp.int32) % 16
        off = jnp.zeros((TILE,), jnp.int32)
        for k in range(8):
            valid = (c[0] + k) > 2.0
            slot = jnp.where(valid, jnp.minimum(sp + off, STACK - 1), -1)
            wmask = slot_rows == slot[None, :]
            stack = jnp.where(wmask, k, stack)
            off = off + valid.astype(jnp.int32)
        return (c[0] + jnp.max(stack, axis=0).astype(jnp.float32) * 1e-9,)
    run("stack 8x masked push (48,TILE)", stack_push)

    # 8) 16-triangle MT block
    def mt_block(i, c, ins):
        tv9 = [c[0] * (0.1 * j + 0.01) for j in range(9)]
        ox = oy = oz = c[0]
        dx = dy = dz = c[0] * 0.5
        acc = c[0]
        for k in range(16):
            p0x, p0y, p0z, e1x, e1y, e1z, e2x, e2y, e2z = \
                [t + k for t in tv9]
            hx = dy * e2z - dz * e2y
            hy = dz * e2x - dx * e2z
            hz = dx * e2y - dy * e2x
            a = e1x * hx + e1y * hy + e1z * hz
            f = 1.0 / jnp.where(jnp.abs(a) < 1e-12, 1e-12, a)
            sx, sy, sz = ox - p0x, oy - p0y, oz - p0z
            u = f * (sx * hx + sy * hy + sz * hz)
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            v = f * (dx * qx + dy * qy + dz * qz)
            t = f * (e2x * qx + e2y * qy + e2z * qz)
            hit = ((jnp.abs(a) > 1e-12) & (u >= 0.0) & (v >= 0.0)
                   & (u + v <= 1.0) & (t > 0.0) & (t < 1e30))
            acc = acc + jnp.where(hit, t, 0.0)
        return (acc,)
    run("leaf MT 16 tris", mt_block)

    # 9) slab x8 + 19-comparator sort
    def slab_sort(i, c, ins):
        ox = oy = oz = c[0]
        ix = iy = iz = c[0] * 0.5 + 1.0
        ts, cs = [], []
        for k in range(8):
            b = [c[0] * 0.01 * (k * 6 + j) for j in range(6)]
            t0x = (b[0] - ox) * ix
            t1x = (b[3] - ox) * ix
            t0y = (b[1] - oy) * iy
            t1y = (b[4] - oy) * iy
            t0z = (b[2] - oz) * iz
            t1z = (b[5] - oz) * iz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.minimum(jnp.maximum(t0z, t1z), 1e30))
            hk = tn <= tf
            ts.append(jnp.where(hk, tn, -jnp.inf))
            cs.append(jnp.full((TILE,), k, jnp.int32))
        SORT8 = ((0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6),
                 (5, 7), (1, 2), (5, 6), (0, 4), (3, 7), (1, 5), (2, 6),
                 (1, 4), (3, 6), (2, 4), (3, 5), (3, 4))
        for a, b in SORT8:
            swap = ts[a] < ts[b]
            ts[a], ts[b] = (jnp.where(swap, ts[b], ts[a]),
                            jnp.where(swap, ts[a], ts[b]))
            cs[a], cs[b] = (jnp.where(swap, cs[b], cs[a]),
                            jnp.where(swap, cs[a], cs[b]))
        return (c[0] + ts[0] + cs[7].astype(jnp.float32),)
    run("slab x8 + sort network", slab_sort)

    # 10) vector->scalar any() reduce + scalar branch
    def any_reduce(i, c, ins):
        flag = jnp.any(c[0] > 0.5)
        x = jax.lax.cond(flag, lambda v: v + 1.0, lambda v: v, c[0])
        return (x,)
    run("any() reduce + lax.cond", any_reduce)

    # 11) dynamic-row stack read/write via pl.ds (lane-sync design probe)
    def dyn_stack(i, c, ins):
        def inner(stack_ref):
            sp = (i % (STACK - 8)) + 1
            top = stack_ref[pl.ds(sp - 1, 1), :]
            for j in range(8):
                stack_ref[pl.ds(sp + j, 1), :] = top + j
            return (c[0] + jnp.sum(top, axis=0).astype(jnp.float32) * 1e-9,)
        return pl.run_scoped(inner,
                             pltpu.VMEM((STACK + 8, TILE), jnp.int32))
    # run_scoped per iteration is wrong; allocate once outside loop instead
    def dyn_stack_kernel(out_ref):
        def inner(stack_ref):
            stack_ref[0, :] = jnp.zeros((TILE,), jnp.int32)
            init = (jnp.full((TILE,), 1.0, jnp.float32),)

            def body(i, c):
                sp = (i % (STACK - 9)) + 1
                top = stack_ref[pl.ds(sp - 1, 1), :]
                for j in range(8):
                    stack_ref[pl.ds(sp + j, 1), :] = top + j
                return (c[0] + jnp.sum(top, axis=0).astype(jnp.float32) * 1e-9,)

            c = jax.lax.fori_loop(0, ITERS, body, init)
            out_ref[0] = c[0]
        pl.run_scoped(inner, pltpu.VMEM((STACK + 8, TILE), jnp.int32))

    f = pl.pallas_call(
        dyn_stack_kernel,
        out_shape=jax.ShapeDtypeStruct((1, TILE), jnp.float32),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    jf = jax.jit(f)
    dt = timeit(jf)
    print(f"{'dyn-row stack read+8 push (pl.ds)':42s} "
          f"{dt/ITERS*1e6:8.3f} us/iter")


if __name__ == "__main__":
    main()
