#!/usr/bin/env python
"""Microbenchmark 3: candidate traversal-visit bodies, all run as
fixed-trip inner fori inside a counter-cond while loop (the 30ns/visit
shape found by tpu_interleave_micro).

  bin_sroll : binary record fetch via 8 STATIC rolls + scalar-select of the
              group, 9 extracts, slab math     (binary layout, no dyn roll)
  wide_x    : wide-node row fetch + 53 scalar extracts + 8-child slab
  wide_bc   : wide-node [8,128] tile fetch + (8,1)->(8,128) lane broadcasts
              + 8-child slab on sublane=child, lane=ray
  smem_stack: wide_x + SMEM scratch stack push/pop (dynamic scalar index)
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

SUB, LANE = 8, 128
ITERS = 2048
D_ROWS = 512
K = 16  # inner fixed-trip visits per outer-loop condition check


def outer(body_visit, n_carry_init):
    """counter-cond while loop over ITERS//K outer steps, K visits each."""
    def run(rows_ref, x_ref, o_ref, *scratch):
        x = x_ref[...]

        def cond(c):
            return c[0] < ITERS

        def obody(c):
            it, i, acc = c

            def ibody(k, c2):
                i2, a2 = c2
                return body_visit(rows_ref, x, i2, a2, scratch)

            i, acc = jax.lax.fori_loop(0, K, ibody, (i, acc))
            return it + K, i, acc

        _, _, acc = jax.lax.while_loop(
            cond, obody, (jnp.int32(0), jnp.int32(3), x * 0.0))
        o_ref[...] = acc
    return run


def visit_bin_sroll(rows_ref, x, i, acc, scratch):
    row = rows_ref[pl.ds((i >> 3) % D_ROWS, 1), :]
    g = i & 7
    sel = pltpu.roll(row, 0, axis=1)
    for s in range(1, 8):
        sel = jnp.where(g == s, pltpu.roll(row, -16 * s, axis=1), sel)
    fs = [sel[0, j] for j in range(9)]
    r = acc
    for f in fs:
        r = r + f * x
        x = jnp.where(r > f, x, r)
    nxt = jnp.where(jnp.any(r > x), i + 1, i + 2)
    return nxt, r


def _slab8_extract(row, x, acc):
    r = acc
    for k in range(8):
        b = 16 * k
        lo = [row[0, b + j] for j in range(3)]
        hi = [row[0, b + 3 + j] for j in range(3)]
        tmin = jnp.minimum((lo[0] - x), (hi[0] - x))
        tmax = jnp.maximum((lo[0] - x), (hi[0] - x))
        tmin = jnp.maximum(tmin, jnp.minimum(lo[1] * x, hi[1] * x))
        tmax = jnp.minimum(tmax, jnp.maximum(lo[1] * x, hi[1] * x))
        tmin = jnp.maximum(tmin, jnp.minimum(lo[2] - x, hi[2] - x))
        tmax = jnp.minimum(tmax, jnp.maximum(lo[2] - x, hi[2] - x))
        r = r + jnp.where(tmax >= tmin, x, acc)
    return r


def visit_wide_x(rows_ref, x, i, acc, scratch):
    row = rows_ref[pl.ds(i % D_ROWS, 1), :]
    r = _slab8_extract(row, x, acc)
    nxt = jnp.where(jnp.any(r > x), i + 1, i + 2)
    return nxt, r


def visit_wide_bc(rows_ref, x, i, acc, scratch):
    # rows_ref reinterpreted as [D_ROWS//8 tiles of (8,128)]
    tile = rows_ref[pl.ds(8 * (i % (D_ROWS // 8)), 8), :]
    x1 = x[0:1, :]  # (1,128) rays
    r = acc

    def f(j):
        return jnp.broadcast_to(tile[:, j:j + 1], (SUB, LANE))

    lo0, lo1, lo2, hi0, hi1, hi2 = f(0), f(1), f(2), f(3), f(4), f(5)
    tmin = jnp.minimum(lo0 - x1, hi0 - x1)
    tmax = jnp.maximum(lo0 - x1, hi0 - x1)
    tmin = jnp.maximum(tmin, jnp.minimum(lo1 * x1, hi1 * x1))
    tmax = jnp.minimum(tmax, jnp.maximum(lo1 * x1, hi1 * x1))
    tmin = jnp.maximum(tmin, jnp.minimum(lo2 - x1, hi2 - x1))
    tmax = jnp.minimum(tmax, jnp.maximum(lo2 - x1, hi2 - x1))
    hitm = tmax >= tmin
    r = r + jnp.where(hitm, x, acc)
    anyk = jnp.sum(jnp.where(hitm, 1, 0))  # one reduce for control flavor
    nxt = jnp.where(anyk > 4, i + 1, i + 2)
    return nxt, r


def visit_smem_stack(rows_ref, x, i, acc, scratch):
    stack = scratch[0]
    row = rows_ref[pl.ds(i % D_ROWS, 1), :]
    r = _slab8_extract(row, x, acc)
    any_ = jnp.any(r > x)
    sp = jnp.maximum(i % 64, 1)
    stack[sp] = i * 2          # dynamic SMEM store
    popped = stack[sp - 1]     # dynamic SMEM load
    nxt = jnp.where(any_, popped % D_ROWS + 1, i + 2)
    return nxt, r


CASES = [
    ("bin_sroll", visit_bin_sroll, None),
    ("wide_x", visit_wide_x, None),
    ("wide_bc", visit_wide_bc, None),
    ("smem_stack", visit_smem_stack, [pltpu.SMEM((256,), jnp.int32)]),
]


def main():
    rows = jnp.asarray(np.random.rand(D_ROWS, LANE).astype(np.float32))
    x = jnp.asarray(np.random.rand(SUB, LANE).astype(np.float32))
    for name, visit, scratch_shapes in CASES:
        try:
            f = pl.pallas_call(
                outer(visit, None),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((SUB, LANE), jnp.float32),
                scratch_shapes=scratch_shapes or [],
            )
            g = jax.jit(lambda a, b, f=f: f(a, b))
            out = g(rows, x)
            out.block_until_ready()
            t0 = time.time()
            for _ in range(10):
                out = g(rows, x)
            out.block_until_ready()
            dt = (time.time() - t0) / 10
            per_child = dt / ITERS / 8 * 1e9
            print(f"{name:10s}: {dt*1e3:8.3f} ms ({dt/ITERS*1e9:7.1f} "
                  f"ns/visit, {per_child:5.1f} ns/child-eqv) "
                  f"sum={float(out.sum()):.2f}", flush=True)
        except Exception as e:
            print(f"{name:10s}: FAIL {str(e).splitlines()[0][:110]}",
                  flush=True)


if __name__ == "__main__":
    main()
