#!/usr/bin/env python
"""Microbenchmark: per-node-visit cost components of the packet traversal
kernel.  Starts from the 12.9ns/visit baseline (fetch + 9 scalar extracts +
20 vector ops in a fori_loop) and adds one suspect at a time:

  base        : fetch row + extracts + vector math, fori_loop
  +roll       : dynamic-lane pltpu.roll on the fetched row
  +any        : jnp.any((8,128)) reduce feeding the next index (scalar)
  +fori0      : nested fori_loop with data-dependent (always 0) trip count
  +while      : outer while_loop (data-dep next index) instead of fori
  full        : all of the above (the real kernel shape)
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
ITERS = 4096
D_ROWS = 512


def visit_math(row, x, acc):
    fs = [row[0, j] for j in range(9)]
    r = acc
    for f in fs:
        r = r + f * x
        x = jnp.where(r > f, x, r)
    return r


def make(variant):
    use_roll = variant in ("roll", "full")
    use_any = variant in ("any", "full")
    use_fori0 = variant in ("fori0", "full")
    use_while = variant in ("while", "full")

    def kernel(rows_ref, x_ref, o_ref):
        x = x_ref[...]

        def visit(i, acc):
            row = rows_ref[pl.ds(i % D_ROWS, 1), :]
            if use_roll:
                row = pltpu.roll(row, -(i & 7) * 16, axis=1)
            r = visit_math(row, x, acc)
            nxt = i + 1
            if use_any:
                nxt = jnp.where(jnp.any(r > x), i + 1, i + 2)
            if use_fori0:
                n = jnp.minimum(jnp.int32(0), nxt)  # always 0 trips

                def tb(k, a):
                    row2 = rows_ref[pl.ds((i + k) % D_ROWS, 1), :]
                    return visit_math(row2, x, a)
                r = jax.lax.fori_loop(0, n, tb, r)
            return nxt, r

        if use_while:
            def cond(c):
                return c[0] < ITERS

            def body(c):
                i, acc = c
                nxt, r = visit(i, acc)
                return jnp.maximum(nxt, i + 1), r
            _, out = jax.lax.while_loop(
                cond, body, (jnp.int32(0), x * 0.0))
        else:
            def body(i, acc):
                _, r = visit(i, acc)
                return r
            out = jax.lax.fori_loop(0, ITERS, body, x * 0.0)
        o_ref[...] = out
    return kernel


def main():
    rows = jnp.asarray(np.random.rand(D_ROWS, LANE).astype(np.float32))
    x = jnp.asarray(np.random.rand(SUB, LANE).astype(np.float32))
    for variant in ("base", "roll", "any", "fori0", "while", "full"):
        try:
            f = pl.pallas_call(
                make(variant),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((SUB, LANE), jnp.float32),
            )
            g = jax.jit(lambda a, b, f=f: f(a, b))
            out = g(rows, x)
            out.block_until_ready()
            t0 = time.time()
            for _ in range(10):
                out = g(rows, x)
            out.block_until_ready()
            dt = (time.time() - t0) / 10
            print(f"{variant:8s}: {dt*1e3:8.3f} ms ({dt/ITERS*1e9:7.1f} "
                  f"ns/visit) checksum={float(out.sum()):.3f}", flush=True)
        except Exception as e:
            print(f"{variant:8s}: FAIL {str(e).splitlines()[0][:110]}",
                  flush=True)


if __name__ == "__main__":
    main()
