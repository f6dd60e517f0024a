#!/usr/bin/env python
"""Microbenchmark 4: VMEM-row stack ops (dynamic-sublane (1,128) store +
load + lane-0 extract) added to the wide_x visit body, in the fixed-trip
inner-fori shape.  If push/pop adds <30ns the stack design wins over
skip-links."""
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
K = 16


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


def make(n_push):
    def kernel(rows_ref, x_ref, o_ref, stack_ref):
        x = x_ref[...]
        stack_ref[0, :] = jnp.zeros((LANE,), jnp.int32)

        def cond(c):
            return c[0] < ITERS

        def obody(c):
            it, i, sp, acc = c

            def ibody(_, c2):
                i2, sp2, a2 = c2
                row = rows_ref[pl.ds(i2 % D_ROWS, 1), :]
                r = _slab8_extract(row, x, a2)
                hot = jnp.any(r > x)
                # pushes: dynamic-sublane (1,128) stores of a splat scalar
                for p in range(n_push):
                    val = i2 * 8 + p
                    stack_ref[pl.ds(jnp.minimum(sp2 + p, 255), 1), :] = (
                        jnp.full((1, LANE), val, jnp.int32))
                sp2 = jnp.minimum(sp2 + jnp.where(hot, n_push, 1), 200)
                # pop: dynamic-sublane load + lane-0 extract
                top = stack_ref[pl.ds(jnp.maximum(sp2 - 1, 0), 1), :]
                nxt = (top[0, 0] + i2) % (D_ROWS * 8) + 1
                sp2 = jnp.maximum(sp2 - 1, 1)
                return nxt, sp2, r

            i, sp, acc = jax.lax.fori_loop(0, K, ibody, (i, sp, acc))
            return it + K, i, sp, acc

        _, _, _, acc = jax.lax.while_loop(
            cond, obody, (jnp.int32(0), jnp.int32(3), jnp.int32(1), x * 0.0))
        o_ref[...] = acc
    return kernel


def main():
    rows = jnp.asarray(np.random.rand(D_ROWS, LANE).astype(np.float32))
    x = jnp.asarray(np.random.rand(SUB, LANE).astype(np.float32))
    for n_push in (0, 1, 2, 4):
        try:
            f = pl.pallas_call(
                make(n_push),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((SUB, LANE), jnp.float32),
                scratch_shapes=[pltpu.VMEM((256, LANE), jnp.int32)],
            )
            g = jax.jit(lambda a, b, f=f: f(a, b))
            out = g(rows, x)
            out.block_until_ready()
            t0 = time.time()
            for _ in range(10):
                out = g(rows, x)
            out.block_until_ready()
            dt = (time.time() - t0) / 10
            print(f"push x{n_push}: {dt*1e3:8.3f} ms ({dt/ITERS*1e9:7.1f} "
                  f"ns/visit) sum={float(out.sum()):.2f}", flush=True)
        except Exception as e:
            print(f"push x{n_push}: FAIL {str(e).splitlines()[0][:110]}",
                  flush=True)


if __name__ == "__main__":
    main()
