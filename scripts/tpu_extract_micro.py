#!/usr/bin/env python
"""Microbenchmark 6: true cost of vector->scalar extracts, CSE-proofed.

Each visit fetches a row at a data-dependent index and consumes N distinct
lanes as scalars, each feeding a DISTINCT vector op whose result feeds the
accumulator AND the next index (so nothing can be CSE'd or DCE'd).  Sweep N.
Also sweep pure vector-op count V at fixed N to get the ALU rate.
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
K = 16


def make(n_extract, n_vop):
    def kernel(rows_ref, x_ref, o_ref):
        x = x_ref[...]

        def cond(c):
            return c[0] < ITERS

        def obody(c):
            it, i, acc = c

            def visit(_, c2):
                i2, a2 = c2
                row = rows_ref[pl.ds(i2 % D_ROWS, 1), :]
                r = a2
                for j in range(n_extract):
                    f = row[0, j]
                    r = r + f * x          # extract feeds a real op
                for j in range(n_vop):
                    r = r * jnp.float32(0.9999) + x
                nxt = jnp.where(jnp.any(r > x), i2 + 1, i2 + 2)
                return nxt, r

            i, acc = jax.lax.fori_loop(0, K, visit, (i, acc))
            return it + K, i, acc

        _, _, acc = jax.lax.while_loop(
            cond, obody, (jnp.int32(0), jnp.int32(3), x * 0.0))
        o_ref[...] = acc
    return kernel


def main():
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.random((D_ROWS, LANE)).astype(np.float32) * 1e-3)
    x = jnp.asarray(rng.random((SUB, LANE)).astype(np.float32))
    cases = [(8, 0), (32, 0), (64, 0), (128, 0),
             (8, 56), (8, 120), (8, 248)]
    for n_e, n_v in cases:
        try:
            f = pl.pallas_call(
                make(n_e, n_v),
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
            print(f"extracts={n_e:4d} vops={n_v:4d}: "
                  f"{dt/ITERS*1e9:7.1f} ns/visit  sum={float(out.sum()):.2f}",
                  flush=True)
        except Exception as e:
            print(f"extracts={n_e} vops={n_v}: FAIL "
                  f"{str(e).splitlines()[0][:100]}", flush=True)


if __name__ == "__main__":
    main()
