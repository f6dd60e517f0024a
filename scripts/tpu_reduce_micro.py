#!/usr/bin/env python
"""Microbenchmark 7: per-child hit-mask construction in the fixed-trip
visit loop — 8 separate jnp.any reduces vs one bitwise-or lax.reduce of a
packed word vs one jnp.max of a packed word with disjoint bit PLANES
(max works when each lane's word is a SUBSET mask: or == max only for
one-bit... no — included to show it's wrong; checksum differs)."""
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


def make(mode):
    def kernel(rows_ref, x_ref, o_ref):
        x = x_ref[...]

        def cond(c):
            return c[0] < ITERS

        def obody(c):
            it, i, acc = c

            def visit(_, c2):
                i2, a2 = c2
                row = rows_ref[pl.ds(i2 % D_ROWS, 1), :]
                hits = []
                for k in range(8):
                    f = row[0, k]
                    hits.append((a2 * f) > x)
                if mode == "eight_any":
                    mask = jnp.int32(0)
                    for k in range(8):
                        mask = mask + jnp.where(
                            jnp.any(hits[k]), jnp.int32(1 << k), 0)
                elif mode == "or_reduce":
                    word = jnp.zeros((SUB, LANE), jnp.int32)
                    for k in range(8):
                        word = word | jnp.where(
                            hits[k], jnp.int32(1 << k), 0)
                    mask = jax.lax.reduce(
                        word, jnp.int32(0), jax.lax.bitwise_or, (0, 1))
                else:  # "max_byte": or-reduce via max over per-lane words
                    # (correct only if per-lane words are totally ordered —
                    # NOT in general; timing reference only)
                    word = jnp.zeros((SUB, LANE), jnp.int32)
                    for k in range(8):
                        word = word | jnp.where(
                            hits[k], jnp.int32(1 << k), 0)
                    mask = jnp.max(word)
                a3 = a2 + jnp.float32(0.001) * x * mask.astype(jnp.float32)
                nxt = jnp.where(mask > 4, i2 + 1, i2 + 2)
                return nxt, a3

            i, acc = jax.lax.fori_loop(0, K, visit, (i, acc))
            return it + K, i, acc

        _, _, acc = jax.lax.while_loop(
            cond, obody, (jnp.int32(0), jnp.int32(3), x * 0.001))
        o_ref[...] = acc
    return kernel


def main():
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.random((D_ROWS, LANE)).astype(np.float32))
    x = jnp.asarray(rng.random((SUB, LANE)).astype(np.float32))
    for mode in ("eight_any", "or_reduce", "max_byte"):
        try:
            f = pl.pallas_call(
                make(mode),
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
            print(f"{mode:10s}: {dt/ITERS*1e9:7.1f} ns/visit "
                  f"sum={float(out.sum()):.2f}", flush=True)
        except Exception as e:
            print(f"{mode:10s}: FAIL {str(e).splitlines()[0][:100]}",
                  flush=True)


if __name__ == "__main__":
    main()
