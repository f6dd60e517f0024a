#!/usr/bin/env python
"""Microbenchmark: ways to splat one lane of a fetched (1,128) record row
across a (8,128) ray tile inside a Mosaic kernel.  Each variant runs the
same synthetic walk: `iters` sequential record fetches, 9 field splats and
~20 vector ops per fetch (the shape of one BVH node visit).

Run under timeout; one variant per pallas_call so a failing compile doesn't
kill the rest.
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
D_ROWS = 512  # fake table rows


def make_kernel(splat):
    def kernel(rows_ref, x_ref, o_ref):
        def body(i, acc):
            row = rows_ref[pl.ds(i % D_ROWS, 1), :]
            fs = [splat(row, j) for j in range(9)]
            x = x_ref[...]
            r = acc
            for f in fs:
                r = r + f * x
                x = jnp.where(r > f, x, r)
            return r

        o_ref[...] = jax.lax.fori_loop(0, ITERS, body, x_ref[...] * 0.0)
    return kernel


def scalar_extract(row, j):
    return row[0, j]


def bcast_1x128(row, j):
    return jnp.broadcast_to(row[0:1, j:j + 1], (1, LANE))


def rep_then_slice(row, j):
    rep = jnp.broadcast_to(row, (SUB, LANE))
    return jnp.broadcast_to(rep[:, j:j + 1], (SUB, LANE))


def concat_then_slice(row, j):
    rep = jnp.concatenate([row] * SUB, axis=0)
    return jnp.broadcast_to(rep[:, j:j + 1], (SUB, LANE))


def repeat_prim(row, j):
    return pltpu.repeat(row[0:1, j:j + 1], LANE, axis=1)


def roll_lane0(row, j):
    # rotate lane j to lane 0, then rely on Mosaic scalar-ish select?
    r = pltpu.roll(row, -j, axis=1)
    return jnp.broadcast_to(r[0:1, 0:1], (1, LANE))


VARIANTS = [
    ("scalar_extract", scalar_extract),
    ("bcast_1x128", bcast_1x128),
    ("rep_then_slice", rep_then_slice),
    ("concat_then_slice", concat_then_slice),
    ("repeat_prim", repeat_prim),
    ("roll_lane0", roll_lane0),
]


def main():
    rows = jnp.asarray(np.random.rand(D_ROWS, LANE).astype(np.float32))
    x = jnp.asarray(np.random.rand(SUB, LANE).astype(np.float32))
    for name, splat in VARIANTS:
        try:
            f = pl.pallas_call(
                make_kernel(splat),
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
            ns = dt / ITERS * 1e9
            print(f"{name:20s}: {dt*1e3:8.3f} ms  ({ns:7.1f} ns/visit)"
                  f"  checksum={float(out.sum()):.3f}", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:110]
            print(f"{name:20s}: FAIL {msg}", flush=True)


if __name__ == "__main__":
    main()
