#!/usr/bin/env python
"""Microbenchmark 2: can round-robin interleaving of independent packet
walks hide the ~900ns vector->scalar drain?  And is pltpu.roll
latency-bound (hideable) or throughput-bound (not)?

  serial_any   : 1 walk,  ITERS visits, any()-driven next index (baseline)
  inter2/4/8   : B independent walks interleaved in one while_loop, each
                 ITERS visits — if drains hide, time stays ~flat vs B=1
                 while visits scale by B (ns/visit drops ~B-fold)
  roll_tput    : ITERS independent rolls, no scalar readback — reveals
                 whether roll occupies the vector unit ~900ns or just has
                 long latency
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


def visit_math(row, x, acc):
    fs = [row[0, j] for j in range(9)]
    r = acc
    for f in fs:
        r = r + f * x
        x = jnp.where(r > f, x, r)
    return r


def make_interleaved(n_walks):
    def kernel(rows_ref, x_ref, o_ref):
        x = x_ref[...]
        idx0 = tuple(jnp.int32(7 * b) for b in range(n_walks))
        acc0 = tuple(x * jnp.float32(b + 1) for b in range(n_walks))

        def cond(c):
            return c[0] < ITERS

        def body(c):
            it = c[0]
            idxs = c[1]
            accs = c[2]
            new_idx = []
            new_acc = []
            for b in range(n_walks):
                i = idxs[b]
                row = rows_ref[pl.ds(i % D_ROWS, 1), :]
                r = visit_math(row, x, accs[b])
                nxt = jnp.where(jnp.any(r > x), i + 1, i + 2)
                new_idx.append(nxt)
                new_acc.append(r)
            return (it + 1, tuple(new_idx), tuple(new_acc))

        _, _, accs = jax.lax.while_loop(cond, body, (jnp.int32(0), idx0, acc0))
        out = accs[0]
        for a in accs[1:]:
            out = out + a
        o_ref[...] = out
    return kernel, ITERS * n_walks


def make_roll_tput():
    def kernel(rows_ref, x_ref, o_ref):
        x = x_ref[...]

        def body(i, acc):
            row = rows_ref[pl.ds(i % D_ROWS, 1), :]
            row = pltpu.roll(row, -(i & 7) * 16, axis=1)
            return acc + row * x[0:1, :]

        out = jax.lax.fori_loop(0, ITERS, body, x[0:1, :] * 0.0)
        o_ref[...] = jnp.broadcast_to(out, (SUB, LANE))
    return kernel, ITERS


def main():
    rows = jnp.asarray(np.random.rand(D_ROWS, LANE).astype(np.float32))
    x = jnp.asarray(np.random.rand(SUB, LANE).astype(np.float32))
    cases = [("serial_any", make_interleaved(1)),
             ("inter2", make_interleaved(2)),
             ("inter4", make_interleaved(4)),
             ("inter8", make_interleaved(8)),
             ("inter16", make_interleaved(16)),
             ("roll_tput", make_roll_tput())]
    for name, (kernel, visits) in cases:
        try:
            f = pl.pallas_call(
                kernel,
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
            print(f"{name:10s}: {dt*1e3:8.3f} ms ({dt/visits*1e9:7.1f} "
                  f"ns/visit, {visits} visits) sum={float(out.sum()):.2f}",
                  flush=True)
        except Exception as e:
            print(f"{name:10s}: FAIL {str(e).splitlines()[0][:110]}",
                  flush=True)


if __name__ == "__main__":
    main()
