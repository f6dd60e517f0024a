#!/usr/bin/env python
"""Microbenchmark 5: lax.cond on a block-uniform scalar inside the
fixed-trip visit loop — can it select slab-vs-MT work per visit (halving
ALU) without the historical miscompile (which involved cond AROUND a
dynamic fori — these branches are straight-line)?

  both   : every visit does slab8 + mt8 (the shipped kernel shape)
  cond   : every visit does lax.cond(is_leaf, mt8, slab8)
Correctness: both variants accumulate the same checksum when the cond
branch selection matches the row flag.
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


def slab8(row, x, acc):
    r = acc
    for k in range(8):
        b = 16 * k
        lo = [row[0, b + j] for j in range(3)]
        hi = [row[0, b + 3 + j] for j in range(3)]
        tmin = jnp.minimum(lo[0] - x, hi[0] - x)
        tmax = jnp.maximum(lo[0] - x, hi[0] - x)
        tmin = jnp.maximum(tmin, jnp.minimum(lo[1] * x, hi[1] * x))
        tmax = jnp.minimum(tmax, jnp.maximum(lo[1] * x, hi[1] * x))
        tmin = jnp.maximum(tmin, jnp.minimum(lo[2] - x, hi[2] - x))
        tmax = jnp.minimum(tmax, jnp.maximum(lo[2] - x, hi[2] - x))
        r = jnp.where(tmax >= tmin, r + x, r)
    return r


def mt8(row, x, acc):
    r = acc
    for k in range(8):
        b = 16 * k
        f = [row[0, b + j] for j in range(9)]
        hx = x * f[7] - x * f[8]
        hy = x * f[6] - x * f[5]
        hz = x * f[3] - x * f[4]
        a = f[0] * hx + f[1] * hy + f[2] * hz
        det = jnp.float32(1.0) / a
        u = det * (hx + hy - hz)
        v = det * (hx * f[6] + hy * f[7] + hz * f[8])
        t = det * (u + v)
        ok = (jnp.abs(a) > 1e-5) & (u >= 0) & (v >= 0) & (u + v <= 1) & (
            t > 1e-5)
        r = jnp.where(ok, r + t, r)
    return r


def make(variant):
    def kernel(rows_ref, x_ref, o_ref):
        x = x_ref[...]

        def cond_(c):
            return c[0] < ITERS

        def obody(c):
            it, i, acc = c

            def visit(_, c2):
                i2, a2 = c2
                row = rows_ref[pl.ds(i2 % D_ROWS, 1), :]
                row_i = pltpu.bitcast(row, jnp.int32)
                is_leaf = (row_i[0, 9] & 1) == 1
                if variant == "both":
                    a_s = slab8(row, x, a2)
                    a_m = mt8(row, x, a2)
                    a2 = jnp.where(is_leaf, a_m, a_s)
                else:
                    a2 = jax.lax.cond(is_leaf,
                                      lambda: mt8(row, x, a2),
                                      lambda: slab8(row, x, a2))
                nxt = jnp.where(jnp.any(a2 > x), i2 + 1, i2 + 2)
                return nxt, a2

            i, acc = jax.lax.fori_loop(0, K, visit, (i, acc))
            return it + K, i, acc

        _, _, acc = jax.lax.while_loop(
            cond_, obody, (jnp.int32(0), jnp.int32(3), x * 0.0))
        o_ref[...] = acc
    return kernel


def main():
    rng = np.random.default_rng(0)
    rows = rng.random((D_ROWS, LANE)).astype(np.float32)
    rows[:, 9] = np.frombuffer(
        (rng.integers(0, 2, D_ROWS, dtype=np.int32)).tobytes(),
        dtype=np.float32)
    rows = jnp.asarray(rows)
    x = jnp.asarray(rng.random((SUB, LANE)).astype(np.float32))
    ref = None
    for variant in ("both", "cond"):
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
            s = float(out.sum())
            ok = "" if ref is None else ("  MATCH" if np.isclose(s, ref)
                                         else "  **MISMATCH**")
            if ref is None:
                ref = s
            print(f"{variant:6s}: {dt*1e3:8.3f} ms ({dt/ITERS*1e9:7.1f} "
                  f"ns/visit) sum={s:.2f}{ok}", flush=True)
        except Exception as e:
            print(f"{variant:6s}: FAIL {str(e).splitlines()[0][:110]}",
                  flush=True)


if __name__ == "__main__":
    main()
