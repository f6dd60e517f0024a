#!/usr/bin/env python
"""Microbenchmark: cost drivers of the leaf (Moller-Trumbore) interpretation
of the 8-wide visit.

Earlier single-pass runs showed a harness artifact: whichever variant ran
FIRST measured ~10ns/visit and every later variant ~1200ns — order, not
code.  This version measures all variants in interleaved round-robin
ROUNDS and reports the min per variant, with an empty-body control.

  empty     : loop structure only (fetch + control, no interp math)
  full      : current leaf interp (8 tris: extracts + MT + 1/a divide)
  recip     : divide replaced by pl.reciprocal(approx=True)
  nodiv     : divide replaced by a multiply (ALU cost floor)
  extonly   : 72 extracts, trivial math
  half      : 4 tris instead of 8
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
ITERS = 32768
D_ROWS = 512
K_VISITS = 32
REC = 16
_EPS = np.float32(1e-5)


def leaf_mt(row, ox, oy, oz, dx, dy, dz, best_t, best_r, pc, variant):
    if variant == "empty":
        return best_t, best_r
    n_tris = 4 if variant == "half" else 8
    for j in range(n_tris):
        b = REC * j
        v0x = row[0, b + 0]
        v0y = row[0, b + 1]
        v0z = row[0, b + 2]
        e1x = row[0, b + 3]
        e1y = row[0, b + 4]
        e1z = row[0, b + 5]
        e2x = row[0, b + 6]
        e2y = row[0, b + 7]
        e2z = row[0, b + 8]
        if variant == "extonly":
            t = (v0x + v0y + v0z + e1x + e1y + e1z + e2x + e2y + e2z) * dx
            hit = t < best_t
            best_t = jnp.where(hit, t, best_t)
            best_r = jnp.where(hit, pc * 8 + j, best_r)
            continue
        hx = dy * e2z - dz * e2y
        hy = dz * e2x - dx * e2z
        hz = dx * e2y - dy * e2x
        a = e1x * hx + e1y * hy + e1z * hz
        if variant == "nodiv":
            f = a * jnp.float32(0.5)
        elif variant == "recip":
            f = pl.reciprocal(a, approx=True)
        else:
            f = jnp.float32(1.0) / a
        sx = ox - v0x
        sy = oy - v0y
        sz = oz - v0z
        u = f * (sx * hx + sy * hy + sz * hz)
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = f * (dx * qx + dy * qy + dz * qz)
        t = f * (e2x * qx + e2y * qy + e2z * qz)
        hit = ((jnp.abs(a) >= _EPS) & (u >= 0.0) & (u <= 1.0)
               & (v >= 0.0) & (u + v <= 1.0) & (t >= _EPS) & (t < best_t))
        best_t = jnp.where(hit, t, best_t)
        best_r = jnp.where(hit, pc * 8 + j, best_r)
    return best_t, best_r


def make(variant):
    def kernel(rows_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               t_out, r_out):
        ox = ox_ref[...]
        oy = oy_ref[...]
        oz = oz_ref[...]
        dx = dx_ref[...]
        dy = dy_ref[...]
        dz = dz_ref[...]

        def visit(_, c):
            p, it, best_t, best_r = c
            pc = jnp.where(p < ITERS, p, 0) % D_ROWS
            row = rows_ref[pl.ds(pc, 1), :]
            row_i = pltpu.bitcast(row, jnp.int32)
            is_leaf = row_i[0, 9] == 1
            skip = row_i[0, 10]
            best_t, best_r = leaf_mt(
                row, ox, oy, oz, dx, dy, dz, best_t, best_r, pc, variant)
            descend = jnp.any(best_t < 1e29)
            new_p = jnp.where(is_leaf | descend, p + 1,
                              jnp.maximum(skip, p + 1))
            return new_p, it + 1, best_t, best_r

        def cond(c):
            return c[0] < ITERS

        def body(c):
            return jax.lax.fori_loop(0, K_VISITS, visit, c)

        _, it, bt, br = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.int32(0),
             jnp.full((SUB, LANE), 1e30, jnp.float32),
             jnp.full((SUB, LANE), -1, jnp.int32)))
        t_out[...] = bt
        r_out[...] = br
    return kernel


VARIANTS = ("empty", "full", "recip", "nodiv", "extonly", "half")


def main():
    rng = np.random.default_rng(0)
    rows = np.zeros((D_ROWS, LANE), np.float32)
    rows[:, :] = rng.uniform(-1, 1, (D_ROWS, LANE))
    meta = np.zeros((D_ROWS, 2), np.int32)
    meta[:, 0] = rng.integers(0, 2, D_ROWS)
    meta[:, 1] = 1
    rows[:, 9:11] = meta.view(np.float32).reshape(D_ROWS, 2)
    rows = jnp.asarray(rows)
    mk = lambda: jnp.asarray(
        rng.uniform(0.1, 1, (SUB, LANE)).astype(np.float32))
    args = (rows, mk(), mk(), mk(), mk(), mk(), mk())

    fns = {}
    for variant in VARIANTS:
        f = pl.pallas_call(
            make(variant),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_shape=[jax.ShapeDtypeStruct((SUB, LANE), jnp.float32),
                       jax.ShapeDtypeStruct((SUB, LANE), jnp.int32)],
        )
        g = jax.jit(lambda *a, f=f: f(*a))
        out = g(*args)  # compile + warm
        jax.block_until_ready(out)
        fns[variant] = g
        print(f"compiled {variant}", flush=True)

    best = {v: float("inf") for v in VARIANTS}
    sums = {}
    for rnd in range(4):
        for variant in VARIANTS:
            g = fns[variant]
            out = g(*args)
            jax.block_until_ready(out)
            t0 = time.time()
            for _ in range(5):
                out = g(*args)
            jax.block_until_ready(out)
            dt = (time.time() - t0) / 5
            best[variant] = min(best[variant], dt)
            sums[variant] = float(out[0].sum())
        print(f"round {rnd}: " + " ".join(
            f"{v}={best[v]/ITERS*1e9:.1f}" for v in VARIANTS), flush=True)
    print("--- min ns/visit ---", flush=True)
    for v in VARIANTS:
        print(f"{v:8s}: {best[v]*1e3:8.3f} ms ({best[v]/ITERS*1e9:7.1f} "
              f"ns/visit) checksum={sums[v]:.3f}", flush=True)


if __name__ == "__main__":
    main()
