#!/usr/bin/env python
"""Microbenchmark: quantized child boxes vs f32 slabs in the real visit shape.

The 8-wide kernel's per-visit cost is scalar-stream-bound (~125 extracts ~=
490 ns/visit; vector ALU changes are invisible).  PAPERS.md's quantized-BVH
idea cuts the node interpretation from 48 f32 extracts to 6 parent f32 + 12
packed-u8 int32 extracts, at the price of 48 scalar shift/and unpacks + 48
int->f32 converts + fma-form slab math.  Whether scalar unpack ops are
cheaper than extracts is the open question this script answers.

Variants (all: dynamic-sublane row fetch + any-reduce + skip control, the
_make_skip_visit shape from accel/pallas_wide.py):
  node_f32 : 8-child slab test, 48 f32 extracts (current kernel node path)
  node_q8  : 8-child slab test, 6+12 extracts + u8 unpack + fma dequant
  full_f32 : node_f32 + 8-tri Moller-Trumbore leaf interp (current kernel)
  full_q8  : node_q8  + 8-tri Moller-Trumbore leaf interp (proposed kernel)
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
K_VISITS = 32
REC = 16
WIDTH = 8
_EPS = np.float32(1e-5)


def slab_f32(row, ox, oy, oz, ix, iy, iz, best_t):
    anyh = jnp.zeros((SUB, LANE), dtype=bool)
    for k in range(WIDTH):
        b = REC * k
        lo_x = row[0, b + 0]
        lo_y = row[0, b + 1]
        lo_z = row[0, b + 2]
        hi_x = row[0, b + 3]
        hi_y = row[0, b + 4]
        hi_z = row[0, b + 5]
        tx_n = (lo_x - ox) * ix
        tx_f = (hi_x - ox) * ix
        tmin = jnp.minimum(tx_n, tx_f)
        tmax_ = jnp.maximum(tx_n, tx_f)
        ty_n = (lo_y - oy) * iy
        ty_f = (hi_y - oy) * iy
        tmin = jnp.maximum(tmin, jnp.minimum(ty_n, ty_f))
        tmax_ = jnp.minimum(tmax_, jnp.maximum(ty_n, ty_f))
        tz_n = (lo_z - oz) * iz
        tz_f = (hi_z - oz) * iz
        tmin = jnp.maximum(tmin, jnp.minimum(tz_n, tz_f))
        tmax_ = jnp.minimum(tmax_, jnp.maximum(tz_n, tz_f))
        anyh = anyh | ((tmax_ >= tmin) & (tmin < best_t)
                       & (tmax_ > jnp.float32(0.0)))
    return anyh


def slab_q8(row, row_i, ox, oy, oz, ix, iy, iz, best_t):
    # parent lo at lanes 0-2, scale at 3-5 (f32); packed u8 at int lanes
    # 12..23: lane 12+2*m+h = plane m (lox,loy,loz,hix,hiy,hiz), children
    # 4h..4h+3, byte c = child 4h+c.
    plo = [row[0, c] for c in range(3)]
    psc = [row[0, 3 + c] for c in range(3)]
    # Per-axis vector precompute: t_plane = A + q * B
    ax = (plo[0] - ox) * ix
    ay = (plo[1] - oy) * iy
    az = (plo[2] - oz) * iz
    bx = psc[0] * ix
    by = psc[1] * iy
    bz = psc[2] * iz
    a3 = (ax, ay, az)
    b3 = (bx, by, bz)
    lanes = [row_i[0, 12 + j] for j in range(12)]
    anyh = jnp.zeros((SUB, LANE), dtype=bool)
    for k in range(WIDTH):
        h, c = divmod(k, 4)
        q = [((lanes[2 * m + h] >> (8 * c)) & 0xFF).astype(jnp.float32)
             for m in range(6)]
        t_lo = [a3[m] + q[m] * b3[m] for m in range(3)]
        t_hi = [a3[m] + q[3 + m] * b3[m] for m in range(3)]
        tmin = jnp.minimum(t_lo[0], t_hi[0])
        tmax_ = jnp.maximum(t_lo[0], t_hi[0])
        tmin = jnp.maximum(tmin, jnp.minimum(t_lo[1], t_hi[1]))
        tmax_ = jnp.minimum(tmax_, jnp.maximum(t_lo[1], t_hi[1]))
        tmin = jnp.maximum(tmin, jnp.minimum(t_lo[2], t_hi[2]))
        tmax_ = jnp.minimum(tmax_, jnp.maximum(t_lo[2], t_hi[2]))
        anyh = anyh | ((tmax_ >= tmin) & (tmin < best_t)
                       & (tmax_ > jnp.float32(0.0)))
    return anyh


def leaf_mt(row, ox, oy, oz, dx, dy, dz, best_t, best_r, pc):
    for j in range(WIDTH):
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
        hx = dy * e2z - dz * e2y
        hy = dz * e2x - dx * e2z
        hz = dx * e2y - dy * e2x
        a = e1x * hx + e1y * hy + e1z * hz
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
    quant = variant.endswith("q8")
    full = variant.startswith("full")

    def kernel(rows_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               t_out, r_out):
        ox = ox_ref[...]
        oy = oy_ref[...]
        oz = oz_ref[...]
        dx = dx_ref[...]
        dy = dy_ref[...]
        dz = dz_ref[...]
        ix = jnp.float32(1.0) / dx
        iy = jnp.float32(1.0) / dy
        iz = jnp.float32(1.0) / dz

        def visit(_, c):
            p, it, best_t, best_r = c
            pc = jnp.where(p < ITERS, p, 0) % D_ROWS
            row = rows_ref[pl.ds(pc, 1), :]
            row_i = pltpu.bitcast(row, jnp.int32)
            is_leaf = row_i[0, 9] == 1
            skip = row_i[0, 10]
            if quant:
                anyh = slab_q8(row, row_i, ox, oy, oz, ix, iy, iz, best_t)
            else:
                anyh = slab_f32(row, ox, oy, oz, ix, iy, iz, best_t)
            if full:
                best_t, best_r = leaf_mt(
                    row, ox, oy, oz, dx, dy, dz, best_t, best_r, pc)
            descend = jnp.any(anyh)
            new_p = jnp.where(is_leaf | descend, p + 1, jnp.maximum(skip, p + 1))
            return new_p, it + 1, best_t, best_r

        def cond(c):
            return c[0] < ITERS

        def body(c):
            return jax.lax.fori_loop(0, K_VISITS, visit, c)

        _, it, bt, br = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.int32(0), jnp.full((SUB, LANE), 1e30, jnp.float32),
             jnp.full((SUB, LANE), -1, jnp.int32)))
        t_out[...] = bt
        r_out[...] = br
    return kernel


def main():
    rng = np.random.default_rng(0)
    rows = np.zeros((D_ROWS, LANE), np.float32)
    # realistic-ish data: parent boxes + packed u8 children + meta
    rows[:, 0:3] = rng.uniform(-5, 5, (D_ROWS, 3))
    rows[:, 3:6] = rng.uniform(0.01, 0.1, (D_ROWS, 3))
    packed = rng.integers(0, 2**31, (D_ROWS, 12), dtype=np.int32)
    rows[:, 12:24] = packed.view(np.float32).reshape(D_ROWS, 12)
    meta = np.zeros((D_ROWS, 2), np.int32)
    meta[:, 0] = rng.integers(0, 2, D_ROWS)
    meta[:, 1] = 1  # skip forward (maximum(skip, p+1) keeps progress)
    rows[:, 9:11] = meta.view(np.float32).reshape(D_ROWS, 2)
    # f32 child boxes in lanes for slab_f32 (overlaps quant lanes; fine for
    # a cost benchmark)
    for k in range(WIDTH):
        b = REC * k
        rows[:, b + 0:b + 3] = np.minimum(rows[:, b + 0:b + 3], 1.0)
    rows = jnp.asarray(rows)
    mk = lambda: jnp.asarray(rng.uniform(0.1, 1, (SUB, LANE)).astype(np.float32))
    args = (rows, mk(), mk(), mk(), mk(), mk(), mk())
    for variant in ("node_f32", "node_q8", "full_f32", "full_q8"):
        try:
            f = pl.pallas_call(
                make(variant),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
                out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_shape=[jax.ShapeDtypeStruct((SUB, LANE), jnp.float32),
                           jax.ShapeDtypeStruct((SUB, LANE), jnp.int32)],
            )
            g = jax.jit(lambda *a, f=f: f(*a))
            out = g(*args)
            jax.block_until_ready(out)
            t0 = time.time()
            for _ in range(10):
                out = g(*args)
            jax.block_until_ready(out)
            dt = (time.time() - t0) / 10
            print(f"{variant:9s}: {dt*1e3:8.3f} ms ({dt/ITERS*1e9:7.1f} "
                  f"ns/visit) checksum={float(out[0].sum()):.3f}", flush=True)
        except Exception as e:
            print(f"{variant:9s}: FAIL {str(e).splitlines()[0][:110]}",
                  flush=True)


if __name__ == "__main__":
    main()
