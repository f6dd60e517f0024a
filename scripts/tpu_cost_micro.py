#!/usr/bin/env python
"""Per-visit cost DECOMPOSITION for the 8-wide stream walk.

tpu_spec_micro (v5e, 2026-08) falsified the drain-dominated model: with
drains fully amortized (W=6 speculation) per-row cost only fell 537 ->
407 ns, so ~400 ns/row is FIXED row work.  This micro isolates where it
lives: the dynamic-sublane fetch, the scalar-extract stream, the slab
vector math, the MT vector math, the any-reduce, or the loop shell.

All variants run a fixed-trip fori (cursor = p + 1, no data-dependent
control) over ROWS_TOTAL visits cycling through D_ROWS resident rows:

  shell     loop + fetch + 2 meta extracts + 1 vector acc op
  ext48     shell + 48 data extracts (scalar-summed, 1 vector op)
  ext120    shell + 120 data extracts
  slab      shell + 48 extracts + 8-child slab test (full vector math)
  slabfma   slab with o*inv hoisted (FMA form: lo*inv - oinv)
  mt        shell + 72 extracts + 8-tri Möller-Trumbore
  full      slab + mt (the real kernel's visit minus reduce)
  fullred   full + jnp.any reduce folded into the cursor (real chain)
  bf4       ONE (4,128) block fetch + 4x full eval, cursor += 4
  bf8       ONE (8,128) block fetch + 8x full eval, cursor += 8

MEASUREMENT PROTOCOL (v5e axon tunnel, established 2026-08-18):
- When the device is BUSY the tunnel ACKs executions immediately and runs
  them later: block_until_ready returns ~instantly and ANY timing taken
  then reads ~100x fast (this generalizes the round-1 "first kernel after
  idle" trap — it poisoned whole interleaved harnesses).  Only time on an
  idle device, strictly sequentially, syncing each call with a HOST READ
  (np.asarray of an output), never just block_until_ready.
- Per-call fixed overhead is ~25-80 ms (dispatch+result RPCs), so
  per-row cost = SLOPE between two problem sizes, not time/rows.
"""
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

SUB, LANE = 8, 128
ROWS_TOTAL = 262144  # overridden per size by the slope harness
SIZES = (131072, 393216)
D_ROWS = 512
REC = 16
_EPS = np.float32(1e-5)
_BIG = np.float32(1e30)


def make(variant, rows_total=ROWS_TOTAL):
    do_slab = variant in ("slab", "slabfma", "full", "fullred", "bf4", "bf8")
    do_mt = variant in ("mt", "full", "fullred", "bf4", "bf8")
    n_ext = {"ext48": 48, "ext120": 120}.get(variant, 0)
    fma = variant == "slabfma"
    bw = {"bf4": 4, "bf8": 8}.get(variant, 1)
    reduce_cursor = variant == "fullred"

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
        oix = ox * ix
        oiy = oy * iy
        oiz = oz * iz

        def eval_row(row, r, pc, best_t, best_r, acc):
            """One (1,128)-row view r (sublane r of a block fetch)."""
            anyh = jnp.zeros((SUB, LANE), dtype=bool)
            if n_ext:
                s = jnp.float32(0.0)
                for i in range(n_ext):
                    s = s + row[r, i]
                acc = acc + s
            if do_slab:
                for k in range(8):
                    b = REC * k
                    lo_x = row[r, b + 0]
                    lo_y = row[r, b + 1]
                    lo_z = row[r, b + 2]
                    hi_x = row[r, b + 3]
                    hi_y = row[r, b + 4]
                    hi_z = row[r, b + 5]
                    if fma:
                        tx_n = lo_x * ix - oix
                        tx_f = hi_x * ix - oix
                        ty_n = lo_y * iy - oiy
                        ty_f = hi_y * iy - oiy
                        tz_n = lo_z * iz - oiz
                        tz_f = hi_z * iz - oiz
                    else:
                        tx_n = (lo_x - ox) * ix
                        tx_f = (hi_x - ox) * ix
                        ty_n = (lo_y - oy) * iy
                        ty_f = (hi_y - oy) * iy
                        tz_n = (lo_z - oz) * iz
                        tz_f = (hi_z - oz) * iz
                    tmin = jnp.minimum(tx_n, tx_f)
                    tmax_ = jnp.maximum(tx_n, tx_f)
                    tmin = jnp.maximum(tmin, jnp.minimum(ty_n, ty_f))
                    tmax_ = jnp.minimum(tmax_, jnp.maximum(ty_n, ty_f))
                    tmin = jnp.maximum(tmin, jnp.minimum(tz_n, tz_f))
                    tmax_ = jnp.minimum(tmax_, jnp.maximum(tz_n, tz_f))
                    anyh = anyh | ((tmax_ >= tmin) & (tmin < best_t)
                                   & (tmax_ > jnp.float32(0.0)))
            if do_mt:
                for j in range(8):
                    b = REC * j
                    v0x = row[r, b + 0]
                    v0y = row[r, b + 1]
                    v0z = row[r, b + 2]
                    e1x = row[r, b + 3]
                    e1y = row[r, b + 4]
                    e1z = row[r, b + 5]
                    e2x = row[r, b + 6]
                    e2y = row[r, b + 7]
                    e2z = row[r, b + 8]
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
                           & (v >= 0.0) & (u + v <= 1.0) & (t >= _EPS)
                           & (t < best_t))
                    best_t = jnp.where(hit, t, best_t)
                    best_r = jnp.where(hit, pc * 8 + j, best_r)
            return best_t, best_r, acc, anyh

        def visit(_, c):
            p, best_t, best_r, acc = c
            pc = p % D_ROWS
            if bw > 1:
                pc = jnp.minimum(pc, D_ROWS - bw)
                row = rows_ref[pl.ds(pc, bw), :]
                for r in range(bw):
                    meta = pltpu.bitcast(row, jnp.int32)
                    acc = acc + jnp.float32(meta[r, 9])
                    best_t, best_r, acc, anyh = eval_row(
                        row, r, pc + r, best_t, best_r, acc)
                return p + bw, best_t, best_r, acc
            row = rows_ref[pl.ds(pc, 1), :]
            meta = pltpu.bitcast(row, jnp.int32)
            is_leaf = meta[0, 9]
            skip = meta[0, 10]
            acc = acc + jnp.float32(is_leaf)
            best_t, best_r, acc, anyh = eval_row(
                row, 0, pc, best_t, best_r, acc)
            nxt = p + 1
            if reduce_cursor:
                # keep the real kernel's vector->scalar dependence: the
                # cursor consumes the reduce (select between +1 and skip
                # both equal to p+1 so the trip count stays fixed)
                desc = jnp.any(anyh)
                nxt = jnp.where(desc, p + 1, jnp.minimum(skip * 0 + p + 1,
                                                         p + 1))
            return nxt, best_t, best_r, acc

        n_vis = rows_total // bw
        _, best_t, best_r, acc = jax.lax.fori_loop(
            0, n_vis, visit,
            (jnp.int32(0), jnp.full((SUB, LANE), _BIG, jnp.float32),
             jnp.full((SUB, LANE), -1, jnp.int32),
             jnp.zeros((SUB, LANE), jnp.float32)))
        t_out[...] = best_t + acc
        r_out[...] = best_r

    return kernel


def make_dummy():
    def kernel(rows_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               t_out, r_out):
        t_out[...] = ox_ref[...] + rows_ref[0, 0]
        r_out[...] = jnp.zeros((SUB, LANE), jnp.int32)
    return kernel


VARIANTS = ("shell", "ext48", "ext120", "slab", "slabfma", "mt",
            "full", "fullred", "bf4", "bf8")


def main():
    rng = np.random.default_rng(0)
    rows = rng.uniform(-1, 1, (D_ROWS, LANE)).astype(np.float32)
    meta = np.ones((D_ROWS, 2), np.int32)
    rows[:, 9:11] = meta.view(np.float32).reshape(D_ROWS, 2)
    rows = jnp.asarray(rows)
    mk = lambda: jnp.asarray(
        rng.uniform(0.1, 1, (SUB, LANE)).astype(np.float32))
    args = (rows, mk(), mk(), mk(), mk(), mk(), mk())

    def timed(g):
        """min-of-3 single calls, each synced by a host read."""
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out = g(*args)
            s = np.asarray(out[0])  # host read = the only reliable sync
            best = min(best, time.time() - t0)
        return best, float(s.sum())

    results = {}
    for v in VARIANTS:
        ts = []
        for size in SIZES:
            f = pl.pallas_call(
                make(v, size),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
                out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_shape=[
                    jax.ShapeDtypeStruct((SUB, LANE), jnp.float32),
                    jax.ShapeDtypeStruct((SUB, LANE), jnp.int32)],
            )
            g = jax.jit(lambda *a, f=f: f(*a))
            np.asarray(g(*args)[0])  # compile + drain
            t, chk = timed(g)
            ts.append(t)
            print(f"{v} @ {size}: {t*1e3:8.2f} ms (sum {chk:.3e})",
                  flush=True)
        slope = (ts[1] - ts[0]) / (SIZES[1] - SIZES[0]) * 1e9
        results[v] = slope
        print(f"{v}: {slope:7.1f} ns/row (slope)", flush=True)
    print("--- ns/row by slope ---", flush=True)
    for v, s in results.items():
        print(f"{v:8s}: {s:7.1f}", flush=True)


if __name__ == "__main__":
    main()
