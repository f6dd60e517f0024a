#!/usr/bin/env python
"""Data-DEPENDENT cursor micro: the missing piece after tpu_cost_micro.

tpu_cost_micro measured fixed-trip (predictable-address) visits:
fetch 130 / slab ~0 / MT +170 / block-fetch amortization to 170 ns/row.
But on-device the specb kernels came out SLOWER than skip (2.7 vs 1.4
M rays/s, device_validate 2026-08-18), so prediction-friendly numbers do
not transfer.  This micro makes the next address come from MEMORY (the
fetched row), optionally through a vector->scalar reduce, so the real
exposed latencies are measured:

  dep0       fetch -> cursor = skipA (scalar load chain, no reduce, no eval)
  dep1       dep0 + full eval (slab+MT) off the critical path
  dep1red    dep1 + cursor = where(any(anyh), skipA, skipB) — the REAL
             skip-walk chain (reduce feeds the address)
  dep1lean   dep1red with the lean plane-form leaf test (~26 ops vs ~47)
  depb8      ONE (8,128) block fetch, 8 evals, cursor = where(desc of
             LAST row, skipA, skipB) of last row — one reduce per window
  depb8all   depb8 but cursor chains through ALL 8 rows' reduces
             (= the real specb resolve)

All skips are stored as (i+1) % D_ROWS (or +8 for windows) so trip counts
are fixed in VALUE but opaque to the compiler.  skipA == skipB, so
variants compute identical walks; only the dependence structure differs.

Protocol: idle device, sequential, host-read sync, two-size slope
(see tpu_cost_micro.py header).
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
SIZES = (131072, 393216)
D_ROWS = 512
REC = 16
SKA, SKB = 9, 10      # int32 skip lanes (stored identical values)
_EPS = np.float32(1e-5)
_BIG = np.float32(1e30)


def make(variant, rows_total):
    do_eval = variant != "dep0"
    lean = variant == "dep1lean"
    use_red = variant in ("dep1red", "dep1lean")
    bw = 8 if variant.startswith("depb") else 1
    chain_all = variant == "depb8all"

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

        def eval_row(row, r, pc, best_t, best_r):
            anyh = jnp.zeros((SUB, LANE), dtype=bool)
            for k in range(8):
                b = REC * k
                lo_x = row[r, b + 0]
                lo_y = row[r, b + 1]
                lo_z = row[r, b + 2]
                hi_x = row[r, b + 3]
                hi_y = row[r, b + 4]
                hi_z = row[r, b + 5]
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
            if lean:
                # plane-form leaf test: lanes reinterpreted as
                # [n(3), d0, U(3), u0, V(3), v0] per record
                for j in range(8):
                    b = REC * j
                    nx = row[r, b + 0]
                    ny = row[r, b + 1]
                    nz = row[r, b + 2]
                    d0 = row[r, b + 3]
                    ux = row[r, b + 4]
                    uy = row[r, b + 5]
                    uz = row[r, b + 6]
                    u0 = row[r, b + 7]
                    vx = row[r, b + 8]
                    vy = row[r, b + 9]
                    vz = row[r, b + 10]
                    v0_ = row[r, b + 11]
                    den = nx * dx + ny * dy + nz * dz
                    t = (d0 - (nx * ox + ny * oy + nz * oz)) / den
                    px = ox + t * dx
                    py = oy + t * dy
                    pz = oz + t * dz
                    u = ux * px + uy * py + uz * pz + u0
                    v = vx * px + vy * py + vz * pz + v0_
                    hit = ((jnp.abs(den) >= _EPS) & (u >= 0.0) & (v >= 0.0)
                           & (u + v <= 1.0) & (t >= _EPS) & (t < best_t))
                    best_t = jnp.where(hit, t, best_t)
                    best_r = jnp.where(hit, pc * 8 + j, best_r)
            else:
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
            return best_t, best_r, anyh

        def visit(_, c):
            p, best_t, best_r = c
            if bw > 1:
                rows = rows_ref[pl.ds(p, bw), :]
                rows_i = pltpu.bitcast(rows, jnp.int32)
                descs = []
                for r in range(bw):
                    best_t, best_r, anyh = eval_row(
                        rows, r, p + r, best_t, best_r)
                    if chain_all:
                        descs.append(jnp.any(anyh))
                if chain_all:
                    nxt = rows_i[0, SKA]
                    for r in range(bw):
                        nxt = jnp.where(
                            descs[r], rows_i[r, SKA], rows_i[r, SKB])
                else:
                    desc = jnp.any(anyh)
                    nxt = jnp.where(
                        desc, rows_i[bw - 1, SKA], rows_i[bw - 1, SKB])
                return nxt, best_t, best_r
            row = rows_ref[pl.ds(p, 1), :]
            row_i = pltpu.bitcast(row, jnp.int32)
            if do_eval:
                best_t, best_r, anyh = eval_row(row, 0, p, best_t, best_r)
            if use_red:
                desc = jnp.any(anyh)
                nxt = jnp.where(desc, row_i[0, SKA], row_i[0, SKB])
            else:
                nxt = row_i[0, SKA]
            return nxt, best_t, best_r

        n_vis = rows_total // bw
        _, best_t, best_r = jax.lax.fori_loop(
            0, n_vis, visit,
            (jnp.int32(0), jnp.full((SUB, LANE), _BIG, jnp.float32),
             jnp.full((SUB, LANE), -1, jnp.int32)))
        t_out[...] = best_t
        r_out[...] = best_r

    return kernel


VARIANTS = ("dep0", "dep1", "dep1red", "dep1lean", "depb8", "depb8all")


def main():
    rng = np.random.default_rng(0)
    rows = rng.uniform(-1, 1, (D_ROWS, LANE)).astype(np.float32)
    # per-row skip targets: +1 (or +8 for windows), wrapped; A == B
    meta = np.zeros((D_ROWS, 2), np.int32)
    meta[:, 0] = (np.arange(D_ROWS) + 1) % D_ROWS
    meta[:, 1] = meta[:, 0]
    rows_b = rows.copy()
    rows_b[:, SKA:SKB + 1] = meta.view(np.float32).reshape(D_ROWS, 2)
    metab = np.zeros((D_ROWS, 2), np.int32)
    metab[:, 0] = (np.arange(D_ROWS) + 8) % (D_ROWS - 8)
    metab[:, 1] = metab[:, 0]
    rows_w = rows.copy()
    rows_w[:, SKA:SKB + 1] = metab.view(np.float32).reshape(D_ROWS, 2)

    mk = lambda: jnp.asarray(
        rng.uniform(0.1, 1, (SUB, LANE)).astype(np.float32))
    ray = (mk(), mk(), mk(), mk(), mk(), mk())

    for v in VARIANTS:
        data = jnp.asarray(rows_w if v.startswith("depb") else rows_b)
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
            np.asarray(g(data, *ray)[0])  # compile + drain
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                out = g(data, *ray)
                np.asarray(out[0])
                best = min(best, time.time() - t0)
            ts.append(best)
            print(f"{v} @ {size}: {best*1e3:8.2f} ms", flush=True)
        slope = (ts[1] - ts[0]) / (SIZES[1] - SIZES[0]) * 1e9
        print(f"{v}: {slope:7.1f} ns/row (slope)", flush=True)


if __name__ == "__main__":
    main()
