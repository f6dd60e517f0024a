#!/usr/bin/env python
"""Microbenchmark: speculative W-row visits for the stream walk.

Model from tpu_leaf_micro: a visit costs ~550ns of VPU->scalar flush (the
jnp.any reduce feeding the next cursor) + ~2ns/extract of row work.  If one
visit processes W consecutive rows (evaluated independently against
visit-start state, reduces all read in ONE scalar phase, per-row results
merged with scalar t-penalties), the flush amortizes over W rows.

Variants: spec1 (= current shape), spec2, spec3, spec4, spec6.
Stream data = leaf rows with +1 transitions, so every speculated row is
useful; real-scene usefulness comes from sim_spec_visits.py.  Reported
ns/ROW is the cost side of the model.
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
ROWS_TOTAL = 32768
D_ROWS = 512
K_VISITS = 32
REC = 16
_EPS = np.float32(1e-5)
_BIG = np.float32(1e30)


def eval_row(row, ox, oy, oz, dx, dy, dz, best_t0, pc):
    """Leaf interp (8-tri MT) + node interp (8 slab tests) of one row vs
    the visit-start best_t; returns (t_w, r_w, anyh_w) tentative results."""
    t_w = jnp.full((SUB, LANE), _BIG, jnp.float32)
    r_w = jnp.full((SUB, LANE), -1, jnp.int32)
    ix = jnp.float32(1.0) / dx
    iy = jnp.float32(1.0) / dy
    iz = jnp.float32(1.0) / dz
    anyh = jnp.zeros((SUB, LANE), dtype=bool)
    for k in range(8):
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
        anyh = anyh | ((tmax_ >= tmin) & (tmin < best_t0)
                       & (tmax_ > jnp.float32(0.0)))
    for j in range(8):
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
               & (v >= 0.0) & (u + v <= 1.0) & (t >= _EPS)
               & (t < best_t0) & (t < t_w))
        t_w = jnp.where(hit, t, t_w)
        r_w = jnp.where(hit, pc * 8 + j, r_w)
    return t_w, r_w, anyh


def make_cur():
    """The real kernel's current visit shape (_make_skip_visit): direct
    best updates gated by scalar->vector is_leaf/valid ANDs, reduce from
    slab-only anyh."""
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
            valid = p < ROWS_TOTAL
            pc = jnp.where(valid, p, 0) % D_ROWS
            row = rows_ref[pl.ds(pc, 1), :]
            row_i = pltpu.bitcast(row, jnp.int32)
            is_leaf = row_i[0, 9] == 1
            skip = row_i[0, 10]
            anyh = jnp.zeros((SUB, LANE), dtype=bool)
            for k in range(8):
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
            descend = jnp.any(anyh)
            leaf_live = jnp.broadcast_to(is_leaf & valid, (SUB, LANE))
            for j in range(8):
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
                       & (v >= 0.0) & (u + v <= 1.0) & (t >= _EPS)
                       & (t < best_t) & leaf_live)
                best_t = jnp.where(hit, t, best_t)
                best_r = jnp.where(hit, pc * 8 + j, best_r)
            new_p = jnp.where(is_leaf | descend, p + 1,
                              jnp.maximum(skip, p + 1))
            new_p = jnp.where(valid, new_p, p)
            return new_p, it + 1, best_t, best_r

        def cond(c):
            return c[0] < ROWS_TOTAL

        def body(c):
            return jax.lax.fori_loop(0, K_VISITS, visit, c)

        _, it, bt, br = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.int32(0),
             jnp.full((SUB, LANE), _BIG, jnp.float32),
             jnp.full((SUB, LANE), -1, jnp.int32)))
        t_out[...] = bt
        r_out[...] = br + it  # fold visit count into checksum output
    return kernel


def make(w_spec):
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
            base = jnp.where(p < ROWS_TOTAL, p, 0)
            evals = []
            for w in range(w_spec):
                pcw = (base + w) % D_ROWS
                row = rows_ref[pl.ds(pcw, 1), :]
                row_i = pltpu.bitcast(row, jnp.int32)
                t_w, r_w, anyh = eval_row(
                    row, ox, oy, oz, dx, dy, dz, best_t, pcw)
                evals.append((t_w, r_w, jnp.any(anyh),
                              row_i[0, 9] == 1, row_i[0, 10]))
            # scalar resolution phase: one flush reads all W reduces
            nxt = base
            for w in range(w_spec):
                t_w, r_w, desc, leaf, skip = evals[w]
                on = nxt == base + w
                step = jnp.where(leaf | desc, base + w + 1,
                                 jnp.maximum(skip, base + w + 1))
                nxt = jnp.where(on, step, nxt)
                pen = jnp.where(on, jnp.float32(0.0), _BIG)
                t_eff = t_w + pen
                better = t_eff < best_t
                best_t = jnp.where(better, t_eff, best_t)
                best_r = jnp.where(better, r_w, best_r)
            return jnp.maximum(nxt, p + 1), it + 1, best_t, best_r

        def cond(c):
            return c[0] < ROWS_TOTAL

        def body(c):
            return jax.lax.fori_loop(0, K_VISITS, visit, c)

        _, it, bt, br = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.int32(0),
             jnp.full((SUB, LANE), _BIG, jnp.float32),
             jnp.full((SUB, LANE), -1, jnp.int32)))
        t_out[...] = bt
        r_out[...] = br + it  # fold visit count into checksum output
    return kernel


VARIANTS = ("cur", 1, 2, 3, 4, 6)


def main():
    rng = np.random.default_rng(0)
    rows = np.zeros((D_ROWS, LANE), np.float32)
    rows[:, :] = rng.uniform(-1, 1, (D_ROWS, LANE))
    meta = np.zeros((D_ROWS, 2), np.int32)
    meta[:, 0] = 1  # all leaf rows -> every +1 speculation is useful
    meta[:, 1] = 1
    rows[:, 9:11] = meta.view(np.float32).reshape(D_ROWS, 2)
    rows = jnp.asarray(rows)
    mk = lambda: jnp.asarray(
        rng.uniform(0.1, 1, (SUB, LANE)).astype(np.float32))
    args = (rows, mk(), mk(), mk(), mk(), mk(), mk())

    fns = {}
    for w in VARIANTS:
        f = pl.pallas_call(
            make_cur() if w == "cur" else make(w),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_shape=[jax.ShapeDtypeStruct((SUB, LANE), jnp.float32),
                       jax.ShapeDtypeStruct((SUB, LANE), jnp.int32)],
        )
        g = jax.jit(lambda *a, f=f: f(*a))
        out = g(*args)
        jax.block_until_ready(out)
        fns[w] = g
        print(f"compiled W={w}", flush=True)

    best = {w: float("inf") for w in VARIANTS}
    sums = {}
    for rnd in range(6):
        for w in VARIANTS:
            g = fns[w]
            out = g(*args)
            jax.block_until_ready(out)
            t0 = time.time()
            for _ in range(5):
                out = g(*args)
            jax.block_until_ready(out)
            best[w] = min(best[w], (time.time() - t0) / 5)
            sums[w] = (float(out[0].sum()), int(np.asarray(out[1])[0, 0]))
        print(f"round {rnd}: " + " ".join(
            f"W{w}={best[w]/ROWS_TOTAL*1e9:.1f}" for w in VARIANTS),
            flush=True)
    print("--- min ns/ROW (walk covers ROWS_TOTAL rows regardless of W)",
          flush=True)
    for w in VARIANTS:
        print(f"W={w}: {best[w]*1e3:8.3f} ms ({best[w]/ROWS_TOTAL*1e9:7.1f} "
              f"ns/row) t_sum={sums[w][0]:.3f} r00+it={sums[w][1]}",
              flush=True)


if __name__ == "__main__":
    main()
