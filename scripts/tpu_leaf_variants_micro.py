#!/usr/bin/env python
"""What makes a phase-2 leaf group cost ~2000ns? Kernel variants, same
harness as tpu_leaf_kernel_micro (slope between 32 and 256 groups/packet,
16 packets, 1024 rays):

  full    : the real kernel body
  nodiv   : f = a instead of f = 1/a (wrong math, same op count minus div)
  noext   : same math but triangle scalars fixed from row 0 fetched once
            (kills per-row fetch+72 extracts; vector work identical)
  halftri : only 4 of 8 tris per row (vector + extract work halved)

timeout 1800 python -u scripts/tpu_leaf_variants_micro.py
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def make_kernel(variant, cap8):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from surf_tpu.accel.pallas_wide import LEAF_TRIS, REC, WIDTH, _EPS

    def kernel(counts_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref,
               dz_ref, tm_ref, list_ref, stream_ref,
               t_out, r_out, u_out, v_out):
        p = pl.program_id(0)
        trip = jnp.minimum(counts_ref[p], jnp.int32(cap8))
        ox = ox_ref[0]
        oy = oy_ref[0]
        oz = oz_ref[0]
        dx = dx_ref[0]
        dy = dy_ref[0]
        dz = dz_ref[0]
        row0 = stream_ref[pl.ds(0, 1), :]

        def group(gi, c):
            best_t, best_r, best_u, best_v = c
            lrow = list_ref[0, pl.ds(gi, 1), :]
            ntri = LEAF_TRIS // 2 if variant == "halftri" else LEAF_TRIS
            for e in range(ntri):
                ridx = lrow[0, e]
                if variant == "noext":
                    row = row0
                else:
                    row = stream_ref[pl.ds(ridx, 1), :]
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
                    if variant == "nodiv":
                        f = a
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
                    hit = (
                        (jnp.abs(a) >= _EPS)
                        & (u >= 0.0) & (u <= 1.0)
                        & (v >= 0.0) & (u + v <= 1.0)
                        & (t >= _EPS) & (t < best_t)
                    )
                    best_t = jnp.where(hit, t, best_t)
                    best_r = jnp.where(hit, ridx * LEAF_TRIS + j, best_r)
                    best_u = jnp.where(hit, u, best_u)
                    best_v = jnp.where(hit, v, best_v)
            return best_t, best_r, best_u, best_v

        tm0 = tm_ref[0]
        init = (tm0, jnp.full(tm0.shape, -1, jnp.int32),
                jnp.zeros(tm0.shape, jnp.float32),
                jnp.zeros(tm0.shape, jnp.float32))
        bt, br, bu, bv = jax.lax.fori_loop(0, trip, group, init)
        t_out[0] = bt
        r_out[0] = br
        u_out[0] = bu
        v_out[0] = bv
    return kernel


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from surf_tpu.accel import pallas_wide as pw
    from surf_tpu.scene import builtin
    from surf_tpu.scene.compile import HostCompiled

    print("backend:", jax.default_backend(), flush=True)
    host = HostCompiled(builtin.make_indoor_scene())
    wt = pw.device_wide_trace(host._ws)
    n_rows = int(wt.anc.shape[0])
    cap8 = 256
    g = 16
    sub = 8
    E = int(wt.ltab.shape[0])

    rng = np.random.default_rng(0)
    o = rng.uniform(-4, 4, (g, sub, 128, 3)).astype(np.float32)
    d = rng.normal(size=(g, sub, 128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    lst = np.tile(np.arange(cap8 * 8, dtype=np.int32).reshape(
        1, cap8, 8) % n_rows, (g, 1, 1))
    args_v = (jnp.asarray(o[..., 0]), jnp.asarray(o[..., 1]),
              jnp.asarray(o[..., 2]), jnp.asarray(d[..., 0]),
              jnp.asarray(d[..., 1]), jnp.asarray(d[..., 2]),
              jnp.full((g, sub, 128), 1e30, jnp.float32))

    def build(variant, trip):
        kernel = make_kernel(variant, cap8)
        counts = np.full(g, trip, np.int32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(g,),
            in_specs=[pl.BlockSpec((1, sub, 128), lambda p, s: (p, 0, 0))
                      for _ in range(7)]
            + [pl.BlockSpec((1, cap8, 8), lambda p, s: (p, 0, 0)),
               pl.BlockSpec((E, 128), lambda p, s: (0, 0))],
            out_specs=[pl.BlockSpec((1, sub, 128), lambda p, s: (p, 0, 0))
                       for _ in range(4)],
        )
        out_shape = [
            jax.ShapeDtypeStruct((g, sub, 128), jnp.float32),
            jax.ShapeDtypeStruct((g, sub, 128), jnp.int32),
            jax.ShapeDtypeStruct((g, sub, 128), jnp.float32),
            jax.ShapeDtypeStruct((g, sub, 128), jnp.float32),
        ]

        @jax.jit
        def f(*a):
            return pl.pallas_call(
                kernel, grid_spec=grid_spec, out_shape=out_shape,
            )(jnp.asarray(counts), *a, jnp.asarray(lst), wt.ltab)
        jax.block_until_ready(f(*args_v))
        return f

    variants = ("full", "nodiv", "noext", "halftri")
    fns = {}
    for v in variants:
        fns[v] = (build(v, 32), build(v, cap8))
    res = {v: ([], []) for v in variants}
    for _ in range(5):
        for v in variants:
            fs, fb = fns[v]
            t0 = time.perf_counter()
            jax.block_until_ready(fs(*args_v))
            res[v][0].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            jax.block_until_ready(fb(*args_v))
            res[v][1].append(time.perf_counter() - t0)
    for v in variants:
        s, b = min(res[v][0]) * 1e3, min(res[v][1]) * 1e3
        per = (b - s) * 1e6 / (g * (cap8 - 32))
        print(f"{v:8s}: small {s:7.2f} ms  big {b:7.2f} ms  "
              f"slope {per:6.0f} ns/group ({per/8:5.1f} ns/row)", flush=True)


if __name__ == "__main__":
    main()
