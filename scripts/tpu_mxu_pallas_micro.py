#!/usr/bin/env python
"""Pallas MXU phase-2 micro: in-kernel [256,8]x[8,768] dot + fused
epilogue + per-(ray,lane) running best, tile-per-iteration.

The XLA-level formulation measured 650-950 ps/test (tpu_mxu_micro.py —
unfused materialization); the current VPU kernel is ~36 ps/test
(tpu_unroll_ab.py, bitsru8).  This measures what a Pallas kernel with
the panel layout gets:
  lhs  rayfeat [R=256, 8]  (rays on sublanes — prebuilt in XLA)
  rhs  tile    [8, 6*128]  (coef-major blocks of 128 tris -> epilogue
                            slices are STATIC lane ranges)
  out  running best t + tile id per (ray, lane) [256, 128] — the final
       128-way lane reduce happens in XLA (lane->scalar relayouts are
       the forbidden primitive in-kernel).
Variants: trips static vs dynamic (drain check), f32 dot.

Run: timeout 1800 python -u scripts/tpu_mxu_pallas_micro.py
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

EPS = np.float32(1e-8)
R = 256
NT = 128  # tris per tile
COLS = 6 * NT


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    def kernel(trips_ref, ray_ref, rows_ref, tm_ref, t_out, k_out,
               *, ntiles, dyn):
        p = pl.program_id(0)
        lhs = ray_ref[0]                       # [R, 8]
        tmax = tm_ref[0]                       # [R, 128] (col-bcast host)
        init = (jnp.full((R, NT), np.inf, jnp.float32),
                jnp.full((R, NT), -1, jnp.int32))

        def tile(kt, c):
            bt, bk = c
            pan = rows_ref[0, kt]              # [8, 768]
            out = jax.lax.dot_general(
                lhs, pan, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [R, 768]
            den = out[:, 0 * NT:1 * NT]
            num = out[:, 1 * NT:2 * NT]
            b1 = out[:, 2 * NT:3 * NT]
            c1 = out[:, 3 * NT:4 * NT]
            b2 = out[:, 4 * NT:5 * NT]
            c2 = out[:, 5 * NT:6 * NT]
            t = num / den
            u = b1 + t * c1
            v = b2 + t * c2
            ok = ((jnp.abs(den) >= EPS)
                  & (u >= 0.0) & (u <= 1.0)
                  & (v >= 0.0) & (u + v <= 1.0)
                  & (t >= EPS) & (t < tmax))
            tc = jnp.where(ok, t, np.inf)
            w = tc < bt
            return jnp.where(w, tc, bt), jnp.where(w, kt, bk)

        if dyn:
            trip = jnp.minimum(trips_ref[p], jnp.int32(ntiles))
            bt, bk = jax.lax.fori_loop(0, trip, tile, init)
        else:
            bt, bk = init
            for kt in range(ntiles):
                bt, bk = tile(kt, (bt, bk))
        t_out[0] = bt
        k_out[0] = bk

    def make(B, ntiles, dyn):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, R, 8), lambda p, s: (p, 0, 0)),
                pl.BlockSpec((1, ntiles, 8, COLS), lambda p, s: (p, 0, 0, 0)),
                pl.BlockSpec((1, R, NT), lambda p, s: (p, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, R, NT), lambda p, s: (p, 0, 0)),
                pl.BlockSpec((1, R, NT), lambda p, s: (p, 0, 0)),
            ],
        )
        out_shape = [
            jax.ShapeDtypeStruct((B, R, NT), jnp.float32),
            jax.ShapeDtypeStruct((B, R, NT), jnp.int32),
        ]
        return jax.jit(pl.pallas_call(
            functools.partial(kernel, ntiles=ntiles, dyn=dyn),
            grid_spec=grid_spec, out_shape=out_shape))

    def run(f, args, label, tests):
        outs = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = f(*args)
            jax.tree.map(lambda x: np.asarray(x), r)
            outs.append(time.perf_counter() - t0)
        ms = min(outs) * 1e3
        print(f"  {label}: {ms:9.2f} ms  "
              f"({ms * 1e9 / tests:7.1f} ps/test)", flush=True)
        return ms

    cases = []
    for ntiles in (8, 16):
        for dyn in (False, True):
            B = 4096 // ntiles  # constant total tiles
            trips = np.full(B, ntiles, np.int32)
            rays = rng.normal(size=(B, R, 8)).astype(np.float32)
            rows = rng.normal(size=(B, ntiles, 8, COLS)).astype(np.float32)
            tm = np.full((B, R, NT), 1e30, np.float32)
            label = f"ntiles{ntiles} {'dyn' if dyn else 'static'} B{B}"
            cases.append((label, make(B, ntiles, dyn),
                          (jnp.asarray(trips), jnp.asarray(rays),
                           jnp.asarray(rows), jnp.asarray(tm)),
                          B * ntiles * R * NT))
    ms = {}
    for rnd in range(3):
        for label, f, args, tests in cases:
            m = run(f, args, f"[{rnd}] {label}", tests)
            ms[label] = min(ms.get(label, 1e30), m)
    print("---- min of rounds ----", flush=True)
    for label, f, args, tests in cases:
        print(f"  {label}: {ms[label]:9.2f} ms "
              f"({ms[label] * 1e9 / tests:7.1f} ps/test)", flush=True)


if __name__ == "__main__":
    main()
