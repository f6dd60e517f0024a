#!/usr/bin/env python
"""Decompose the Pallas MXU kernel cost (micro1 measured a pathological
~14 ms per grid step, ~independent of tile count).

Variants (all B=64, ntiles=16, R=256, 128 tris/tile):
  full     : dot + epilogue + merge (as micro1, static trips)
  dotonly  : dot + 1-op min merge
  epionly  : epilogue on a sublane-tiled pan (no dot)
  dotbf16  : dot with bf16 operands, f32 accum, + 1-op merge
  bigdot   : ONE [256,8]x[8,ntiles*768] dot + 1-op min (no tile loop)

Run: timeout 1800 python -u scripts/tpu_mxu_pallas_micro2.py
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

EPS = np.float32(1e-8)
R = 256
NT = 128
COLS = 6 * NT
NTILES = 16
B = 64


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    def epilogue(out, tmax, bt, bk, kt):
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
        return jnp.where(w, tc, bt), jnp.where(w, jnp.int32(kt), bk)

    def kernel(trips_ref, ray_ref, rows_ref, tm_ref, t_out, k_out,
               *, variant):
        del trips_ref
        lhs = ray_ref[0]                       # [R, 8]
        tmax = tm_ref[0]                       # [R, NT]
        bt = jnp.full((R, NT), np.inf, jnp.float32)
        bk = jnp.full((R, NT), -1, jnp.int32)
        if variant == "bigdot":
            pan = rows_ref[0].reshape(NTILES * 8, COLS)  # wrong math, timing only
            pan = pan[:8]
            out = jax.lax.dot_general(
                lhs, rows_ref[0].reshape(8, NTILES * COLS)
                if False else
                jnp.concatenate([rows_ref[0, kt] for kt in range(NTILES)],
                                axis=1),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [R, NTILES*COLS]
            for kt in range(NTILES):
                bt = jnp.minimum(bt, out[:, kt * COLS:kt * COLS + NT])
            _ = pan
        else:
            for kt in range(NTILES):
                pan = rows_ref[0, kt]          # [8, COLS]
                if variant == "epionly":
                    out = jnp.concatenate([pan] * (R // 8), axis=0)  # [R,COLS]
                    bt, bk = epilogue(out, tmax, bt, bk, kt)
                elif variant == "dotbf16":
                    out = jax.lax.dot_general(
                        lhs.astype(jnp.bfloat16), pan.astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    bt = jnp.minimum(bt, out[:, :NT])
                elif variant == "dotonly":
                    out = jax.lax.dot_general(
                        lhs, pan, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    bt = jnp.minimum(bt, out[:, :NT])
                else:  # full
                    out = jax.lax.dot_general(
                        lhs, pan, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    bt, bk = epilogue(out, tmax, bt, bk, kt)
        t_out[0] = bt
        k_out[0] = bk

    def make(variant):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, R, 8), lambda p, s: (p, 0, 0)),
                pl.BlockSpec((1, NTILES, 8, COLS),
                             lambda p, s: (p, 0, 0, 0)),
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
            functools.partial(kernel, variant=variant),
            grid_spec=grid_spec, out_shape=out_shape))

    trips = np.full(B, NTILES, np.int32)
    rays = rng.normal(size=(B, R, 8)).astype(np.float32)
    rows = rng.normal(size=(B, NTILES, 8, COLS)).astype(np.float32)
    tm = np.full((B, R, NT), 1e30, np.float32)
    args = (jnp.asarray(trips), jnp.asarray(rays), jnp.asarray(rows),
            jnp.asarray(tm))
    tests = B * NTILES * R * NT

    def run(f, label):
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

    fns = {}
    for variant in ("full", "dotonly", "epionly", "dotbf16", "bigdot"):
        try:
            fns[variant] = make(variant)
        except Exception as e:  # noqa: BLE001
            print(f"  {variant}: build failed: {e}", flush=True)
    ms = {}
    for rnd in range(3):
        for label, f in fns.items():
            try:
                m = run(f, f"[{rnd}] {label}")
            except Exception as e:  # noqa: BLE001
                print(f"  [{rnd}] {label}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
                fns[label] = None
                continue
            ms[label] = min(ms.get(label, 1e30), m)
        fns = {k: v for k, v in fns.items() if v is not None}
    print("---- min of rounds ----", flush=True)
    for label, m in ms.items():
        print(f"  {label}: {m:9.2f} ms ({m * 1e9 / tests:7.1f} ps/test)",
              flush=True)


if __name__ == "__main__":
    main()
