#!/usr/bin/env python
"""MXU phase-2, round 4: XLA tile-major dot + RUNNING-select epilogue
(no concat / argmin / take_along_axis — those may be what pushed micro3
to 580 ps/test).  Also a no-map variant (one flat batched einsum) to
check whether scan bodies block fusion.

Run: timeout 1800 python -u scripts/tpu_mxu_micro4.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

EPS = np.float32(1e-8)
NT = 128
COLS = 6 * NT
NTT = 16


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    def epilogue_running(out, tm_p, R):
        bt = jnp.full((R, NT), np.inf, jnp.float32)
        bk = jnp.full((R, NT), -1, jnp.int32)
        for kt in range(NTT):
            o = out[:, kt * COLS:(kt + 1) * COLS]
            den = o[:, 0 * NT:1 * NT]
            num = o[:, 1 * NT:2 * NT]
            b1 = o[:, 2 * NT:3 * NT]
            c1 = o[:, 3 * NT:4 * NT]
            b2 = o[:, 4 * NT:5 * NT]
            c2 = o[:, 5 * NT:6 * NT]
            t = num / den
            u = b1 + t * c1
            v = b2 + t * c2
            ok = ((jnp.abs(den) >= EPS)
                  & (u >= 0.0) & (u <= 1.0)
                  & (v >= 0.0) & (u + v <= 1.0)
                  & (t >= EPS) & (t < tm_p[:, None]))
            tc = jnp.where(ok, t, np.inf)
            w = tc < bt
            bt = jnp.where(w, tc, bt)
            bk = jnp.where(w, jnp.int32(kt), bk)
        return bt, bk

    def make_map(B, R):
        @jax.jit
        def f(rays, rhs, tmax):
            def body(args):
                ray_p, rhs_p, tm_p = args
                out = jax.lax.dot_general(
                    ray_p, rhs_p, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
                return epilogue_running(out, tm_p, R)
            return jax.lax.map(body, (rays, rhs, tmax))
        return f

    def make_flat(B, R):
        @jax.jit
        def f(rays, rhs, tmax):
            out = jax.lax.dot_general(
                rays, rhs, (((2,), (1,)), ((0,), (0,))),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)  # [B, R, NTT*COLS]
            o2 = out.reshape(B * R, NTT * COLS)
            bt, bk = epilogue_running(o2, tmax.reshape(B * R), B * R)
            return bt.reshape(B, R, NT), bk.reshape(B, R, NT)
        return f

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
    for label, mk, R, B in (("map R256", make_map, 256, 256),
                            ("map R2048", make_map, 2048, 32),
                            ("flat R256", make_flat, 256, 64),
                            ("flat R2048", make_flat, 2048, 8)):
        rays = rng.normal(size=(B, R, 8)).astype(np.float32)
        rhs = rng.normal(size=(B, 8, NTT * COLS)).astype(np.float32)
        tmax = np.full((B, R), 1e30, np.float32)
        cases.append((label, mk(B, R),
                      (jnp.asarray(rays), jnp.asarray(rhs),
                       jnp.asarray(tmax)), B * R * NTT * NT))

    ms = {}
    for rnd in range(3):
        for label, f, args, tests in cases:
            try:
                m = run(f, args, f"[{rnd}] {label}", tests)
            except Exception as e:  # noqa: BLE001
                print(f"  [{rnd}] {label}: FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)
                continue
            ms[label] = min(ms.get(label, 1e30), m)
    print("---- min of rounds ----", flush=True)
    for label, f, args, tests in cases:
        if label in ms:
            print(f"  {label}: {ms[label]:9.2f} ms "
                  f"({ms[label] * 1e9 / tests:7.1f} ps/test)", flush=True)


if __name__ == "__main__":
    main()
