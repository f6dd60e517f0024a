#!/usr/bin/env python
"""Device A/B: bitsr phase-2 loop unroll (uN rows per dynamic-trip
iteration).  Hypothesis: the ~700 ns/row cost of the exact-row-list
kernel is dominated by the data-dependent loop's per-ITERATION pipeline
drain (measured ~900 ns/iter for while-condition loops,
scripts/tpu_cond_micro.py), which bitsw/bitsi/bf16 washes could not cut
because they only reduced vector work.

Run: timeout 1800 python -u scripts/tpu_unroll_ab.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

SIZES = (32768, 131072)
ALGOS = ("bitsr", "bitsru2", "bitsru4", "bitsru8")


def main():
    import jax
    import jax.numpy as jnp

    from surf_tpu.accel import pallas_wide as pw
    from surf_tpu.scene import builtin
    from surf_tpu.scene.compile import HostCompiled

    print("backend:", jax.default_backend(), flush=True)
    host = HostCompiled(builtin.make_indoor_scene())
    wt = pw.device_wide_trace(host._ws)

    rng = np.random.default_rng(0)
    n = max(SIZES)
    o = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tm = np.full(n, 1e30, np.float32)

    fns = {}
    for algo in ALGOS:
        fns[algo] = jax.jit(
            lambda o_, d_, t_, a_, g=algo: pw.traverse_wide(
                wt, o_, d_, t_, a_, any_hit=False, algo=g,
                block_rays=2048))

    def run_once(f, args):
        t0 = time.perf_counter()
        r = f(*args)
        jax.tree.map(lambda x: np.asarray(x), r)
        return time.perf_counter() - t0

    ms = {k: {} for k in fns}
    ref = {}
    for sz in SIZES:
        targs = (jnp.asarray(o[:sz]), jnp.asarray(d[:sz]),
                 jnp.asarray(tm[:sz]), jnp.ones(sz, bool))
        # Rounds OUTSIDE, variants INSIDE (ADVICE r3): each variant's min
        # is drawn from interleaved rounds so the first-after-idle /
        # coherent-swing traps (CLAUDE.md) hit all variants equally.
        for f in fns.values():  # warm compile for every variant first
            run_once(f, targs)
        raw = {label: [] for label in fns}
        for _ in range(3):
            for label, f in fns.items():
                raw[label].append(run_once(f, targs))
        for label in fns:
            ms[label][sz] = min(raw[label]) * 1e3
            print(f"  {label} @ {sz}: {ms[label][sz]:9.2f} ms", flush=True)
        h0 = jax.tree.map(np.asarray, fns["bitsr"](*targs))
        for label in ALGOS[1:]:
            h = jax.tree.map(np.asarray, fns[label](*targs))
            same = np.array_equal(h.prim, h0.prim)
            tsame = np.array_equal(h.t, h0.t)
            print(f"  {label} parity: prim={same} t={tsame}", flush=True)

    for label in fns:
        lo, hi = ms[label][min(SIZES)], ms[label][max(SIZES)]
        if hi > lo:
            slope = (max(SIZES) - min(SIZES)) / ((hi - lo) / 1e3)
            print(f"{label} slope: {slope/1e6:.2f} M rays/s", flush=True)
    _ = ref


if __name__ == "__main__":
    main()
