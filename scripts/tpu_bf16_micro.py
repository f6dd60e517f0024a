#!/usr/bin/env python
"""Is the algo="bits" phase-1 dense slab sweep faster in bf16?

Phase 1 tests every row's own AABB against a ray packet: an [E, R] dense
VPU job (~27 vector ops per element).  If v5e's VPU retires bf16 at 2x
f32 (unverified, CLAUDE.md "bf16 slab tests"), a conservatively-dilated
bf16 sweep halves phase-1 cost; phase 2 (exact f32 MT) already cleans up
false positives, and box dilation (lo rounded down, hi rounded up) means
no false negatives — same contract as the existing conservative t bounds.

Protocol per scripts/tpu_cost_micro.py: idle device, sequential, host-read
sync, cost = slope between two E sizes (per-call RPC overhead ~25-80 ms).

Run: timeout 1800 python -u scripts/tpu_bf16_micro.py
"""
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

R = 2048
SIZES = (8192, 65536)
ROUNDS = 5


def make(dtype):
    @jax.jit
    def f(box_lo, box_hi, o3, inv3, tm):
        tmin = None
        tmax_ = None
        for c in range(3):
            tn = (box_lo[c][:, None] - o3[c][None, :]) * inv3[c][None, :]
            tf = (box_hi[c][:, None] - o3[c][None, :]) * inv3[c][None, :]
            lo_c = jnp.minimum(tn, tf)
            hi_c = jnp.maximum(tn, tf)
            tmin = lo_c if tmin is None else jnp.maximum(tmin, lo_c)
            tmax_ = hi_c if tmax_ is None else jnp.minimum(tmax_, hi_c)
        hit = (tmax_ >= tmin) & (tmin < tm[None, :]) & (tmax_ > 0.0)
        return jnp.any(hit, axis=1)

    def args(E):
        rng = np.random.default_rng(E)
        lo = rng.uniform(-4, 0, (3, E)).astype(np.float32)
        hi = lo + rng.uniform(0.1, 4, (3, E)).astype(np.float32)
        o = rng.uniform(-4, 4, (3, R)).astype(np.float32)
        d = rng.normal(size=(3, R)).astype(np.float32)
        d /= np.linalg.norm(d, axis=0, keepdims=True)
        t = np.full(R, 1e30, np.float32)
        c = lambda x: jnp.asarray(x, dtype)
        return c(lo), c(hi), c(o), c(1.0 / d), c(t)

    return f, args


def main():
    print("backend:", jax.default_backend(), flush=True)
    variants = {
        "f32": make(jnp.float32),
        "bf16": make(jnp.bfloat16),
    }
    data = {
        (name, E): (f, args(E))
        for name, (f, args) in variants.items() for E in SIZES
    }
    # warmup/compile
    for (name, E), (f, a) in data.items():
        np.asarray(f(*a))

    times = {k: [] for k in data}
    for rnd in range(ROUNDS):
        for k, (f, a) in data.items():
            t0 = time.perf_counter()
            out = np.asarray(f(*a))
            dt = time.perf_counter() - t0
            times[k].append(dt)
    for name in variants:
        t1 = statistics.median(times[(name, SIZES[0])])
        t2 = statistics.median(times[(name, SIZES[1])])
        slope = (t2 - t1) / ((SIZES[1] - SIZES[0]) * R)
        print(f"{name}: {SIZES[0]}: {t1*1e3:7.2f} ms  {SIZES[1]}: "
              f"{t2*1e3:7.2f} ms  slope {slope*1e12:7.2f} ps/elem "
              f"(~{(SIZES[1]-SIZES[0])*R/(t2-t1)/1e9:.1f} Gelem/s)",
              flush=True)


if __name__ == "__main__":
    main()
