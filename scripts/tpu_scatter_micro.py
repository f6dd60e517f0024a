#!/usr/bin/env python
"""Is the phase-1.5b scatter the hidden cost of every bits call?

bits-dead (all lanes inactive) measures ~490 ns/ray marginal — far above
p1+p15's ~90 ns/ray — and the only ungated O(g*L) op with a suspicious
cost model is `flat.at[dest].set(...)` (TPU scatter is near-serialized).
Times three formulations of "indices of set bits, first cap per packet":

  scatter     : cumsum key -> int32 scatter (current production code)
  searchsorted: cumsum -> vectorized binary search (12 gathers of [g,cap])
  none        : cumsum only (lower bound)

Protocol per tpu_cost_micro.py: idle device, host-read sync, slope
between two g sizes.  Run: timeout 1200 python -u scripts/tpu_scatter_micro.py
"""
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

L = 4105
CAP = 1536
SIZES = (32, 128)   # packets
ROUNDS = 5


def make(kind):
    @jax.jit
    def f(vis):
        g = vis.shape[0]
        cs = jnp.cumsum(vis, axis=1, dtype=jnp.int32)
        if kind == "none":
            return cs[:, -1].sum()
        if kind == "scatter":
            key = cs - 1
            pid = jnp.arange(g, dtype=jnp.int32)[:, None]
            dest = jnp.where(vis & (key < CAP), pid * CAP + key, g * CAP)
            flat = jnp.full((g * CAP,), L - 1, jnp.int32)
            flat = flat.at[dest.reshape(-1)].set(
                jnp.broadcast_to(
                    jnp.arange(L, dtype=jnp.int32)[None, :],
                    (g, L)).reshape(-1),
                mode="drop")
            return flat.reshape(g, CAP)
        if kind == "topk":
            # first-cap set-bit positions via top_k on descending position
            # keys: strictly decreasing in l, so order is preserved exactly.
            key = jnp.where(vis, -jnp.arange(L, dtype=jnp.int32)[None, :],
                            jnp.int32(-(1 << 30)))
            neg, _ = jax.lax.top_k(key, CAP)
            return jnp.where(neg > -(1 << 30), -neg, L - 1)
        if kind == "scatter8":
            # group-granularity (8 consecutive rows per entry): 8x fewer
            # scatter updates; the kernel would process whole groups.
            vg = vis.reshape(g, L // 8 if L % 8 == 0 else 0, 8).any(-1) \
                if L % 8 == 0 else vis[:, :L - L % 8].reshape(
                    g, L // 8, 8).any(-1)
            lg = vg.shape[1]
            cs8 = jnp.cumsum(vg, axis=1, dtype=jnp.int32)
            key = cs8 - 1
            cap8 = CAP // 8
            pid = jnp.arange(g, dtype=jnp.int32)[:, None]
            dest = jnp.where(vg & (key < cap8), pid * cap8 + key, g * cap8)
            flat = jnp.full((g * cap8,), lg - 1, jnp.int32)
            flat = flat.at[dest.reshape(-1)].set(
                jnp.broadcast_to(
                    jnp.arange(lg, dtype=jnp.int32)[None, :],
                    (g, lg)).reshape(-1),
                mode="drop")
            return flat.reshape(g, cap8)
        if kind == "searchsorted":
            # flat[p, j] = smallest l with cs[p, l] == j+1 and vis[p, l]
            q = jnp.arange(1, CAP + 1, dtype=jnp.int32)
            idx = jax.vmap(
                lambda c: jnp.searchsorted(c, q, side="left")
            )(cs)                                    # [g, CAP] in [0, L]
            idx = jnp.minimum(idx, L - 1)
            # slots beyond the count point at cs[L-1] < j+1 -> inert
            valid = jnp.take_along_axis(cs, idx, axis=1) == q[None, :]
            valid &= jnp.take_along_axis(vis, idx, axis=1)
            return jnp.where(valid, idx, L - 1)
        raise AssertionError

    return f


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    data = {}
    for g in SIZES:
        v = rng.random((g, L)) < 0.25   # ~1026 set bits per packet
        data[g] = jnp.asarray(v)
    fns = {k: make(k)
           for k in ("none", "scatter", "searchsorted", "topk", "scatter8")}
    # parity check
    a = np.asarray(fns["scatter"](data[SIZES[0]]))
    b = np.asarray(fns["searchsorted"](data[SIZES[0]]))
    print("parity scatter==searchsorted:", np.array_equal(a, b), flush=True)
    for k, f in fns.items():
        for g in SIZES:
            np.asarray(f(data[g]))  # compile
    times = {(k, g): [] for k in fns for g in SIZES}
    for _ in range(ROUNDS):
        for k, f in fns.items():
            for g in SIZES:
                t0 = time.perf_counter()
                np.asarray(f(data[g]))
                times[(k, g)].append(time.perf_counter() - t0)
    for k in fns:
        t1 = statistics.median(times[(k, SIZES[0])])
        t2 = statistics.median(times[(k, SIZES[1])])
        per_pkt = (t2 - t1) / (SIZES[1] - SIZES[0])
        print(f"{k:13s}: g={SIZES[0]}: {t1*1e3:7.2f} ms  g={SIZES[1]}: "
              f"{t2*1e3:7.2f} ms  slope {per_pkt*1e6:8.1f} us/packet",
              flush=True)


if __name__ == "__main__":
    main()
