#!/usr/bin/env python
"""Phase-cost breakdown of the algo="bits" traversal on the real TPU.

Times, with the honest two-size slope protocol (scripts/tpu_cost_micro.py
— host-read sync per call, idle-device instant-ACK trap avoided by
interleaving), each stage of _traverse_bits_padded on indoor-scene
bounce-like rays:

  p1    : phase 1 only (bits = own-box slab sweep per packet)
  p15   : phase 1 + 1.5 (bits -> visited -> compacted lists)
  full  : all three phases (incl. the Pallas list kernel)
  skip  : the walk kernel, for reference

Run under timeout:  timeout 1800 python -u scripts/tpu_bits_phases.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

SIZES = (32768, 131072)


def main():
    import jax
    import jax.numpy as jnp

    from surf_tpu.accel import pallas_wide as pw
    from surf_tpu.scene import builtin
    from surf_tpu.scene.compile import HostCompiled

    print("backend:", jax.default_backend(), flush=True)
    host = HostCompiled(builtin.make_indoor_scene())
    wt = pw.device_wide_trace(host._ws)
    E = int(wt.box_lo.shape[1])
    L = int(wt.anc.shape[0])
    print(f"leaf table: rows={L} boxes={E} maxd={int(wt.anc.shape[1])}",
          flush=True)

    rng = np.random.default_rng(0)
    n = max(SIZES)
    o = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tm = np.full(n, 1e30, np.float32)

    cap8 = -(-L // 8)

    def stage_fn(stage):
        @jax.jit
        def f(ox, oy, oz, dx, dy, dz, tmx, ac):
            g, sub, _ = ox.shape
            R = sub * 128
            tmf = jnp.where(ac != 0, tmx, -pw._FAR).reshape(g, R)
            o3 = jnp.stack([ox, oy, oz]).reshape(3, g, R)
            d3 = jnp.stack([dx, dy, dz]).reshape(3, g, R)
            inv3 = jnp.float32(1.0) / d3

            def body(args):
                o_p, i_p, t_p = args
                return pw._packet_bits(wt.box_lo, wt.box_hi, o_p, i_p, t_p)

            bits = jax.lax.map(
                body,
                (jnp.moveaxis(o3, 1, 0), jnp.moveaxis(inv3, 1, 0), tmf))
            if stage == "p1":
                return bits.sum()
            vis = bits[:, wt.anc[:, 0]]
            for k in range(1, wt.anc.shape[1]):
                vis = vis & bits[:, wt.anc[:, k]]
            counts = vis.sum(axis=1, dtype=jnp.int32)
            key = jnp.cumsum(vis, axis=1, dtype=jnp.int32) - 1
            cap = cap8 * 8
            pid = jnp.arange(g, dtype=jnp.int32)[:, None]
            dest = jnp.where(vis, pid * cap + key, g * cap)
            flat = jnp.full((g * cap,), int(wt.inert_row), jnp.int32)
            flat = flat.at[dest.reshape(-1)].set(
                jnp.broadcast_to(
                    jnp.arange(L, dtype=jnp.int32)[None, :],
                    (g, L)).reshape(-1), mode="drop")
            if stage == "p15":
                return counts.sum() + flat.sum()
            raise AssertionError
        return f

    def prep(x, block=1024):
        gg = len(x) // block
        return jnp.asarray(x.reshape(gg, block // 128, 128))

    def run(f, args, n_rays, label):
        outs = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = f(*args)
            jax.tree.map(
                lambda x: np.asarray(x) if hasattr(x, "shape") else x, r)
            outs.append(time.perf_counter() - t0)
        ms = min(outs) * 1e3
        print(f"  {label} @ {n_rays}: {ms:9.2f} ms", flush=True)
        return ms

    results = {}
    # visited-rows statistic (phase-2 work estimate)
    for label in ("p1", "p15"):
        f = stage_fn(label)
        ms = {}
        for sz in SIZES:
            args = tuple(
                prep(a[:sz]) for a in (o[:, 0], o[:, 1], o[:, 2],
                                       d[:, 0], d[:, 1], d[:, 2], tm,
                                       np.ones(sz, np.int32)))
            ms[sz] = run(f, args, sz, label)
        slope = (max(SIZES) - min(SIZES)) / (
            (ms[max(SIZES)] - ms[min(SIZES)]) / 1e3)
        print(f"  {label} slope: {slope/1e6:.2f} M rays/s", flush=True)
        results[label] = slope

    algos = ("bits", "skip")
    for a in sys.argv[1:]:
        if a.startswith("--algos="):
            algos = tuple(a.split("=", 1)[1].split(","))
    for algo in algos:
        f = jax.jit(lambda o_, d_, t_, a_, g=algo: pw.traverse_wide(
            wt, o_, d_, t_, a_, any_hit=False, algo=g))
        ms = {}
        for sz in SIZES:
            args = (jnp.asarray(o[:sz]), jnp.asarray(d[:sz]),
                    jnp.asarray(tm[:sz]), jnp.ones(sz, bool))
            ms[sz] = run(f, args, sz, algo)
        slope = (max(SIZES) - min(SIZES)) / (
            (ms[max(SIZES)] - ms[min(SIZES)]) / 1e3)
        print(f"  {algo} slope: {slope/1e6:.2f} M rays/s", flush=True)
        results[algo] = slope

    # dead-wave cost: a full-width call with EVERY lane inactive — what a
    # compacted tail wave pays per traversal (should be ~free; anything
    # else is ungated phase-1.5 work).
    f = jax.jit(lambda o_, d_, t_, a_: pw.traverse_wide(
        wt, o_, d_, t_, a_, any_hit=False, algo="bits"))
    ms = {}
    for sz in SIZES:
        args = (jnp.asarray(o[:sz]), jnp.asarray(d[:sz]),
                jnp.asarray(tm[:sz]), jnp.zeros(sz, bool))
        ms[sz] = run(f, args, sz, "bits-dead")
    slope = (max(SIZES) - min(SIZES)) / (
        (ms[max(SIZES)] - ms[min(SIZES)]) / 1e3)
    print(f"  bits-dead slope: {slope/1e6:.2f} M rays/s", flush=True)
    print("done", results, flush=True)


if __name__ == "__main__":
    main()
