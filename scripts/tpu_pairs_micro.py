#!/usr/bin/env python
"""Stage-cost breakdown of the algo="bitsp" per-ray pair traversal on the
real TPU (it measured 7x SLOWER than bitsr at frame level on first
device run — this locates the stage).

Stages (cumulative, each jitted separately, two-size slope protocol):
  visg : phase 1 per-ray bits + hierarchy AND + group any + counts
  glst : + per-ray group list (one-hot contraction)
  gath : + row gather [R, capg*8, 128]
  full : + MT + first-win argmin (the complete per-packet body)
  bitsp/bitsr : traverse_wide end-to-end for reference

Run: timeout 1800 python -u scripts/tpu_pairs_micro.py [capg]
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

    capg = int(sys.argv[1]) if len(sys.argv) > 1 else pw.PAIR_GROUPS
    print("backend:", jax.default_backend(), "capg:", capg, flush=True)
    host = HostCompiled(builtin.make_indoor_scene())
    wt = pw.device_wide_trace(host._ws)
    L = int(wt.anc.shape[0])
    sizes = [L]
    while sizes[-1] > 1:
        sizes.append(-(-sizes[-1] // 8))
    offs = np.concatenate([[0], np.cumsum(sizes)]).tolist()
    L1 = sizes[1]
    padL = L1 * 8 - L
    inert_group = int(wt.inert_row) // 8

    rng = np.random.default_rng(0)
    n = max(SIZES)
    o = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tm = np.full(n, 1e30, np.float32)

    jcap = jnp.arange(capg, dtype=jnp.int32)
    gids = jnp.arange(L1, dtype=jnp.int32)
    roff = jnp.arange(8, dtype=jnp.int32)

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
                hit = pw._ray_box_bits(wt.box_lo, wt.box_hi, o_p, i_p, t_p)
                v = hit[offs[len(sizes) - 1]][None, :]
                for k in range(len(sizes) - 2, -1, -1):
                    par = jnp.repeat(v, 8, axis=0)[: sizes[k]]
                    v = hit[offs[k]: offs[k] + sizes[k]] & par
                visL = jnp.pad(v, ((0, padL), (0, 0))) if padL else v
                visg = visL.reshape(L1, 8, R).any(axis=1).T
                cg = jnp.cumsum(visg.astype(jnp.int32), axis=1)
                counts_g = cg[:, -1]
                if stage == "visg":
                    return counts_g.sum()
                keyg = cg - 1
                oh = ((keyg[:, :, None] == jcap[None, None, :])
                      & visg[:, :, None])
                gl = jnp.sum(oh * gids[None, :, None], axis=1,
                             dtype=jnp.int32)
                gl = jnp.where(jcap[None, :] < counts_g[:, None], gl,
                               inert_group)
                if stage == "glst":
                    return gl.sum()
                rowids = (gl[:, :, None] * 8
                          + roff[None, None, :]).reshape(R, -1)
                rows = jnp.take(wt.ltab, rowids.reshape(-1),
                                axis=0).reshape(R, capg * 8, 8, 16)
                if stage == "gath":
                    return rows.sum()
                raise AssertionError

            out = jax.lax.map(
                body, (jnp.moveaxis(o3, 1, 0), jnp.moveaxis(inv3, 1, 0),
                       tmf))
            return out.sum()
        return f

    def prep(x, block=2048):
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

    fns = {s: stage_fn(s) for s in ("visg", "glst", "gath")}
    for algo in ("bitsp", "bitsr"):
        fns[algo] = jax.jit(
            lambda o_, d_, t_, a_, g=algo: pw.traverse_wide(
                wt, o_, d_, t_, a_, any_hit=False, algo=g,
                block_rays=2048, pair_groups=capg))

    # interleave stages across rounds (idle-ACK trap, CLAUDE.md)
    ms = {k: {} for k in fns}
    for sz in SIZES:
        sargs = tuple(
            prep(a[:sz]) for a in (o[:sz, 0], o[:sz, 1], o[:sz, 2],
                                   d[:sz, 0], d[:sz, 1], d[:sz, 2],
                                   tm[:sz], np.ones(sz, np.float32)))
        targs = (jnp.asarray(o[:sz]), jnp.asarray(d[:sz]),
                 jnp.asarray(tm[:sz]), jnp.ones(sz, bool))
        for label, f in fns.items():
            a = targs if label.startswith("bits") else sargs
            ms[label][sz] = run(f, a, sz, label)

    for label in fns:
        lo, hi = ms[label][min(SIZES)], ms[label][max(SIZES)]
        if hi > lo:
            slope = (max(SIZES) - min(SIZES)) / ((hi - lo) / 1e3)
            print(f"{label} slope: {slope/1e6:.2f} M rays/s", flush=True)


if __name__ == "__main__":
    main()
