#!/usr/bin/env python
"""End-to-end floor-math accounting at the bench shape (VERDICT r4 #2).

The round-4 floor claim ("single-chip traversal is at this design's
floor") rested on per-row micros + wave sweeps but nobody had published
the identity  frame_time = fixed + sum_over_waves(rows x cost)  with
every factor measured.  This script measures the missing factor — the
EXACT phase-2 row counts the production frame processes — plus the
matching wave-marginal times, at any shape (default the 512^2 bench
shape).

Part A (counts): monkeypatch integrator._dispatch_traverse to ALSO
compute the phase-1/1.5 exact-row list sizes in plain jnp (the same
slab-test + hierarchy-AND math as accel/pallas_wide._traverse_bits_padded
phase 1/1.5a, reusing its _packet_bits) and stream them to the host with
jax.debug.callback; then run the REAL render_frame_seeded at the bench
config so ladder, compaction, Morton order, NEE and spp chunking are all
exactly the production path.  Each traverse call site fires once per
executed wave; records carry (any_hit, per-packet row counts, live mask).

Part B (times): unpatched frame times vs wave_limit at the same shape,
spp-diffed ((t(spp_hi)-t(spp=1))/(spp_hi-1)) to cancel the ~24 ms tunnel
dispatch floor -> marginal-wave ms that the counted rows must explain.

Output: out_configs/row_account.json with
  totals: rows / u8-padded rows / trips / live packets / calls, split
          extend vs connect (any_hit), per spp-sample
  sites:  per-(tag, packets-in-call) aggregates (the ladder rungs show
          up as distinct packet counts)
  times:  wl -> per-sample ms

Run: timeout 5400 python -u scripts/tpu_row_account.py --size=512
Smoke (CPU): python -u scripts/tpu_row_account.py --cpu --size=32 \
             --scene=box --spp=1
"""
import argparse
import json
import sys
import time
import warnings

import numpy as np

warnings.filterwarnings("ignore")
sys.path.insert(0, ".")

RECORDS = []


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--spp", type=int, default=2,
                    help="samples for the counting pass")
    ap.add_argument("--scene", default="indoor", choices=["indoor", "box"])
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip-times", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        from surf_tpu.utils import force_cpu
        force_cpu(1)

    import jax
    import jax.numpy as jnp

    from surf_tpu.accel import pallas_wide as PW
    from surf_tpu.scene import builtin
    from surf_tpu.scene.camera import CameraParams
    from surf_tpu.scene.compile import HostCompiled
    from surf_tpu.wavefront import RenderConfig
    from surf_tpu.wavefront import integrator as I

    W = H = args.size
    print("backend:", jax.default_backend(), f"{W}x{H}@{args.spp}spp",
          flush=True)
    host = HostCompiled(builtin.make_indoor_scene() if args.scene == "indoor"
                        else builtin.make_diffuse_box_scene())
    scene = jax.device_put(host.render_scene)
    cam = (builtin.make_indoor_camera(W, H) if args.scene == "indoor"
           else builtin.make_box_camera(W, H))
    cp = CameraParams.from_camera(cam)

    def bench_cfg(spp, **kw):
        cfg = RenderConfig.for_scene(
            host.static, W, H, spp, use_defocus=True,
            use_pallas=not args.cpu,
        )._replace(max_bounces=None, compact=True, compact_every=4,
                   block_rays=2048, ladder=6, ladder_shrink=2,
                   pixel_order="morton", wave_limit=32)
        return cfg._replace(**kw)

    # ---- Part A: exact row counts through the production frame ----------
    def row_stats(box_lo, box_hi, L, origin, direction, t_max, active, G):
        """Phase-1 own-box bits + phase-1.5a hierarchy AND + exact-row
        counts, mirroring _traverse_bits_padded (pallas_wide.py:1598-1637)
        including the zero-direction nudge and dead-packet cond."""
        n = origin.shape[0]
        pad = (-n) % G
        g = (n + pad) // G
        direction = jnp.where(
            jnp.abs(direction) < 1e-20,
            jnp.where(direction < 0, jnp.float32(-1e-20),
                      jnp.float32(1e-20)), direction)

        def prep(x, fill=0.0):
            x = x.astype(jnp.float32)
            if pad:
                x = jnp.concatenate(
                    [x, jnp.full((pad,), fill, jnp.float32)])
            return x.reshape(g, G)

        ac = prep(active.astype(jnp.float32))
        tmf = jnp.where(ac != 0, prep(t_max), -PW._FAR)
        o3 = jnp.stack([prep(origin[:, c]) for c in range(3)])
        inv3 = jnp.float32(1.0) / jnp.stack(
            [prep(direction[:, c], 1.0) for c in range(3)])
        EB = box_lo.shape[1]

        def body(packed):
            o_p, i_p, t_p = packed
            return jax.lax.cond(
                jnp.any(t_p > -PW._FAR),
                lambda: PW._packet_bits(box_lo, box_hi, o_p, i_p, t_p, 1),
                lambda: jnp.zeros((EB,), bool))

        bits = jax.lax.map(
            body, (jnp.moveaxis(o3, 1, 0), jnp.moveaxis(inv3, 1, 0), tmf))
        sizes = [L]
        while sizes[-1] > 1:
            sizes.append(-(-sizes[-1] // 8))
        offs = np.concatenate([[0], np.cumsum(sizes)]).tolist()
        v = bits[:, offs[len(sizes) - 1]][:, None]
        for k in range(len(sizes) - 2, -1, -1):
            idx = offs[k] + jnp.arange(sizes[k], dtype=jnp.int32)
            v = bits[:, idx] & v[:, jnp.arange(sizes[k]) // 8]
        counts = v.sum(axis=1, dtype=jnp.int32)          # exact rows
        live = (tmf > -PW._FAR).any(axis=1)
        return counts, live

    def record(tag, counts, live):
        RECORDS.append((int(tag), np.asarray(counts).copy(),
                        np.asarray(live).copy()))

    orig_dispatch = I._dispatch_traverse
    ltab_rows = []

    def patched(cfg, trace, origin, direction, t_max, active, any_hit):
        if not ltab_rows:
            ltab_rows.append(int(trace.wide_ltab.shape[0]))
        counts, live = row_stats(
            trace.wide_box_lo, trace.wide_box_hi,
            int(trace.wide_anc.shape[0]),
            origin, direction, t_max, active, cfg.block_rays)
        jax.debug.callback(record, jnp.int32(1 if any_hit else 0),
                           counts, live)
        return orig_dispatch(cfg, trace, origin, direction, t_max, active,
                             any_hit)

    cfg_cnt = bench_cfg(args.spp, algo="bitsru8" if not args.cpu else "bits")
    I._dispatch_traverse = patched
    try:
        seed = I.initial_seeds(cfg_cnt, jnp.uint32(0))
        t0 = time.perf_counter()
        img, _ = I.render_frame_seeded(scene, cfg_cnt, cp, seed)
        jax.block_until_ready(img)
        print(f"counting frame done in {time.perf_counter()-t0:.1f}s "
              f"({len(RECORDS)} traverse executions)", flush=True)
    finally:
        I._dispatch_traverse = orig_dispatch

    UN = 8  # bitsru8 unroll: trips = ceil(rows/8), padded rows = 8*trips
    cap = min(PW.BITS_CAP_ROWS, ltab_rows[0])
    totals = {}
    sites = {}
    for tag, counts, live in RECORDS:
        rows = int(counts.sum())
        trips = int(np.ceil(counts / UN).sum())
        over = int((counts > cap).sum())
        key = "connect" if tag else "extend"
        t = totals.setdefault(key, dict(calls=0, rows=0, rows_u8=0,
                                        trips=0, packets=0,
                                        live_packets=0, overflow=0))
        t["calls"] += 1
        t["rows"] += rows
        t["rows_u8"] += trips * UN
        t["trips"] += trips
        t["packets"] += len(counts)
        t["live_packets"] += int(live.sum())
        t["overflow"] += over
        sk = f"{key}@g{len(counts)}"
        s = sites.setdefault(sk, dict(calls=0, rows=0, live_packets=0))
        s["calls"] += 1
        s["rows"] += rows
        s["live_packets"] += int(live.sum())

    print("\n-- per-sample row totals --")
    for k, t in totals.items():
        print(f"  {k}: calls {t['calls']/args.spp:.0f} "
              f"rows {t['rows']/args.spp:.0f} "
              f"u8rows {t['rows_u8']/args.spp:.0f} "
              f"trips {t['trips']/args.spp:.0f} "
              f"live_packets {t['live_packets']/args.spp:.0f} "
              f"overflow {t['overflow']}", flush=True)

    out = {"shape": f"{W}x{H}", "spp": args.spp, "cap_rows": cap,
           "totals": totals, "sites": sites}

    # ---- Part B: wave-marginal times (unpatched) -------------------------
    if not args.skip_times:
        from surf_tpu.wavefront.integrator import (initial_seeds,
                                                   render_frame_seeded)
        WLS = (0, 1, 2, 4, 8, 32)
        SPPS = (1, 3)
        fns = {}
        for wl in WLS:
            for spp in SPPS:
                cfg = bench_cfg(spp, wave_limit=wl)

                def frame(ts, cfg=cfg):
                    sd = initial_seeds(cfg, ts)
                    im, _ = render_frame_seeded(scene, cfg, cp, sd)
                    return im
                fns[f"wl{wl}@{spp}"] = frame
        for name, fn in fns.items():
            t0 = time.perf_counter()
            jax.block_until_ready(fn(jnp.uint32(0)))
            print(f"{name}: compiled+warm {time.perf_counter()-t0:.1f}s",
                  flush=True)
        times = {n: [] for n in fns}
        for rnd in range(4):
            for name, fn in fns.items():
                t0 = time.perf_counter()
                jax.block_until_ready(fn(jnp.uint32(rnd + 1)))
                times[name].append(time.perf_counter() - t0)
        best = {n: min(ts) * 1e3 for n, ts in times.items()}
        per_sample = {
            f"wl{wl}": (best[f"wl{wl}@3"] - best[f"wl{wl}@1"]) / 2.0
            for wl in WLS}
        print("\n-- per-sample ms by wave_limit (spp-diffed) --")
        for k, v in per_sample.items():
            print(f"  {k:6s} {v:9.2f}")
        out["times_raw_ms"] = best
        out["per_sample_ms"] = per_sample

    with open("out_configs/row_account.json", "w") as f:
        json.dump(out, f, indent=1)
    print("\nwrote out_configs/row_account.json", flush=True)


if __name__ == "__main__":
    main()
