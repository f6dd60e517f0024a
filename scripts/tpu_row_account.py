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
phase 1/1.5a, reusing its _packet_bits).  The axon tunnel rejects
jax.debug.callback (UNIMPLEMENTED host send/recv), so the counts leave
the device as ARRAYS: the script drives its own lax.scan over 32 waves
of the production bounce_step (morton lanes, ce4 compaction, plain
ladder=0 path) and the patched dispatcher's count tracers are stacked
into per-wave [waves, packets] outputs.  Bit-equivalent ray populations
to the production plain path; the ladder's frame-level factor is
measured separately in Part B.

Part B (times): unpatched frame times vs wave_limit at the same shape,
ladder6 (bench) AND ladder0 (the counted path), spp-diffed
((t(spp_hi)-t(spp=1))/(spp_hi-1)) to cancel the ~25-35 ms tunnel
dispatch floor -> marginal-wave ms that the counted rows must explain.

Output: out_configs/row_account.json with per-wave extend/connect row
sums, alive-lane counts, live packets, and wl->per-sample ms for both
ladder settings.

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

    from surf_tpu.wavefront.integrator import (PathState, bounce_step,
                                               compact_paths,
                                               lane_pixel_perm,
                                               ray_generation,
                                               view_plane_jnp)

    orig_dispatch = I._dispatch_traverse
    COLLECT = []  # (tag, counts-tracer, live-tracer) during trace

    def patched(cfg, trace, origin, direction, t_max, active, any_hit):
        counts, live = row_stats(
            trace.wide_box_lo, trace.wide_box_hi,
            int(trace.wide_anc.shape[0]),
            origin, direction, t_max, active, cfg.block_rays)
        COLLECT.append((1 if any_hit else 0, counts, live))
        return orig_dispatch(cfg, trace, origin, direction, t_max, active,
                             any_hit)

    # Plain path (ladder=0): same lanes/compaction/morton as production;
    # the ladder only changes dispatch widths, measured in Part B.
    cfg_cnt = bench_cfg(1, algo="bitsru8" if not args.cpu else "bits",
                        ladder=0)
    WAVES = 32
    vp = view_plane_jnp(cp, W, H)
    n = W * H
    perm = lane_pixel_perm(cfg_cnt)
    lane_pixel = (jnp.arange(n, dtype=jnp.uint32) if perm is None
                  else perm.astype(jnp.uint32))
    px = (lane_pixel % jnp.uint32(W)).astype(jnp.int32)
    py = (lane_pixel // jnp.uint32(W)).astype(jnp.int32)

    def count_sample(seed_pix):
        seed_lane = seed_pix if perm is None else jnp.take(seed_pix, perm)
        seed, origin, direction = ray_generation(cfg_cnt, vp, seed_lane,
                                                 px, py)
        st = PathState(
            origin=origin, direction=direction, seed=seed,
            transmission=jnp.ones((n, 3), jnp.float32),
            energy=jnp.zeros((n, 3), jnp.float32),
            last_specular=jnp.ones(n, bool),
            in_medium=jnp.zeros(n, bool), alive=jnp.ones(n, bool),
            pixel=(jnp.arange(n, dtype=jnp.int32) if perm is None
                   else perm))

        def wave(st, i):
            if cfg_cnt.compact:
                st = jax.lax.cond(i % cfg_cnt.compact_every == 0,
                                  compact_paths, lambda x: x, st)
            alive = jnp.sum(st.alive.astype(jnp.int32))
            COLLECT.clear()
            st2 = bounce_step(scene, cfg_cnt, st)
            ext = [c for t, c, _ in COLLECT if t == 0][0]
            liv = [lv for t, _, lv in COLLECT if t == 0][0]
            con = [c for t, c, _ in COLLECT if t == 1]
            con = con[0] if con else jnp.zeros_like(ext)
            return st2, (ext, con, liv, alive)

        st, (ext, con, liv, alive) = jax.lax.scan(
            wave, st, jnp.arange(WAVES))
        # seeds back to pixel order for chaining the next sample
        if cfg_cnt.compact or perm is not None:
            n_ = st.pixel.shape[0]
            order = jnp.zeros(n_, jnp.int32).at[st.pixel].set(
                jnp.arange(n_, dtype=jnp.int32), unique_indices=True)
            seed_out = jnp.take(st.seed, order)
        else:
            seed_out = st.seed
        return ext, con, liv, alive, seed_out

    I._dispatch_traverse = patched
    count_jit = jax.jit(count_sample)
    seed = I.initial_seeds(cfg_cnt, jnp.uint32(0))
    ext_all, con_all, liv_all, alive_all = [], [], [], []
    t0 = time.perf_counter()
    for s_i in range(args.spp):
        ext, con, liv, alive, seed = count_jit(seed)
        ext_all.append(np.asarray(ext))        # [waves, packets]
        con_all.append(np.asarray(con))
        liv_all.append(np.asarray(liv))
        alive_all.append(np.asarray(alive))
    I._dispatch_traverse = orig_dispatch
    print(f"counting pass done in {time.perf_counter()-t0:.1f}s", flush=True)

    UN = 8  # bitsru8 unroll: trips = ceil(rows/8), padded rows = 8*trips
    ext = np.stack(ext_all)                    # [spp, waves, packets]
    con = np.stack(con_all)
    liv = np.stack(liv_all)
    alive = np.stack(alive_all)                # [spp, waves]
    cap = PW.BITS_CAP_ROWS

    def agg(c):
        return dict(
            rows=int(c.sum()),
            rows_u8=int((np.ceil(c / UN) * UN).sum()),
            trips=int(np.ceil(c / UN).sum()),
            overflow=int((c > cap).sum()),
            per_wave_rows=[int(x) for x in c.sum(axis=(0, 2)) / args.spp],
        )

    totals = {"extend": agg(ext), "connect": agg(con)}
    print("\n-- per-sample row totals (plain path, ladder=0) --")
    for k, t in totals.items():
        print(f"  {k}: rows {t['rows']/args.spp:.0f} "
              f"u8rows {t['rows_u8']/args.spp:.0f} "
              f"trips {t['trips']/args.spp:.0f} overflow {t['overflow']}",
              flush=True)
    print("  per-wave extend rows:", totals["extend"]["per_wave_rows"])
    print("  per-wave connect rows:", totals["connect"]["per_wave_rows"])
    print("  per-wave alive lanes:",
          [int(x) for x in alive.mean(axis=0)], flush=True)

    out = {"shape": f"{W}x{H}", "spp": args.spp, "cap_rows": cap,
           "waves": WAVES, "packets": int(ext.shape[2]),
           "totals": totals,
           "per_wave_alive": [float(x) for x in alive.mean(axis=0)],
           "per_wave_live_packets": [float(x) for x in
                                     liv.sum(axis=2).mean(axis=0)]}

    # ---- Part B: wave-marginal times (unpatched) -------------------------
    if not args.skip_times:
        from surf_tpu.wavefront.integrator import (initial_seeds,
                                                   render_frame_seeded)
        # ladder0 curve = the counted (plain) path; ladder6 wl32 = bench.
        VARIANTS = ([("lad0", dict(ladder=0, wave_limit=wl))
                     for wl in (1, 2, 4, 8, 32)]
                    + [("lad6", dict(wave_limit=32))])
        SPPS = (1, 3)
        fns = {}
        for lname, kw in VARIANTS:
            for spp in SPPS:
                cfg = bench_cfg(spp, **kw)

                def frame(ts, cfg=cfg):
                    sd = initial_seeds(cfg, ts)
                    im, _ = render_frame_seeded(scene, cfg, cp, sd)
                    return im
                fns[f"{lname}_wl{kw['wave_limit']}@{spp}"] = frame
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
            f"{ln}_wl{kw['wave_limit']}":
            (best[f"{ln}_wl{kw['wave_limit']}@3"]
             - best[f"{ln}_wl{kw['wave_limit']}@1"]) / 2.0
            for ln, kw in VARIANTS}
        print("\n-- per-sample ms by variant (spp-diffed) --")
        for k, v in per_sample.items():
            print(f"  {k:12s} {v:9.2f}")
        out["times_raw_ms"] = best
        out["per_sample_ms"] = per_sample

    with open("out_configs/row_account.json", "w") as f:
        json.dump(out, f, indent=1)
    print("\nwrote out_configs/row_account.json", flush=True)


if __name__ == "__main__":
    main()
