#!/usr/bin/env python
"""Per-sample FIXED-block decomposition (VERDICT r4 item 1).

Round-4 established that at 256^2@1spp roughly a third of the frame is
not marginal traversal (tpu_wl_sweep: wl=1 52.6 ms vs ~17-20 ms marginal
wave), but nobody split that block below the wave level.  This harness
ablates one stage at a time and reports a ms-level attribution table:

  raygen         jitted ray_generation alone (RNG + AA jitter + rejection
                 -sampled defocus disk)
  extend0        primary closest-hit traversal alone on raygen output
  wl0_nolad      wave_limit=0, ladder=0: raygen + frame scaffolding
                 (pixel-order restore scatter, spp fori, accumulate)
  wl0            wave_limit=0, bench ladder: + ladder scaffolding (per-rung
                 compact_paths + banked retirement scatters) paid even with
                 zero waves
  wl1_nolad      + wave 0 (compact + extend + shade + NEE + connect)
  wl1_nolad_nonee  wave 0 with num_lights=0 (no NEE sampling, no connect
                 traversal) -> isolates the connect share of wave 0
  wl2_nolad      + wave 1 (marginal full-occupancy wave, no ladder)
  full           bench config (wl=32, ladder) for reference

Derived lines printed at the end:
  frame scaffolding   = wl0_nolad - raygen
  ladder scaffolding  = wl0 - wl0_nolad
  wave0 total         = wl1_nolad - wl0_nolad
  wave0 connect+NEE   = wl1_nolad - wl1_nolad_nonee
  wave0 extend+shade  = wl1_nolad_nonee - wl0_nolad
  marginal wave       = wl2_nolad - wl1_nolad

Timing protocol: every config warmed, then rounds INTERLEAVED (the
first-measured-after-idle kernel reads ~100x fast on the axon tunnel);
min over rounds, absolute values only compared within this run.

Run: timeout 3600 python -u scripts/tpu_fixed_profile.py
"""
import argparse
import json
import sys
import time
import warnings

warnings.filterwarnings("ignore")
sys.path.insert(0, ".")

ROUNDS = 5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--scene", default="indoor", choices=["indoor", "box"])
    ap.add_argument("--cpu", action="store_true",
                    help="smoke-test on CPU (interpret-mode Pallas)")
    args = ap.parse_args()
    if args.cpu:
        from surf_tpu.utils import force_cpu
        force_cpu(1)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from surf_tpu.scene import builtin
    from surf_tpu.scene.camera import CameraParams, view_plane_jnp
    from surf_tpu.scene.compile import HostCompiled
    from surf_tpu.wavefront import RenderConfig
    from surf_tpu.wavefront.integrator import (
        initial_seeds, lane_pixel_perm, ray_generation, render_frame_seeded,
        _dispatch_traverse)

    W = H = args.size
    print("backend:", jax.default_backend(), f"{W}x{H} 1spp", flush=True)
    host = HostCompiled(builtin.make_indoor_scene() if args.scene == "indoor"
                        else builtin.make_diffuse_box_scene())
    scene = jax.device_put(host.render_scene)
    cp = CameraParams.from_camera(builtin.make_indoor_camera(W, H))

    def base_cfg(**kw):
        cfg = RenderConfig.for_scene(
            host.static, W, H, 1, use_defocus=True,
            use_pallas=not args.cpu,
        )._replace(max_bounces=None, compact=True, compact_every=4,
                   block_rays=2048, ladder=6, ladder_shrink=2,
                   pixel_order="morton", wave_limit=32)
        return cfg._replace(**kw)

    cfgs = {
        "full": base_cfg(),
        "wl0": base_cfg(wave_limit=0),
        "wl0_nolad": base_cfg(wave_limit=0, ladder=0),
        "wl1_nolad": base_cfg(wave_limit=1, ladder=0),
        "wl1_nolad_nonee": base_cfg(wave_limit=1, ladder=0, num_lights=0),
        "wl2_nolad": base_cfg(wave_limit=2, ladder=0),
    }

    fns = {}
    for name, cfg in cfgs.items():
        def frame(total_samples, cfg=cfg):
            seed = initial_seeds(cfg, total_samples)
            img, _ = render_frame_seeded(scene, cfg, cp, seed)
            return img
        fns[name] = frame

    # raygen alone (jitted separately; includes the morton lane gather of
    # the seed stream exactly as render_sample pays it)
    cfg0 = cfgs["full"]
    vp = view_plane_jnp(cp, W, H)
    perm = lane_pixel_perm(cfg0)
    px = (perm % W).astype(jnp.int32)
    py = (perm // W).astype(jnp.int32)

    @jax.jit
    def rg(total_samples):
        seed = initial_seeds(cfg0, total_samples)
        seed_lane = jnp.take(seed, perm)
        return ray_generation(cfg0, vp, seed_lane, px, py)

    fns["raygen"] = rg

    # primary extend alone: raygen output (regenerated in-jit so the whole
    # thing is one dispatch) -> closest-hit traversal
    @jax.jit
    def ext(total_samples):
        seed = initial_seeds(cfg0, total_samples)
        seed_lane = jnp.take(seed, perm)
        s2, o, d = ray_generation(cfg0, vp, seed_lane, px, py)
        n = o.shape[0]
        hit = _dispatch_traverse(
            cfg0, scene.trace, o, d,
            jnp.full(n, np.float32(1e30)), jnp.ones(n, bool),
            any_hit=False)
        return hit.t, hit.prim

    fns["raygen_extend0"] = ext

    order = list(fns)
    for name in order:
        t0 = time.perf_counter()
        jax.block_until_ready(fns[name](jnp.uint32(0)))
        print(f"{name}: compiled+warm {time.perf_counter()-t0:.1f}s",
              flush=True)

    times = {n: [] for n in order}
    for rnd in range(ROUNDS):
        for name in order:
            t0 = time.perf_counter()
            out = jax.block_until_ready(fns[name](jnp.uint32(rnd + 1)))
            times[name].append(time.perf_counter() - t0)
        if rnd == 0:
            for name in ("full", "wl1_nolad"):
                e = float(np.asarray(fns[name](jnp.uint32(1))).sum())
                print(f"  {name}: energy {e:.1f}", flush=True)

    best = {n: min(ts) * 1e3 for n, ts in times.items()}
    print("\n-- raw (min of %d interleaved rounds, ms) --" % ROUNDS)
    for n in order:
        print(f"  {n:18s} {best[n]:8.2f}")

    d = {}
    d["raygen"] = best["raygen"]
    d["extend0_incl_raygen"] = best["raygen_extend0"]
    d["frame_scaffolding"] = best["wl0_nolad"] - best["raygen"]
    d["ladder_scaffolding"] = best["wl0"] - best["wl0_nolad"]
    d["wave0_total"] = best["wl1_nolad"] - best["wl0_nolad"]
    d["wave0_connect_nee"] = best["wl1_nolad"] - best["wl1_nolad_nonee"]
    d["wave0_extend_shade"] = best["wl1_nolad_nonee"] - best["wl0_nolad"]
    d["marginal_wave"] = best["wl2_nolad"] - best["wl1_nolad"]
    d["full_frame"] = best["full"]
    print("\n-- attribution (ms) --")
    for k, v in d.items():
        print(f"  {k:20s} {v:8.2f}")
    with open("out_configs/fixed_profile.json", "w") as f:
        json.dump({"raw_ms": best, "attrib_ms": d,
                   "shape": f"{W}x{H}@1spp", "rounds": ROUNDS}, f, indent=1)
    print("\nwrote out_configs/fixed_profile.json", flush=True)


if __name__ == "__main__":
    main()
