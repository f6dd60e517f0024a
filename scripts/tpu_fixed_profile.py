#!/usr/bin/env python
"""Per-sample FIXED-block decomposition, v2 (VERDICT r4 item 1).

v1 measured absolute one-shot jits and was tunnel-floor-contaminated:
the remote-TPU dispatch latency (~20-25 ms per block_until_ready) rode
on every small measurement (raygen-only read 23.8 ms — the floor, not
the op).  v2 uses DIFFS that cancel the floor:

  per-sample cost of a stage = (t(spp=5, cfg) - t(spp=1, cfg)) / 4
  within-sample structure    = t(wl=k) - t(wl=k-1)  (same dispatch shape)

Stages ablated (256^2, indoor, bench config base):
  null            trivial jit -> the dispatch floor itself (reported)
  full            bench config (wl=32, ladder6/2, morton, ce4)
  wl0             wave_limit=0 (raygen + ladder scaffolding + restore)
  wl0_nolad       wave_limit=0, ladder=0 (raygen + restore only)
  wl0_nolad_nodf  + use_defocus=False (no defocus-disk rejection loop)
  wl1_nolad       + wave 0
  wl1_nolad_nonee wave 0 without NEE/connect
  wl2_nolad       + wave 1 (marginal full-occupancy wave)

Derived per-sample table (all spp-diffs, tunnel-free):
  raygen+restore      = d(wl0_nolad)
  defocus rejection   = d(wl0_nolad) - d(wl0_nolad_nodf)
  ladder scaffolding  = d(wl0) - d(wl0_nolad)
  wave0 total         = d(wl1_nolad) - d(wl0_nolad)
  wave0 connect+NEE   = d(wl1_nolad) - d(wl1_nolad_nonee)
  marginal wave       = d(wl2_nolad) - d(wl1_nolad)
  per-sample total    = d(full)

Timing: every config warmed at both spp, rounds interleaved (the
first-after-idle ~100x artifact), min over rounds, diffs within one run.

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
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        from surf_tpu.utils import force_cpu
        force_cpu(1)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from surf_tpu.scene import builtin
    from surf_tpu.scene.camera import CameraParams
    from surf_tpu.scene.compile import HostCompiled
    from surf_tpu.wavefront import RenderConfig
    from surf_tpu.wavefront.integrator import (initial_seeds,
                                               render_frame_seeded)

    W = H = args.size
    print("backend:", jax.default_backend(), f"{W}x{H}", flush=True)
    host = HostCompiled(builtin.make_indoor_scene() if args.scene == "indoor"
                        else builtin.make_diffuse_box_scene())
    scene = jax.device_put(host.render_scene)
    cp = CameraParams.from_camera(builtin.make_indoor_camera(W, H))

    def base_cfg(spp, **kw):
        cfg = RenderConfig.for_scene(
            host.static, W, H, spp, use_defocus=True,
            use_pallas=not args.cpu,
        )._replace(max_bounces=None, compact=True, compact_every=4,
                   block_rays=2048, ladder=6, ladder_shrink=2,
                   pixel_order="morton", wave_limit=32)
        return cfg._replace(**kw)

    variants = {
        "full": {},
        "wl0": dict(wave_limit=0),
        "wl0_nolad": dict(wave_limit=0, ladder=0),
        "wl0_nolad_nodf": dict(wave_limit=0, ladder=0, use_defocus=False),
        "wl1_nolad": dict(wave_limit=1, ladder=0),
        "wl1_nolad_nonee": dict(wave_limit=1, ladder=0, num_lights=0),
        "wl2_nolad": dict(wave_limit=2, ladder=0),
    }

    fns = {}
    for name, kw in variants.items():
        for spp in (1, 5):
            cfg = base_cfg(spp, **kw)

            def frame(total_samples, cfg=cfg):
                seed = initial_seeds(cfg, total_samples)
                img, _ = render_frame_seeded(scene, cfg, cp, seed)
                return img
            fns[f"{name}@{spp}"] = frame

    zeros = jnp.zeros(W * H, jnp.uint32)

    @jax.jit
    def null(total_samples):
        return zeros + total_samples

    fns["null"] = null

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
            jax.block_until_ready(fns[name](jnp.uint32(rnd + 1)))
            times[name].append(time.perf_counter() - t0)
    best = {n: min(ts) * 1e3 for n, ts in times.items()}

    print("\n-- raw (min of %d interleaved rounds, ms) --" % ROUNDS)
    for n in order:
        print(f"  {n:20s} {best[n]:8.2f}")

    def d(name):  # tunnel-free per-sample cost of a variant
        # spp 1 vs 5: the 4-sample diff /4 averages the ~+-5 ms floor
        # jitter down 4x (1-vs-2 diffs measured negative on small configs)
        return (best[f"{name}@5"] - best[f"{name}@1"]) / 4.0

    a = {}
    a["dispatch_floor(null)"] = best["null"]
    a["raygen_restore"] = d("wl0_nolad")
    a["defocus_rejection"] = d("wl0_nolad") - d("wl0_nolad_nodf")
    a["ladder_scaffolding"] = d("wl0") - d("wl0_nolad")
    a["wave0_total"] = d("wl1_nolad") - d("wl0_nolad")
    a["wave0_connect_nee"] = d("wl1_nolad") - d("wl1_nolad_nonee")
    a["marginal_wave"] = d("wl2_nolad") - d("wl1_nolad")
    a["per_sample_total"] = d("full")
    a["frame_wl32_spp1"] = best["full@1"]
    print("\n-- per-sample attribution (spp-diffs, ms) --")
    for k, v in a.items():
        print(f"  {k:22s} {v:8.2f}")
    with open("out_configs/fixed_profile.json", "w") as f:
        json.dump({"raw_ms": best, "per_sample_ms": a,
                   "shape": f"{W}x{H}", "rounds": ROUNDS}, f, indent=1)
    print("\nwrote out_configs/fixed_profile.json", flush=True)


if __name__ == "__main__":
    main()
