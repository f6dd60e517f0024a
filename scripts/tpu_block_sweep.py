#!/usr/bin/env python
"""Block-size sweep at the bench shape + per-wave overhead isolation.

The round-5 floor fit (out_configs/row_account.json; DESIGN.md 3f) says
the plain path at 512^2 is dominated by a per-wave, occupancy-INDEPENDENT
cost r ~ 27 ms/wave that scales with PACKET COUNT, not rows — the prime
suspect is the phase-1 lax.map scan-step + lax.cond overhead (2 traverse
calls x 128 packets = 256 cond'd scan steps per wave).  Two probes:

1. G sweep (indoor, bench lad6 config, G in {2048, 4096, 8192}): doubling
   the packet size halves scan steps while unions grow only ~G^0.6
   (bits_union_study: +53% rows at 4096).  If r is step-bound, bigger G
   wins despite more row work; if r lives elsewhere, 2048 stays best
   (r3 measured 2048 > 1024 — the upward direction was never tried).
2. Box scene lad0 wl32 (rows ~ 0, E ~ tens of boxes): the frame is then
   f + 32*r_box; with negligible slab/row work r_box directly measures
   the per-(packet, wave) scaffolding cost.

All spp-diffed (1 vs 3) to cancel the tunnel dispatch floor, 3 rounds
interleaved, min.

Run: timeout 4500 python -u scripts/tpu_block_sweep.py
"""
import json
import sys
import time
import warnings

warnings.filterwarnings("ignore")
sys.path.insert(0, ".")

W = H = 512


def main():
    import jax
    import jax.numpy as jnp

    from surf_tpu.scene import builtin
    from surf_tpu.scene.camera import CameraParams
    from surf_tpu.scene.compile import HostCompiled
    from surf_tpu.wavefront import RenderConfig
    from surf_tpu.wavefront.integrator import (initial_seeds,
                                               render_frame_seeded)

    print("backend:", jax.default_backend(), f"{W}x{H}", flush=True)
    hosts = {
        "indoor": HostCompiled(builtin.make_indoor_scene()),
        "box": HostCompiled(builtin.make_diffuse_box_scene()),
    }
    cams = {
        "indoor": CameraParams.from_camera(builtin.make_indoor_camera(W, H)),
        "box": CameraParams.from_camera(builtin.make_box_camera(W, H)),
    }
    scenes = {k: jax.device_put(h.render_scene) for k, h in hosts.items()}

    def cfg_for(scene_key, spp, block, ladder):
        cfg = RenderConfig.for_scene(
            hosts[scene_key].static, W, H, spp, use_defocus=True,
            use_pallas=True,
        )._replace(max_bounces=None, compact=True, compact_every=4,
                   block_rays=block, ladder=ladder, ladder_shrink=2,
                   pixel_order="morton", wave_limit=32)
        return cfg

    VARIANTS = [
        ("indoor_lad6_g2048", "indoor", 2048, 6),
        ("indoor_lad6_g4096", "indoor", 4096, 6),
        ("indoor_lad6_g8192", "indoor", 8192, 6),
        ("indoor_lad0_g4096", "indoor", 4096, 0),
        ("box_lad0_g2048", "box", 2048, 0),
    ]
    fns = {}
    for name, sk, block, lad in VARIANTS:
        for spp in (1, 3):
            cfg = cfg_for(sk, spp, block, lad)

            def frame(ts, cfg=cfg, sk=sk):
                sd = initial_seeds(cfg, ts)
                im, _ = render_frame_seeded(scenes[sk], cfg, cams[sk], sd)
                return im
            fns[f"{name}@{spp}"] = frame

    for nm, fn in fns.items():
        t0 = time.perf_counter()
        jax.block_until_ready(fn(jnp.uint32(0)))
        print(f"{nm}: compiled+warm {time.perf_counter()-t0:.1f}s",
              flush=True)
    times = {nm: [] for nm in fns}
    for rnd in range(3):
        for nm, fn in fns.items():
            t0 = time.perf_counter()
            jax.block_until_ready(fn(jnp.uint32(rnd + 1)))
            times[nm].append(time.perf_counter() - t0)
    best = {nm: min(ts) * 1e3 for nm, ts in times.items()}
    per_sample = {name: (best[f"{name}@3"] - best[f"{name}@1"]) / 2.0
                  for name, _, _, _ in VARIANTS}
    print("\n-- per-sample ms (spp-diffed) --")
    for k, v in per_sample.items():
        print(f"  {k:20s} {v:9.2f}")
    with open("out_configs/block_sweep.json", "w") as f:
        json.dump({"shape": f"{W}x{H}", "raw_ms": best,
                   "per_sample_ms": per_sample}, f, indent=1)
    print("wrote out_configs/block_sweep.json", flush=True)


if __name__ == "__main__":
    main()
