#!/usr/bin/env python
"""Decompose r — the ~25-27 ms/wave occupancy-independent full-width
cost (DESIGN.md 3f) — by ablation on the BOX scene (rows ~ 0, E ~ tens
of boxes, so phase-2 and slab work are negligible and r IS the frame).

box lad0 wl32 G2048 variants (spp-diffed 1v3):
  base        two traverse calls + NEE + shade + ce4 compaction
  nonee       num_lights=0: ONE traverse call, no NEE math/shadow rays
  nocompact   compact=False (keeps both calls)
  nonee_nc    both ablations
  mb32        max_bounces=32 static fori instead of while_loop (same
              work; isolates the while cond/carry overhead)

If (base - nonee) ~ r/2: the per-wave cost is per-TRAVERSE-CALL
machinery (phase-1 lax.map scan + pallas grid + prep/unprep), and the
attack is batching extend+connect rays into one call per wave.
If nocompact moves it: compaction.  If mb32 moves it: loop carry.

Run: timeout 3600 python -u scripts/tpu_wave_overhead.py
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

    print("backend:", jax.default_backend(), f"{W}x{H} box", flush=True)
    host = HostCompiled(builtin.make_diffuse_box_scene())
    scene = jax.device_put(host.render_scene)
    cp = CameraParams.from_camera(builtin.make_box_camera(W, H))

    def mk(spp, **kw):
        cfg = RenderConfig.for_scene(
            host.static, W, H, spp, use_defocus=True, use_pallas=True,
        )._replace(max_bounces=None, compact=True, compact_every=4,
                   block_rays=2048, ladder=0, ladder_shrink=2,
                   pixel_order="morton", wave_limit=32)
        return cfg._replace(**kw)

    VARIANTS = {
        "base": {},
        "nonee": dict(num_lights=0),
        "nocompact": dict(compact=False),
        "nonee_nc": dict(num_lights=0, compact=False),
        "mb32": dict(max_bounces=32, wave_limit=0),
    }
    fns = {}
    for name, kw in VARIANTS.items():
        for spp in (1, 3):
            cfg = mk(spp, **kw)

            def frame(ts, cfg=cfg):
                sd = initial_seeds(cfg, ts)
                im, _ = render_frame_seeded(scene, cfg, cp, sd)
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
                  for name in VARIANTS}
    print("\n-- per-sample ms (spp-diffed) --")
    for k, v in per_sample.items():
        print(f"  {k:12s} {v:9.2f}")
    with open("out_configs/wave_overhead.json", "w") as f:
        json.dump({"shape": f"{W}x{H}", "raw_ms": best,
                   "per_sample_ms": per_sample}, f, indent=1)
    print("wrote out_configs/wave_overhead.json", flush=True)


if __name__ == "__main__":
    main()
