#!/usr/bin/env python
"""Compact-cadence sweep at the bench config (round 5).

The wave-overhead ablation (out_configs/wave_overhead.json) showed
compaction costs ~37 ms per compact at 512^2 (~296 ms/sample at ce4
lad0 — 35% of the plain frame; the 44 ns/update scatter + per-lane
gathers on 17 state columns).  Under the ladder, every rung transition
ALSO stable-compacts, so the in-loop every-4-waves compacts may be
mostly redundant there.  Sweep compact_every at the exact bench config
(indoor 512^2, lad6/2, morton, bitsru8, G2048) — bit-identical by
construction (compaction is a lane permutation; per-lane streams are
unchanged) — plus the lad0 curve on the indoor scene for the r
decomposition.

Run: timeout 4500 python -u scripts/tpu_compact_cadence.py
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

    print("backend:", jax.default_backend(), f"{W}x{H} indoor", flush=True)
    host = HostCompiled(builtin.make_indoor_scene())
    scene = jax.device_put(host.render_scene)
    cp = CameraParams.from_camera(builtin.make_indoor_camera(W, H))

    def mk(spp, **kw):
        cfg = RenderConfig.for_scene(
            host.static, W, H, spp, use_defocus=True, use_pallas=True,
        )._replace(max_bounces=None, compact=True, compact_every=4,
                   block_rays=2048, ladder=6, ladder_shrink=2,
                   pixel_order="morton", wave_limit=32)
        return cfg._replace(**kw)

    VARIANTS = {
        "lad6_ce4": {},
        "lad6_ce8": dict(compact_every=8),
        "lad6_ce16": dict(compact_every=16),
        "lad6_ce99": dict(compact_every=99),   # rung compacts only
        "lad0_ce8": dict(ladder=0, compact_every=8),
        "lad0_ce16": dict(ladder=0, compact_every=16),
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
    energies = {}
    for nm, fn in fns.items():
        t0 = time.perf_counter()
        img = jax.block_until_ready(fn(jnp.uint32(0)))
        energies[nm] = float(jnp.sum(img))
        print(f"{nm}: compiled+warm {time.perf_counter()-t0:.1f}s "
              f"energy {energies[nm]:.2f}", flush=True)
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
    # bit-identity check across cadences (same spp=1 frame)
    e0 = energies["lad6_ce4@1"]
    for nm in ("lad6_ce8@1", "lad6_ce16@1", "lad6_ce99@1"):
        same = energies[nm] == e0
        print(f"  energy[{nm}] == ce4: {same}")
    with open("out_configs/compact_cadence.json", "w") as f:
        json.dump({"shape": f"{W}x{H}", "raw_ms": best,
                   "per_sample_ms": per_sample,
                   "energies": energies}, f, indent=1)
    print("wrote out_configs/compact_cadence.json", flush=True)


if __name__ == "__main__":
    main()
