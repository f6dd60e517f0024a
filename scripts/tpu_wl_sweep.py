#!/usr/bin/env python
"""In-frame wave-cost decomposition: frame time vs wave_limit at
256^2@1spp (bitsru8, ladder=4, compact_every=4).  The per-wave host-sync
profile (tpu_wave_profile) is tunnel-latency-dominated (~30 ms/wave
floor that the real on-device while_loop does not pay); this sweep
diffs whole-frame times instead:
  t(wl=2) - t(wl=1)  = one full-occupancy wave (extend+shade+connect)
  t(wl=32) - t(wl=8) = the occupancy tail under the ladder

Run: timeout 3600 python -u scripts/tpu_wl_sweep.py
"""
import sys
import time
import warnings

warnings.filterwarnings("ignore")
sys.path.insert(0, ".")

WLS = (1, 2, 8, 32)


def main():
    import jax
    import numpy as np

    from surf_tpu.scene import builtin
    from surf_tpu.scene.camera import CameraParams
    from surf_tpu.scene.compile import HostCompiled
    from surf_tpu.wavefront import RenderConfig
    from surf_tpu.wavefront.integrator import (initial_seeds,
                                               render_frame_seeded)

    W = H = 256
    print("backend:", jax.default_backend(), f"{W}x{H} 1spp", flush=True)
    host = HostCompiled(builtin.make_indoor_scene())
    scene = jax.device_put(host.render_scene)
    cp = CameraParams.from_camera(builtin.make_indoor_camera(W, H))

    frames = {}
    for wl in WLS:
        cfg = RenderConfig.for_scene(
            host.static, W, H, 1, use_defocus=True, use_pallas=True,
        )._replace(max_bounces=None, wave_limit=wl, compact=True,
                   compact_every=4, block_rays=2048, ladder=4)

        def frame(total_samples, cfg=cfg):
            seed = initial_seeds(cfg, total_samples)
            img, _ = render_frame_seeded(scene, cfg, cp, seed)
            return img

        t0 = time.perf_counter()
        jax.block_until_ready(frame(0))
        print(f"wl={wl}: compiled+warm {time.perf_counter()-t0:.1f}s",
              flush=True)
        frames[wl] = frame

    times = {wl: [] for wl in WLS}
    for rnd in range(4):
        for wl in WLS:
            t0 = time.perf_counter()
            img = jax.block_until_ready(frames[wl](rnd + 1))
            times[wl].append(time.perf_counter() - t0)
            if rnd == 0:
                e = float(np.asarray(img).sum())
                print(f"  wl={wl}: energy {e:.1f}", flush=True)
    best = {wl: min(ts) * 1e3 for wl, ts in times.items()}
    for wl in WLS:
        print(f"wl={wl:3d}: {best[wl]:8.1f} ms", flush=True)
    if 1 in best and 2 in best:
        print(f"wave@full-occupancy: {best[2]-best[1]:.1f} ms", flush=True)
    if 8 in best and 32 in best:
        print(f"tail waves 9..32:    {best[32]-best[8]:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
