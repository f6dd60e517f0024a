#!/usr/bin/env python
"""Frame A/B: ladder shrink factor 4 (default) vs 2 at 256^2@4spp.
The wl sweep (tpu_wl_sweep.py) shows waves 3-8 (17-54% occupancy) run
with NO width shrink under the /4 ladder; a /2 ladder halves the
width-proportional per-wave cost (shade, RNG, phase-1 scan, compaction)
from ~50% occupancy down.  Bit-identical by the ladder argument.

Run: timeout 3000 python -u scripts/tpu_ladder_ab.py
"""
import sys
import time
import warnings

warnings.filterwarnings("ignore")
sys.path.insert(0, ".")


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
    SPP = 4
    print("backend:", jax.default_backend(), f"{W}x{H} {SPP}spp", flush=True)
    host = HostCompiled(builtin.make_indoor_scene())
    scene = jax.device_put(host.render_scene)
    cp = CameraParams.from_camera(builtin.make_indoor_camera(W, H))

    combos = {"l4s4": (4, 4), "l6s2": (6, 2), "l8s2": (8, 2)}
    frames = {}
    for name, (lad, shr) in combos.items():
        cfg = RenderConfig.for_scene(
            host.static, W, H, 1, use_defocus=True, use_pallas=True,
        )._replace(max_bounces=None, wave_limit=32, compact=True,
                   compact_every=4, block_rays=2048, ladder=lad,
                   ladder_shrink=shr)

        def frame(total_samples, cfg=cfg):
            seed = initial_seeds(cfg, total_samples)
            acc = None
            for _ in range(SPP):
                part, seed = render_frame_seeded(scene, cfg, cp, seed)
                acc = part if acc is None else acc + part
            return acc

        t0 = time.perf_counter()
        jax.block_until_ready(frame(0))
        print(f"{name}: compiled+warm {time.perf_counter()-t0:.1f}s",
              flush=True)
        frames[name] = frame

    times = {c: [] for c in combos}
    imgs = {}
    for rnd in range(3):
        for name in combos:
            t0 = time.perf_counter()
            img = jax.block_until_ready(frames[name](SPP * (rnd + 1)))
            times[name].append(time.perf_counter() - t0)
            if rnd == 0:
                imgs[name] = np.asarray(img)
    ref = imgs["l4s4"]
    for name in combos:
        ms = min(times[name]) * 1e3
        rel = float(np.abs(imgs[name] - ref).sum() / np.abs(ref).sum())
        print(f"{name}: best {ms:7.1f} ms  relL1_vs_l4s4={rel:.6f}",
              flush=True)


if __name__ == "__main__":
    main()
