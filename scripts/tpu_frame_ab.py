#!/usr/bin/env python
"""Frame-level A/B of traversal algos on the real TPU.

Usage: timeout 3600 python -u scripts/tpu_frame_ab.py [WxH] [spp] [algo:block,...]
Defaults: 256x256 4spp, configs skip:2048, bits:1024, bits:2048.

One process, interleaved rounds (run-to-run absolute swings ~2x; only
compare WITHIN one run — CLAUDE.md measurement protocol).
"""
import sys
import time
import warnings

warnings.filterwarnings("ignore")
sys.path.insert(0, ".")


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "256x256"
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    combos = (sys.argv[3].split(",") if len(sys.argv) > 3
              else ["skip:2048", "bits:1024", "bits:2048"])
    W, H = map(int, size.split("x"))

    import jax
    import jax.numpy as jnp  # noqa: F401
    import numpy as np

    from surf_tpu.scene import builtin
    from surf_tpu.scene.camera import CameraParams
    from surf_tpu.scene.compile import HostCompiled
    from surf_tpu.wavefront import RenderConfig
    from surf_tpu.wavefront.integrator import (initial_seeds,
                                               render_frame_seeded)

    print("backend:", jax.default_backend(), f"{W}x{H} spp={spp}", flush=True)
    two_level = any(c.split(":")[0] == "twolevel" for c in combos)
    host = HostCompiled(builtin.make_indoor_scene(), two_level=two_level)
    scene = jax.device_put(host.render_scene)
    cp = CameraParams.from_camera(builtin.make_indoor_camera(W, H))

    def make_frame(algo, block, ce=4, ladder=0, cap=0, order="native"):
        cfg = RenderConfig.for_scene(
            host.static, W, H, 1, use_defocus=True, use_pallas=True,
        )._replace(max_bounces=None, wave_limit=32, compact=True,
                   compact_every=ce, algo=algo, block_rays=block,
                   ladder=ladder, ladder_shrink=2, cap_rows=cap,
                   pixel_order=order)

        def frame(total_samples):
            seed = initial_seeds(cfg, total_samples)
            acc = None
            for _ in range(spp):
                part, seed = render_frame_seeded(scene, cfg, cp, seed)
                acc = part if acc is None else acc + part
            return acc
        return frame

    frames = {}
    for c in combos:
        parts = c.split(":")  # algo:block[:ce[:ladder[:cap[:order]]]]
        frames[c] = make_frame(parts[0], int(parts[1]),
                               int(parts[2]) if len(parts) > 2 else 4,
                               int(parts[3]) if len(parts) > 3 else 0,
                               int(parts[4]) if len(parts) > 4 else 0,
                               parts[5] if len(parts) > 5 else "native")
        t0 = time.perf_counter()
        jax.block_until_ready(frames[c](0))  # compile+warmup
        print(f"{c}: compiled+warm in {time.perf_counter()-t0:.1f}s",
              flush=True)

    times = {c: [] for c in combos}
    energy = {}
    imgs = {}
    for rnd in range(3):
        for c in combos:
            t0 = time.perf_counter()
            img = jax.block_until_ready(frames[c](spp * (rnd + 1)))
            dt = time.perf_counter() - t0
            times[c].append(dt)
            if rnd == 0:
                imgs[c] = np.asarray(img) / spp
            energy[c] = float(np.asarray(img).sum()) / spp
            print(f"round {rnd} {c}: {dt*1e3:9.1f} ms", flush=True)
    print()
    ref = imgs[combos[0]]
    for c in combos:
        best = min(times[c])
        l1 = np.abs(imgs[c] - ref).sum() / max(ref.sum(), 1e-9)
        print(f"{c}: best {best*1e3:9.1f} ms = "
              f"{W*H*spp/best/1e6:.3f} M rays/s  energy={energy[c]:.1f}  "
              f"relL1_vs_{combos[0]}={l1:.4f}", flush=True)


if __name__ == "__main__":
    main()
