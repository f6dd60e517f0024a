#!/usr/bin/env python
"""Frame-level A/B of cross-frame deferral (render_frame_carry) vs the
plain capped loop (render_frame_seeded): deferral lets the per-sample
wave cap drop (fewer near-empty tail waves per sample) with ZERO
estimator bias — capped-out paths resume next frame from the pooled
continuation (renderer.cpp:1101-1104 semantics).

Usage: timeout 3000 python -u scripts/tpu_defer_ab.py [WxH] [spp] \
          [algo:block] [wave_limits like 32,16,12]

One process, interleaved rounds (CLAUDE.md measurement protocol).
"""
import sys
import time
import warnings

warnings.filterwarnings("ignore")
sys.path.insert(0, ".")


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "256x256"
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    algo_block = sys.argv[3] if len(sys.argv) > 3 else "bits:2048"
    limits = ([int(x) for x in sys.argv[4].split(",")]
              if len(sys.argv) > 4 else [32, 16, 12])
    W, H = map(int, size.split("x"))
    algo, block = algo_block.split(":")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from surf_tpu.scene import builtin
    from surf_tpu.scene.camera import CameraParams
    from surf_tpu.scene.compile import HostCompiled
    from surf_tpu.wavefront import RenderConfig
    from surf_tpu.wavefront.integrator import (
        empty_frame_carry,
        initial_seeds,
        render_frame_carry_jit,
        render_frame_seeded,
    )

    print("backend:", jax.default_backend(), f"{W}x{H} spp={spp} "
          f"{algo}:{block} limits={limits}", flush=True)
    host = HostCompiled(builtin.make_indoor_scene())
    scene = jax.device_put(host.render_scene)
    cp = CameraParams.from_camera(builtin.make_indoor_camera(W, H))

    def cfg_for(wl):
        return RenderConfig.for_scene(
            host.static, W, H, spp, use_defocus=True, use_pallas=True,
        )._replace(max_bounces=None, wave_limit=wl, compact=True,
                   compact_every=4, algo=algo, block_rays=int(block))

    runs = {}

    def make_plain(wl):
        cfg = cfg_for(wl)

        def frame(fi):
            seed = initial_seeds(cfg, jnp.uint32(fi * spp))
            img, _ = render_frame_seeded(scene, cfg, cp, seed)
            return img
        return frame

    def make_defer(wl):
        cfg = cfg_for(wl)
        carry_box = [empty_frame_carry(cfg)]

        def frame(fi):
            seed = initial_seeds(cfg, jnp.uint32(fi * spp))
            img, _, carry_box[0] = render_frame_carry_jit(
                scene, cfg, cp, seed, carry_box[0])
            return img
        return frame

    for wl in limits:
        runs[f"plain{wl}"] = make_plain(wl)
        runs[f"defer{wl}"] = make_defer(wl)

    for name, fn in runs.items():
        t0 = time.perf_counter()
        jax.block_until_ready(fn(0))
        print(f"{name}: compiled+warm in {time.perf_counter()-t0:.1f}s",
              flush=True)

    times = {k: [] for k in runs}
    energy = {}
    for rnd in range(3):
        for name, fn in runs.items():
            t0 = time.perf_counter()
            img = jax.block_until_ready(fn(rnd + 1))
            dt = time.perf_counter() - t0
            times[name].append(dt)
            energy[name] = float(np.asarray(img).sum()) / spp
            print(f"round {rnd} {name}: {dt*1e3:9.1f} ms", flush=True)
    print()
    for name in runs:
        best = min(times[name])
        print(f"{name}: best {best*1e3:9.1f} ms = "
              f"{W*H*spp/best/1e6:.3f} M rays/s  energy={energy[name]:.1f}",
              flush=True)


if __name__ == "__main__":
    main()
