#!/usr/bin/env python
"""Device A/B: K_VISITS (visits per while-cond check) at 512^2 frame shape."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import surf_tpu.accel.pallas_wide as pw
from surf_tpu.scene import builtin
from surf_tpu.scene.camera import CameraParams
from surf_tpu.scene.compile import HostCompiled
from surf_tpu.wavefront import RenderConfig
from surf_tpu.wavefront.integrator import initial_seeds, render_frame_seeded


def main():
    W = H = 512
    host = HostCompiled(builtin.make_indoor_scene())
    scene = jax.device_put(host.render_scene)
    cam = builtin.make_indoor_camera(W, H)
    cp = CameraParams.from_camera(cam)
    for k in (16, 32, 64):
        pw.K_VISITS = k
        cfg = RenderConfig.for_scene(
            host.static, W, H, 1, use_defocus=True, use_pallas=True,
        )._replace(max_bounces=None, wave_limit=32, compact=True,
                   compact_every=4,
                   # unique static cfg -> fresh jit trace picking up the
                   # K_VISITS module global; stack_depth is unused on the
                   # pallas-wide path so behavior is identical
                   stack_depth=host.static.stack_depth + k)
        seed = initial_seeds(cfg, jnp.uint32(0))
        acc, _ = render_frame_seeded(scene, cfg, cp, seed)
        acc.block_until_ready()
        t0 = time.time()
        acc, _ = render_frame_seeded(scene, cfg, cp, seed)
        acc.block_until_ready()
        print(f"K={k}: {(time.time()-t0)*1e3:.0f} ms "
              f"energy={float(np.asarray(acc).sum()):.1f}", flush=True)


if __name__ == "__main__":
    main()
