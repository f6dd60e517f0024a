#!/usr/bin/env python
"""Device A/B: compaction cadence at 512^2 (bench shape)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

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
    base = RenderConfig.for_scene(host.static, W, H, 1, use_defocus=True,
                                  use_pallas=True)._replace(
        max_bounces=None, wave_limit=32)
    for compact, every in ((False, 1), (True, 1), (True, 2), (True, 4)):
        cfg = base._replace(compact=compact, compact_every=every)
        seed = initial_seeds(cfg, jnp.uint32(0))
        acc, _ = render_frame_seeded(scene, cfg, cp, seed)
        acc.block_until_ready()
        t0 = time.time()
        acc, _ = render_frame_seeded(scene, cfg, cp, seed)
        acc.block_until_ready()
        dt = time.time() - t0
        print(f"compact={compact} every={every}: {dt*1e3:.0f} ms "
              f"energy={float(np.asarray(acc).sum()):.1f}", flush=True)


if __name__ == "__main__":
    main()
