#!/usr/bin/env python
"""Per-wave frame profile on device: time each bounce_step at its actual
liveness for the wide vs binary kernels.  Usage:
  python scripts/tpu_wave_profile.py [--binary] [--waves N] [--size W]
"""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from surf_tpu.scene import builtin
from surf_tpu.scene.camera import CameraParams, view_plane_jnp
from surf_tpu.scene.compile import HostCompiled
from surf_tpu.wavefront import RenderConfig
from surf_tpu.wavefront.integrator import (
    PathState, bounce_step, initial_seeds, ray_generation,
)


def main():
    W = H = 256
    for a in sys.argv:
        if a.startswith("--size"):
            W = H = int(a.split("=")[1])
    n_waves = 24
    use_wide = "--binary" not in sys.argv
    algo = "skip"
    block = 2048
    for a in sys.argv:
        if a.startswith("--algo"):
            algo = a.split("=")[1]
        if a.startswith("--block"):
            block = int(a.split("=")[1])

    host = HostCompiled(builtin.make_indoor_scene())
    scene = jax.device_put(host.render_scene)
    cam = builtin.make_indoor_camera(W, H)
    cp = CameraParams.from_camera(cam)
    cfg = RenderConfig.for_scene(host.static, W, H, 1, use_defocus=True,
                                 use_pallas=True)._replace(
        use_wide=use_wide, algo=algo, block_rays=block)
    vp = view_plane_jnp(cp, W, H)
    n = W * H
    lane = jnp.arange(n, dtype=jnp.uint32)
    px = (lane % jnp.uint32(W)).astype(jnp.int32)
    py = (lane // jnp.uint32(W)).astype(jnp.int32)
    seed, origin, direction = jax.jit(
        lambda s: ray_generation(cfg, vp, s, px, py)
    )(initial_seeds(cfg, jnp.uint32(0)))
    state = PathState(
        origin=origin, direction=direction, seed=seed,
        transmission=jnp.ones((n, 3), jnp.float32),
        energy=jnp.zeros((n, 3), jnp.float32),
        last_specular=jnp.ones(n, bool), in_medium=jnp.zeros(n, bool),
        alive=jnp.ones(n, bool), pixel=jnp.arange(n, dtype=jnp.int32),
    )

    compact = "--compact" in sys.argv
    if compact:
        from surf_tpu.wavefront.integrator import compact_paths

        def step_fn(s):
            return bounce_step(scene, cfg, compact_paths(s))
    else:
        def step_fn(s):
            return bounce_step(scene, cfg, s)
    step = jax.jit(step_fn)
    s = step(state)
    jax.tree.map(lambda x: x.block_until_ready(), s)
    print(f"kernel={'wide' if use_wide else 'binary'} algo={algo} "
          f"block={block} {W}x{H} compact={compact}", flush=True)

    total = 0.0
    for w in range(n_waves):
        alive = int(state.alive.sum())
        # count blocks with >=1 live lane (1024-lane blocks in lane order)
        ab = np.asarray(state.alive)
        blocks = int((ab.reshape(-1, 1024).any(axis=1)).sum())
        t0 = time.time()
        state = step(state)
        state.alive.block_until_ready()
        dt = time.time() - t0
        total += dt
        print(f"wave {w:2d}: alive {alive:6d} active_blocks {blocks:3d} "
              f"-> {dt*1e3:7.1f} ms", flush=True)
        if alive == 0:
            break
    print(f"total {total*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
