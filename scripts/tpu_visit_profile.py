#!/usr/bin/env python
"""Frame work breakdown on device: per wave, the live-lane count and the
EXTEND traversal's visited-row total (sum over blocks), for three lane
orders: as-is, compacted, compacted+coherence-sorted.  Quantifies (a) how
much of the frame is traversal (visits x ~567 ns), (b) what compaction
already harvests, (c) what a coherent order could harvest — the round-2
"cut visits, not ALU" question.

Usage: timeout 1800 python -u scripts/tpu_visit_profile.py [--size=256]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from surf_tpu.accel.pallas_wide import WideTrace, traverse_wide
from surf_tpu.scene import builtin
from surf_tpu.scene.camera import CameraParams, view_plane_jnp
from surf_tpu.scene.compile import HostCompiled
from surf_tpu.wavefront import RenderConfig
from surf_tpu.wavefront.integrator import (
    PathState,
    bounce_step,
    compact_paths,
    initial_seeds,
    ray_generation,
)


def main():
    W = H = 256
    n_waves = 16
    for a in sys.argv:
        if a.startswith("--size"):
            W = H = int(a.split("=")[1])
        if a.startswith("--waves"):
            n_waves = int(a.split("=")[1])

    host = HostCompiled(builtin.make_indoor_scene())
    scene = jax.device_put(host.render_scene)
    wt = WideTrace(scene.trace.wide_stream, scene.trace.wide_rec_slot)
    cam = builtin.make_indoor_camera(W, H)
    cp = CameraParams.from_camera(cam)
    cfg = RenderConfig.for_scene(host.static, W, H, 1, use_defocus=True,
                                 use_pallas=True)
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

    tmax_full = jnp.full(n, 1e30, jnp.float32)
    visits_fn = jax.jit(lambda o, d, a: traverse_wide(
        wt, o, d, tmax_full, a, return_visits=True))
    step_fn = jax.jit(lambda s: bounce_step(scene, cfg, s))
    comp = jax.jit(compact_paths)
    comp_coh = jax.jit(lambda s: compact_paths(s, coherence=True))

    tot = {"asis": 0, "compact": 0, "coh": 0}
    print(f"{'wave':>4} {'live':>7} {'asis':>9} {'compact':>9} {'coh':>9}",
          flush=True)
    for w in range(n_waves):
        live = int(np.asarray(jnp.sum(state.alive)))
        if live == 0:
            break
        row = {}
        for name, st in (
            ("asis", state),
            ("compact", comp(state)),
            ("coh", comp_coh(state)),
        ):
            v = np.asarray(visits_fn(st.origin, st.direction, st.alive))
            row[name] = int(v.sum())
            tot[name] += int(v.sum())
        print(f"{w:>4} {live:>7} {row['asis']:>9} {row['compact']:>9} "
              f"{row['coh']:>9}", flush=True)
        state = step_fn(state)

    print("totals:", tot, flush=True)
    print(f"traversal-time estimate (567 ns/visit): "
          f"asis {tot['asis']*567e-6:.1f} ms  "
          f"compact {tot['compact']*567e-6:.1f} ms  "
          f"coh {tot['coh']*567e-6:.1f} ms  (extend only; NEE ~ same again)",
          flush=True)


if __name__ == "__main__":
    main()
