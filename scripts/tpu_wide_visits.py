#!/usr/bin/env python
"""Device diagnosis: visit counts + ns/visit of the wide kernel, and
device-vs-oracle agreement on a subset."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from surf_tpu.scene import builtin
from surf_tpu.scene.camera import CameraParams, view_plane_jnp
from surf_tpu.scene.compile import HostCompiled
from surf_tpu.wavefront import RenderConfig
from surf_tpu.wavefront.integrator import initial_seeds, ray_generation
from surf_tpu.accel.pallas_wide import WideTrace, traverse_wide


def main():
    W = H = 256
    host = HostCompiled(builtin.make_indoor_scene())
    scene = jax.device_put(host.render_scene)
    wt = WideTrace(scene.trace.wide_stream, scene.trace.wide_rec_slot)
    print("stream rows:", wt.stream.shape[0], flush=True)

    cam = builtin.make_indoor_camera(W, H)
    cp = CameraParams.from_camera(cam)
    cfg = RenderConfig.for_scene(host.static, W, H, 1, use_defocus=True,
                                 use_pallas=True)
    vp = view_plane_jnp(cp, W, H)
    n = W * H
    lane = jnp.arange(n, dtype=jnp.uint32)
    px = (lane % jnp.uint32(W)).astype(jnp.int32)
    py = (lane // jnp.uint32(W)).astype(jnp.int32)
    _, origin, direction = jax.jit(
        lambda s: ray_generation(cfg, vp, s, px, py)
    )(initial_seeds(cfg, jnp.uint32(0)))
    origin.block_until_ready()
    act = jnp.ones(n, bool)
    tmax = jnp.full(n, 1e30, jnp.float32)

    d2 = jax.random.normal(jax.random.PRNGKey(0), (n, 3))
    d2 = d2 / jnp.linalg.norm(d2, axis=1, keepdims=True)
    o2 = jax.random.uniform(jax.random.PRNGKey(1), (n, 3), minval=-3.0, maxval=3.0)

    algos = ["skip", "skip2"] if "--skip2" in sys.argv else (["stack"] if "--stack" in sys.argv else ["skip", "stack"])
    for algo in algos:
        fv = jax.jit(lambda o, d, a=algo: traverse_wide(
            wt, o, d, tmax, act, any_hit=False, return_visits=True, algo=a))
        f = jax.jit(lambda o, d, a=algo: traverse_wide(
            wt, o, d, tmax, act, any_hit=False, algo=a))
        fa = jax.jit(lambda o, d, a=algo: traverse_wide(
            wt, o, d, tmax, act, any_hit=True, algo=a))

        for name, o, d in (("coherent", origin, direction),
                           ("incoherent", o2, d2)):
            visits = np.asarray(fv(o, d))
            hit = f(o, d)
            hit.t.block_until_ready()
            t0 = time.time()
            for _ in range(5):
                hit = f(o, d)
            hit.t.block_until_ready()
            dt = (time.time() - t0) / 5
            ha = fa(o, d)
            ha.t.block_until_ready()
            t0 = time.time()
            for _ in range(5):
                ha = fa(o, d)
            ha.t.block_until_ready()
            dta = (time.time() - t0) / 5
            tot = visits.sum()
            print(f"{algo:5s} {name}: {dt*1e3:.2f} ms (anyhit {dta*1e3:.2f})"
                  f", visits/block mean {visits.mean():.0f} "
                  f"max {visits.max()}, total {tot} "
                  f"-> {dt/tot*1e9:.1f} ns/visit", flush=True)

    # device-vs-oracle spot check (512 rays)
    from surf_tpu.accel.wide import traverse_stream_np, WideStream
    o_s = np.asarray(o2[:512])
    d_s = np.asarray(d2[:512])
    hit = f(o2, d2)
    ws = WideStream(np.asarray(wt.stream), np.asarray(wt.rec_slot),
                    wt.stream.shape[0], 0, 0)
    t_np, rec, _, _ = traverse_stream_np(ws, o_s, d_s,
                                         np.full(512, 1e30, np.float32))
    slot = np.where(rec >= 0, ws.rec_slot[np.maximum(rec, 0)], -1)
    agree = np.mean(np.isclose(np.asarray(hit.t[:512]), t_np, rtol=1e-5)
                    | ((slot < 0) & (np.asarray(hit.prim[:512]) < 0)))
    print("device t agreement vs oracle:", agree, flush=True)


if __name__ == "__main__":
    main()
