#!/usr/bin/env python
"""On-device microbenchmark + correctness check for the Pallas traversal
kernels.  Run under `timeout` (a faulting kernel wedges the remote worker).

Usage: python -u scripts/tpu_kernel_bench.py [--frames] [--wide]
"""
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


def main():
    W = H = 256
    host = HostCompiled(builtin.make_indoor_scene())
    scene = jax.device_put(host.render_scene)
    trace = scene.trace
    print("nodes:", trace.node_boxes.shape[0], "tris:", trace.tri_v0.shape[0],
          flush=True)

    cam = builtin.make_indoor_camera(W, H)
    cp = CameraParams.from_camera(cam)
    cfg = RenderConfig.for_scene(host.static, W, H, 1, use_defocus=True,
                                 use_pallas=True)
    vp = view_plane_jnp(cp, W, H)
    n = W * H
    lane = jnp.arange(n, dtype=jnp.uint32)
    px = (lane % jnp.uint32(W)).astype(jnp.int32)
    py = (lane // jnp.uint32(W)).astype(jnp.int32)
    seed0 = initial_seeds(cfg, jnp.uint32(0))
    rg = jax.jit(lambda s: ray_generation(cfg, vp, s, px, py))
    _, origin, direction = rg(seed0)
    origin.block_until_ready()
    active = jnp.ones(n, bool)
    tmax = jnp.full(n, 1e30, jnp.float32)

    key = jax.random.PRNGKey(0)
    d2 = jax.random.normal(key, (n, 3))
    d2 = d2 / jnp.linalg.norm(d2, axis=1, keepdims=True)
    o2 = jax.random.uniform(jax.random.PRNGKey(1), (n, 3), minval=-3.0,
                            maxval=3.0)

    def bench(fn, *a, reps=5):
        out = fn(*a)
        jax.tree.map(lambda x: x.block_until_ready(), out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*a)
        jax.tree.map(lambda x: x.block_until_ready(), out)
        return (time.time() - t0) / reps, out

    kernels = []
    if "--no-binary" not in sys.argv:
        from surf_tpu.accel.pallas_traverse import traverse_pallas
        f = jax.jit(lambda o, d, t, a: traverse_pallas(
            trace, o, d, t, a, any_hit=False))
        fa = jax.jit(lambda o, d, t, a: traverse_pallas(
            trace, o, d, t, a, any_hit=True))
        kernels.append(("binary", f, fa))

    if "--wide" in sys.argv:
        from surf_tpu.accel.wide import build_wide_stream
        from surf_tpu.accel.pallas_wide import (
            device_wide_trace, traverse_wide)
        perm = host.bvh.indices.astype("int64")
        ws = build_wide_stream(host.bvh, host.samp_v0[perm],
                               host.samp_v1[perm], host.samp_v2[perm])
        wt = device_wide_trace(ws)
        algos = ["skip"]
        for a in sys.argv:
            if a.startswith("--algo="):
                algos = a.split("=", 1)[1].split(",")
        for algo in algos:
            fw = jax.jit(lambda o, d, t, a, algo=algo: traverse_wide(
                wt, o, d, t, a, any_hit=False, algo=algo))
            fwa = jax.jit(lambda o, d, t, a, algo=algo: traverse_wide(
                wt, o, d, t, a, any_hit=True, algo=algo))
            kernels.append((f"wide[{algo}]", fw, fwa))

    results = {}
    for name, fc, fay in kernels:
        t_coh, hit_c = bench(fc, origin, direction, tmax, active)
        t_inc, hit_i = bench(fc, o2, d2, tmax, active)
        t_any, hit_a = bench(fay, o2, d2, tmax, active)
        print(f"{name}: coherent {t_coh*1e3:.2f} ms ({n/t_coh/1e6:.1f} Mray/s)"
              f"  incoherent {t_inc*1e3:.2f} ms ({n/t_inc/1e6:.1f} Mray/s)"
              f"  anyhit {t_any*1e3:.2f} ms", flush=True)
        results[name] = (np.asarray(hit_c.t), np.asarray(hit_c.prim),
                         np.asarray(hit_i.t), np.asarray(hit_i.prim),
                         np.asarray(hit_a.prim) >= 0)

    names = list(results)
    for other in names[1:]:
        a, b = results[names[0]], results[other]
        agree_c = float(np.mean(np.isclose(a[0], b[0], rtol=1e-5) |
                                (a[1] < 0) & (b[1] < 0)))
        agree_i = float(np.mean(np.isclose(a[2], b[2], rtol=1e-5) |
                                (a[3] < 0) & (b[3] < 0)))
        agree_a = float(np.mean(a[4] == b[4]))
        print(f"{other}-vs-{names[0]} agreement: coherent t {agree_c:.6f} "
              f"incoherent t {agree_i:.6f} anyhit {agree_a:.6f}", flush=True)

    if False and len(results) == 2:
        a, b = results["binary"], results["wide"]
        agree_c = float(np.mean(np.isclose(a[0], b[0], rtol=1e-5) |
                                (a[1] < 0) & (b[1] < 0)))
        agree_i = float(np.mean(np.isclose(a[2], b[2], rtol=1e-5) |
                                (a[3] < 0) & (b[3] < 0)))
        agree_a = float(np.mean(a[4] == b[4]))
        print(f"wide-vs-binary agreement: coherent t {agree_c:.6f} "
              f"incoherent t {agree_i:.6f} anyhit {agree_a:.6f}", flush=True)

    if "--frames" in sys.argv:
        from surf_tpu.wavefront.integrator import render_frame_seeded
        for compact in (False, True):
            cfgf = cfg._replace(compact=compact, max_bounces=None)
            seed = initial_seeds(cfgf, jnp.uint32(0))
            t0 = time.time()
            acc, _ = render_frame_seeded(scene, cfgf, cp, seed)
            acc.block_until_ready()
            comp = time.time() - t0
            t0 = time.time()
            acc, _ = render_frame_seeded(scene, cfgf, cp, seed)
            acc.block_until_ready()
            dt = time.time() - t0
            print(f"frame {W}x{H}@1spp compact={compact}: {dt*1e3:.1f} ms "
                  f"(compile {comp:.1f}s) energy={float(acc.sum()):.1f}",
                  flush=True)


if __name__ == "__main__":
    main()
