#!/usr/bin/env python
"""Headline benchmark: forward wavefront render of the built-in indoor scene.

Prints ONE JSON line:
  {"metric": "rays_per_s_chip", "value": N, "unit": "rays/s", "vs_baseline": x}

The metric matches the reference's runtime instrumentation
(/root/reference/sources/main.cpp:430-431): primary samples per second
(W*H*spp / frame time), measured at 512x512 @ 16 spp (BASELINE config 2
shape) on whatever single chip is available.  vs_baseline is against the
BASELINE.json north star of 2e8 rays/s/chip.

Robustness: falls back to smaller configurations (or the CPU backend) rather
than crashing, and reports which configuration ran in "detail".
"""

from __future__ import annotations

import json
import sys
import time
import warnings

warnings.filterwarnings("ignore")

BASELINE_RAYS_PER_S = 2.0e8


def run_bench(width, height, spp, max_bounces, use_pallas, frames=3,
              spp_chunk=1):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from surf_tpu.scene import builtin
    from surf_tpu.scene.camera import CameraParams
    from surf_tpu.scene.compile import HostCompiled
    from surf_tpu.wavefront import RenderConfig
    from surf_tpu.wavefront.integrator import (
        initial_seeds,
        render_frame_seeded,
    )

    host = HostCompiled(builtin.make_indoor_scene())
    scene = jax.device_put(host.render_scene)
    cam = builtin.make_indoor_camera(width, height)
    cp = CameraParams.from_camera(cam)
    # Chunk spp at host level: the remote tunnel kills multi-minute
    # single dispatches, and chunking keeps RNG streams identical.
    assert spp % spp_chunk == 0
    cfg = RenderConfig.for_scene(
        host.static, width, height, spp_chunk, use_defocus=True,
        use_pallas=use_pallas,
    )._replace(
        # Unbounded-mode while_loop with a wave cap: identical estimator to
        # a fori over max_bounces (dead lanes are masked), but exits as
        # soon as every path has terminated instead of paying all N waves.
        max_bounces=None, wave_limit=max_bounces, compact=use_pallas,
        # Round-3 A/B-tuned knobs (256^2@4spp, one-process comparisons):
        # 2048-ray packets beat 1024 even with exact row lists (666 vs
        # 719 ms — per-packet phase-1/1.5 fixed cost dominates the union
        # shrink); compaction cadence 4; width-ladder 4 rungs retires dead
        # lanes in the occupancy tail (1179 -> 666 ms, bit-identical).
        block_rays=2048 if use_pallas else 1024,
        # /2-factor ladder shrinks dispatch width from ~50% occupancy on
        # (waves 3-8 carry most width-proportional cost): 580 -> 559 ms
        # at 256^2@4spp, bit-identical (scripts/tpu_ladder_ab.py).
        ladder=6 if use_pallas else 0, ladder_shrink=2,
        # Morton lane->pixel order: packets become ~64x32 pixel tiles
        # instead of thin scanlines; bit-identical (r4 device A/B at
        # 256^2@4spp: 557 -> 550 ms; union-row study: primary -16%,
        # bounce -12%, shadow -24%).
        pixel_order="morton" if use_pallas else "native",
        # Round-5: compaction costs ~37 ms per full-width compact at 512^2
        # (wave_overhead.json); under the ladder the rung transitions
        # already stable-compact, so the in-loop cadence relaxes to 16
        # (538.8 -> 525.3 ms/sample at 512^2, bit-identical energies,
        # out_configs/compact_cadence.json).  lad0 still wants ce<=8 —
        # compaction pays for itself via packet liveness there.
        compact_every=16 if use_pallas else 4,
    )

    def frame(total_samples):
        seed = initial_seeds(cfg, total_samples)
        acc = None
        for _ in range(spp // spp_chunk):
            part, seed = render_frame_seeded(scene, cfg, cp, seed)
            acc = part if acc is None else acc + part
        return acc

    img = jax.block_until_ready(frame(0))  # compile + warmup
    t0 = time.perf_counter()
    for i in range(frames):
        img = frame((i + 1) * spp)
    jax.block_until_ready(img)
    dt = (time.perf_counter() - t0) / frames

    energy = float(np.asarray(img).sum()) / spp
    assert np.isfinite(energy) and energy > 0, "render produced bad energy"
    rays_per_s = width * height * spp / dt
    return rays_per_s, dt, energy


class _Timeout(Exception):
    pass


def _alarm(seconds):
    import signal

    def handler(signum, frame):
        raise _Timeout(f"stage exceeded {seconds}s")

    signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)


def _probe_device(seconds=90) -> bool:
    """True when the default backend answers a trivial computation quickly.
    The remote-TPU tunnel can wedge for minutes after a kernel fault; a dead
    probe routes the bench to the CPU fallback instead of hanging.  Runs in
    a subprocess so this process never initializes the (possibly wedged)
    backend before the fallback decision."""
    import signal
    import subprocess

    try:
        # Belt and braces: a killed child stuck in uninterruptible IO can
        # still hang subprocess.run's reaping — the alarm covers that too.
        _alarm(seconds + 30)
        out = subprocess.run(
            [sys.executable, "-c",
             "import warnings; warnings.filterwarnings('ignore');"
             "import jax, jax.numpy as jnp;"
             "(jnp.arange(4) + 1).block_until_ready(); print('OK')"],
            capture_output=True, timeout=seconds, text=True,
        )
        return "OK" in out.stdout
    except (Exception, _Timeout):
        return False
    finally:
        signal.alarm(0)


def main():
    import os
    import signal

    healthy = _probe_device()
    if not healthy and os.environ.get("PALLAS_AXON_POOL_IPS") and \
            not os.environ.get("SURF_BENCH_CPU_REEXEC"):
        # A wedged remote-TPU tunnel blocks *interpreter startup* via the
        # sitecustomize PJRT registration; re-exec without the axon env so
        # the CPU fallback actually runs.
        print("device probe failed; re-exec on CPU-only interpreter",
              file=sys.stderr)
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["SURF_BENCH_CPU_REEXEC"] = "1"
        os.execve(sys.executable, [sys.executable, __file__], env)
    if not healthy:
        print("device probe failed; falling back to CPU backend",
              file=sys.stderr)
        from surf_tpu.utils import force_cpu

        force_cpu()

    import jax

    backend = jax.default_backend()
    # spp per jitted dispatch (RNG/image bit-identical at any chunking —
    # render_frame_seeded carries the seed streams); >1 amortizes the
    # ~12 ms per-dispatch fixed cost, bounded so single dispatches stay
    # well under the remote tunnel's multi-minute kill window.
    spp_chunk = int(os.environ.get("SURF_SPP_CHUNK", "1"))
    attempts = [
        dict(width=512, height=512, spp=16, max_bounces=32,
             use_pallas=backend != "cpu", frames=2, spp_chunk=spp_chunk),
        dict(width=256, height=256, spp=4, max_bounces=32,
             use_pallas=backend != "cpu"),
        dict(width=128, height=128, spp=2, max_bounces=16,
             use_pallas=backend != "cpu", frames=2),
    ]
    if backend == "cpu":
        # XLA CPU compiles of the full render are minutes-slow; keep the
        # emergency fallback tiny (it only certifies liveness, not perf).
        attempts = [
            dict(width=64, height=64, spp=1, max_bounces=16,
                 use_pallas=False, frames=1),
            dict(width=32, height=32, spp=1, max_bounces=8,
                 use_pallas=False, frames=1),
        ]
    last_err = None
    for i, att in enumerate(attempts):
        try:
            _alarm(1500 if i == 0 else 600)
            rays_per_s, dt, energy = run_bench(**att)
            signal.alarm(0)
            print(json.dumps({
                "metric": "rays_per_s_chip",
                "value": rays_per_s,
                "unit": "rays/s",
                "vs_baseline": rays_per_s / BASELINE_RAYS_PER_S,
                "detail": {
                    "backend": backend,
                    "config": att,
                    "frame_time_s": dt,
                    "energy": energy,
                },
            }))
            return 0
        except Exception as e:  # noqa: BLE001 — fall back to smaller config
            last_err = e
            print(f"bench config {att} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
    print(json.dumps({
        "metric": "rays_per_s_chip", "value": 0.0, "unit": "rays/s",
        "vs_baseline": 0.0, "detail": {"error": str(last_err)[:300]},
    }))
    return 1


if __name__ == "__main__":
    sys.exit(main())
