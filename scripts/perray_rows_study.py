#!/usr/bin/env python
"""Per-RAY candidate-row statistics for a dense pair-list phase 2.

The bits kernel charges every ray the MT math of its whole packet's
candidate union (~1290 rows at 2048-ray bounce packets).  A per-ray
formulation would process only each ray's own candidates, densely packed
to a fixed cap: work/ray = cap * 8 tri tests, HBM traffic = cap rows *
512 B per ray.  This study measures, on the indoor scene (same ray
populations as bits_union_study):

  - per-ray exact candidate ROW counts (mean / p50 / p95 / p99 / max)
  - per-ray candidate GROUP counts (8-row granularity, the list the
    one-hot contraction can build cheaply at [G, L1] x [L1, capg])
  - overflow fraction at candidate caps (rows: 32..256, groups: 8..64)

Decides whether an XLA dense gather + [G, cap, 8]-MT phase 2 ("pairs")
can beat the union kernel: projected win = union_rows/(cap_rows_padded),
gated by gather bandwidth (~2G rows/s measured) and overflow fallback.

Run: timeout 900 python -u scripts/perray_rows_study.py
"""
import json
import sys

import numpy as np

sys.path.insert(0, ".")

from surf_tpu.scene import builtin  # noqa: E402
from surf_tpu.scene.compile import HostCompiled  # noqa: E402
from surf_tpu.utils import force_cpu  # noqa: E402

force_cpu()

sys.path.insert(0, "scripts")
from bits_union_study import candidates  # noqa: E402  (same phase-1 semantics)


def main():
    rng = np.random.default_rng(0)
    hc = HostCompiled(builtin.make_indoor_scene())
    from surf_tpu.accel.pallas_wide import device_wide_trace

    wt = device_wide_trace(hc._ws)
    box_lo = np.asarray(wt.box_lo)
    box_hi = np.asarray(wt.box_hi)
    L = int(wt.anc.shape[0])
    sizes = [L]
    while sizes[-1] > 1:
        sizes.append(-(-sizes[-1] // 8))
    offs = np.concatenate([[0], np.cumsum(sizes)]).tolist()

    W = H = 96
    cam = builtin.make_indoor_camera(W, H)
    fp, uv, vv = cam.view_plane()
    pos = np.asarray(cam.position, np.float32)
    xs, ys = np.meshgrid((np.arange(W) + 0.5) / W, (np.arange(H) + 0.5) / H)
    pts = (np.asarray(fp)[None, :]
           + xs.reshape(-1, 1) * np.asarray(uv)[None, :]
           + ys.reshape(-1, 1) * np.asarray(vv)[None, :])
    dirs = pts - pos[None, :]
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    o0 = np.broadcast_to(pos, dirs.shape).astype(np.float32).copy()
    dirs = dirs.astype(np.float32)
    N = W * H

    from surf_tpu.accel.wide import traverse_stream_np

    t0, rec0, _, _ = traverse_stream_np(
        hc._ws, o0, dirs, np.full(N, 1e30, np.float32))
    hitm = rec0 >= 0
    hp = o0[hitm] + dirs[hitm] * t0[hitm][:, None]
    nrm = -dirs[hitm]
    r1, r2 = rng.random(len(hp)), rng.random(len(hp))
    st = np.sqrt(r1)
    phi = 2 * np.pi * r2
    loc = np.stack([st * np.cos(phi), st * np.sin(phi), np.sqrt(1 - r1)], 1)
    w = nrm
    a_ = np.where(np.abs(w[:, 0:1]) > 0.9, [[0, 1, 0]], [[1, 0, 0]])
    u_ = np.cross(a_, w)
    u_ /= np.linalg.norm(u_, axis=1, keepdims=True)
    v_ = np.cross(w, u_)
    bd = (loc[:, 0:1] * u_ + loc[:, 1:2] * v_
          + loc[:, 2:3] * w).astype(np.float32)
    bo = (hp + 1e-4 * bd).astype(np.float32)

    light = np.array([0.0, 4.0, 0.0], np.float32)
    sv = light[None, :] - hp
    sd = np.linalg.norm(sv, axis=1)
    sdir = (sv / sd[:, None]).astype(np.float32)
    so = (hp + 1e-4 * sdir).astype(np.float32)

    pops = {
        "primary": (o0, dirs, np.full(N, 1e30, np.float32)),
        "bounce": (bo, bd, np.full(len(bo), 1e30, np.float32)),
        "shadow": (so, sdir, (sd - 2e-4).astype(np.float32)),
    }

    results = []
    for name, (o, d, tm) in pops.items():
        vis = candidates(box_lo, box_hi, L, sizes, offs, o, d, tm)  # [n, L]
        rows = vis.sum(axis=1)
        L1 = sizes[1]
        padL = L1 * 8 - L
        visg = np.pad(vis, ((0, 0), (0, padL))).reshape(-1, L1, 8).any(2)
        grps = visg.sum(axis=1)
        q = lambda a: {  # noqa: E731
            "mean": float(a.mean()), "p50": float(np.percentile(a, 50)),
            "p95": float(np.percentile(a, 95)),
            "p99": float(np.percentile(a, 99)), "max": int(a.max())}
        rec = {"pop": name, "n": int(len(o)),
               "rows": q(rows), "groups": q(grps)}
        rec["row_overflow"] = {c: float((rows > c).mean())
                               for c in (32, 48, 64, 96, 128, 192, 256)}
        rec["grp_overflow"] = {c: float((grps > c).mean())
                               for c in (8, 12, 16, 24, 32, 48, 64)}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    with open("out_configs/perray_rows_study.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
