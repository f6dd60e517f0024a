#!/usr/bin/env python
"""Dense-LeafTable candidate-count study for the bits traversal: does
direction-sorting rays shrink per-group candidate unions enough to pay
for per-(8,128)-sub-block lists (algo="bits8")?

Computes phase-1 semantics in NumPy (own-box slab sweep + hierarchical
ancestor AND on the 8-ary box chain) for bounce/shadow/primary rays in
shuffled / sorted / native order at group sizes 256..4096, and reports
the effective phase-2 vector work per ray:

    work(G) = rows(G) * max(G, 1024) / G      [vreg floor (8,128)]

(The earlier sub-block-list experiment LOST on unsorted rays —
tpu_frame_ab 256^2: 1431 ms vs 1191 packet-wide; this study asks whether
sorting changes the unions, before paying for an in-loop sort.)

Run: timeout 900 python -u scripts/bits_union_study.py
"""
import json
import sys

import numpy as np

sys.path.insert(0, ".")

from surf_tpu.scene import builtin  # noqa: E402
from surf_tpu.scene.compile import HostCompiled  # noqa: E402
from surf_tpu.utils import force_cpu  # noqa: E402

force_cpu()


def morton3(x, bits=8):
    out = np.zeros(len(x), np.uint64)
    for b in range(bits):
        for c in range(3):
            out |= ((x[:, c].astype(np.uint64) >> b) & 1) << (3 * b + c)
    return out


def sort_key(origin, direction, lo, hi):
    oct_ = ((direction[:, 0] < 0).astype(np.uint64)
            | ((direction[:, 1] < 0).astype(np.uint64) << 1)
            | ((direction[:, 2] < 0).astype(np.uint64) << 2))
    q = ((origin - lo) / np.maximum(hi - lo, 1e-9) * 255).clip(0, 255)
    return (oct_ << np.uint64(24)) | morton3(q.astype(np.uint32))


def candidates(box_lo, box_hi, anc_L, sizes, offs, o, d, tm):
    """Per-ray candidate leaf-row masks [n, L] (phase-1 + hierarchy AND)."""
    inv = 1.0 / np.where(np.abs(d) < 1e-20, np.where(d < 0, -1e-20, 1e-20), d)
    tn = (box_lo[:, :, None] - o.T[:, None, :]) * inv.T[:, None, :]
    tf = (box_hi[:, :, None] - o.T[:, None, :]) * inv.T[:, None, :]
    lo_ = np.minimum(tn, tf).max(axis=0)   # [E, n]
    hi_ = np.maximum(tn, tf).min(axis=0)
    hit = (hi_ >= lo_) & (lo_ < tm[None, :]) & (hi_ > 0)  # [E, n]
    v = hit[offs[len(sizes) - 1]][None, :]  # root [1, n]
    for k in range(len(sizes) - 2, -1, -1):
        idx = offs[k] + np.arange(sizes[k])
        v = hit[idx] & v[np.arange(sizes[k]) // 8]
    return v.T  # [n, L]


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

    tv0 = hc.samp_v0[hc.bvh.indices]
    lo, hi = tv0.min(axis=0), tv0.max(axis=0)

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
        n = len(o)
        perm = rng.permutation(n)
        os_, ds_, ts_ = o[perm], d[perm], tm[perm]
        sperm = np.argsort(sort_key(os_, ds_, lo, hi))
        orders = {
            "shuffled": (os_, ds_, ts_),
            "sorted": (os_[sperm], ds_[sperm], ts_[sperm]),
            "native": (o, d, tm),
        }
        for order, (oo, dd, tt) in orders.items():
            # per-ray candidate masks once, unions per group size from it
            n8 = (n // 2048) * 2048
            cand = candidates(box_lo, box_hi, L, sizes, offs,
                              oo[:n8], dd[:n8], tt[:n8])
            for G in (256, 512, 1024, 2048, 4096):
                if n8 < G:
                    continue
                gmask = cand[: (n8 // G) * G].reshape(-1, G, cand.shape[1])
                u = gmask.any(axis=1)                 # [npk, L]
                rows = u.sum(axis=1)                  # union rows per packet
                Lr = u.shape[1]
                pad = (-Lr) % 8
                up = np.pad(u, ((0, 0), (0, pad)))
                grp = up.reshape(len(u), -1, 8).any(axis=2)
                grows = grp.sum(axis=1) * 8           # rows if group lists
                work = rows.mean() * max(G, 1024) / G  # per-ray vreg work
                rec = dict(pop=name, order=order, G=G,
                           union_rows=float(rows.mean()),
                           group8_rows=float(grows.mean()),
                           per_ray_work=float(work))
                results.append(rec)
                print(f"{name:8s} {order:8s} G={G:5d} "
                      f"rows={rows.mean():7.1f} grp8rows={grows.mean():7.1f} "
                      f"work/ray={work:8.1f}", flush=True)
    with open("out_configs/bits_union_study.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
