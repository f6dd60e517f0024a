#!/usr/bin/env python
"""Does a Morton (Z-order) lane->pixel mapping shrink per-packet candidate
unions at bench geometry (256^2, G=2048)?

Round-3 finding: per-ray candidates are ~4.5 rows but a 2048-ray packet's
union is ~772 rows (primary) / ~940 (bounce) — ~200x redundant phase-2 row
work, and per-row cost is at its measured floor.  The round-3 union study
ran at 96^2 where a 2048-ray packet is already a fat 21-scanline tile; at
256^2 the native row-major order gives 8 THIN scanlines (256 wide) per
packet.  A Morton order makes every aligned 2048-lane packet a compact
64x32 staircase tile, which should tighten the packet frustum for primary
AND (via inherited pixel locality under stable compaction) bounce/shadow
waves.

Models the integrator exactly: lanes are permuted once at raygen
(lane i -> pixel perm[i]); bounce/shadow rays keep their lane, and
stable compaction keeps lane order, so wave-k packets are contiguous
runs of ALIVE lanes in the chosen pixel order.

Run: timeout 1800 python -u scripts/morton_pixel_study.py
"""
import json
import sys

import numpy as np

sys.path.insert(0, ".")

from surf_tpu.scene import builtin  # noqa: E402
from surf_tpu.scene.compile import HostCompiled  # noqa: E402
from surf_tpu.utils import force_cpu  # noqa: E402

force_cpu()

G = 2048
W = H = 256


def morton2(x, y, bits=8):
    out = np.zeros(len(x), np.uint32)
    for b in range(bits):
        out |= ((x >> b) & 1) << (2 * b)
        out |= ((y >> b) & 1) << (2 * b + 1)
    return out


def packet_union_rows(box_lo, box_hi, sizes, offs, o, d, tm, chunk=512):
    """Union candidate-leaf-row count for ONE packet of rays (phase-1 +
    hierarchy-AND semantics, as accel/pallas_wide phase 1)."""
    n = len(o)
    L = sizes[0]
    u = np.zeros(L, bool)
    for s in range(0, n, chunk):
        oo, dd, tt = o[s:s + chunk], d[s:s + chunk], tm[s:s + chunk]
        inv = 1.0 / np.where(np.abs(dd) < 1e-20,
                             np.where(dd < 0, -1e-20, 1e-20), dd)
        tn = (box_lo[:, :, None] - oo.T[:, None, :]) * inv.T[:, None, :]
        tf = (box_hi[:, :, None] - oo.T[:, None, :]) * inv.T[:, None, :]
        lo_ = np.minimum(tn, tf).max(axis=0)
        hi_ = np.maximum(tn, tf).min(axis=0)
        hit = (hi_ >= lo_) & (lo_ < tt[None, :]) & (hi_ > 0)
        v = hit[offs[len(sizes) - 1]][None, :]
        for k in range(len(sizes) - 2, -1, -1):
            idx = offs[k] + np.arange(sizes[k])
            v = hit[idx] & v[np.arange(sizes[k]) // 8]
        u |= v.any(axis=1)
    return int(u.sum())


def unions(box_lo, box_hi, sizes, offs, o, d, tm, alive=None):
    """Mean union rows over aligned G-packets of the (compacted) rays."""
    if alive is not None:
        o, d, tm = o[alive], d[alive], tm[alive]
    n8 = (len(o) // G) * G
    rows = [packet_union_rows(box_lo, box_hi, sizes, offs,
                              o[s:s + G], d[s:s + G], tm[s:s + G])
            for s in range(0, n8, G)]
    return float(np.mean(rows)), len(rows)


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

    print("tracing first hits for bounce/shadow pops...", flush=True)
    from surf_tpu.accel.wide import traverse_stream_np

    t0, rec0, _, _ = traverse_stream_np(
        hc._ws, o0, dirs, np.full(N, 1e30, np.float32))
    hitm = rec0 >= 0
    hp = o0 + dirs * np.where(hitm, t0, 1.0)[:, None]
    nrm = -dirs
    r1, r2 = rng.random(N), rng.random(N)
    st = np.sqrt(r1)
    phi = 2 * np.pi * r2
    loc = np.stack([st * np.cos(phi), st * np.sin(phi), np.sqrt(1 - r1)], 1)
    w_ = nrm
    a_ = np.where(np.abs(w_[:, 0:1]) > 0.9, [[0, 1, 0]], [[1, 0, 0]])
    u_ = np.cross(a_, w_)
    u_ /= np.linalg.norm(u_, axis=1, keepdims=True)
    v_ = np.cross(w_, u_)
    bd = (loc[:, 0:1] * u_ + loc[:, 1:2] * v_
          + loc[:, 2:3] * w_).astype(np.float32)
    bo = (hp + 1e-4 * bd).astype(np.float32)

    light = np.array([0.0, 4.0, 0.0], np.float32)
    sv = light[None, :] - hp
    sd = np.linalg.norm(sv, axis=1)
    sdir = (sv / sd[:, None]).astype(np.float32)
    so = (hp + 1e-4 * sdir).astype(np.float32)

    px = np.arange(N, dtype=np.uint32) % W
    py = np.arange(N, dtype=np.uint32) // W
    orders = {
        "native": np.arange(N),
        "morton": np.argsort(morton2(px, py), kind="stable"),
    }

    pops = {
        "primary": (o0, dirs, np.full(N, 1e30, np.float32), None),
        "bounce": (bo, bd, np.full(N, 1e30, np.float32), hitm),
        "shadow": (so, sdir, (sd - 2e-4).astype(np.float32), hitm),
    }

    results = []
    for oname, perm in orders.items():
        for pname, (o, d, tm, alive) in pops.items():
            a = alive[perm] if alive is not None else None
            rows, npk = unions(box_lo, box_hi, sizes, offs,
                               o[perm], d[perm], tm[perm], a)
            rec = dict(order=oname, pop=pname, G=G, res=W,
                       union_rows=rows, packets=npk)
            results.append(rec)
            print(f"{oname:8s} {pname:8s} rows={rows:7.1f} "
                  f"({npk} packets)", flush=True)
    with open("out_configs/morton_pixel_study.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
