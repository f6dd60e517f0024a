#!/usr/bin/env python
"""Leaf-order study (round-4 lever validation): the dense LeafTable packs
8 CONSECUTIVE leaf-order tris per row; candidate-union size depends on
how tightly that order clusters geometry.  Compares, on the indoor scene
(primary + bounce pops, native ray order):

  sah    : the SAH DFS leaf order (current)
  morton : global Morton order of tri centroids
  hilb   : Morton with 16-bit quantization (finer)

Metrics: mean per-ray exact candidate rows, union(2048), union(256).
Pure CPU/NumPy — run before touching any kernel.

Run: timeout 900 python -u scripts/leaf_order_study.py
"""
import json
import sys

import numpy as np

sys.path.insert(0, ".")

from surf_tpu.scene import builtin  # noqa: E402
from surf_tpu.scene.compile import HostCompiled  # noqa: E402
from surf_tpu.utils import force_cpu  # noqa: E402

force_cpu()


def morton3(q, bits):
    out = np.zeros(len(q), np.uint64)
    for b in range(bits):
        for c in range(3):
            out |= ((q[:, c].astype(np.uint64) >> b) & 1) << (3 * b + c)
    return out


def candidates(box_lo, box_hi, sizes, offs, o, d, tm):
    inv = 1.0 / np.where(np.abs(d) < 1e-20,
                         np.where(d < 0, -1e-20, 1e-20), d)
    tn = (box_lo[:, :, None] - o.T[:, None, :]) * inv.T[:, None, :]
    tf = (box_hi[:, :, None] - o.T[:, None, :]) * inv.T[:, None, :]
    lo_ = np.minimum(tn, tf).max(axis=0)
    hi_ = np.maximum(tn, tf).min(axis=0)
    hit = (hi_ >= lo_) & (lo_ < tm[None, :]) & (hi_ > 0)
    v = hit[offs[len(sizes) - 1]][None, :]
    for k in range(len(sizes) - 2, -1, -1):
        idx = offs[k] + np.arange(sizes[k])
        v = hit[idx] & v[np.arange(sizes[k]) // 8]
    return v.T  # [n, L]


def table_boxes(tv0, tv1, tv2):
    from surf_tpu.accel.wide import build_leaf_table

    lt = build_leaf_table(tv0, tv1, tv2)
    L = lt.anc.shape[0]
    sizes = [L]
    while sizes[-1] > 1:
        sizes.append(-(-sizes[-1] // 8))
    offs = np.concatenate([[0], np.cumsum(sizes)]).tolist()
    return lt.box_lo.T, lt.box_hi.T, sizes, offs, L


def main():
    rng = np.random.default_rng(0)
    hc = HostCompiled(builtin.make_indoor_scene())
    perm0 = hc.bvh.indices  # leaf-order permutation used by the render path
    v0 = hc.samp_v0[perm0]
    v1 = hc.samp_v1[perm0]
    v2 = hc.samp_v2[perm0]

    cent = (v0 + v1 + v2) / 3.0
    lo, hi = cent.min(axis=0), cent.max(axis=0)

    def quant(bits):
        q = ((cent - lo) / np.maximum(hi - lo, 1e-9)
             * ((1 << bits) - 1)).astype(np.uint32)
        return np.argsort(morton3(q, bits), kind="stable")

    orders = {
        "sah": np.arange(len(v0)),
        "morton10": quant(10),
        "morton16": quant(16),
    }

    # ray populations (reuse bits_union_study's construction)
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
    vdir = np.cross(w, u_)
    bd = (loc[:, 0:1] * u_ + loc[:, 1:2] * vdir
          + loc[:, 2:3] * w).astype(np.float32)
    bo = (hp + 1e-4 * bd).astype(np.float32)

    pops = {
        "primary": (o0, dirs, np.full(N, 1e30, np.float32)),
        "bounce": (bo, bd, np.full(len(bo), 1e30, np.float32)),
    }

    results = []
    for oname, perm in orders.items():
        blo, bhi, sizes, offs, L = table_boxes(v0[perm], v1[perm], v2[perm])
        for pname, (o, d, tm) in pops.items():
            n8 = (len(o) // 2048) * 2048
            cand = candidates(blo, bhi, sizes, offs, o[:n8], d[:n8], tm[:n8])
            per_ray = cand.sum(axis=1)
            un2048 = cand.reshape(-1, 2048, L).any(axis=1).sum(axis=1)
            un256 = cand.reshape(-1, 256, L).any(axis=1).sum(axis=1)
            rec = dict(order=oname, pop=pname, L=L,
                       per_ray_rows=float(per_ray.mean()),
                       union2048=float(un2048.mean()),
                       union256=float(un256.mean()))
            results.append(rec)
            print(f"{oname:9s} {pname:8s} L={L:5d} "
                  f"per_ray={per_ray.mean():6.2f} "
                  f"u2048={un2048.mean():7.1f} u256={un256.mean():6.1f}",
                  flush=True)
    with open("out_configs/leaf_order_study.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote out_configs/leaf_order_study.json", flush=True)


if __name__ == "__main__":
    main()
