#!/usr/bin/env python
"""CPU simulation: speculative multi-row visits for the 8-wide stream walk.

tpu_leaf_micro showed the per-visit cost is ~550ns of vector->scalar
pipeline drain (the any-reduce feeding the next row index), with row work
(extracts + MT/slab ALU) nearly free at ~2ns/extract marginal.  A visit
that processes W consecutive rows (p .. p+W-1) pays the drain ONCE; rows
past the first non-(+1) transition are wasted work (cheap).

This sim walks the real indoor-scene stream with kernel block semantics
(descend iff ANY ray in the block hits ANY child) and reports, per W:
serialized visit count (= drains) and total rows fetched (= extract work),
for primary-ray blocks of the real block size (1024 rays).
"""
import sys

sys.path.insert(0, ".")

import numpy as np

from surf_tpu.utils import force_cpu

force_cpu(1)

from surf_tpu.accel.wide import (IS_LEAF_LANE, LEAF_TRIS, REC, SKIP_LANE,
                                 WIDTH, build_wide_stream)
from surf_tpu.scene import builtin
from surf_tpu.scene.compile import HostCompiled

BLOCK = 1024
_EPS = np.float32(1e-5)


def walk_transitions(ws, origin, direction, t_max):
    """Block-level walk; returns the list of (p, next_p) transitions."""
    stream = ws.stream
    meta = stream[:, IS_LEAF_LANE:SKIP_LANE + 1].view(np.int32)
    E = ws.n_entries
    o = origin
    d = direction
    inv = np.float32(1.0) / d
    best_t = t_max.copy()
    trans = []
    p = 0
    while p < E:
        row = stream[p]
        is_leaf, skip = meta[p]
        if is_leaf:
            for j in range(LEAF_TRIS):
                b = REC * j
                v0 = row[b:b + 3]
                e1 = row[b + 3:b + 6]
                e2 = row[b + 6:b + 9]
                h = np.cross(d, e2)
                a = (e1 * h).sum(axis=1)
                with np.errstate(divide="ignore", invalid="ignore"):
                    f = 1.0 / a
                    s = o - v0
                    u = f * (s * h).sum(axis=1)
                    q = np.cross(s, e1)
                    v = f * (d * q).sum(axis=1)
                    t = f * (e2 * q).sum(axis=1)
                hit = ((np.abs(a) >= _EPS) & (u >= 0) & (u <= 1)
                       & (v >= 0) & (u + v <= 1) & (t >= _EPS)
                       & (t < best_t))
                best_t[hit] = t[hit]
            nxt = p + 1
        else:
            anyh = False
            for k in range(WIDTH):
                lo = row[REC * k:REC * k + 3]
                hi = row[REC * k + 3:REC * k + 6]
                tn = (lo - o) * inv
                tf = (hi - o) * inv
                tmin = np.minimum(tn, tf).max(axis=1)
                tmax_ = np.maximum(tn, tf).min(axis=1)
                if ((tmax_ >= tmin) & (tmin < best_t) & (tmax_ > 0)).any():
                    anyh = True
                    break
            nxt = p + 1 if anyh else int(skip)
        trans.append((p, nxt))
        p = nxt
    return trans


def main():
    host = HostCompiled(builtin.make_indoor_scene())
    perm = host.bvh.indices.astype(np.int64)
    ws = build_wide_stream(host.bvh, host.samp_v0[perm],
                           host.samp_v1[perm], host.samp_v2[perm])
    print(f"stream: {ws.n_entries} rows "
          f"({ws.n_node_rows} node / {ws.n_leaf_rows} leaf)")

    cam = builtin.make_indoor_camera(128, 128)
    res = 128
    first, uvec, vvec = cam.view_plane()
    xs, ys = np.meshgrid(np.arange(res), np.arange(res))
    u = (xs.reshape(-1) + 0.5) / res
    v = (ys.reshape(-1) + 0.5) / res
    plane = first[None] + u[:, None] * uvec[None] + v[:, None] * vvec[None]
    o = np.broadcast_to(cam.position, (res * res, 3)).astype(np.float32)
    d = plane - o
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    d = np.where(np.abs(d) < 1e-20, 1e-20, d)

    tot_v = {w: 0 for w in (1, 2, 3, 4, 6, 8)}
    tot_rows = {w: 0 for w in (1, 2, 3, 4, 6, 8)}
    plus1 = 0
    n_tr = 0
    rng = np.random.default_rng(0)
    blocks = rng.choice(res * res // BLOCK, size=8, replace=False)
    for bi in blocks:
        s = bi * BLOCK
        trans = walk_transitions(
            ws, o[s:s + BLOCK], d[s:s + BLOCK],
            np.full(BLOCK, 1e30, np.float32))
        n_tr += len(trans)
        plus1 += sum(1 for p, n in trans if n == p + 1)
        for w in tot_v:
            i = 0
            v = 0
            rows = 0
            while i < len(trans):
                # one visit processes rows p..p+w-1; follow transitions
                # while they stay inside the speculated span
                p0 = trans[i][0]
                j = i
                while (j < len(trans) and trans[j][0] < p0 + w
                       and trans[j][0] >= p0):
                    j += 1
                v += 1
                rows += w
                i = j
            tot_v[w] += v
            tot_rows[w] += rows
    print(f"transitions: {n_tr}, +1 fraction: {plus1 / n_tr:.3f}")
    for w in sorted(tot_v):
        print(f"W={w}: serialized visits {tot_v[w]:7d} "
              f"({tot_v[w] / tot_v[1]:.3f}x)  rows fetched {tot_rows[w]:8d} "
              f"({tot_rows[w] / tot_v[1]:.2f} rows/base-visit)")
    # time model: visit = drain D + rows * work; D=550ns, work=150ns/row
    for D, wk in ((550, 150), (550, 250)):
        print(f"model D={D}ns work={wk}ns/row:")
        base = tot_v[1] * (D + wk)
        for w in sorted(tot_v):
            t = tot_v[w] * D + tot_rows[w] * wk
            print(f"  W={w}: {t / base:.3f}x of W=1")


if __name__ == "__main__":
    main()
