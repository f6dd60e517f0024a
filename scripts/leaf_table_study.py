"""Offline comparison of bits-path culling domains (CPU/NumPy):

(a) the wide-collapse stream's leaf rows (SAH-shaped, ~42% occupancy on
    the indoor scene: 9,846 rows for 32,836 tris), vs
(b) a dense leaf table: 8 consecutive leaf-order tris per row (~100%
    occupancy, 4,105 rows) with an arithmetic 8-ary box hierarchy.

The phase-2 kernel cost is visited_rows x fixed row cost (padding slots
cost the same vector work as real triangles), and phase-1 cost is total
rows, so (b) wins if its visited-row count is not ~2.4x worse.  Measures
visited leaf rows under own-box + ancestor-AND culling for both, on the
same ray populations as union_visits_study.
"""
from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from surf_tpu.scene import builtin  # noqa: E402
from surf_tpu.scene.compile import HostCompiled  # noqa: E402
from surf_tpu.accel.wide import IS_LEAF_LANE  # noqa: E402


def slab_any(lo, hi, o, inv, tm):
    """lo/hi [E,3], rays [R,3] -> [E] any-ray-hit (initial t bounds)."""
    tmin = None
    tmax_ = None
    for c in range(3):
        tn = (lo[:, None, c] - o[None, :, c]) * inv[None, :, c]
        tf = (hi[:, None, c] - o[None, :, c]) * inv[None, :, c]
        a = np.minimum(tn, tf)
        b = np.maximum(tn, tf)
        tmin = a if tmin is None else np.maximum(tmin, a)
        tmax_ = b if tmax_ is None else np.minimum(tmax_, b)
    with np.errstate(invalid="ignore"):
        hit = (tmax_ >= tmin) & (tmin < tm[None, :]) & (tmax_ > 0)
    return hit.any(axis=1)


def visited_count(box_lo, box_hi, anc, leaf_ids, o, d, tm):
    inv = 1.0 / np.where(np.abs(d) < 1e-20,
                         np.where(d < 0, -1e-20, 1e-20), d)
    bits = slab_any(box_lo, box_hi, o, inv, tm)
    vis = bits[anc[leaf_ids, 0]]
    for k in range(1, anc.shape[1]):
        vis = vis & bits[anc[leaf_ids, k]]
    return int(vis.sum())


def dense_table_meta(T, tlo, thi, arity=8):
    """Boxes + ancestor chains for a dense leaf table over T leaf-order
    tris: rows of `arity`, 8-ary hierarchy over consecutive rows."""
    n0 = -(-T // arity)
    lo_rows = np.full((n0, 3), np.inf, np.float32)
    hi_rows = np.full((n0, 3), -np.inf, np.float32)
    idx = np.arange(T) // arity
    np.minimum.at(lo_rows, idx, tlo)
    np.maximum.at(hi_rows, idx, thi)
    levels_lo = [lo_rows]
    levels_hi = [hi_rows]
    while len(levels_lo[-1]) > 1:
        cur_lo, cur_hi = levels_lo[-1], levels_hi[-1]
        n = len(cur_lo)
        np_ = -(-n // 8)
        plo = np.full((np_, 3), np.inf, np.float32)
        phi = np.full((np_, 3), -np.inf, np.float32)
        gid = np.arange(n) // 8
        np.minimum.at(plo, gid, cur_lo)
        np.maximum.at(phi, gid, cur_hi)
        levels_lo.append(plo)
        levels_hi.append(phi)
    box_lo = np.concatenate(levels_lo)
    box_hi = np.concatenate(levels_hi)
    offs = np.cumsum([0] + [len(x) for x in levels_lo])
    maxd = len(levels_lo)
    anc = np.empty((len(box_lo), maxd), np.int64)
    # only leaf-row chains are used
    r = np.arange(n0)
    for k in range(maxd):
        anc[:n0, k] = offs[k] + (r // (8 ** k)) if k < maxd else 0
    anc[n0:] = 0
    return box_lo, box_hi, anc[:n0], len(box_lo)


def main():
    rng = np.random.default_rng(0)
    sc = builtin.make_indoor_scene()
    hc = HostCompiled(sc)
    ws = hc._ws
    perm = hc.bvh.indices.astype(np.int64)
    tv0 = hc.samp_v0[perm]
    tv1 = hc.samp_v1[perm]
    tv2 = hc.samp_v2[perm]
    T = len(tv0)
    tlo = np.minimum(np.minimum(tv0, tv1), tv2).astype(np.float32)
    thi = np.maximum(np.maximum(tv0, tv1), tv2).astype(np.float32)

    # (a) stream layout
    meta_i = ws.stream[:, IS_LEAF_LANE].view(np.int32)
    leaf_ids_a = np.nonzero(meta_i[:ws.n_entries] == 1)[0]
    anc_a = ws.anc.astype(np.int64)
    lo_a, hi_a = ws.box_lo, ws.box_hi
    E_a = ws.stream.shape[0]

    # (b) dense table
    lo_b, hi_b, anc_b, E_b = dense_table_meta(T, tlo, thi)
    n0_b = len(anc_b)

    # rays: primary + bounce + shadow (see union_visits_study)
    W = H = 128
    cam = builtin.make_indoor_camera(W, H)
    fp, uv, vv = cam.view_plane()
    pos = np.asarray(cam.position, np.float32)
    xs, ys = np.meshgrid((np.arange(W) + .5) / W, (np.arange(H) + .5) / H)
    pts = (np.asarray(fp)[None] + xs.reshape(-1, 1) * np.asarray(uv)[None]
           + ys.reshape(-1, 1) * np.asarray(vv)[None])
    dirs = (pts - pos[None]).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    o0 = np.broadcast_to(pos, dirs.shape).astype(np.float32).copy()
    N = W * H
    from surf_tpu.accel.wide import traverse_stream_np
    t0, rec0, _, _ = traverse_stream_np(ws, o0, dirs,
                                        np.full(N, 1e30, np.float32))
    hitm = rec0 >= 0
    hp = o0[hitm] + dirs[hitm] * t0[hitm][:, None]
    nrm = -dirs[hitm]
    r1, r2 = rng.random(len(hp)), rng.random(len(hp))
    st = np.sqrt(r1)
    phi = 2 * np.pi * r2
    loc = np.stack([st * np.cos(phi), st * np.sin(phi), np.sqrt(1 - r1)], 1)
    a_ = np.where(np.abs(nrm[:, 0:1]) > 0.9, [[0, 1, 0]], [[1, 0, 0]])
    u_ = np.cross(a_, nrm)
    u_ /= np.linalg.norm(u_, axis=1, keepdims=True)
    v_ = np.cross(nrm, u_)
    bd = (loc[:, :1] * u_ + loc[:, 1:2] * v_ + loc[:, 2:] * nrm
          ).astype(np.float32)
    bo = (hp + 1e-4 * bd).astype(np.float32)
    light = np.array([0., 4., 0.], np.float32)
    sv = light[None] - hp
    sd = np.linalg.norm(sv, axis=1)
    sdir = (sv / sd[:, None]).astype(np.float32)
    so = (hp + 1e-4 * sdir).astype(np.float32)

    pops = {
        "primary": (o0, dirs, np.full(N, 1e30, np.float32)),
        "bounce": (bo, bd, np.full(len(bo), 1e30, np.float32)),
        "shadow": (so, sdir, (sd - 2e-4).astype(np.float32)),
    }
    out = {"rows_a": int(len(leaf_ids_a)), "rows_b": int(n0_b),
           "E_a": int(E_a), "E_b": int(E_b), "pops": {}}
    for name, (o, d, tm) in pops.items():
        n = len(o)
        perm_r = rng.permutation(n)
        o, d, tm = o[perm_r], d[perm_r], tm[perm_r]
        res = {}
        for R in (1024, 2048):
            va, vb = [], []
            for b in range(min(6, n // R)):
                sl = slice(b * R, (b + 1) * R)
                va.append(visited_count(lo_a, hi_a, anc_a, leaf_ids_a,
                                        o[sl], d[sl], tm[sl]))
                vb.append(visited_count(lo_b, hi_b, anc_b,
                                        np.arange(n0_b),
                                        o[sl], d[sl], tm[sl]))
            res[R] = dict(visited_a=float(np.mean(va)),
                          visited_b=float(np.mean(vb)))
        out["pops"][name] = res
        print(name, res, flush=True)
    print(json.dumps(out))
    with open("/root/repo/out_configs/leaf_table_study.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
