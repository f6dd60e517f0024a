"""Offline (CPU/NumPy) study of packet-union traversal visit counts.

The Pallas stream kernel walks ONE cursor per ray block: a node row is
descended if ANY live ray hits ANY child slot (accel/pallas_wide.py).
Its cost is visits x per-visit-cost, so the redesign question is how the
visited-row count U(R) scales with packet size R and with ray coherence.
This script measures U(R) with a vectorized NumPy union walk on:

- primary rays in pixel order (coherent, what wave 0 sees),
- the same rays randomly permuted (the incoherent bounce-wave proxy),
- diffuse bounce rays (cosine hemisphere from first-hit points),
- NEE shadow rays (first-hit -> random light point, finite t_max),
  in both orders,
- each optionally pre-sorted by (direction octant, origin morton).

Output: one JSON line per config to stdout + out_configs/union_visits.json.
"""
from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from surf_tpu.scene import builtin  # noqa: E402
from surf_tpu.scene.compile import HostCompiled  # noqa: E402
from surf_tpu.accel.wide import (  # noqa: E402
    IS_LEAF_LANE, LEAF_TRIS, REC, SKIP_LANE, WIDTH)


def union_walk_visits(ws, origin, direction, t_max):
    """Vectorized union walk of one packet; returns (node_visits,
    leaf_visits, per-ray closest t).  Semantics = kernel skip walk:
    descend iff any ray hits any child slot (with its CURRENT best t)."""
    eps = np.float32(1e-5)
    o = np.asarray(origin, np.float32)
    d = np.asarray(direction, np.float32)
    d = np.where(np.abs(d) < 1e-20,
                 np.where(d < 0, np.float32(-1e-20), np.float32(1e-20)), d)
    inv = 1.0 / d
    best = np.asarray(t_max, np.float32).copy()
    stream = ws.stream
    meta = stream[:, IS_LEAF_LANE:SKIP_LANE + 1].view(np.int32)
    E = ws.n_entries
    p = 0
    nv = lv = 0
    while p < E:
        row = stream[p]
        is_leaf, skip = meta[p]
        if is_leaf:
            lv += 1
            for j in range(LEAF_TRIS):
                b = REC * j
                v0 = row[b:b + 3]
                e1 = row[b + 3:b + 6]
                e2 = row[b + 6:b + 9]
                h = np.cross(d, e2[None, :])
                a = h @ e1
                fa = np.where(np.abs(a) < eps, np.nan, 1.0 / a)
                s = o - v0[None, :]
                u = fa * np.einsum("ij,ij->i", s, h)
                q = np.cross(s, e1[None, :])
                v = fa * np.einsum("ij,ij->i", d, q)
                t = fa * (q @ e2)
                hit = ((np.abs(a) >= eps) & (u >= 0) & (u <= 1)
                       & (v >= 0) & (u + v <= 1) & (t >= eps) & (t < best))
                best = np.where(hit, t, best)
            p += 1
            continue
        nv += 1
        anyh = False
        for k in range(WIDTH):
            b = REC * k
            lo = row[b:b + 3]
            hi = row[b + 3:b + 6]
            tn = (lo[None, :] - o) * inv
            tf = (hi[None, :] - o) * inv
            tmin = np.minimum(tn, tf).max(axis=1)
            tmx = np.maximum(tn, tf).min(axis=1)
            if np.any((tmx >= tmin) & (tmin < best) & (tmx > 0)):
                anyh = True
                break
        p = p + 1 if anyh else skip
    return nv, lv, best


def morton3(x, bits=8):
    """Interleave 3 uint arrays (values < 2**bits) into morton codes."""
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


def main():
    rng = np.random.default_rng(0)
    sc = builtin.make_indoor_scene()
    hc = HostCompiled(sc)
    ws = hc._ws
    tv0 = hc.samp_v0[hc.bvh.indices]

    # scene bounds for morton
    lo = tv0.min(axis=0)
    hi = tv0.max(axis=0)

    # --- ray populations ---------------------------------------------------
    W = H = 128
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

    # first hits for bounce/shadow populations
    from surf_tpu.accel.wide import traverse_stream_np
    t0, rec0, _, _ = traverse_stream_np(ws, o0, dirs, np.full(N, 1e30, np.float32))
    hitm = rec0 >= 0
    hp = o0[hitm] + dirs[hitm] * t0[hitm][:, None]

    # diffuse bounce rays: cosine hemisphere around a crude normal (use -dir)
    nrm = -dirs[hitm]
    r1, r2 = rng.random(len(hp)), rng.random(len(hp))
    st = np.sqrt(r1)
    phi = 2 * np.pi * r2
    loc = np.stack([st * np.cos(phi), st * np.sin(phi), np.sqrt(1 - r1)], 1)
    w = nrm
    a_ = np.where(np.abs(w[:, 0:1]) > 0.9, [[0, 1, 0]], [[1, 0, 0]])
    u_ = np.cross(a_, w); u_ /= np.linalg.norm(u_, axis=1, keepdims=True)
    v_ = np.cross(w, u_)
    bd = (loc[:, 0:1] * u_ + loc[:, 1:2] * v_ + loc[:, 2:3] * w).astype(np.float32)
    bo = (hp + 1e-4 * bd).astype(np.float32)

    # shadow rays to a fixed light point (emissive cube area)
    light = np.array([0.0, 4.0, 0.0], np.float32)
    sv = light[None, :] - hp
    sd = np.linalg.norm(sv, axis=1)
    sdir = (sv / sd[:, None]).astype(np.float32)
    so = (hp + 1e-4 * sdir).astype(np.float32)

    pops = {
        "primary_coherent": (o0, dirs, np.full(N, 1e30, np.float32)),
        "bounce": (bo, bd, np.full(len(bo), 1e30, np.float32)),
        "shadow": (so, sdir, (sd - 2e-4).astype(np.float32)),
    }

    results = []
    E = ws.n_entries
    for name, (o, d, tm) in pops.items():
        n = len(o)
        perm = rng.permutation(n)
        os_, ds_, ts_ = o[perm], d[perm], tm[perm]  # incoherent order
        key = sort_key(os_, ds_, lo, hi)
        sperm = np.argsort(key)
        oS, dS, tS = os_[sperm], ds_[sperm], ts_[sperm]
        for order, (oo, dd, tt) in {
            "shuffled": (os_, ds_, ts_),
            "sorted": (oS, dS, tS),
            "native": (o, d, tm),
        }.items():
            for R in (256, 512, 1024, 2048):
                nvs, lvs = [], []
                npk = min(8, n // R)
                for b in range(npk):
                    nv, lv, _ = union_walk_visits(
                        ws, oo[b * R:(b + 1) * R], dd[b * R:(b + 1) * R],
                        tt[b * R:(b + 1) * R])
                    nvs.append(nv)
                    lvs.append(lv)
                rec = dict(pop=name, order=order, R=R,
                           node_visits=float(np.mean(nvs)),
                           leaf_visits=float(np.mean(lvs)),
                           visits=float(np.mean(nvs) + np.mean(lvs)),
                           frac_of_tree=float((np.mean(nvs) + np.mean(lvs)) / E))
                results.append(rec)
                print(json.dumps(rec), flush=True)
    with open("/root/repo/out_configs/union_visits.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
