#!/usr/bin/env python
"""CPU simulation: packet-traversal visit counts for candidate kernel
designs on the indoor scene.  A 'visit' = one row fetch + one vector test
(~21.5ns by tpu_body_micro), so visit counts map ~linearly to kernel time.

Designs:
  bin-skip : current binary skip-link packet walk (visit = node OR one tri)
  wide-skip: 8-wide skip-link, leaf rows inline as DFS entries
  wide-stk : 8-wide with per-child stack pruning (+ leaf rows)

Ray sets: coherent primary block, incoherent random, incoherent sorted by
direction octant + origin cell.
"""
import sys

sys.path.insert(0, ".")

import numpy as np

from surf_tpu.utils import force_cpu

force_cpu(1)

from surf_tpu.scene import builtin
from surf_tpu.scene.compile import HostCompiled
from surf_tpu.accel.wide import build_wide, WIDTH


def slab(lo, hi, o, inv, t_best):
    tn = (lo[None, :] - o) * inv
    tf = (hi[None, :] - o) * inv
    tmin = np.minimum(tn, tf).max(axis=1)
    tmax = np.maximum(tn, tf).min(axis=1)
    return (tmax >= tmin) & (tmin < t_best) & (tmax > 0)


def sim_binary(host, o, d, block):
    from surf_tpu.accel.traverse import build_skiplinks
    boxes, meta = build_skiplinks(host.bvh)
    inv = 1.0 / d
    n_nodes = len(boxes)
    total = 0
    for s in range(0, len(o), block):
        ob, ib = o[s:s + block], inv[s:s + block]
        t_best = np.full(len(ob), 1e30, np.float32)
        dfs = 0
        while dfs < n_nodes:
            total += 1
            hit = slab(boxes[dfs, :3], boxes[dfs, 3:], ob, ib, t_best)
            anyh = hit.any()
            leaf_count = meta[dfs, 1]
            if anyh and leaf_count > 0:
                total += int(leaf_count)  # one visit per tri fetch
            dfs = dfs + 1 if (anyh and leaf_count == 0) else meta[dfs, 2]
    return total


def wide_arrays(host):
    perm = host.bvh.indices.astype(np.int64)
    tv0 = host.samp_v0[perm]
    tv1 = host.samp_v1[perm]
    tv2 = host.samp_v2[perm]
    wide = build_wide(host.bvh, tv0, tv1, tv2)
    nodes = wide.nodes
    meta = nodes[:, 8:13].view(np.int32)
    boxes = np.zeros((len(nodes), WIDTH, 6), np.float32)
    for k in range(WIDTH):
        boxes[:, k, :3] = nodes[:, 16 * k:16 * k + 3]
        boxes[:, k, 3:] = nodes[:, 16 * k + 3:16 * k + 6]
    return wide, boxes, meta


def sim_wide_stack(host, o, d, block):
    wide, boxes, meta = wide_arrays(host)
    inv = 1.0 / d
    total = 0
    for s in range(0, len(o), block):
        ob, ib = o[s:s + block], inv[s:s + block]
        t_best = np.full(len(ob), 1e30, np.float32)
        stack = [0]
        while stack:
            ni = stack.pop()
            total += 1
            cb, lb, types, iranks, lranks = meta[ni]
            for k in range(WIDTH):
                ty = (types >> (2 * k)) & 3
                if ty == 0:
                    continue
                hit = slab(boxes[ni, k, :3], boxes[ni, k, 3:], ob, ib,
                           t_best).any()
                if not hit:
                    continue
                if ty == 1:
                    stack.append(cb + ((iranks >> (4 * k)) & 15))
                else:
                    total += 1  # leaf-row fetch+test visit
    return total


def sim_wide_skip(host, o, d, block):
    """Unified DFS stream: node entries + leaf-row entries; descend iff any
    child (interior or leaf) hit; leaf rows visited unconditionally once
    parent descends."""
    wide, boxes, meta = wide_arrays(host)
    # Build DFS stream: entry list with skip links.
    # entry: ('n', ni) or ('l', row)
    stream = []
    skip = []

    def emit(ni):
        pos = len(stream)
        stream.append(("n", ni))
        skip.append(-1)
        cb, lb, types, iranks, lranks = meta[ni]
        for k in range(WIDTH):
            ty = (types >> (2 * k)) & 3
            if ty == 2:
                stream.append(("l", lb + ((lranks >> (4 * k)) & 15)))
                skip.append(len(stream))  # leaf entry: skip = next
        for k in range(WIDTH):
            ty = (types >> (2 * k)) & 3
            if ty == 1:
                emit(cb + ((iranks >> (4 * k)) & 15))
        skip[pos] = len(stream)

    sys.setrecursionlimit(100000)
    emit(0)
    n_entries = len(stream)
    inv = 1.0 / d
    total = 0
    for s in range(0, len(o), block):
        ob, ib = o[s:s + block], inv[s:s + block]
        t_best = np.full(len(ob), 1e30, np.float32)
        p = 0
        while p < n_entries:
            total += 1
            kind, idx = stream[p]
            if kind == "l":
                p += 1
                continue
            cb, lb, types, iranks, lranks = meta[idx]
            anyh = False
            for k in range(WIDTH):
                ty = (types >> (2 * k)) & 3
                if ty == 0:
                    continue
                if slab(boxes[idx, k, :3], boxes[idx, k, 3:], ob, ib,
                        t_best).any():
                    anyh = True
                    break
            p = p + 1 if anyh else skip[p]
    return total


def main():
    host = HostCompiled(builtin.make_indoor_scene())
    n = 16384

    from surf_tpu.scene.camera import CameraParams, view_plane_jnp
    from surf_tpu.wavefront import RenderConfig
    from surf_tpu.wavefront.integrator import initial_seeds, ray_generation
    import jax.numpy as jnp
    W = H = 128
    cam = builtin.make_indoor_camera(W, H)
    cp = CameraParams.from_camera(cam)
    cfg = RenderConfig.for_scene(host.static, W, H, 1, use_defocus=True,
                                 use_pallas=False)
    vp = view_plane_jnp(cp, W, H)
    lanes = jnp.arange(n, dtype=jnp.uint32)
    px = (lanes % jnp.uint32(W)).astype(jnp.int32)
    py = (lanes // jnp.uint32(W)).astype(jnp.int32)
    _, o_pri, d_pri = ray_generation(cfg, vp, initial_seeds(cfg, jnp.uint32(0))[:n], px, py)
    o_pri = np.asarray(o_pri)
    d_pri = np.asarray(d_pri)

    rng = np.random.default_rng(0)
    o_inc = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    d_inc = rng.normal(size=(n, 3)).astype(np.float32)
    d_inc /= np.linalg.norm(d_inc, axis=1, keepdims=True)

    octant = ((d_inc[:, 0] >= 0) + 2 * (d_inc[:, 1] >= 0)
              + 4 * (d_inc[:, 2] >= 0)).astype(int)
    cell = np.clip(((o_inc + 16) * (8 / 32)).astype(int), 0, 7)
    key = ((octant * 64 + cell[:, 0] * 8 + cell[:, 1]) * 8 + cell[:, 2])
    perm = np.argsort(key, kind="stable")
    o_srt, d_srt = o_inc[perm], d_inc[perm]

    for block in (1024, 128):
        print(f"--- block={block} (visits per {n} rays; 1 visit ~ 21.5ns)")
        for name, o, d in (("primary", o_pri, d_pri),
                           ("incoher", o_inc, d_inc),
                           ("sorted ", o_srt, d_srt)):
            vb = sim_binary(host, o, d, block)
            vs = sim_wide_stack(host, o, d, block)
            vk = sim_wide_skip(host, o, d, block)
            est = (vb * 1000 / n, vs * 21.5 / n * 8 / 8, vk)
            print(f"{name}: bin-skip {vb:8d}  wide-stk {vs:7d} "
                  f"(x{vb/vs:4.1f})  wide-skip {vk:7d} (x{vb/vk:4.1f})",
                  flush=True)


if __name__ == "__main__":
    main()
