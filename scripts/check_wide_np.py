#!/usr/bin/env python
"""CPU check: wide-stream NumPy traversal + interpret-mode Pallas kernel
vs the binary skip-link reference on the indoor scene."""
import sys

sys.path.insert(0, ".")

import numpy as np

from surf_tpu.utils import force_cpu

force_cpu(1)

from surf_tpu.scene import builtin
from surf_tpu.scene.compile import HostCompiled
from surf_tpu.accel.wide import build_wide_stream, traverse_stream_np


def main():
    host = HostCompiled(builtin.make_indoor_scene())
    bvh = host.bvh
    perm = bvh.indices.astype(np.int64)
    tv0 = host.samp_v0[perm]
    tv1 = host.samp_v1[perm]
    tv2 = host.samp_v2[perm]
    ws = build_wide_stream(bvh, tv0, tv1, tv2)
    print("stream entries:", ws.n_entries, "(nodes", ws.n_node_rows,
          "leaf rows", ws.n_leaf_rows, ") padded:", ws.stream.shape[0])
    occ = (ws.rec_slot[:ws.n_entries * 8] >= 0).mean() * (
        ws.n_entries / max(ws.n_leaf_rows, 1))
    print(f"leaf occupancy: {occ:.2f}  "
          f"VMEM: {ws.stream.nbytes/1e6:.1f} MB")
    slots = ws.rec_slot[ws.rec_slot >= 0]
    assert len(np.unique(slots)) == len(tv0) == len(slots)

    rng = np.random.default_rng(0)
    n = 512
    o = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmax = np.full(n, 1e30, np.float32)

    t_w, rec, u_w, v_w = traverse_stream_np(ws, o, d, tmax)
    slot_w = np.where(rec >= 0, ws.rec_slot[np.maximum(rec, 0)], -1)

    import jax.numpy as jnp
    from surf_tpu.accel.traverse import traverse
    trace = host.render_scene.trace
    hit = traverse(trace, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmax),
                   jnp.ones(n, bool), host.static.stack_depth)
    t_b = np.asarray(hit.t)
    p_b = np.asarray(hit.prim)

    both_miss = (slot_w < 0) & (p_b < 0)
    t_match = np.isclose(t_w, t_b, rtol=1e-5, atol=1e-6) | both_miss
    print("numpy stream: closest t agreement:", t_match.mean())
    print("numpy stream: prim agreement:",
          ((slot_w == p_b) | both_miss).mean())
    assert t_match.mean() == 1.0

    ta, reca, _, _ = traverse_stream_np(ws, o, d, tmax, any_hit=True)
    hita = traverse(trace, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmax),
                    jnp.ones(n, bool), host.static.stack_depth, any_hit=True)
    agree_any = ((reca >= 0) == (np.asarray(hita.prim) >= 0)).mean()
    print("numpy stream: any-hit found agreement:", agree_any)
    assert agree_any == 1.0

    # Interpret-mode Pallas kernel vs binary reference.
    from surf_tpu.accel.pallas_wide import device_wide_trace, traverse_wide
    wt = device_wide_trace(ws)
    hw = traverse_wide(wt, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmax),
                       jnp.ones(n, bool), interpret=True)
    t_k = np.asarray(hw.t)
    p_k = np.asarray(hw.prim)
    both_miss_k = (p_k < 0) & (p_b < 0)
    tm = (np.isclose(t_k, t_b, rtol=1e-5, atol=1e-6) | both_miss_k).mean()
    pm = ((p_k == p_b) | both_miss_k).mean()
    print("pallas interpret: t agreement:", tm, "prim agreement:", pm)
    assert tm == 1.0 and pm == 1.0

    hwa = traverse_wide(wt, jnp.asarray(o), jnp.asarray(d),
                        jnp.asarray(tmax), jnp.ones(n, bool), any_hit=True,
                        interpret=True)
    am = ((np.asarray(hwa.prim) >= 0) == (np.asarray(hita.prim) >= 0)).mean()
    print("pallas interpret: any-hit found agreement:", am)
    assert am == 1.0
    print("OK")


if __name__ == "__main__":
    main()
