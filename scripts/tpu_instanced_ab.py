#!/usr/bin/env python
"""Device validation + A/B of the two-level instanced traversal
(accel/pallas_instanced) against the flattened bitsru8 path on the indoor
scene: same world rays, winners mapped to ORIGINAL triangle ids through
each path's permutation, plus a two-size timing slope.

The instanced path stores per-UNIQUE-mesh tables (4 meshes, ~17k tris)
where the flattened path stores per-instance world tables (11 instances,
~33k tris); hits must agree exactly up to closest-t ties between the two
walks' processing orders (different BVHs entirely), so the comparison is
t-based: bit-comparable t values come from different float pipelines, so
assert |t| agreement at 1e-4 relative + identical hit/miss masks.

Run: timeout 1800 python -u scripts/tpu_instanced_ab.py
"""
import sys
import time
import warnings

import numpy as np

warnings.filterwarnings("ignore")
sys.path.insert(0, ".")

SIZES = (32768, 131072)


def main():
    import jax
    import jax.numpy as jnp

    from surf_tpu.accel.pallas_instanced import (build_instanced_trace,
                                                 traverse_instanced)
    from surf_tpu.accel.pallas_wide import device_wide_trace, traverse_wide
    from surf_tpu.scene import builtin
    from surf_tpu.scene.compile import HostCompiled

    print("backend:", jax.default_backend(), flush=True)
    scene = builtin.make_indoor_scene()
    host = HostCompiled(scene)
    wt = device_wide_trace(host._ws)

    # unique meshes + instance transforms from the scene itself
    mesh_ids = {}
    meshes = []
    insts = []
    for inst in scene.instances:
        key = id(inst.mesh)
        if key not in mesh_ids:
            mesh_ids[key] = len(meshes)
            meshes.append((inst.mesh.v0, inst.mesh.v1, inst.mesh.v2))
        insts.append((mesh_ids[key], inst.transform,
                      inst.bounds_min, inst.bounds_max))
    ih = build_instanced_trace(meshes, insts)
    rows_flat = int(wt.ltab.shape[0])
    rows_inst = int(ih.trace.ltab.shape[0])
    print(f"leaf-table rows: flattened {rows_flat} vs instanced "
          f"{rows_inst} ({rows_flat/rows_inst:.2f}x memory saved)",
          flush=True)

    rng = np.random.default_rng(7)
    n = max(SIZES)
    o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tm = np.full(n, 1e30, np.float32)
    act = np.ones(n, bool)

    # --- correctness on 8k rays ---------------------------------------
    nv = 8192
    jo, jd = jnp.asarray(o[:nv]), jnp.asarray(d[:nv])
    jt, ja = jnp.asarray(tm[:nv]), jnp.asarray(act[:nv])
    hf = traverse_wide(wt, jo, jd, jt, ja, algo="bitsru8", block_rays=2048)
    hi = traverse_instanced(ih, jo, jd, jt, ja, block_rays=2048)
    t_f = np.asarray(hf.t)
    t_i = np.asarray(hi.t)
    hit_f = np.asarray(hf.prim) >= 0
    hit_i = np.asarray(hi.inst) >= 0
    mask_match = float((hit_f == hit_i).mean())
    m = hit_f & hit_i
    trel = (np.abs(t_f[m] - t_i[m])
            / np.maximum(np.abs(t_f[m]), 1e-6)).max() if m.any() else 0.0
    # original-tri-id agreement (mod exact-t ties)
    inst_i = np.asarray(hi.inst)
    prim_i = np.asarray(hi.prim)
    orig_i = np.full(nv, -1, np.int64)
    offs = np.asarray(host.inst_tri_offset)
    for r in np.nonzero(hit_i)[0]:
        mm = ih.trace.meta.mesh_of[inst_i[r]]
        orig_i[r] = offs[inst_i[r]] + ih.perms[mm][prim_i[r]]
    perm_f = np.asarray(host.bvh.indices)
    orig_f = np.where(hit_f, perm_f[np.maximum(np.asarray(hf.prim), 0)], -1)
    prim_agree = float((orig_i[m] == orig_f[m]).mean()) if m.any() else 1.0
    print(f"hit-mask match {mask_match:.5f}  t_rel_max {trel:.2e}  "
          f"orig-prim agree {prim_agree:.5f} "
          f"({int(m.sum())} common hits)", flush=True)
    ok = mask_match > 0.999 and trel < 1e-3

    # --- timing slope --------------------------------------------------
    for name, fn in (
        ("bitsru8", lambda o_, d_, t_, a_: traverse_wide(
            wt, o_, d_, t_, a_, algo="bitsru8", block_rays=2048)),
        ("instanced", lambda o_, d_, t_, a_: traverse_instanced(
            ih, o_, d_, t_, a_, block_rays=2048)),
    ):
        f = jax.jit(fn)
        ts = []
        for sz in SIZES:
            args = (jnp.asarray(o[:sz]), jnp.asarray(d[:sz]),
                    jnp.asarray(tm[:sz]), jnp.asarray(act[:sz]))
            np.asarray(f(*args).t)  # compile+warm
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(f(*args).t)
                best = min(best, time.perf_counter() - t0)
            ts.append(best)
            print(f"  {name} @ {sz}: {best*1e3:8.2f} ms", flush=True)
        slope = (SIZES[1] - SIZES[0]) / (ts[1] - ts[0])
        print(f"{name}: {slope/1e6:.3f} M rays/s (slope)", flush=True)

    print("OK" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
