#!/usr/bin/env python
"""Device-validation artifact for the compiled Pallas traversal kernels
(VERDICT round-1 item 7): runs each algo ON THE REAL TPU against the NumPy
stream oracle and records a JSON verdict + timing in
out_configs/device_validate.json.  Run whenever a kernel changes:

    timeout 1800 python -u scripts/device_validate.py [--algos=skip,specb8]

Safety: every kernel here carries the strict-progress wedge guard; still,
run under `timeout` (a faulted kernel wedges the remote worker 10-90 min).
The quarantined "skip2" pair-walk is deliberately NOT in the default set
(it wedged the worker on its first device run — CLAUDE.md).

Timing protocol (see scripts/tpu_cost_micro.py): idle device, sequential
calls, host-read sync, and a two-size slope to cancel the ~25-80 ms
per-call tunnel overhead.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

ALGOS = ("skip", "specb8", "specb4")
SIZES = (32768, 131072)  # rays (32 / 128 blocks)


def main():
    algos = ALGOS
    for a in sys.argv[1:]:
        if a.startswith("--algos="):
            algos = tuple(a.split("=", 1)[1].split(","))

    import jax
    import jax.numpy as jnp

    from surf_tpu.accel.pallas_wide import device_wide_trace, traverse_wide
    from surf_tpu.accel.wide import traverse_stream_np
    from surf_tpu.scene import builtin
    from surf_tpu.scene.camera import CameraParams, view_plane_jnp
    from surf_tpu.scene.compile import HostCompiled
    from surf_tpu.wavefront import RenderConfig
    from surf_tpu.wavefront.integrator import initial_seeds, ray_generation

    backend = jax.default_backend()
    print(f"backend: {backend}", flush=True)

    host = HostCompiled(builtin.make_indoor_scene())
    ws = host._ws
    wt = device_wide_trace(ws)
    n = max(SIZES)

    # Ray mix: half primary (coherent), half random (incoherent bounce-like),
    # plus a few axis-aligned rays (slab 0*inf edge).
    W = H = 256
    cam = builtin.make_indoor_camera(W, H)
    cfg = RenderConfig.for_scene(host.static, W, H, 1, use_defocus=True,
                                 use_pallas=True)
    vp = view_plane_jnp(CameraParams.from_camera(cam), W, H)
    lane = jnp.arange(W * H, dtype=jnp.uint32)
    px = (lane % jnp.uint32(W)).astype(jnp.int32)
    py = (lane // jnp.uint32(W)).astype(jnp.int32)
    _, origin, direction = jax.jit(
        lambda s: ray_generation(cfg, vp, s, px, py)
    )(initial_seeds(cfg, jnp.uint32(0)))
    o_pri = np.asarray(origin)[: n // 2]
    d_pri = np.asarray(direction)[: n // 2]
    rng = np.random.default_rng(11)
    o_rnd = rng.uniform(-6, 6, (n - n // 2, 3)).astype(np.float32)
    d_rnd = rng.normal(size=(n - n // 2, 3)).astype(np.float32)
    d_rnd /= np.linalg.norm(d_rnd, axis=1, keepdims=True)
    d_rnd[:8] = 0.0
    d_rnd[np.arange(8), np.arange(8) % 3] = np.where(
        np.arange(8) % 2 == 0, 1.0, -1.0)
    o = np.concatenate([o_pri, o_rnd]).astype(np.float32)
    d = np.concatenate([d_pri, d_rnd]).astype(np.float32)
    tmax = np.full(n, 1e30, np.float32)
    act = np.ones(n, bool)

    # Validation subset (the NumPy oracle is a per-ray Python loop — keep
    # it at 8k rays: 4k coherent primaries + 4k incoherent incl. the
    # axis-aligned edge rays).  Timing uses the full arrays.
    nv = 8192
    vsel = np.concatenate(
        [np.arange(nv // 2), n // 2 + np.arange(nv // 2)])
    ov_, dv_ = o[vsel], d[vsel]
    tv_ = np.full(nv, 1e30, np.float32)
    av_ = np.ones(nv, bool)

    print("oracle walk (NumPy, one-time)...", flush=True)
    ot, orec, ou, ovv = traverse_stream_np(ws, ov_, dv_, tv_)
    oprim = np.where(orec >= 0, ws.rec_slot[np.maximum(orec, 0)], -1)
    oa_t, oa_rec, _, _ = traverse_stream_np(ws, ov_, dv_, tv_, any_hit=True)
    print(f"oracle: {int((orec >= 0).sum())}/{nv} closest hits", flush=True)

    jo = jnp.asarray(o)
    jd = jnp.asarray(d)
    jt = jnp.asarray(tmax)
    ja = jnp.asarray(act)
    jov = jnp.asarray(ov_)
    jdv = jnp.asarray(dv_)
    jtv = jnp.asarray(tv_)
    jav = jnp.asarray(av_)

    results = {"backend": backend, "n_rays": n, "algos": {}}
    ok_all = True
    for algo in algos:
        rec = {}
        fw = jax.jit(lambda o_, d_, t_, a_, g=algo: traverse_wide(
            wt, o_, d_, t_, a_, any_hit=False, algo=g))
        fa = jax.jit(lambda o_, d_, t_, a_, g=algo: traverse_wide(
            wt, o_, d_, t_, a_, any_hit=True, algo=g))

        h = fw(jov, jdv, jtv, jav)
        prim = np.asarray(h.prim)          # host read = sync
        t = np.asarray(h.t)
        m = oprim >= 0
        prim_match = float((prim == oprim).mean())
        rel = (np.abs(t[m] - ot[m])
               / np.maximum(np.abs(ot[m]), 1e-8)).max() if m.any() else 0.0
        ha = fa(jov, jdv, jtv, jav)
        any_match = float(((np.asarray(ha.prim) >= 0) == (oa_rec >= 0))
                          .mean())
        rec["closest_prim_match"] = prim_match
        rec["closest_t_max_rel"] = float(rel)
        rec["anyhit_match"] = any_match
        ok = prim_match >= 0.9999 and any_match >= 0.9999 and rel < 1e-4
        rec["ok"] = bool(ok)
        ok_all &= ok
        print(f"{algo}: prim {prim_match:.5f} any {any_match:.5f} "
              f"t_rel {rel:.2e} -> {'OK' if ok else 'FAIL'}", flush=True)

        # timing: slope between the two sizes (closest-hit walk)
        ts = []
        for sz in SIZES:
            so, sd = jo[:sz], jd[:sz]
            st, sa = jt[:sz], ja[:sz]
            np.asarray(fw(so, sd, st, sa).t)  # compile + drain
            best = np.inf
            for _ in range(3):
                t0 = time.time()
                out = fw(so, sd, st, sa)
                np.asarray(out.t)  # host read = the only reliable sync
                best = min(best, time.time() - t0)
            ts.append(best)
            print(f"  {algo} @ {sz}: {best*1e3:8.2f} ms", flush=True)
        slope_rays_s = (SIZES[1] - SIZES[0]) / (ts[1] - ts[0])
        rec["ms_small"], rec["ms_large"] = ts[0] * 1e3, ts[1] * 1e3
        rec["slope_rays_per_s"] = float(slope_rays_s)
        print(f"  {algo}: {slope_rays_s/1e6:.3f} M rays/s (slope, "
              f"mixed-coherence single-pass)", flush=True)
        results["algos"][algo] = rec

    # ---- full frame path (VERDICT r3 item 7): the EXACT bench config
    # (bitsru8, block 2048, ce4, ladder6/shrink2) vs the plain
    # ladder=0/compact-off loop on one 128^2 frame — every per-lane op
    # sequence is identical by design (compaction/ladder only change
    # which lanes are co-resident in a dispatch; the bits traversal is
    # per-ray exact), so the images must agree BIT-FOR-BIT.
    from surf_tpu.wavefront.integrator import render_frame_seeded

    Wf = Hf = 128
    sppf = 4
    cpf = CameraParams.from_camera(builtin.make_indoor_camera(Wf, Hf))
    scene_dev = jax.device_put(host.render_scene)

    def frame(cfgf):
        seed = initial_seeds(cfgf, jnp.uint32(0))
        acc = None
        for _ in range(sppf):
            part, seed = render_frame_seeded(scene_dev, cfgf, cpf, seed)
            acc = part if acc is None else acc + part
        return np.asarray(jax.block_until_ready(acc))

    base_cfg = RenderConfig.for_scene(
        host.static, Wf, Hf, 1, use_defocus=True, use_pallas=True,
    )._replace(max_bounces=None, wave_limit=32, algo="bitsru8",
               block_rays=2048)
    bench_cfg = base_cfg._replace(compact=True, compact_every=4,
                                  ladder=6, ladder_shrink=2,
                                  pixel_order="morton")
    plain_cfg = base_cfg._replace(compact=False, ladder=0)
    print("frame_path: bench config...", flush=True)
    img_bench = frame(bench_cfg)
    print("frame_path: plain config...", flush=True)
    img_plain = frame(plain_cfg)
    rel_l1 = float(np.abs(img_bench - img_plain).sum()
                   / max(float(np.abs(img_plain).sum()), 1e-9))
    bit_ident = bool(np.array_equal(img_bench, img_plain))
    frame_ok = bit_ident or rel_l1 == 0.0
    results["frame_path"] = {
        "width": Wf, "height": Hf, "spp": sppf,
        "bench": "bitsru8:2048:ce4:ladder6/2:compact:morton",
        "plain": "bitsru8:2048:nocompact:ladder0",
        "rel_l1": rel_l1, "bit_identical": bit_ident,
        "energy": float(img_bench.sum()) / sppf, "ok": frame_ok,
    }
    ok_all &= frame_ok
    print(f"frame_path: relL1={rel_l1:.2e} bit_identical={bit_ident} "
          f"-> {'OK' if frame_ok else 'FAIL'}", flush=True)

    results["ok"] = bool(ok_all)
    with open("out_configs/device_validate.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: v for k, v in results.items() if k != "algos"}))
    print("wrote out_configs/device_validate.json", flush=True)
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
