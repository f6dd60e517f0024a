#!/usr/bin/env python
"""Per-group cost of the phase-2 leaf-list kernel, isolated.

Feeds synthetic lists (rows 0..trip*8 of the indoor leaf table) at two
trip counts and takes the slope: ns per 8-leaf-row group at block_rays
rays.  Model says ~545 ns/group (64 MT tests x ~40 vec ops at 1024 rays,
~5 ops/cycle); the phase breakdown implied ~2.4x that — this pins it.

timeout 1200 python -u scripts/tpu_leaf_kernel_micro.py
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from surf_tpu.accel import pallas_wide as pw
    from surf_tpu.scene import builtin
    from surf_tpu.scene.compile import HostCompiled

    print("backend:", jax.default_backend(), flush=True)
    host = HostCompiled(builtin.make_indoor_scene())
    wt = pw.device_wide_trace(host._ws)
    n_rows = int(wt.anc.shape[0])
    cap8 = 256  # synthetic list capacity (groups)
    g = 16      # packets
    sub = 8     # 1024 rays per packet

    rng = np.random.default_rng(0)
    o = rng.uniform(-4, 4, (g, sub, 128, 3)).astype(np.float32)
    d = rng.normal(size=(g, sub, 128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    E = int(wt.ltab.shape[0])

    def run_for(trip):
        lst = np.tile(np.arange(cap8 * 8, dtype=np.int32).reshape(
            1, cap8, 8) % n_rows, (g, 1, 1))
        counts = np.full(g, trip, np.int32)
        kernel = functools.partial(pw._leaf_list_kernel, cap8=cap8)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(g,),
            in_specs=[pl.BlockSpec((1, sub, 128), lambda p, s: (p, 0, 0))
                      for _ in range(7)]
            + [pl.BlockSpec((1, cap8, 8), lambda p, s: (p, 0, 0)),
               pl.BlockSpec((E, 128), lambda p, s: (0, 0))],
            out_specs=[pl.BlockSpec((1, sub, 128), lambda p, s: (p, 0, 0))
                       for _ in range(4)],
        )
        out_shape = [
            jax.ShapeDtypeStruct((g, sub, 128), jnp.float32),
            jax.ShapeDtypeStruct((g, sub, 128), jnp.int32),
            jax.ShapeDtypeStruct((g, sub, 128), jnp.float32),
            jax.ShapeDtypeStruct((g, sub, 128), jnp.float32),
        ]

        @jax.jit
        def f(ox, oy, oz, dx, dy, dz, tm):
            return pl.pallas_call(
                kernel, grid_spec=grid_spec, out_shape=out_shape,
            )(jnp.asarray(counts), ox, oy, oz, dx, dy, dz, tm,
              jnp.asarray(lst), wt.ltab)

        args = (jnp.asarray(o[..., 0]), jnp.asarray(o[..., 1]),
                jnp.asarray(o[..., 2]), jnp.asarray(d[..., 0]),
                jnp.asarray(d[..., 1]), jnp.asarray(d[..., 2]),
                jnp.full((g, sub, 128), 1e30, jnp.float32))
        jax.block_until_ready(f(*args))  # compile
        return f, args

    f_small, a_small = run_for(32)
    f_big, a_big = run_for(cap8)

    ts, tb = [], []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f_small(*a_small))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(f_big(*a_big))
        tb.append(time.perf_counter() - t0)
    ms_s, ms_b = min(ts) * 1e3, min(tb) * 1e3
    d_groups = g * (cap8 - 32)
    per_group = (ms_b - ms_s) * 1e6 / d_groups
    print(f"small(32 grp/pkt): {ms_s:.2f} ms   big({cap8}): {ms_b:.2f} ms")
    print(f"slope: {per_group:.0f} ns per 8-row group at {sub*128} rays "
          f"({per_group/8:.0f} ns/row)", flush=True)


if __name__ == "__main__":
    main()
