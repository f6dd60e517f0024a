"""Pallas TPU packet-traversal kernel over the 8-wide DFS stream
(accel/wide.py) — v2 of the performance path for ray_extend / ray_connect.

Replaces the binary-record kernel (accel/pallas_traverse.py) after v5e
microbenchmarks (scripts/tpu_*_micro.py) showed its per-visit cost was
~1us of *pipeline structure*, not math:

- dynamic-lane `pltpu.roll` per record fetch: ~1.2us throughput-bound;
- a data-dependent `while_loop` condition: ~900ns per iteration;
- dynamic-index stores (any stack design): ~1.4us.

This kernel is shaped by those numbers:

- one (1,128) row per visit, fetched at a dynamic *sublane* index (cheap),
  fields consumed via static-lane scalar extracts (~free in a fixed-trip
  fori: 53 extracts + 8 slab tests measured 21.5ns/visit);
- stackless skip-link walk over the unified node/leaf stream — no dynamic
  stores anywhere;
- the walk runs K visits per `while_loop` condition check (the ~900ns
  cond cost amortizes to ~900/K ns/visit; visits past stream end are
  masked no-ops).

Each visit evaluates BOTH row interpretations (8 child AABB slab tests and
8 Möller–Trumbore tests) and select-masks by the row's is_leaf flag — the
branch-free trade that keeps every iteration identical.  Intersection
semantics match the oracle exactly: C-style NaN min/max slab test
(bvh.cpp:40-66), |det| >= 1e-5 / t >= 1e-5 bounds (mesh.cpp:23-62),
strictly-closer hit replacement in stream order.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .traverse import Hit
from .wide import IS_LEAF_LANE, LEAF_TRIS, REC, SKIP_LANE, WIDTH, WideStream

BLOCK = 1024
SUB = 8
LANE = 128
K_VISITS = 32   # visits per while-loop condition check

_EPS = np.float32(1e-5)
_FAR = np.float32(1e30)


class WideTrace(NamedTuple):
    """Device-resident stream (jnp pytree).  The walk bound is the padded
    row count — padding rows are inert zero-triangle leaf rows, so walking
    them is a masked no-op (at most 7 extra visits)."""

    stream: jnp.ndarray    # [E_pad, 128] f32
    rec_slot: jnp.ndarray  # [E_pad * 8] int32


def device_wide_trace(ws: WideStream) -> WideTrace:
    return WideTrace(
        stream=jnp.asarray(ws.stream),
        rec_slot=jnp.asarray(ws.rec_slot),
    )


def _c_min(a, b):
    return jnp.where(a < b, a, b)


def _c_max(a, b):
    return jnp.where(a > b, a, b)


def _walk_block(
    ox, oy, oz, dx, dy, dz, tmax, act,
    stream_ref, *, any_hit: bool, n_entries: int,
):
    """Walk one (8,128) ray block down the stream; returns
    (visits, best_t, best_rec, best_u, best_v)."""
    inv_dx = jnp.float32(1.0) / dx
    inv_dy = jnp.float32(1.0) / dy
    inv_dz = jnp.float32(1.0) / dz
    n_e = jnp.int32(n_entries)

    init = (
        jnp.where(jnp.any(act), jnp.int32(0), n_e),
        jnp.int32(0),
        tmax,
        jnp.full((SUB, LANE), -1, jnp.int32),
        jnp.zeros((SUB, LANE), jnp.float32),
        jnp.zeros((SUB, LANE), jnp.float32),
    )

    def visit(_, c):
        p, it, best_t, best_r, best_u, best_v = c
        valid = p < n_e
        pc = jnp.where(valid, p, 0)
        row = stream_ref[pl.ds(pc, 1), :]
        row_i = pltpu.bitcast(row, jnp.int32)
        is_leaf = row_i[0, IS_LEAF_LANE] == 1
        skip = row_i[0, SKIP_LANE]

        if any_hit:
            live = act & (best_r < 0)
        else:
            live = act

        # ---- node interpretation: 8 child slab tests -------------------
        anyh = jnp.zeros((SUB, LANE), dtype=bool)
        for k in range(WIDTH):
            b = REC * k
            lo_x = row[0, b + 0]
            lo_y = row[0, b + 1]
            lo_z = row[0, b + 2]
            hi_x = row[0, b + 3]
            hi_y = row[0, b + 4]
            hi_z = row[0, b + 5]
            tx_n = (lo_x - ox) * inv_dx
            tx_f = (hi_x - ox) * inv_dx
            tmin = _c_min(tx_n, tx_f)
            tmax_ = _c_max(tx_n, tx_f)
            ty_n = (lo_y - oy) * inv_dy
            ty_f = (hi_y - oy) * inv_dy
            tmin = _c_max(tmin, _c_min(ty_n, ty_f))
            tmax_ = _c_min(tmax_, _c_max(ty_n, ty_f))
            tz_n = (lo_z - oz) * inv_dz
            tz_f = (hi_z - oz) * inv_dz
            tmin = _c_max(tmin, _c_min(tz_n, tz_f))
            tmax_ = _c_min(tmax_, _c_max(tz_n, tz_f))
            anyh = anyh | (
                (tmax_ >= tmin) & (tmin < best_t)
                & (tmax_ > jnp.float32(0.0))
            )
        descend = jnp.any(anyh & live)

        # ---- leaf interpretation: 8 Möller–Trumbore tests ---------------
        leaf_live = live & is_leaf & valid
        for j in range(WIDTH):
            b = REC * j
            v0x = row[0, b + 0]
            v0y = row[0, b + 1]
            v0z = row[0, b + 2]
            e1x = row[0, b + 3]
            e1y = row[0, b + 4]
            e1z = row[0, b + 5]
            e2x = row[0, b + 6]
            e2y = row[0, b + 7]
            e2z = row[0, b + 8]
            hx = dy * e2z - dz * e2y
            hy = dz * e2x - dx * e2z
            hz = dx * e2y - dy * e2x
            a = e1x * hx + e1y * hy + e1z * hz
            f = jnp.float32(1.0) / a
            sx = ox - v0x
            sy = oy - v0y
            sz = oz - v0z
            u = f * (sx * hx + sy * hy + sz * hz)
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            v = f * (dx * qx + dy * qy + dz * qz)
            t = f * (e2x * qx + e2y * qy + e2z * qz)
            hit = (
                (jnp.abs(a) >= _EPS)
                & (u >= 0.0) & (u <= 1.0)
                & (v >= 0.0) & (u + v <= 1.0)
                & (t >= _EPS) & (t < best_t)
                & leaf_live
            )
            best_t = jnp.where(hit, t, best_t)
            best_r = jnp.where(hit, pc * LEAF_TRIS + j, best_r)
            best_u = jnp.where(hit, u, best_u)
            best_v = jnp.where(hit, v, best_v)
            if any_hit:
                leaf_live = leaf_live & (best_r < 0)

        new_p = jnp.where(is_leaf | descend, p + 1, skip)
        new_p = jnp.maximum(new_p, p + 1)  # provable progress (wedge guard)
        new_p = jnp.where(valid, new_p, p)
        if any_hit:
            new_p = jnp.where(jnp.any(act & (best_r < 0)), new_p, n_e)
        it = it + jnp.where(valid, 1, 0)
        return new_p, it, best_t, best_r, best_u, best_v

    def cond(c):
        return c[0] < n_e

    def body(c):
        return jax.lax.fori_loop(0, K_VISITS, visit, c)

    _, it, best_t, best_r, best_u, best_v = jax.lax.while_loop(
        cond, body, init)
    return it, best_t, best_r, best_u, best_v


def _kernel_multiblock(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref, act_ref,
    stream_ref,
    t_out, rec_out, u_out, v_out, it_out,
    *, any_hit: bool, n_entries: int, n_blocks: int,
):
    def blk(b, _):
        it, bt, br, bu, bv = _walk_block(
            ox_ref[b], oy_ref[b], oz_ref[b],
            dx_ref[b], dy_ref[b], dz_ref[b],
            tmax_ref[b], act_ref[b] != 0,
            stream_ref, any_hit=any_hit, n_entries=n_entries,
        )
        t_out[b] = bt
        rec_out[b] = br
        u_out[b] = bu
        v_out[b] = bv
        it_out[b] = jnp.full((SUB, LANE), it, jnp.int32)
        return 0

    jax.lax.fori_loop(0, n_blocks, blk, 0)


MULTIBLOCK_CHUNK = 64 * BLOCK


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret"))
def _traverse_padded(stream, rec_slot, ox, oy, oz, dx, dy, dz,
                     tm, ac, any_hit: bool, interpret: bool):
    n_entries = stream.shape[0]
    g = ox.shape[0]
    chunk_blocks = MULTIBLOCK_CHUNK // BLOCK
    outs = []
    for start in range(0, g, chunk_blocks):
        end = min(start + chunk_blocks, g)
        nb = end - start
        kernel = functools.partial(
            _kernel_multiblock, any_hit=any_hit, n_entries=n_entries,
            n_blocks=nb,
        )
        out_shape = [
            jax.ShapeDtypeStruct((nb, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((nb, SUB, LANE), jnp.int32),
            jax.ShapeDtypeStruct((nb, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((nb, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((nb, SUB, LANE), jnp.int32),  # visits
        ]
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        outs.append(pl.pallas_call(
            kernel,
            in_specs=[vmem] * 9,
            out_specs=[vmem] * 5,
            out_shape=out_shape,
            interpret=interpret,
        )(ox[start:end], oy[start:end], oz[start:end],
          dx[start:end], dy[start:end], dz[start:end],
          tm[start:end], ac[start:end], stream))
    parts = [[o[i] for o in outs] for i in range(5)]
    return tuple(
        jnp.concatenate(x) if len(x) > 1 else x[0] for x in parts)


def traverse_wide(
    wt: WideTrace,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    t_max: jnp.ndarray,
    active: jnp.ndarray,
    any_hit: bool = False,
    interpret: bool = False,
    return_visits: bool = False,
) -> Hit:
    """Drop-in replacement for accel.traverse.traverse / traverse_pallas;
    hit.prim is the leaf-order triangle slot (map through scene.perm for
    the original id), identical to the binary kernels."""
    n = origin.shape[0]
    pad = (-n) % BLOCK
    n_pad = n + pad
    g = n_pad // BLOCK

    def prep(x, fill=0):
        x = jnp.concatenate(
            [x, jnp.full((pad,), fill, x.dtype)]
        ) if pad else x
        return x.reshape(g, SUB, LANE)

    t_o, r_o, u_o, v_o, it_o = _traverse_padded(
        wt.stream, wt.rec_slot,
        prep(origin[:, 0]), prep(origin[:, 1]), prep(origin[:, 2]),
        prep(direction[:, 0], 1), prep(direction[:, 1], 1),
        prep(direction[:, 2], 1),
        prep(t_max.astype(jnp.float32)), prep(active.astype(jnp.int32)),
        any_hit, interpret,
    )
    if return_visits:
        return it_o[:, 0, 0]  # per-block visit counts [g]

    def unprep(x):
        return x.reshape(n_pad)[:n]

    rec = unprep(r_o)
    prim = jnp.where(
        rec >= 0, jnp.take(wt.rec_slot, jnp.maximum(rec, 0)), -1)
    return Hit(
        prim=jnp.where(active, prim, -1),
        t=unprep(t_o),
        u=unprep(u_o),
        v=unprep(v_o),
    )
