"""Pallas TPU packet-traversal kernel — the performance path for
ray_extend / ray_connect.

Design (SURVEY.md §7.3.1, the 'single hardest kernel'):

- **Packet traversal**: rays are processed in blocks of 8x128 = 1024 (one
  native VPU tile per field).  Each block walks the skip-link DFS node list
  *as a packet*: one scalar control stream per block, each visited node's
  AABB tested against all 1024 rays in one vector op, descend if ANY ray
  hits, else follow the skip link.  This replaces the reference's per-thread
  stacks and atomic queues (ray_extend.comp:26-165) with block-uniform
  control flow — the shape a VPU can actually execute.
- **Scene resident in VMEM, 16-lane record packing**: VMEM tiles are
  (8, 128), so a naive [D, 6] node table lane-pads to [D, 128] (107 MB for
  the indoor scene — exceeds the 16 MB VMEM).  Instead each node/triangle
  record occupies a 16-lane group, 8 records per 128-lane row:
  row = id >> 3, group = id & 7.  A record fetch is one (1, 128) vector
  load at a *dynamic sublane* index (legal in Mosaic) + one dynamic lane
  rotate (`pltpu.roll`) to bring the group to lane 0 + static lane extracts.
  Int fields ride in the same row via bitcast.  Total VMEM: ~6 MB.
- **Per-block trip counts**: each grid cell's while_loop ends when *its*
  packet exhausts the tree — unlike the XLA lockstep version where every
  lane pays the global max iteration count (and whose per-lane gathers +
  stack scatters measured 1000x slower end to end).

The kernel reproduces the oracle's intersection semantics exactly: the same
Möller–Trumbore with F32_EPSILON bounds (mesh.cpp:23-62), the same C-style
NaN min/max slab test (bvh.cpp:40-66), strictly-closer hit replacement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .traverse import Hit, TraceArrays

BLOCK = 1024
SUB = 8
LANE = 128
REC = 16           # lanes per packed record
REC_PER_ROW = LANE // REC

# NumPy scalars (not jnp) — jnp module-level constants would be captured as
# tracer constants, which pallas_call rejects.
_EPS = np.float32(1e-5)
_FAR = np.float32(1e30)


def _c_min(a, b):
    return jnp.where(a < b, a, b)


def _c_max(a, b):
    return jnp.where(a > b, a, b)


def _fetch_record(ref, idx):
    """Load packed record ``idx``: returns a (1, 128) f32 vector with the
    record's 16 lanes rotated to lane 0."""
    row = ref[pl.ds(idx >> 3, 1), :]
    shift = (idx & 7) * REC
    # roll left by `shift`: lane shift -> lane 0
    return pltpu.roll(row, -shift, axis=1)


def _traverse_kernel(
    # ray block refs, each (1, 8, 128)
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref, act_ref,
    # packed scene refs (whole arrays in VMEM)
    nodes_ref,   # [ceil(D/8), 128] f32: per 16-lane group
                 #   [lox,loy,loz,hix,hiy,hiz, first(i32), count(i32), skip(i32), pad...]
    tris_ref,    # [ceil(T/8), 128] f32: per group [v0 xyz, e1 xyz, e2 xyz, pad...]
    # outputs (1, 8, 128)
    t_out, prim_out, u_out, v_out,
    *, any_hit: bool, n_nodes: int,
):
    ox = ox_ref[0]
    oy = oy_ref[0]
    oz = oz_ref[0]
    dx = dx_ref[0]
    dy = dy_ref[0]
    dz = dz_ref[0]
    act = act_ref[0] != 0
    inv_dx = jnp.float32(1.0) / dx
    inv_dy = jnp.float32(1.0) / dy
    inv_dz = jnp.float32(1.0) / dz

    # NOTE: the live mask is re-derived from best_p each step rather than
    # carried — Mosaic cannot legalize vector<i1> loop carries.  The while
    # condition is scalar-only (pure dfs bound): early exits are expressed
    # by jumping dfs to n_nodes inside the body, and termination is
    # unconditionally guaranteed by the strict-progress guard below.
    init = (
        # packets with no active lanes skip the walk entirely
        jnp.where(jnp.any(act), jnp.int32(0), jnp.int32(n_nodes)),
        tmax_ref[0],                           # best_t
        jnp.full((SUB, LANE), -1, jnp.int32),  # best prim
        jnp.zeros((SUB, LANE), jnp.float32),   # best u
        jnp.zeros((SUB, LANE), jnp.float32),   # best v
    )

    def live_mask(best_p):
        if any_hit:
            # intersectAny early-out: occluded lanes stop participating.
            return act & (best_p < 0)
        return act

    def cond(c):
        return c[0] < n_nodes

    def body(c):
        dfs, best_t, best_p, best_u, best_v = c
        live = live_mask(best_p)

        rec = _fetch_record(nodes_ref, dfs)
        rec_i = pltpu.bitcast(rec, jnp.int32)
        lo_x = rec[0, 0]
        lo_y = rec[0, 1]
        lo_z = rec[0, 2]
        hi_x = rec[0, 3]
        hi_y = rec[0, 4]
        hi_z = rec[0, 5]
        leaf_first = rec_i[0, 6]
        leaf_count = rec_i[0, 7]
        skip = rec_i[0, 8]

        # slab test vs current best_t (bvh.cpp:40-66)
        tx_n = (lo_x - ox) * inv_dx
        tx_f = (hi_x - ox) * inv_dx
        tmin = _c_min(tx_n, tx_f)
        tmax = _c_max(tx_n, tx_f)
        ty_n = (lo_y - oy) * inv_dy
        ty_f = (hi_y - oy) * inv_dy
        tmin = _c_max(tmin, _c_min(ty_n, ty_f))
        tmax = _c_min(tmax, _c_max(ty_n, ty_f))
        tz_n = (lo_z - oz) * inv_dz
        tz_f = (hi_z - oz) * inv_dz
        tmin = _c_max(tmin, _c_min(tz_n, tz_f))
        tmax = _c_min(tmax, _c_max(tz_n, tz_f))
        box_hit = (
            (tmax >= tmin) & (tmin < best_t) & (tmax > jnp.float32(0.0)) & live
        )
        packet_hit = jnp.any(box_hit)
        is_leaf = leaf_count > 0

        def tri_body(k, c2):
            best_t, best_p, best_u, best_v = c2
            live2 = live_mask(best_p)
            t_idx = leaf_first + k
            tri = _fetch_record(tris_ref, t_idx)
            v0x = tri[0, 0]
            v0y = tri[0, 1]
            v0z = tri[0, 2]
            e1x = tri[0, 3]
            e1y = tri[0, 4]
            e1z = tri[0, 5]
            e2x = tri[0, 6]
            e2y = tri[0, 7]
            e2z = tri[0, 8]

            # Möller–Trumbore (mesh.cpp:23-62), component form
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
                & live2
            )
            best_t = jnp.where(hit, t, best_t)
            best_p = jnp.where(hit, t_idx, best_p)
            best_u = jnp.where(hit, u, best_u)
            best_v = jnp.where(hit, v, best_v)
            return best_t, best_p, best_u, best_v

        # Dynamic trip count, zero when the packet misses or the node is
        # internal (a lax.cond around this miscompiled in Mosaic — the
        # branch-free form is also cheaper).  Clamped: a corrupted count
        # must not turn into an unbounded loop on-device.
        n_tris = jnp.clip(
            jnp.where(packet_hit & is_leaf, leaf_count, 0), 0, 256
        )
        best_t, best_p, best_u, best_v = jax.lax.fori_loop(
            0, n_tris, tri_body, (best_t, best_p, best_u, best_v)
        )

        descend = packet_hit & ~is_leaf
        new_dfs = jnp.where(descend, dfs + 1, skip)
        # Strict-progress guard: a valid skip link always satisfies
        # skip > dfs (skip = dfs + subtree size), so forcing monotone
        # progress never changes a correct walk — but it makes the loop
        # provably terminating (<= n_nodes iterations) even if a record
        # read ever returns garbage.  A faulted TPU worker wedges the whole
        # chip for minutes; this guard converts that failure mode into a
        # wrong (testable) result instead.
        new_dfs = jnp.maximum(new_dfs, dfs + 1)
        if any_hit:
            # all active lanes occluded -> stop this packet's walk
            new_dfs = jnp.where(
                jnp.any(act & (best_p < 0)), new_dfs, jnp.int32(n_nodes)
            )
        return new_dfs, best_t, best_p, best_u, best_v

    _, best_t, best_p, best_u, best_v = jax.lax.while_loop(cond, body, init)

    t_out[0] = best_t
    prim_out[0] = best_p
    u_out[0] = best_u
    v_out[0] = best_v


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret"))
def traverse_pallas(
    arrays: TraceArrays,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    t_max: jnp.ndarray,
    active: jnp.ndarray,
    any_hit: bool = False,
    interpret: bool = False,
) -> Hit:
    """Drop-in replacement for accel.traverse.traverse (stack-free)."""
    n = origin.shape[0]
    pad = (-n) % BLOCK
    n_pad = n + pad
    g = n_pad // BLOCK

    def prep(x, fill=0):
        x = jnp.concatenate(
            [x, jnp.full((pad,), fill, x.dtype)]
        ) if pad else x
        return x.reshape(g, SUB, LANE)

    ox = prep(origin[:, 0])
    oy = prep(origin[:, 1])
    oz = prep(origin[:, 2])
    dx = prep(direction[:, 0], 1)
    dy = prep(direction[:, 1], 1)
    dz = prep(direction[:, 2], 1)
    tm = prep(t_max.astype(jnp.float32))
    ac = prep(active.astype(jnp.int32))

    # Packed scene tables are built host-side at scene compile
    # (TraceArrays.nodes_packed/tris_packed): the pallas_call must receive
    # plain device arrays — transposed intermediates produced inside this
    # jit reached the custom call with a mismatched layout and corrupted
    # in-kernel reads (device faults).
    d_nodes = arrays.node_boxes.shape[0]
    nodes_packed = arrays.nodes_packed
    tris_packed = arrays.tris_packed

    ray_spec = pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def full_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _traverse_kernel, any_hit=any_hit, n_nodes=d_nodes
    )
    out_shape = [
        jax.ShapeDtypeStruct((g, SUB, LANE), jnp.float32),  # t
        jax.ShapeDtypeStruct((g, SUB, LANE), jnp.int32),    # prim
        jax.ShapeDtypeStruct((g, SUB, LANE), jnp.float32),  # u
        jax.ShapeDtypeStruct((g, SUB, LANE), jnp.float32),  # v
    ]
    t_o, p_o, u_o, v_o = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[ray_spec] * 8 + [
            full_spec(nodes_packed.shape),
            full_spec(tris_packed.shape),
        ],
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(ox, oy, oz, dx, dy, dz, tm, ac, nodes_packed, tris_packed)

    def unprep(x):
        return x.reshape(n_pad)[:n]

    prim = unprep(p_o)
    return Hit(
        prim=jnp.where(active, prim, -1),
        t=unprep(t_o),
        u=unprep(u_o),
        v=unprep(v_o),
    )
