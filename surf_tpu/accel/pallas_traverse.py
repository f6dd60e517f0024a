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


def _walk_block(
    ox, oy, oz, dx, dy, dz, tmax, act,
    nodes_ref, tris_ref, *, any_hit: bool, n_nodes: int,
):
    """Shared packet-walk body over one (8,128) ray block; returns
    (best_t, best_p, best_u, best_v)."""
    inv_dx = jnp.float32(1.0) / dx
    inv_dy = jnp.float32(1.0) / dy
    inv_dz = jnp.float32(1.0) / dz

    init = (
        jnp.where(jnp.any(act), jnp.int32(0), jnp.int32(n_nodes)),
        tmax,
        jnp.full((SUB, LANE), -1, jnp.int32),
        jnp.zeros((SUB, LANE), jnp.float32),
        jnp.zeros((SUB, LANE), jnp.float32),
    )

    def live_mask(best_p):
        if any_hit:
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
        box_hit = (
            (tmax_ >= tmin) & (tmin < best_t)
            & (tmax_ > jnp.float32(0.0)) & live
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

        n_tris = jnp.clip(
            jnp.where(packet_hit & is_leaf, leaf_count, 0), 0, 256
        )
        best_t, best_p, best_u, best_v = jax.lax.fori_loop(
            0, n_tris, tri_body, (best_t, best_p, best_u, best_v)
        )

        descend = packet_hit & ~is_leaf
        new_dfs = jnp.where(descend, dfs + 1, skip)
        new_dfs = jnp.maximum(new_dfs, dfs + 1)
        if any_hit:
            new_dfs = jnp.where(
                jnp.any(act & (best_p < 0)), new_dfs, jnp.int32(n_nodes)
            )
        return new_dfs, best_t, best_p, best_u, best_v

    _, best_t, best_p, best_u, best_v = jax.lax.while_loop(cond, body, init)
    return best_t, best_p, best_u, best_v


def _traverse_kernel_multiblock(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref, act_ref,
    nodes_ref, tris_ref,
    t_out, prim_out, u_out, v_out,
    *, any_hit: bool, n_nodes: int, n_blocks: int,
):
    """Variant B: no Pallas grid — all ray blocks live in VMEM and a
    fori_loop walks them within one kernel invocation (sidesteps the grid
    pipelining entirely)."""
    def blk(b, _):
        bt, bp, bu, bv = _walk_block(
            ox_ref[b], oy_ref[b], oz_ref[b],
            dx_ref[b], dy_ref[b], dz_ref[b],
            tmax_ref[b], act_ref[b] != 0,
            nodes_ref, tris_ref, any_hit=any_hit, n_nodes=n_nodes,
        )
        t_out[b] = bt
        prim_out[b] = bp
        u_out[b] = bu
        v_out[b] = bv
        return 0

    jax.lax.fori_loop(0, n_blocks, blk, 0)


# Max rays per multiblock invocation: 12 (8,128) f32 arrays per block plus
# the ~6 MB scene tables must fit VMEM.
MULTIBLOCK_CHUNK = 64 * BLOCK  # 64 blocks = 65536 rays (~3 MB of ray state)


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

    # Variant B (no Pallas grid): all ray blocks resident in VMEM and
    # iterated by an in-kernel fori_loop.  Chunked so ray state + the
    # packed scene stay within VMEM.
    chunk_blocks = MULTIBLOCK_CHUNK // BLOCK
    outs_t, outs_p, outs_u, outs_v = [], [], [], []
    for start in range(0, g, chunk_blocks):
        end = min(start + chunk_blocks, g)
        nb = end - start
        kernel = functools.partial(
            _traverse_kernel_multiblock, any_hit=any_hit, n_nodes=d_nodes,
            n_blocks=nb,
        )
        out_shape = [
            jax.ShapeDtypeStruct((nb, SUB, LANE), jnp.float32),  # t
            jax.ShapeDtypeStruct((nb, SUB, LANE), jnp.int32),    # prim
            jax.ShapeDtypeStruct((nb, SUB, LANE), jnp.float32),  # u
            jax.ShapeDtypeStruct((nb, SUB, LANE), jnp.float32),  # v
        ]
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        t_c, p_c, u_c, v_c = pl.pallas_call(
            kernel,
            in_specs=[vmem] * 10,
            out_specs=[vmem] * 4,
            out_shape=out_shape,
            interpret=interpret,
        )(ox[start:end], oy[start:end], oz[start:end],
          dx[start:end], dy[start:end], dz[start:end],
          tm[start:end], ac[start:end], nodes_packed, tris_packed)
        outs_t.append(t_c)
        outs_p.append(p_c)
        outs_u.append(u_c)
        outs_v.append(v_c)
    t_o = jnp.concatenate(outs_t) if len(outs_t) > 1 else outs_t[0]
    p_o = jnp.concatenate(outs_p) if len(outs_p) > 1 else outs_p[0]
    u_o = jnp.concatenate(outs_u) if len(outs_u) > 1 else outs_u[0]
    v_o = jnp.concatenate(outs_v) if len(outs_v) > 1 else outs_v[0]

    def unprep(x):
        return x.reshape(n_pad)[:n]

    prim = unprep(p_o)
    return Hit(
        prim=jnp.where(active, prim, -1),
        t=unprep(t_o),
        u=unprep(u_o),
        v=unprep(v_o),
    )
