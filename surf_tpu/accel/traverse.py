"""Lockstep BVH traversal on TPU — the `ray_extend`/`ray_connect` core.

TPU-native redesign of the reference's per-thread stackful traversal
(/root/reference/sources/bvh.cpp:129-253 CPU, shaders/ray_extend.comp:26-165
GPU).  A dense block of rays steps a per-lane automaton in lockstep under one
``lax.while_loop``; divergence is handled by masking, not warps.

The traversal is **stackless**: nodes are laid out in DFS preorder with a
per-node *skip link* (the DFS position of the next subtree), so a lane's
whole control state is one index.  The reference's 64-deep per-thread stack
(bvh.cpp:13) would require a per-lane scatter into an [N, depth] array every
step — measured pathologically slow through XLA on TPU (the scatter
microbenchmark ran >100x slower than the equivalent gather) — while the
skip-link walk needs only row gathers, which sustain ~2G rows/s.

Cost trade: DFS order loses the stack version's near-first ordering, so a
lane typically visits ~1.3-2x more nodes (the t-bound still prunes), in
exchange for a scatter-free loop.  Hit selection (strictly-closer wins,
mesh.cpp:56) is order-independent, so results are identical modulo exact-t
ties.

Layout notes:
- triangles are pre-permuted into leaf order at scene-compile time, so a
  leaf is a contiguous [first, first+count) range and the cursor doubles as
  the triangle id (the reference's indices[] indirection is folded away);
- boxes+meta are row-gathered per visited node: [D, 6] f32 and [D, 3] i32.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.geometry import intersect_aabb, intersect_triangle
from .builder import BVH


class TraceArrays(NamedTuple):
    """Device-resident flattened BVH + triangle geometry (jnp pytree).

    Nodes are in DFS preorder; ``node_meta[:, 0]`` = leaf first-tri slot,
    ``[:, 1]`` = leaf tri count (0 for internal), ``[:, 2]`` = skip link.

    ``nodes_packed`` / ``tris_packed`` are the VMEM record layout consumed
    by the Pallas packet kernel (16 lanes per record, 8 records per 128-lane
    row; see accel/pallas_traverse.py).  They are packed host-side at scene
    compile so the pallas_call receives plain device arrays — packing them
    inside the render jit handed the custom call transposed intermediates
    whose layout assignment corrupted in-kernel reads (observed as OOB
    device faults)."""

    tri_v0: jnp.ndarray     # [T,3] leaf-ordered world-space vertices
    tri_v1: jnp.ndarray     # [T,3]
    tri_v2: jnp.ndarray     # [T,3]
    node_boxes: jnp.ndarray # [D,6] (lo xyz, hi xyz) in DFS order
    node_meta: jnp.ndarray  # [D,3] int32 (leaf_first, leaf_count, skip)
    nodes_packed: jnp.ndarray  # [ceil(D/8)pad, 128] f32 packed records
    tris_packed: jnp.ndarray   # [ceil(T/8)pad, 128] f32 packed records
    wide_stream: jnp.ndarray | None = None   # [E,128] f32 8-wide DFS stream
    wide_rec_slot: jnp.ndarray | None = None # [E*8] i32 rec -> tri slot
    # (accel/wide.py; None in unit-test fixtures that only exercise the
    # binary kernels — a None leaf is an empty pytree subtree.)
    # algo="bits" dense LeafTable (accel/wide.py build_leaf_table):
    wide_ltab: jnp.ndarray | None = None     # [n_pad,128] f32 packed rows
    wide_lrec: jnp.ndarray | None = None     # [n_pad*8] i32 rec->tri slot
    wide_box_lo: jnp.ndarray | None = None   # [3,E] f32 row+hierarchy boxes
    wide_box_hi: jnp.ndarray | None = None   # [3,E] f32
    wide_anc: jnp.ndarray | None = None      # [n_rows,MAXD] i32 root paths
    wide_ltabw: jnp.ndarray | None = None    # [n_pad,128] f32 Baldwin–Weber
    # algo="twolevel" shared-BLAS instanced tables (accel/pallas_instanced;
    # built by HostCompiled(two_level=True); None otherwise):
    inst_ltab: jnp.ndarray | None = None     # concatenated per-mesh tables
    inst_box_lo: jnp.ndarray | None = None   # [3,E_tot] per-mesh box chains
    inst_box_hi: jnp.ndarray | None = None
    inst_xf: jnp.ndarray | None = None       # [I,128] inverse-3x4 rows
    inst_wlo: jnp.ndarray | None = None      # [3,I] instance world AABBs
    inst_whi: jnp.ndarray | None = None
    inst_inv: jnp.ndarray | None = None      # [I,12] inverse 3x4 (phase 1)
    inst_prim_map: jnp.ndarray | None = None # flat (inst,slot)->leaf slot
    inst_prim_base: jnp.ndarray | None = None  # [I] offsets into prim_map
    # algo="twolevelp" pure object-space mode (HostCompiled(
    # two_level="pure")): no flattened arrays exist; hits are resolved in
    # (instance, object-tri) space (reference bvh.cpp:481-513 end-to-end).
    inst_obj_base: jnp.ndarray | None = None   # [I] base into obj_* arrays
    inst_slot_perm: jnp.ndarray | None = None  # [Tu] mesh-local leaf slot
    #                                          #   -> mesh-local original id


def pack_records_np(f32_cols, i32_cols) -> np.ndarray:
    """Host-side packer for the Pallas record layout: 16 lanes per record
    (f32 fields then int32 fields bitcast to f32), 8 records per row."""
    n = len(f32_cols[0])
    cols = [np.asarray(c, np.float32) for c in f32_cols] + [
        np.asarray(c, np.int32).view(np.float32) for c in i32_cols
    ]
    k = len(cols)
    assert k <= 16
    rec = np.zeros((n, 16), np.float32)
    for j, c in enumerate(cols):
        rec[:, j] = c
    rows = (n + 7) // 8
    rows_pad = rows + ((-rows) % 8)
    flat = np.zeros((rows_pad * 8, 16), np.float32)
    flat[:n] = rec
    return flat.reshape(rows_pad, 128)


def pack_trace_tables(tri_v0, tri_v1, tri_v2, boxes, meta):
    """Build (nodes_packed, tris_packed) from host arrays."""
    nodes_packed = pack_records_np(
        [boxes[:, i] for i in range(6)], [meta[:, i] for i in range(3)]
    )
    e1 = np.asarray(tri_v1, np.float32) - tri_v0
    e2 = np.asarray(tri_v2, np.float32) - tri_v0
    tris_packed = pack_records_np(
        [tri_v0[:, 0], tri_v0[:, 1], tri_v0[:, 2],
         e1[:, 0], e1[:, 1], e1[:, 2], e2[:, 0], e2[:, 1], e2[:, 2]],
        [],
    )
    return nodes_packed, tris_packed


def skiplink_boxes(bvh: BVH, order: np.ndarray) -> np.ndarray:
    """Refit fast path: re-gather node boxes in a cached DFS preorder
    (the skip-link topology is invariant under refit — only box values
    move).  Vectorized; replaces the 90 ms Python DFS of build_skiplinks
    on every animated frame (BvhBLAS::refit analog, bvh.cpp:268-287)."""
    return np.concatenate(
        [bvh.node_lo[order], bvh.node_hi[order]], axis=1
    ).astype(np.float32)


def build_skiplinks(
    bvh: BVH, return_order: bool = False
) -> tuple[np.ndarray, ...]:
    """DFS-preorder node arrays with skip links (host side).

    Returns (boxes [D,6] f32, meta [D,3] i32) and, with ``return_order``,
    the node-id preorder for later ``skiplink_boxes`` refits. The
    reference's node pool (2N, node 1 unused) is compacted to the D
    reachable nodes."""
    # Iterative DFS assigning positions, left child first (matches the
    # builder's allocation order).
    n_total = bvh.nodes_used
    walk = [0]
    order = []
    while walk:
        node = walk.pop()
        order.append(node)
        if bvh.count[node] == 0:
            left = int(bvh.left_first[node])
            walk.append(left + 1)  # pushed first -> visited after left
            walk.append(left)
    d = len(order)

    # skip[i] = position after node i's whole subtree.
    size = np.zeros(n_total, np.int64)
    # compute subtree sizes bottom-up over the preorder (reverse iteration)
    for node in reversed(order):
        if bvh.count[node] != 0:
            size[node] = 1
        else:
            left = int(bvh.left_first[node])
            size[node] = 1 + size[left] + size[left + 1]

    boxes = np.empty((d, 6), np.float32)
    meta = np.empty((d, 3), np.int32)
    for i, node in enumerate(order):
        boxes[i, 0:3] = bvh.node_lo[node]
        boxes[i, 3:6] = bvh.node_hi[node]
        if bvh.count[node] != 0:
            meta[i, 0] = bvh.left_first[node]
            meta[i, 1] = bvh.count[node]
        else:
            meta[i, 0] = 0
            meta[i, 1] = 0
        meta[i, 2] = i + size[node]  # skip link
    if return_order:
        return boxes, meta, np.asarray(order, np.int64)
    return boxes, meta


def bvh_max_depth(bvh: BVH) -> int:
    """Tree depth (informational; the stackless walk needs no stack)."""
    depth = 0
    stack = [(0, 1)]
    while stack:
        node, dd = stack.pop()
        depth = max(depth, dd)
        if bvh.count[node] == 0:
            left = int(bvh.left_first[node])
            stack.append((left, dd + 1))
            stack.append((left + 1, dd + 1))
    return depth


class Hit(NamedTuple):
    prim: jnp.ndarray  # [N] int32 leaf-order triangle id, -1 on miss
    t: jnp.ndarray     # [N] float32
    u: jnp.ndarray     # [N] float32
    v: jnp.ndarray     # [N] float32


def traverse(
    arrays: TraceArrays,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    t_max: jnp.ndarray,
    active: jnp.ndarray,
    stack_depth: int = 0,  # unused (kept for call-site compatibility)
    any_hit: bool = False,
) -> Hit:
    """Closest-hit (any_hit=False) or occlusion (any_hit=True) traversal.

    For any_hit the returned ``prim`` is >= 0 where occluded (first hit
    found, matching intersectAny's early-out, bvh.cpp:193-253)."""
    n = origin.shape[0]
    d_total = arrays.node_boxes.shape[0]
    END = jnp.int32(d_total)
    inv_dir = jnp.float32(1.0) / direction

    state = dict(
        dfs=jnp.where(active, jnp.int32(0), END),
        leaf_ptr=jnp.zeros(n, jnp.int32),
        leaf_end=jnp.zeros(n, jnp.int32),
        best_t=t_max.astype(jnp.float32),
        best_prim=jnp.full(n, -1, jnp.int32),
        best_u=jnp.zeros(n, jnp.float32),
        best_v=jnp.zeros(n, jnp.float32),
    )

    def lane_done(s):
        return (s["dfs"] >= END) & (s["leaf_ptr"] >= s["leaf_end"])

    def cond(s):
        return jnp.any(~lane_done(s))

    def body(s):
        in_leaf = s["leaf_ptr"] < s["leaf_end"]

        # ---- LEAF step: one triangle test per lane in leaf mode ----------
        slot = jnp.clip(s["leaf_ptr"], 0, arrays.tri_v0.shape[0] - 1)
        v0 = jnp.take(arrays.tri_v0, slot, axis=0)
        v1 = jnp.take(arrays.tri_v1, slot, axis=0)
        v2 = jnp.take(arrays.tri_v2, slot, axis=0)
        hit, t, u, v = intersect_triangle(origin, direction, v0, v1, v2, s["best_t"])
        upd = in_leaf & hit
        best_t = jnp.where(upd, t, s["best_t"])
        best_prim = jnp.where(upd, slot, s["best_prim"])
        best_u = jnp.where(upd, u, s["best_u"])
        best_v = jnp.where(upd, v, s["best_v"])
        leaf_ptr = jnp.where(in_leaf, s["leaf_ptr"] + 1, s["leaf_ptr"])
        leaf_end = s["leaf_end"]
        if any_hit:
            # intersectAny early-out: stop the lane on first hit.
            leaf_ptr = jnp.where(upd, leaf_end, leaf_ptr)

        # ---- NODE step: lanes not in leaf mode visit their dfs node ------
        trav = ~in_leaf & (s["dfs"] < END)
        if any_hit:
            trav = trav & (best_prim < 0)
        node = jnp.where(trav, s["dfs"], jnp.int32(0))
        boxes = jnp.take(arrays.node_boxes, node, axis=0)
        meta = jnp.take(arrays.node_meta, node, axis=0)
        leaf_count = meta[:, 1]
        skip = meta[:, 2]
        dist = intersect_aabb(origin, inv_dir, boxes[:, 0:3], boxes[:, 3:6], best_t)
        box_hit = dist < jnp.float32(1e30)
        is_leaf = leaf_count > 0

        enter_leaf = trav & box_hit & is_leaf
        leaf_ptr = jnp.where(enter_leaf, meta[:, 0], leaf_ptr)
        leaf_end = jnp.where(enter_leaf, meta[:, 0] + leaf_count, leaf_end)

        new_dfs = jnp.where(
            trav,
            jnp.where(box_hit & ~is_leaf, s["dfs"] + 1, skip),
            s["dfs"],
        )
        if any_hit:
            new_dfs = jnp.where(best_prim >= 0, END, new_dfs)

        return dict(
            dfs=new_dfs,
            leaf_ptr=leaf_ptr,
            leaf_end=leaf_end,
            best_t=best_t,
            best_prim=best_prim,
            best_u=best_u,
            best_v=best_v,
        )

    out = jax.lax.while_loop(cond, body, state)
    return Hit(prim=out["best_prim"], t=out["best_t"], u=out["best_u"], v=out["best_v"])
