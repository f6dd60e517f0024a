"""Lockstep BVH traversal on TPU — the `ray_extend`/`ray_connect` core.

TPU-native redesign of the reference's per-thread stackful traversal
(/root/reference/sources/bvh.cpp:129-253 CPU, shaders/ray_extend.comp:26-165
GPU): instead of SIMT threads popping work from atomic queues, a dense block
of rays steps a per-lane automaton in lockstep under one ``lax.while_loop``;
divergence is handled by masking, not warps.  Per iteration every lane does
at most one triangle test *and* one internal-node visit, so iteration count
is max over lanes of (nodes visited + triangles tested).

Memory layout is chosen for gather efficiency:
- nodes are packed as sibling *pairs* (the builder allocates children
  adjacently with an even left index, bvh.cpp:441-448), so fetching both
  children of an internal node is one contiguous 12-float row gather plus one
  4-int row gather;
- triangles are pre-permuted into BVH leaf order at scene-compile time, so a
  leaf's primitives are a contiguous range and the cursor doubles as the
  triangle id (the reference's extra indices[] indirection is folded away).

Traversal order, AABB entry-distance ordering, and the strict ``>`` swap all
replicate bvh.cpp:155-189 so hit selection matches the oracle.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.geometry import intersect_aabb, intersect_triangle
from ..core.vecmath import F32_FAR_AWAY
from .builder import BVH

NONE = jnp.int32(-1)


class TraceArrays(NamedTuple):
    """Device-resident flattened BVH + triangle geometry (jnp pytree)."""

    tri_v0: jnp.ndarray      # [T,3] leaf-ordered world-space vertices
    tri_v1: jnp.ndarray      # [T,3]
    tri_v2: jnp.ndarray      # [T,3]
    pair_boxes: jnp.ndarray  # [P,12] (lo0,hi0,lo1,hi1) sibling pairs
    pair_meta: jnp.ndarray   # [P,4] (leftFirst0,count0,leftFirst1,count1)


def pack_bvh(bvh: BVH) -> tuple[np.ndarray, np.ndarray]:
    """Pack a host BVH node pool into sibling-pair rows (host side)."""
    used = bvh.nodes_used
    pairs = (used + 1) // 2
    lo = bvh.node_lo[: 2 * pairs].reshape(pairs, 2, 3)
    hi = bvh.node_hi[: 2 * pairs].reshape(pairs, 2, 3)
    boxes = np.concatenate(
        [lo[:, 0], hi[:, 0], lo[:, 1], hi[:, 1]], axis=1
    ).astype(np.float32)
    meta = np.stack(
        [
            bvh.left_first[: 2 * pairs: 2],
            bvh.count[: 2 * pairs: 2],
            bvh.left_first[1: 2 * pairs: 2],
            bvh.count[1: 2 * pairs: 2],
        ],
        axis=1,
    ).astype(np.int32)
    return boxes, meta


def bvh_max_depth(bvh: BVH) -> int:
    """Exact traversal stack requirement, computed host-side at compile."""
    depth = 0
    stack = [(0, 1)]
    while stack:
        node, d = stack.pop()
        depth = max(depth, d)
        if bvh.count[node] == 0:
            left = int(bvh.left_first[node])
            stack.append((left, d + 1))
            stack.append((left + 1, d + 1))
    return depth


class Hit(NamedTuple):
    prim: jnp.ndarray  # [N] int32 leaf-order triangle id, -1 on miss
    t: jnp.ndarray     # [N] float32
    u: jnp.ndarray     # [N] float32
    v: jnp.ndarray     # [N] float32


def _node_meta(arrays: TraceArrays, node):
    meta = jnp.take(arrays.pair_meta, node >> 1, axis=0)
    odd = (node & 1) == 1
    lf = jnp.where(odd, meta[..., 2], meta[..., 0])
    cnt = jnp.where(odd, meta[..., 3], meta[..., 1])
    return lf, cnt


def traverse(
    arrays: TraceArrays,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    t_max: jnp.ndarray,
    active: jnp.ndarray,
    stack_depth: int,
    any_hit: bool = False,
) -> Hit:
    """Closest-hit (any_hit=False) or occlusion (any_hit=True) traversal.

    For any_hit the returned ``prim`` is >= 0 where occluded (first hit found,
    matching intersectAny's early-out, bvh.cpp:193-253).
    """
    n = origin.shape[0]
    inv_dir = jnp.float32(1.0) / direction

    state = dict(
        node=jnp.where(active, jnp.int32(0), NONE),
        sp=jnp.zeros(n, jnp.int32),
        stack=jnp.zeros((n, stack_depth), jnp.int32),
        leaf_ptr=jnp.zeros(n, jnp.int32),
        leaf_end=jnp.zeros(n, jnp.int32),
        best_t=t_max.astype(jnp.float32),
        best_prim=jnp.full(n, -1, jnp.int32),
        best_u=jnp.zeros(n, jnp.float32),
        best_v=jnp.zeros(n, jnp.float32),
    )

    def lane_done(s):
        return (s["node"] == NONE) & (s["leaf_ptr"] >= s["leaf_end"])

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

        # ---- TRAV step: lanes not in leaf mode visit their current node --
        trav = ~in_leaf & (s["node"] != NONE)
        if any_hit:
            trav = trav & (best_prim < 0)
        node = jnp.where(trav, s["node"], jnp.int32(0))
        lf, cnt = _node_meta(arrays, node)
        is_leaf = cnt != 0

        # Pop helper values (shared by leaf-entry and dead-end cases).
        sp = s["sp"]
        top = jnp.take_along_axis(
            s["stack"], jnp.clip(sp - 1, 0, stack_depth - 1)[:, None], axis=1
        )[:, 0]
        popped = jnp.where(sp > 0, top, NONE)

        # Case A: current node is a leaf -> enter leaf mode, pop next node.
        enter = trav & is_leaf
        leaf_ptr = jnp.where(enter, lf, leaf_ptr)
        leaf_end = jnp.where(enter, lf + cnt, leaf_end)

        # Case B: internal -> slab-test both children (one packed row).
        boxes = jnp.take(arrays.pair_boxes, lf >> 1, axis=0)
        d0 = intersect_aabb(origin, inv_dir, boxes[:, 0:3], boxes[:, 3:6], best_t)
        d1 = intersect_aabb(origin, inv_dir, boxes[:, 6:9], boxes[:, 9:12], best_t)
        swap = d0 > d1  # strict, bvh.cpp:166
        d_near = jnp.where(swap, d1, d0)
        d_far = jnp.where(swap, d0, d1)
        near_node = jnp.where(swap, lf + 1, lf)
        far_node = jnp.where(swap, lf, lf + 1)

        internal = trav & ~is_leaf
        miss_near = d_near == F32_FAR_AWAY
        go_near = internal & ~miss_near
        push_far = go_near & (d_far != F32_FAR_AWAY)

        new_node = jnp.where(
            enter | (internal & miss_near),
            popped,
            jnp.where(go_near, near_node, s["node"]),
        )
        sp_after_pop = jnp.where(
            (enter | (internal & miss_near)) & (sp > 0), sp - 1, sp
        )
        # Push far child.
        stack = s["stack"]
        idx = jnp.clip(sp_after_pop, 0, stack_depth - 1)
        lanes = jnp.arange(n, dtype=jnp.int32)
        pushed = stack[lanes, idx]
        pushed = jnp.where(push_far, far_node, pushed)
        stack = stack.at[lanes, idx].set(pushed)
        sp_new = jnp.where(push_far, sp_after_pop + 1, sp_after_pop)

        if any_hit:
            # Occluded lanes terminate immediately (intersectAny early-out).
            new_node = jnp.where(best_prim >= 0, NONE, new_node)

        return dict(
            node=new_node,
            sp=sp_new,
            stack=stack,
            leaf_ptr=leaf_ptr,
            leaf_end=leaf_end,
            best_t=best_t,
            best_prim=best_prim,
            best_u=best_u,
            best_v=best_v,
        )

    out = jax.lax.while_loop(cond, body, state)
    return Hit(prim=out["best_prim"], t=out["best_t"], u=out["best_u"], v=out["best_v"])
