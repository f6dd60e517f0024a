"""8-wide BVH "stream" layout for the TPU packet-traversal kernel.

The binary SAH BVH (builder.py, algorithm from /root/reference/sources/
bvh.cpp:255-465) is collapsed host-side into a branching-factor-8 tree and
flattened into a single DFS-preorder **stream** of 128-lane rows — the
layout consumed by accel/pallas_wide.py.  Two row kinds share one table:

- **node row**: child slot k at lanes [16k, 16k+6) = AABB lo/hi of the k-th
  child, plus lanes [16k+6, 16k+8) = (child stream position, child is_leaf)
  as int32 — the per-child pointers that drive the register-stack kernel.
  Empty slots carry NaN boxes (NaN propagates through the min/max slab
  chain and fails every comparison, so they can never test as hit);
- **leaf row**: triangle j at lanes [16j, 16j+9) = v0, e1, e2 (zero padding
  fails the Möller–Trumbore |det| >= eps test, so no count field is needed).

Shared metadata lives in lanes that are spare in BOTH kinds (node slot 0
uses lanes 0-5, leaf slot 0 uses lanes 0-8):
  lane 9  (int32) = 1 for leaf rows, 0 for node rows
  lane 10 (int32) = skip link: stream position after this node's subtree

Stream order per node: [node row][its leaf-item rows][child subtrees...]
[skip].  Sibling leaf ranges that are contiguous in leaf order are merged
up to 8 tris per child (merge_adjacent_leaves) for row occupancy; each leaf
child then owns exactly one row, so the register-stack kernel can jump to
it by slot pointer.

Two kernels consume the same table (accel/pallas_wide.py):
- skip-link walk ("skip"): visit row p; a node row descends to p+1 if ANY
  live ray hits ANY child slot, else jumps to skip; a leaf row tests its 8
  triangles and always proceeds to p+1.  Cursor strictly increases —
  iterations bounded by the stream length (the wedge-proof guard).
- register-stack walk ("stack"): per-child pruning via the slot pointers,
  pending siblings held in scalar-register (row, mask) pairs.  Each child
  pointer's mask bit is consumed at most once — iterations bounded by the
  stream length again.

Why this shape (measured on v5e, scripts/tpu_*_micro.py):
- dynamic-lane `pltpu.roll` ~1.2us/op and dynamic-index stores ~1.4us/op —
  both banned; one row per node/leaf needs neither (static lane offsets,
  read-only tables);
- vector->scalar extracts are ~free inside a fixed-trip fori_loop
  (53 extracts + 8 slab tests = 21.5ns/visit), while a data-dependent
  while-loop *condition* costs ~900ns — so the kernel checks its cursor
  once every K visits and runs K masked visits per check.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from .builder import BVH, triangle_bounds

WIDTH = 8
LEAF_TRIS = 8        # triangles per leaf row
LANE = 128
REC = 16
_FAR = np.float32(1e30)

IS_LEAF_LANE = 9
SKIP_LANE = 10


class WideStream(NamedTuple):
    """Host arrays (pack to device with jnp.asarray)."""

    stream: np.ndarray    # [E, 128] f32 unified rows
    rec_slot: np.ndarray  # [E * 8] int32: record -> leaf-order tri slot (-1)
    n_entries: int        # E (pre-padding)
    n_node_rows: int
    n_leaf_rows: int
    max_depth: int = 0    # node-tree depth (register-stack kernel sizing)
    # Slot provenance for refit (topology-preserving animation updates):
    # per (node row, slot): kind 0=empty 1=binary-node 2=leaf-range,
    # a = binary node id / range first, b = range count.
    slot_kind: np.ndarray | None = None  # [E, 8] int8
    slot_a: np.ndarray | None = None     # [E, 8] int32
    slot_b: np.ndarray | None = None     # [E, 8] int32
    # Per-row OWN bounding box (leaf rows: bounds of their triangles; node
    # rows: union of slot boxes; inert pad rows: NaN = never hit) and the
    # root-path row-index chain [self, parent, ..., root] padded by
    # repeating self — the inputs of the "bits" list-driven traversal
    # (accel/pallas_wide.py): a leaf row can contain a hit only if every
    # box on its root path is hit, so per-packet hit bits over own-boxes
    # AND-gathered along `anc` give an exact visited-leaf-row list.
    box_lo: np.ndarray | None = None     # [E_pad, 3] f32
    box_hi: np.ndarray | None = None     # [E_pad, 3] f32
    anc: np.ndarray | None = None        # [E_pad, MAXD] int32


def _fill_leaf_rows(stream, rec_slot, tv0, tv1, tv2):
    """Vectorized in-place write of every leaf record's (v0, e1, e2) from
    leaf-ordered vertices (used by both build and refit)."""
    valid = rec_slot >= 0
    rows_idx = np.nonzero(valid)[0] // LEAF_TRIS
    lane0 = (np.nonzero(valid)[0] % LEAF_TRIS) * REC
    slots = rec_slot[valid]
    for c in range(3):
        stream[rows_idx, lane0 + 0 + c] = tv0[slots, c]
        stream[rows_idx, lane0 + 3 + c] = tv1[slots, c] - tv0[slots, c]
        stream[rows_idx, lane0 + 6 + c] = tv2[slots, c] - tv0[slots, c]


def build_wide_stream(bvh: BVH, tri_v0, tri_v1, tri_v2) -> WideStream:
    """Collapse a binary BVH over *leaf-ordered* triangles (vertices already
    permuted by ``bvh.indices``) into the wide DFS stream."""
    tv0 = np.asarray(tri_v0, np.float32)
    tv1 = np.asarray(tri_v1, np.float32)
    tv2 = np.asarray(tri_v2, np.float32)
    tlo, thi = triangle_bounds(tv0, tv1, tv2)

    count = bvh.count
    left_first = bvh.left_first
    node_lo, node_hi = bvh.node_lo, bvh.node_hi

    def leaf_box(first, cnt):
        return (tlo[first:first + cnt].min(axis=0),
                thi[first:first + cnt].max(axis=0))

    # items: ('n', i) binary node | ('l', first, cnt) leaf triangle range
    def item_box(it):
        if it[0] == "n":
            return node_lo[it[1]], node_hi[it[1]]
        return leaf_box(it[1], it[2])

    def expandable(it):
        if it[0] == "n":
            return count[it[1]] == 0 or count[it[1]] > LEAF_TRIS
        return it[2] > LEAF_TRIS

    def area(it):
        lo, hi = item_box(it)
        e = hi - lo
        return float(e[0] * e[1] + e[1] * e[2] + e[2] * e[0])

    def expand(it):
        if it[0] == "n" and count[it[1]] == 0:
            l = int(left_first[it[1]])
            return [("n", l), ("n", l + 1)]
        first, cnt = (int(left_first[it[1]]), int(count[it[1]])) \
            if it[0] == "n" else (it[1], it[2])
        h = cnt // 2
        return [("l", first, h), ("l", first + h, cnt - h)]

    def merge_adjacent_leaves(items):
        """Merge sibling leaf ranges that are contiguous in leaf order and
        fit one row — raises leaf-row occupancy (SAH min_leaf leaves average
        well under 8 tris) and frees child slots for deeper expansion."""
        def rng(it):
            if it[0] == "l":
                return it[1], it[2]
            if count[it[1]] > 0:
                return int(left_first[it[1]]), int(count[it[1]])
            return None
        changed = True
        while changed:
            changed = False
            for i in range(len(items)):
                a = rng(items[i])
                if a is None:
                    continue
                for j in range(len(items)):
                    if i == j:
                        continue
                    b = rng(items[j])
                    if b is None:
                        continue
                    if a[0] + a[1] == b[0] and a[1] + b[1] <= LEAF_TRIS:
                        items[i] = ("l", a[0], a[1] + b[1])
                        del items[j]
                        changed = True
                        break
                if changed:
                    break
        return items

    def make_children(root_items):
        items = merge_adjacent_leaves(list(root_items))
        while len(items) < WIDTH:
            cands = [i for i, it in enumerate(items) if expandable(it)]
            if not cands:
                break
            pick = max(cands, key=lambda i: area(items[i]))
            items[pick:pick + 1] = expand(items[pick])
        # Oversized leaves are impossible when the binary build used
        # max_leaf <= LEAF_TRIS (builder.enforce_max_leaf).
        for it in items:
            if it[0] == "l":
                assert it[2] <= LEAF_TRIS, "binary build must cap leaf size"
            else:
                assert count[it[1]] == 0 or count[it[1]] <= LEAF_TRIS
        return items

    rows: list[np.ndarray] = []
    recs: list[np.ndarray] = []
    chains: list[tuple[int, ...]] = []  # per row: enclosing node-row chain
    provenance: list[tuple[int, int, int, int, int]] = []  # row,slot,kind,a,b

    def emit_leaf_row(tri_slots, chain=()) -> int:
        """One leaf item -> one row (<= 8 tris); returns its position.
        Triangle data is filled vectorized afterwards (_fill_leaf_rows)."""
        pos = len(rows)
        row = np.zeros(LANE, np.float32)
        rec = np.full(LEAF_TRIS, -1, np.int32)
        rec[: len(tri_slots)] = tri_slots
        meta = np.array([1, pos + 1], np.int32)  # is_leaf, skip
        row[IS_LEAF_LANE:SKIP_LANE + 1] = meta.view(np.float32)
        rows.append(row)
        recs.append(rec)
        chains.append(chain)
        return pos

    depth_seen = [0]

    def emit_node(items, depth=1, chain=()):
        depth_seen[0] = max(depth_seen[0], depth)
        pos = len(rows)
        rows.append(np.zeros(LANE, np.float32))  # placeholder
        recs.append(np.full(LEAF_TRIS, -1, np.int32))
        chains.append(chain)
        child_chain = chain + (pos,)

        boxes = []
        child_pos: list[int] = []   # per slot: stream position
        child_leaf: list[int] = []  # per slot: is_leaf flag
        interior: list[tuple[int, list]] = []  # (slot, child items)
        for k, it in enumerate(items):
            boxes.append(item_box(it))
            if it[0] == "n" and count[it[1]] == 0:
                l = int(left_first[it[1]])
                interior.append((k, make_children([("n", l), ("n", l + 1)])))
                child_pos.append(-1)  # filled after recursion
                child_leaf.append(0)
                provenance.append((pos, k, 1, it[1], 0))
            else:
                first, cnt = (int(left_first[it[1]]), int(count[it[1]])) \
                    if it[0] == "n" else (it[1], it[2])
                child_pos.append(
                    emit_leaf_row(range(first, first + cnt), child_chain))
                child_leaf.append(1)
                provenance.append((pos, k, 2, first, cnt))

        for k, child_items in interior:
            child_pos[k] = emit_node(child_items, depth + 1, child_chain)

        row = np.zeros(LANE, np.float32)
        for k, (lo, hi) in enumerate(boxes):
            row[REC * k + 0: REC * k + 3] = lo
            row[REC * k + 3: REC * k + 6] = hi
            # per-slot child pointer + kind (register-stack kernel, v2)
            row[REC * k + 6: REC * k + 8] = np.array(
                [child_pos[k], child_leaf[k]], np.int32).view(np.float32)
        for k in range(len(boxes), WIDTH):
            # Empty slots carry NaN boxes: NaN propagates through the
            # min/max slab chain and every comparison is false, so they can
            # NEVER test as hit.  (An inverted lo=+FAR/hi=-FAR box is NOT
            # safe: a negative direction component swaps the slabs and the
            # test passes — which sent the register-stack walk into the
            # slot's null child pointer.)
            row[REC * k + 0: REC * k + 6] = np.nan
        meta = np.array([0, len(rows)], np.int32)  # is_leaf, skip
        row[IS_LEAF_LANE:SKIP_LANE + 1] = meta.view(np.float32)
        rows[pos] = row
        return pos

    if count[0] > 0:
        root_items = make_children(
            [("l", int(left_first[0]), int(count[0]))])
    else:
        l = int(left_first[0])
        root_items = make_children([("n", l), ("n", l + 1)])
    emit_node(root_items)

    n_entries = len(rows)
    # Pad rows to a multiple of 8 sublanes with inert leaf rows (zero
    # tris) — always at least one, so the bits path has an inert row to
    # point list padding at.
    while len(rows) % 8 or len(rows) == n_entries:
        row = np.zeros(LANE, np.float32)
        row[IS_LEAF_LANE:SKIP_LANE + 1] = np.array(
            [1, len(rows) + 1], np.int32).view(np.float32)
        rows.append(row)
        recs.append(np.full(LEAF_TRIS, -1, np.int32))
        chains.append(())

    stream = np.stack(rows).astype(np.float32)
    rec_slot = np.concatenate(recs).astype(np.int32)
    _fill_leaf_rows(stream, rec_slot, tv0, tv1, tv2)
    meta_i = stream[:, IS_LEAF_LANE].view(np.int32)
    n_leaf = int(meta_i[:n_entries].sum())
    e_pad = stream.shape[0]
    slot_kind = np.zeros((e_pad, WIDTH), np.int8)
    slot_a = np.zeros((e_pad, WIDTH), np.int32)
    slot_b = np.zeros((e_pad, WIDTH), np.int32)
    for r, k, kind, a, b in provenance:
        slot_kind[r, k] = kind
        slot_a[r, k] = a
        slot_b[r, k] = b
    maxd = max(len(c) for c in chains) + 1
    anc = np.empty((e_pad, maxd), np.int32)
    for i, c in enumerate(chains):
        path = (i,) + tuple(reversed(c))
        anc[i, :len(path)] = path
        anc[i, len(path):] = i  # pad by repeating self (idempotent AND)
    box_lo, box_hi = compute_own_boxes(stream, rec_slot, n_entries)
    return WideStream(stream, rec_slot, n_entries,
                      n_entries - n_leaf, n_leaf, depth_seen[0],
                      slot_kind, slot_a, slot_b,
                      box_lo, box_hi, anc)


class LeafTable(NamedTuple):
    """Dense leaf table for the bits traversal (accel/pallas_wide.py):
    8 consecutive leaf-order triangles per 128-lane row (~100% occupancy
    vs ~42% for the SAH-shaped stream leaf rows on the indoor scene) plus
    an arithmetic 8-ary AABB hierarchy over consecutive rows.  Measured
    (scripts/leaf_table_study.py): 4,105 rows + 591 hierarchy boxes vs
    9,846 + 3,256 for the stream layout, at only ~1.3x the visited-row
    count — phase-1 sweep 2.8x smaller, phase-2 rows all-useful."""

    table: np.ndarray     # [n_pad, 128] f32 (v0/e1/e2 per 16-lane record)
    rec_slot: np.ndarray  # [n_pad * 8] int32 -> leaf-order tri slot (-1)
    box_lo: np.ndarray    # [E, 3] f32 (rows then hierarchy levels)
    box_hi: np.ndarray    # [E, 3]
    anc: np.ndarray       # [n_rows, MAXD] int32 (self, parent, ..., root)
    n_rows: int           # real leaf rows
    # Baldwin–Weber precomputed-coefficient rows (algo="bitsw"), same
    # row/record structure: per 16-lane record
    #   [nx ny nz d0  a1x a1y a1z a1w  a2x a2y a2z a2w  slot 0 0 0]
    # where n = e1 x e2 (unnormalized), d0 = n.v0, and (a1, a1w)/(a2, a2w)
    # are the affine barycentric rows: u = a1.p + a1w, v = a2.p + a2w for
    # a point p on the triangle plane.  The plane test n.d equals the
    # Möller–Trumbore determinant up to sign (a = -n.d exactly), so the
    # |den| >= 1e-5 gate matches the oracle's |det| gate (mesh.cpp:23-62
    # semantics) up to float rounding.  ~1.4x fewer VPU issues per test
    # than MT.  Padding/degenerate records are all-zero -> den == 0 ->
    # gated off.
    tablew: np.ndarray | None = None  # [n_pad, 128] f32


def _fill_bw_rows(table, rec, tv0, tv1, tv2):
    """Vectorized in-place write of Baldwin–Weber records (see LeafTable).
    Coefficients are derived in float64 and stored f32; the projection
    axis k is the dominant normal axis, with (i, j, k) cyclic so the 2-D
    determinant equals n_k exactly."""
    valid = rec >= 0
    pos = np.nonzero(valid)[0]
    ridx = pos // LEAF_TRIS
    lane0 = (pos % LEAF_TRIS) * REC
    slots = rec[valid]
    v0 = tv0[slots].astype(np.float64)
    e1 = (tv1[slots] - tv0[slots]).astype(np.float64)
    e2 = (tv2[slots] - tv0[slots]).astype(np.float64)
    n = np.cross(e1, e2)
    k = np.argmax(np.abs(n), axis=1)
    i_ = (k + 1) % 3
    j_ = (k + 2) % 3
    r = np.arange(len(slots))
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / n[r, k]
    a1 = np.zeros((len(slots), 3))
    a2 = np.zeros((len(slots), 3))
    a1[r, i_] = e2[r, j_] * inv
    a1[r, j_] = -e2[r, i_] * inv
    a1w = (e2[r, i_] * v0[r, j_] - e2[r, j_] * v0[r, i_]) * inv
    a2[r, i_] = -e1[r, j_] * inv
    a2[r, j_] = e1[r, i_] * inv
    a2w = (e1[r, j_] * v0[r, i_] - e1[r, i_] * v0[r, j_]) * inv
    d0 = np.einsum("ij,ij->i", n, v0)
    cols = [n[:, 0], n[:, 1], n[:, 2], d0,
            a1[:, 0], a1[:, 1], a1[:, 2], a1w,
            a2[:, 0], a2[:, 1], a2[:, 2], a2w]
    for c, col in enumerate(cols):
        # Degenerate triangles (n == 0) produce inf/nan coefficients; the
        # den == 0 gate keeps them from ever hitting, matching MT's
        # |det| < eps rejection.
        table[ridx, lane0 + c] = col.astype(np.float32)
    table[ridx, lane0 + 12] = slots.astype(np.int32).view(np.float32)


BW_SLOT_LANE = 12  # slot-id lane within a Baldwin–Weber record


def build_leaf_table(tv0, tv1, tv2) -> LeafTable:
    """Pack leaf-ordered triangles densely (8/row) and build the 8-ary
    box hierarchy over consecutive rows.  Rebuilt whole on refit (pure
    vectorized NumPy, ~ms)."""
    tv0 = np.asarray(tv0, np.float32)
    tv1 = np.asarray(tv1, np.float32)
    tv2 = np.asarray(tv2, np.float32)
    T = len(tv0)
    n0 = -(-T // LEAF_TRIS)
    # Pad with one FULL inert 8-row group beyond the last (possibly
    # partial) real group: group-granularity candidate lists point their
    # padding slots at it (all-zero rows fail every MT |det| test).
    n_pad = (-(-n0 // 8) + 1) * 8
    rec = np.full(n_pad * LEAF_TRIS, -1, np.int32)
    rec[:T] = np.arange(T, dtype=np.int32)
    table = np.zeros((n_pad, LANE), np.float32)
    _fill_leaf_rows(table, rec, tv0, tv1, tv2)
    # Spare lane 9 of each 16-lane record carries the record's leaf-order
    # tri slot (int32; -1 for padding) so the phase-2 kernel emits prim
    # ids directly from the fetched row — no rec->prim gather afterwards.
    rec2d = rec.reshape(n_pad, LEAF_TRIS)
    for j in range(LEAF_TRIS):
        table[:, REC * j + 9] = np.ascontiguousarray(
            rec2d[:, j]).view(np.float32)
    tablew = np.zeros((n_pad, LANE), np.float32)
    _fill_bw_rows(tablew, rec, tv0, tv1, tv2)

    tlo, thi = triangle_bounds(tv0, tv1, tv2)
    lo0 = np.full((n0, 3), np.inf, np.float32)
    hi0 = np.full((n0, 3), -np.inf, np.float32)
    idx = np.arange(T) // LEAF_TRIS
    np.minimum.at(lo0, idx, tlo)
    np.maximum.at(hi0, idx, thi)
    levels_lo, levels_hi = [lo0], [hi0]
    while len(levels_lo[-1]) > 1:
        cur_lo, cur_hi = levels_lo[-1], levels_hi[-1]
        n = len(cur_lo)
        npar = -(-n // 8)
        plo = np.full((npar, 3), np.inf, np.float32)
        phi = np.full((npar, 3), -np.inf, np.float32)
        gid = np.arange(n) // 8
        np.minimum.at(plo, gid, cur_lo)
        np.maximum.at(phi, gid, cur_hi)
        levels_lo.append(plo)
        levels_hi.append(phi)
    box_lo = np.concatenate(levels_lo)
    box_hi = np.concatenate(levels_hi)
    offs = np.cumsum([0] + [len(x) for x in levels_lo])
    maxd = len(levels_lo)
    r = np.arange(n0)
    anc = np.empty((n0, maxd), np.int32)
    for k in range(maxd):
        anc[:, k] = offs[k] + r // (8 ** k)
    return LeafTable(table, rec, box_lo, box_hi, anc, n0, tablew)


def compute_own_boxes(stream, rec_slot, n_entries):
    """Per-row own AABB from the packed stream: node rows = union of their
    (non-NaN) slot boxes, leaf rows = bounds over their triangle records,
    inert rows (zero tris / padding) = NaN boxes (never hit — NaN fails
    every slab comparison, same convention as empty node slots)."""
    e_pad = stream.shape[0]
    lo = np.full((e_pad, 3), np.nan, np.float32)
    hi = np.full((e_pad, 3), np.nan, np.float32)
    meta_i = stream[:, IS_LEAF_LANE].view(np.int32)
    is_leaf = meta_i == 1
    is_leaf[n_entries:] = True

    node = np.nonzero(~is_leaf[:n_entries])[0]
    if len(node):
        slabs = stream[node].reshape(len(node), WIDTH, REC)[:, :, :6]
        with np.errstate(invalid="ignore"):
            lo[node] = np.nanmin(slabs[:, :, 0:3], axis=1)
            hi[node] = np.nanmax(slabs[:, :, 3:6], axis=1)

    valid = rec_slot >= 0
    ridx = np.nonzero(valid)[0] // LEAF_TRIS
    lane0 = (np.nonzero(valid)[0] % LEAF_TRIS) * REC
    if len(ridx):
        v0 = np.stack([stream[ridx, lane0 + c] for c in range(3)], 1)
        v1 = v0 + np.stack([stream[ridx, lane0 + 3 + c] for c in range(3)], 1)
        v2 = v0 + np.stack([stream[ridx, lane0 + 6 + c] for c in range(3)], 1)
        tl = np.minimum(np.minimum(v0, v1), v2)
        th = np.maximum(np.maximum(v0, v1), v2)
        acc_lo = np.full((e_pad, 3), np.inf, np.float32)
        acc_hi = np.full((e_pad, 3), -np.inf, np.float32)
        np.minimum.at(acc_lo, ridx, tl)
        np.maximum.at(acc_hi, ridx, th)
        occ = np.isfinite(acc_lo[:, 0])
        lo[occ] = acc_lo[occ]
        hi[occ] = acc_hi[occ]
    return lo, hi


def pad_wide_stream(ws: WideStream, target_rows: int) -> WideStream:
    """Pad a built stream to a fixed row capacity so per-frame SAH rebuilds
    keep a stable jit signature (VERDICT r3 item 4: a rebuild that changes
    padded shapes forces recompilation every animated frame).

    Padding rows are inert NODE rows: every slot box is NaN (fails every
    slab comparison, the same convention as empty child slots) and the
    skip link jumps to ``target_rows``, so a walk that lands anywhere in
    the pad region pays exactly ONE visit and exits — unlike inert leaf
    rows, which advance one row per visit.  The bits path never reads the
    pad region at all (its phase arrays come from the LeafTable, whose
    shape depends only on the triangle count)."""
    e0 = ws.stream.shape[0]
    if target_rows <= e0:
        return ws
    add = target_rows - e0
    rows = np.full((add, LANE), np.nan, np.float32)
    meta = np.array([0, target_rows], np.int32).view(np.float32)
    rows[:, IS_LEAF_LANE:SKIP_LANE + 1] = meta
    out = dict(
        stream=np.concatenate([ws.stream, rows]),
        rec_slot=np.concatenate(
            [ws.rec_slot, np.full(add * LEAF_TRIS, -1, np.int32)]),
    )
    for name, fill in (("slot_kind", 0), ("slot_a", 0), ("slot_b", 0)):
        arr = getattr(ws, name)
        if arr is not None:
            pad = np.full((add,) + arr.shape[1:], fill, arr.dtype)
            out[name] = np.concatenate([arr, pad])
    for name in ("box_lo", "box_hi"):
        arr = getattr(ws, name)
        if arr is not None:
            pad = np.full((add,) + arr.shape[1:], np.nan, arr.dtype)
            out[name] = np.concatenate([arr, pad])
    if ws.anc is not None:
        pad = np.repeat(np.arange(e0, target_rows, dtype=np.int32)
                        [:, None], ws.anc.shape[1], axis=1)
        out["anc"] = np.concatenate([ws.anc, pad])
    return ws._replace(**out)


def refit_wide_stream(ws: WideStream, bvh: BVH,
                      tri_v0, tri_v1, tri_v2) -> WideStream:
    """Topology-preserving refit of an existing stream after vertex motion:
    leaf-row triangles and node-row child AABBs are rewritten in place
    (vectorized), ~6x cheaper than a full rebuild — the wide analog of
    BvhBLAS::refit (bvh.cpp:268-287).  The caller must have refit ``bvh``
    (same topology as at build) and pass leaf-ordered vertices."""
    tv0 = np.asarray(tri_v0, np.float32)
    tv1 = np.asarray(tri_v1, np.float32)
    tv2 = np.asarray(tri_v2, np.float32)
    stream = ws.stream.copy()

    # --- leaf rows: rewrite all triangle records in one shot -------------
    _fill_leaf_rows(stream, ws.rec_slot, tv0, tv1, tv2)

    # --- node rows: child boxes from refit binary nodes / leaf ranges ----
    tlo, thi = triangle_bounds(tv0, tv1, tv2)
    kind = ws.slot_kind
    rn, kn = np.nonzero(kind == 1)
    if len(rn):
        ids = ws.slot_a[rn, kn]
        for c in range(3):
            stream[rn, REC * kn + 0 + c] = bvh.node_lo[ids, c]
            stream[rn, REC * kn + 3 + c] = bvh.node_hi[ids, c]
    rl, kl = np.nonzero(kind == 2)
    if len(rl):
        first = ws.slot_a[rl, kl]
        cnt = ws.slot_b[rl, kl]
        # ranges are contiguous and <= LEAF_TRIS long: unrolled min/max
        lo = tlo[first].copy()
        hi = thi[first].copy()
        for j in range(1, int(cnt.max())):
            m = cnt > j
            lo[m] = np.minimum(lo[m], tlo[first[m] + j])
            hi[m] = np.maximum(hi[m], thi[first[m] + j])
        for c in range(3):
            stream[rl, REC * kl + 0 + c] = lo[:, c]
            stream[rl, REC * kl + 3 + c] = hi[:, c]
    box_lo, box_hi = compute_own_boxes(stream, ws.rec_slot, ws.n_entries)
    return ws._replace(stream=stream, box_lo=box_lo, box_hi=box_hi)


# --------------------------------------------------------------------------
# NumPy reference traversal (oracle for the Pallas kernel tests)
# --------------------------------------------------------------------------

def traverse_stream_np(ws: WideStream, origin, direction, t_max,
                       any_hit: bool = False):
    """Per-ray scalar walk of the stream; returns (t, rec, u, v) with
    rec = row*8+j into rec_slot, -1 for a miss.  Semantics match the wide
    kernel exactly: IEEE min/max slab test over directions sanitized away
    from exact zero (same 1e-20 nudge as traverse_wide, so axis-aligned
    rays never produce 0*inf NaNs and oracle/kernel agree bit-for-bit),
    strictly-closer replacement, |det| >= 1e-5 and t >= 1e-5 epsilon
    bounds (mesh.cpp:23-62)."""
    eps = np.float32(1e-5)
    direction = np.asarray(direction, np.float32)
    direction = np.where(
        np.abs(direction) < 1e-20,
        np.where(direction < 0, np.float32(-1e-20), np.float32(1e-20)),
        direction,
    )
    stream = ws.stream
    meta = stream[:, IS_LEAF_LANE:SKIP_LANE + 1].view(np.int32)
    E = ws.n_entries
    n = len(origin)
    out_t = np.asarray(t_max, np.float32).copy()
    out_rec = np.full(n, -1, np.int64)
    out_u = np.zeros(n, np.float32)
    out_v = np.zeros(n, np.float32)

    for r in range(n):
        o = origin[r]
        d = direction[r]
        inv = np.float32(1.0) / d
        p = 0
        while p < E:
            row = stream[p]
            is_leaf, skip = meta[p]
            if is_leaf:
                for j in range(LEAF_TRIS):
                    b = REC * j
                    v0 = row[b: b + 3]
                    e1 = row[b + 3: b + 6]
                    e2 = row[b + 6: b + 9]
                    h = np.cross(d, e2)
                    a = float(e1 @ h)
                    if abs(a) < eps:
                        continue
                    f = 1.0 / a
                    s = o - v0
                    u = f * float(s @ h)
                    if u < 0.0 or u > 1.0:
                        continue
                    q = np.cross(s, e1)
                    v = f * float(d @ q)
                    if v < 0.0 or u + v > 1.0:
                        continue
                    t = f * float(e2 @ q)
                    if eps <= t < out_t[r]:
                        out_t[r] = t
                        out_rec[r] = p * LEAF_TRIS + j
                        out_u[r] = u
                        out_v[r] = v
                p += 1
                if any_hit and out_rec[r] >= 0:
                    break
                continue
            anyh = False
            for k in range(WIDTH):
                lo = row[REC * k: REC * k + 3]
                hi = row[REC * k + 3: REC * k + 6]
                tn = (lo - o) * inv
                tf = (hi - o) * inv
                tmin = np.minimum(tn, tf).max()
                tmax_ = np.maximum(tn, tf).min()
                if tmax_ >= tmin and tmin < out_t[r] and tmax_ > 0:
                    anyh = True
                    break
            p = p + 1 if anyh else skip
    return out_t, out_rec, out_u, out_v
