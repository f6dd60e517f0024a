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
import re
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
SUBBLK = 8      # sublanes per per-sub-block candidate list (one (8,128) vreg)
LANE = 128
K_VISITS = 32   # visits per while-loop condition check

_EPS = np.float32(1e-5)
_FAR = np.float32(1e30)
_QNAN = np.float32(np.nan)


class WideTrace(NamedTuple):
    """Device-resident stream (jnp pytree).  The walk bound is the padded
    row count — padding rows are inert zero-triangle leaf rows, so walking
    them is a masked no-op (at most 7 extra visits).

    ``max_depth`` is the wide node-tree depth (a plain Python int, NOT a
    traced leaf — it sizes the algo="stack" unrolled register stack at
    trace time; 0 = unknown, falls back to STACK_DEPTH).

    The algo="bits" list-driven path instead consumes a dense LeafTable
    (accel/wide.py): ltab/lrec are the 8-tris-per-row packed rows + their
    rec->tri-slot map, box_lo/hi ([3, E] SoA) the leaf-row + hierarchy
    boxes, and anc ([n_rows, MAXD]) each leaf row's root-path box chain.
    ``inert_row`` is a guaranteed zero-triangle pad row used as list
    padding (a Python int, static)."""

    stream: jnp.ndarray    # [E_pad, 128] f32
    rec_slot: jnp.ndarray  # [E_pad * 8] int32
    max_depth: int = 0
    ltab: jnp.ndarray | None = None      # [n_pad, 128] f32
    lrec: jnp.ndarray | None = None      # [n_pad * 8] int32
    box_lo: jnp.ndarray | None = None    # [3, E] f32
    box_hi: jnp.ndarray | None = None    # [3, E] f32
    anc: jnp.ndarray | None = None       # [n_rows, MAXD] int32
    inert_row: int = 0
    ltabw: jnp.ndarray | None = None     # [n_pad, 128] f32 Baldwin–Weber


def device_wide_trace(ws: WideStream) -> WideTrace:
    """Load a host WideStream (+ a dense LeafTable derived from its leaf
    records) to device.  The triangle set is reconstructed from the
    stream's own leaf rows so callers need not re-supply vertices."""
    from .wide import build_leaf_table

    valid = ws.rec_slot >= 0
    slots = ws.rec_slot[valid]
    ridx = np.nonzero(valid)[0] // LEAF_TRIS
    lane0 = (np.nonzero(valid)[0] % LEAF_TRIS) * REC
    T = int(slots.max()) + 1 if len(slots) else 0
    tv0 = np.zeros((T, 3), np.float32)
    tv1 = np.zeros((T, 3), np.float32)
    tv2 = np.zeros((T, 3), np.float32)
    for c in range(3):
        tv0[slots, c] = ws.stream[ridx, lane0 + c]
        tv1[slots, c] = ws.stream[ridx, lane0 + c] + \
            ws.stream[ridx, lane0 + 3 + c]
        tv2[slots, c] = ws.stream[ridx, lane0 + c] + \
            ws.stream[ridx, lane0 + 6 + c]
    lt = build_leaf_table(tv0, tv1, tv2)
    return WideTrace(
        stream=jnp.asarray(ws.stream),
        rec_slot=jnp.asarray(ws.rec_slot),
        max_depth=int(ws.max_depth),
        ltab=jnp.asarray(lt.table),
        lrec=jnp.asarray(lt.rec_slot),
        box_lo=jnp.asarray(lt.box_lo.T.copy()),
        box_hi=jnp.asarray(lt.box_hi.T.copy()),
        anc=jnp.asarray(lt.anc),
        inert_row=int(lt.table.shape[0] - 1),
        ltabw=jnp.asarray(lt.tablew),
    )


def _walk_block(
    ox, oy, oz, dx, dy, dz, tmax, act,
    stream_ref, *, any_hit: bool, n_entries: int,
):
    """Walk one (8,128) ray block down the stream; returns
    (visits, best_t, best_rec, best_u, best_v)."""
    visit, init = _make_skip_visit(
        ox, oy, oz, dx, dy, dz, tmax, act, stream_ref,
        any_hit=any_hit, n_entries=n_entries)
    n_e = jnp.int32(n_entries)

    def cond(c):
        return c[0] < n_e

    def body(c):
        return jax.lax.fori_loop(0, K_VISITS, visit, c)

    _, it, best_t, best_r, best_u, best_v = jax.lax.while_loop(
        cond, body, init)
    return it, best_t, best_r, best_u, best_v


def _make_skip_visit(ox, oy, oz, dx, dy, dz, tmax, act, stream_ref,
                     *, any_hit: bool, n_entries: int):
    """Build the skip-link visit body (closure over one ray block)."""
    inv_dx = jnp.float32(1.0) / dx
    inv_dy = jnp.float32(1.0) / dy
    inv_dz = jnp.float32(1.0) / dz
    n_e = jnp.int32(n_entries)

    init = (
        jnp.where(jnp.any(act), jnp.int32(0), n_e),
        jnp.int32(0),
        tmax,
        jnp.full(tmax.shape, -1, jnp.int32),
        jnp.zeros(tmax.shape, jnp.float32),
        jnp.zeros(tmax.shape, jnp.float32),
    )

    def visit(_, c):
        p, it, best_t, best_r, best_u, best_v = c
        valid = p < n_e
        pc = jnp.where(valid, p, 0)
        row = stream_ref[pl.ds(pc, 1), :]
        row_i = pltpu.bitcast(row, jnp.int32)
        is_leaf = row_i[0, IS_LEAF_LANE] == 1
        skip = row_i[0, SKIP_LANE]
        # Node rows / overrun visits are killed by a scalar NaN t-penalty
        # (t + NaN fails every comparison) instead of ANDing the scalar
        # is_leaf/valid into the vector hit mask — scalar->vector boolean
        # broadcasts are a measured Mosaic slow path, scalar float adds are
        # free (tpu_cost_micro / tpu_dep_micro).
        pen = jnp.where(is_leaf & valid, jnp.float32(0.0), _QNAN)

        if any_hit:
            live = act & (best_r < 0)
        else:
            live = act

        # ---- node interpretation: 8 child slab tests -------------------
        # jnp.minimum/maximum (1 op) instead of the C-style where-chains
        # (2 ops): 0*inf NaNs are impossible because traverse_wide
        # sanitizes zero direction components, so IEEE and C-style min/max
        # agree on real boxes; EMPTY slots carry deliberate NaN boxes that
        # propagate and fail every comparison (never hit).
        anyh = jnp.zeros(tmax.shape, dtype=bool)
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
            tmin = jnp.minimum(tx_n, tx_f)
            tmax_ = jnp.maximum(tx_n, tx_f)
            ty_n = (lo_y - oy) * inv_dy
            ty_f = (hi_y - oy) * inv_dy
            tmin = jnp.maximum(tmin, jnp.minimum(ty_n, ty_f))
            tmax_ = jnp.minimum(tmax_, jnp.maximum(ty_n, ty_f))
            tz_n = (lo_z - oz) * inv_dz
            tz_f = (hi_z - oz) * inv_dz
            tmin = jnp.maximum(tmin, jnp.minimum(tz_n, tz_f))
            tmax_ = jnp.minimum(tmax_, jnp.maximum(tz_n, tz_f))
            anyh = anyh | (
                (tmax_ >= tmin) & (tmin < best_t)
                & (tmax_ > jnp.float32(0.0))
            )
        descend = jnp.any(anyh & live)

        # ---- leaf interpretation: 8 Möller–Trumbore tests ---------------
        leaf_live = live
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
            t = f * (e2x * qx + e2y * qy + e2z * qz) + pen
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

    return visit, init


def _walk_block_multi(
    rays, stream_ref, *, any_hit: bool, n_entries: int,
):
    """M independent block walks interleaved in ONE while_loop with a FLAT
    carry (algo="skipN").  Rationale (scripts/tpu_dep_micro.py +
    /tmp/interleave_check, v5e 2026-08-18, honest host-read timing): a
    single walk's per-visit cost is dominated by the serialized
    fetch->eval->reduce->address chain (~390 ns in the micro); two
    interleaved walks overlap each other's memory latency with the other's
    VPU work (M=2: -21%, M=4: -28% per visit).  Round 1 dismissed
    interleaving from measurements now known poisoned by the busy-device
    instant-ACK timing trap.

    Differences from the quarantined skip2 pair-walk (which wedged the
    worker once): a flat tuple carry (no nested per-walk tuples) and each
    walk's cursor is frozen at n_e once it finishes (monotone, provably
    terminating: cond is a disjunction of strictly-increasing cursors
    against a static bound)."""
    m = len(rays)
    visits = []
    inits = []
    for r in rays:
        v, i = _make_skip_visit(*r, stream_ref, any_hit=any_hit,
                                n_entries=n_entries)
        visits.append(v)
        inits.append(i)
    n_e = jnp.int32(n_entries)
    width = len(inits[0])

    flat0 = tuple(x for i in inits for x in i)

    def cond(c):
        ok = c[0] < n_e
        for i in range(1, m):
            ok = ok | (c[i * width] < n_e)
        return ok

    def body(c):
        def step(_, c2):
            outs = []
            for i in range(m):
                ci = c2[i * width:(i + 1) * width]
                outs.extend(visits[i](0, ci))
            return tuple(outs)
        return jax.lax.fori_loop(0, K_VISITS, step, c)

    out = jax.lax.while_loop(cond, body, flat0)
    return [out[i * width:(i + 1) * width] for i in range(m)]


def _walk_block_pair(
    rays0, rays1, stream_ref, *, any_hit: bool, n_entries: int,
):
    """Software-pipelined variant: two independent ray blocks advance in
    ONE while_loop, their visits interleaved in program order so each
    block's vector work can overlap the other's fetch->reduce->scalar
    serialization.  Returns both blocks' results."""
    v0, i0 = _make_skip_visit(*rays0, stream_ref, any_hit=any_hit,
                              n_entries=n_entries)
    v1, i1 = _make_skip_visit(*rays1, stream_ref, any_hit=any_hit,
                              n_entries=n_entries)
    n_e = jnp.int32(n_entries)

    def cond(c):
        return (c[0][0] < n_e) | (c[1][0] < n_e)

    def body(c):
        def both(_, c2):
            return (v0(0, c2[0]), v1(0, c2[1]))
        return jax.lax.fori_loop(0, K_VISITS, both, c)

    c0, c1 = jax.lax.while_loop(cond, body, (i0, i1))
    return c0, c1


def _walk_block_spec(
    ox, oy, oz, dx, dy, dz, tmax, act,
    stream_ref, *, any_hit: bool, n_entries: int, w_spec: int,
):
    """Speculative W-row visits: the skip-link walk's per-visit cost is the
    serialized chain  fetch -> slab masks -> any-reduce -> scalar cursor ->
    next fetch  (the VPU->scalar handoff dominates; row math is nearly free
    by comparison — scripts/tpu_leaf_micro.py / tpu_spec_micro.py).  One
    visit therefore fetches W CONSECUTIVE rows (addresses base..base+W-1
    are scalar-known immediately), evaluates all of them against the
    visit-start best state as independent vector work, and resolves the
    actual path taken in ONE scalar phase reading all W reduces.

    DFS-preorder makes "+1" the common transition (leaf rows always, node
    rows on descend), so most speculated rows are on-path: on the indoor
    scene 69%/58%/45% of serialized visits remain at W=2/3/4 for 1.1/1.2/
    1.3x the row work (scripts/sim_spec_visits.py).

    Correctness notes:
    - EVERY speculated row's leaf hits are merged UNCONDITIONALLY (even
      rows the sequential walk would skip).  Sound: a subtree is pruned
      only when every ray's slab tmin >= its best_t at prune time, best_t
      decreases monotonically, and every tri inside satisfies t >= tmin —
      so an off-path tri can never beat the final best; the strict-< merge
      rejects it for free.  Only NODE rows (whose lanes reinterpret as
      garbage tri data) need killing, and is_leaf is a scalar LOAD (the
      scalar unit runs ahead of the VPU on loads), applied as a t-penalty
      (NaN) — never a scalar->vector boolean mask (Mosaic (1,1)->(8,128)
      broadcasts are unimplemented/slow).  The reduces therefore feed ONLY
      the cursor, exactly like algo="skip" — one drain per W rows.
    - Rows are evaluated/merged in stream order within the window, so the
      running best_t each row sees matches the sequential walk's (only
      EXTRA rows are added, per the argument above).  Exact-t ties against
      an early-merged off-path tri could pick the other coincident
      triangle — edge-measure-zero, same as the stack-vs-skip caveat.
    - The cursor is monotonically increasing (skip links point forward,
      +1 otherwise), so iterations stay bounded by the stream length; the
      max(nxt, p+1) belt keeps that provable under any miscompile.
    - any_hit early-exit moves from per-visit to the (already draining)
      while cond: up to K_VISITS*W rows of masked overshoot, no result
      change."""
    inv_dx = jnp.float32(1.0) / dx
    inv_dy = jnp.float32(1.0) / dy
    inv_dz = jnp.float32(1.0) / dz
    n_e = jnp.int32(n_entries)

    init = (
        jnp.where(jnp.any(act), jnp.int32(0), n_e),
        jnp.int32(0),
        tmax,
        jnp.full(tmax.shape, -1, jnp.int32),
        jnp.zeros(tmax.shape, jnp.float32),
        jnp.zeros(tmax.shape, jnp.float32),
    )

    def visit(_, c):
        p, it, best_t, best_r, best_u, best_v = c
        base = jnp.minimum(p, n_e - 1)

        # ---- vector phase: evaluate + merge W consecutive rows ----------
        ctrl = []  # per row: (desc, leaf, skip) scalars for the cursor
        for w in range(w_spec):
            pcw = jnp.minimum(base + w, n_e - 1)
            row = stream_ref[pl.ds(pcw, 1), :]
            row_i = pltpu.bitcast(row, jnp.int32)
            leaf_w = row_i[0, IS_LEAF_LANE] == 1
            skip_w = row_i[0, SKIP_LANE]
            # Node-row garbage killed by a scalar-load penalty; leaf rows
            # get pen == 0.0 so t_eff == t bit-exactly.  The penalty is NaN
            # (not +/-1e30): t_eff = t + NaN fails every comparison for ANY
            # garbage t (a +1e30 bias admits false hits when the raw t lands
            # in [-1e30, 0), and callers may pass t_max = inf).
            pen = jnp.where(leaf_w, jnp.float32(0.0), _QNAN)

            if any_hit:
                live = act & (best_r < 0)
            else:
                live = act

            anyh = jnp.zeros(tmax.shape, dtype=bool)
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
                tmin = jnp.minimum(tx_n, tx_f)
                tmax_ = jnp.maximum(tx_n, tx_f)
                ty_n = (lo_y - oy) * inv_dy
                ty_f = (hi_y - oy) * inv_dy
                tmin = jnp.maximum(tmin, jnp.minimum(ty_n, ty_f))
                tmax_ = jnp.minimum(tmax_, jnp.maximum(ty_n, ty_f))
                tz_n = (lo_z - oz) * inv_dz
                tz_f = (hi_z - oz) * inv_dz
                tmin = jnp.maximum(tmin, jnp.minimum(tz_n, tz_f))
                tmax_ = jnp.minimum(tmax_, jnp.maximum(tz_n, tz_f))
                anyh = anyh | (
                    (tmax_ >= tmin) & (tmin < best_t)
                    & (tmax_ > jnp.float32(0.0))
                )
            desc_w = jnp.any(anyh & live)
            ctrl.append((desc_w, leaf_w, skip_w))

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
                t = f * (e2x * qx + e2y * qy + e2z * qz) + pen
                hit = (
                    (jnp.abs(a) >= _EPS)
                    & (u >= 0.0) & (u <= 1.0)
                    & (v >= 0.0) & (u + v <= 1.0)
                    & (t >= _EPS) & (t < best_t)
                    & live
                )
                best_t = jnp.where(hit, t, best_t)
                best_r = jnp.where(hit, pcw * LEAF_TRIS + j, best_r)
                best_u = jnp.where(hit, u, best_u)
                best_v = jnp.where(hit, v, best_v)
                if any_hit:
                    live = live & (best_r < 0)

        # ---- scalar phase: resolve the cursor from the W reduces --------
        on = p < n_e
        nxt = base
        n_on = jnp.int32(0)
        for w in range(w_spec):
            desc_w, leaf_w, skip_w = ctrl[w]
            on_w = on & (nxt == base + w) & (base + w < n_e)
            step_w = jnp.where(leaf_w | desc_w, base + w + 1, skip_w)
            nxt = jnp.where(on_w, step_w, nxt)
            n_on = n_on + jnp.where(on_w, jnp.int32(1), jnp.int32(0))

        new_p = jnp.maximum(nxt, p + 1)  # provable progress (wedge guard)
        new_p = jnp.where(p < n_e, new_p, p)
        return new_p, it + n_on, best_t, best_r, best_u, best_v

    def cond(c):
        ok = c[0] < n_e
        if any_hit:
            ok = ok & jnp.any(act & (c[3] < 0))
        return ok

    def body(c):
        return jax.lax.fori_loop(0, K_VISITS, visit, c)

    _, it, best_t, best_r, best_u, best_v = jax.lax.while_loop(
        cond, body, init)
    return it, best_t, best_r, best_u, best_v


def _walk_block_specb(
    ox, oy, oz, dx, dy, dz, tmax, act,
    stream_ref, *, any_hit: bool, n_entries: int, w_spec: int,
    k_visits: int = 8,
):
    """Speculative window walk with ONE (W,128) BLOCK FETCH per visit —
    the v3 hot path, shaped by the slope-protocol decomposition
    (scripts/tpu_cost_micro.py, v5e 2026-08-18):

        dynamic-sublane fetch      ~130 ns/row   <- dominates the skip walk
        slab math + its extracts     ~0          (hides under the fetch)
        MT math                    ~170 ns/row   (VPU-issue-bound)
        block fetch of (8,128)      ~16 ns/row   (130/8, measured bf8)

    One visit fetches rows [base, base+W) as a single (W,128) dynamic
    sublane slice (one ~130 ns fetch instead of W), evaluates every row
    against the visit-start state, and resolves the cursor through the W
    per-row (desc, leaf, skip) scalars in one trailing phase — i.e. the
    reduce->cursor->fetch serialization is paid once per W rows
    (sim_spec_visits: W=8 keeps 0.196x the serialized visits for 1.57x
    the row work on the indoor scene).

    Soundness is the same argument as _walk_block_spec (merges of extra
    rows are harmless under the strict-< best_t merge; node-row garbage is
    killed by a scalar NaN t-penalty), with one addition: near the stream
    end base clamps to n_entries - W, so the window may REVISIT rows before
    p — idempotent under strict-<, and the cursor resolve starts at nxt=p
    so pre-p rows never steer the walk."""
    inv_dx = jnp.float32(1.0) / dx
    inv_dy = jnp.float32(1.0) / dy
    inv_dz = jnp.float32(1.0) / dz
    n_e = jnp.int32(n_entries)
    assert n_entries >= w_spec, "stream shorter than the spec window"

    init = (
        jnp.where(jnp.any(act), jnp.int32(0), n_e),
        jnp.int32(0),
        tmax,
        jnp.full(tmax.shape, -1, jnp.int32),
        jnp.zeros(tmax.shape, jnp.float32),
        jnp.zeros(tmax.shape, jnp.float32),
    )

    def visit(_, c):
        p, it, best_t, best_r, best_u, best_v = c
        base = jnp.clip(p, 0, n_e - w_spec)
        rows = stream_ref[pl.ds(base, w_spec), :]   # ONE block fetch
        rows_i = pltpu.bitcast(rows, jnp.int32)

        ctrl = []  # per row: (desc, leaf, skip) scalars for the cursor
        for w in range(w_spec):
            leaf_w = rows_i[w, IS_LEAF_LANE] == 1
            skip_w = rows_i[w, SKIP_LANE]
            pen = jnp.where(leaf_w, jnp.float32(0.0), _QNAN)

            if any_hit:
                live = act & (best_r < 0)
            else:
                live = act

            anyh = jnp.zeros(tmax.shape, dtype=bool)
            for k in range(WIDTH):
                b = REC * k
                lo_x = rows[w, b + 0]
                lo_y = rows[w, b + 1]
                lo_z = rows[w, b + 2]
                hi_x = rows[w, b + 3]
                hi_y = rows[w, b + 4]
                hi_z = rows[w, b + 5]
                tx_n = (lo_x - ox) * inv_dx
                tx_f = (hi_x - ox) * inv_dx
                tmin = jnp.minimum(tx_n, tx_f)
                tmax_ = jnp.maximum(tx_n, tx_f)
                ty_n = (lo_y - oy) * inv_dy
                ty_f = (hi_y - oy) * inv_dy
                tmin = jnp.maximum(tmin, jnp.minimum(ty_n, ty_f))
                tmax_ = jnp.minimum(tmax_, jnp.maximum(ty_n, ty_f))
                tz_n = (lo_z - oz) * inv_dz
                tz_f = (hi_z - oz) * inv_dz
                tmin = jnp.maximum(tmin, jnp.minimum(tz_n, tz_f))
                tmax_ = jnp.minimum(tmax_, jnp.maximum(tz_n, tz_f))
                anyh = anyh | (
                    (tmax_ >= tmin) & (tmin < best_t)
                    & (tmax_ > jnp.float32(0.0))
                )
            desc_w = jnp.any(anyh & live)
            ctrl.append((desc_w, leaf_w, skip_w))

            for j in range(WIDTH):
                b = REC * j
                v0x = rows[w, b + 0]
                v0y = rows[w, b + 1]
                v0z = rows[w, b + 2]
                e1x = rows[w, b + 3]
                e1y = rows[w, b + 4]
                e1z = rows[w, b + 5]
                e2x = rows[w, b + 6]
                e2y = rows[w, b + 7]
                e2z = rows[w, b + 8]
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
                t = f * (e2x * qx + e2y * qy + e2z * qz) + pen
                hit = (
                    (jnp.abs(a) >= _EPS)
                    & (u >= 0.0) & (u <= 1.0)
                    & (v >= 0.0) & (u + v <= 1.0)
                    & (t >= _EPS) & (t < best_t)
                    & live
                )
                best_t = jnp.where(hit, t, best_t)
                best_r = jnp.where(hit, (base + w) * LEAF_TRIS + j, best_r)
                best_u = jnp.where(hit, u, best_u)
                best_v = jnp.where(hit, v, best_v)
                if any_hit:
                    live = live & (best_r < 0)

        # ---- scalar phase: resolve the cursor through the W rows ---------
        nxt = p
        n_on = jnp.int32(0)
        for w in range(w_spec):
            desc_w, leaf_w, skip_w = ctrl[w]
            on_w = (nxt == base + w) & (base + w < n_e)
            step_w = jnp.where(leaf_w | desc_w, base + w + 1, skip_w)
            nxt = jnp.where(on_w, step_w, nxt)
            n_on = n_on + jnp.where(on_w, jnp.int32(1), jnp.int32(0))

        new_p = jnp.maximum(nxt, p + 1)  # provable progress (wedge guard)
        new_p = jnp.where(p < n_e, new_p, p)
        return new_p, it + n_on, best_t, best_r, best_u, best_v

    def cond(c):
        ok = c[0] < n_e
        if any_hit:
            ok = ok & jnp.any(act & (c[3] < 0))
        return ok

    def body(c):
        return jax.lax.fori_loop(0, k_visits, visit, c)

    _, it, best_t, best_r, best_u, best_v = jax.lax.while_loop(
        cond, body, init)
    return it, best_t, best_r, best_u, best_v


STACK_DEPTH = 16  # default when WideTrace.max_depth is unknown (0)


def _walk_block_stack(
    ox, oy, oz, dx, dy, dz, tmax, act,
    stream_ref, *, any_hit: bool, n_entries: int,
    stack_depth: int = STACK_DEPTH,
):
    """Register-stack walk: exact per-child pruning without memory.

    The stackless skip-link walk visits EVERY child entry of a descended
    node (a leaf row whose own box no ray hit still pays a full visit).
    This variant tests the 8 child boxes at the parent and visits only hit
    children, cutting visits ~2x on the indoor scene (scripts/sim_visits).
    The pending-sibling state lives in SCALAR REGISTERS — one (row, mask)
    pair per tree level, accessed by where-chains over a static depth —
    because every dynamic-index store costs ~1.4us on v5e (tpu_stack_micro)
    while scalar selects are ~free.  Pops re-fetch the parent row to
    recover the next hit child's slot pointer (fetches are cheap).

    Row kinds are still mixed, so each visit evaluates both the slab and
    Möller–Trumbore interpretations, select-masked by the carried kind flag
    (lax.cond measured ~1.6us per switch — branch-free is faster)."""
    inv_dx = jnp.float32(1.0) / dx
    inv_dy = jnp.float32(1.0) / dy
    inv_dz = jnp.float32(1.0) / dz
    n_e = jnp.int32(n_entries)
    zero = jnp.int32(0)

    init = (
        jnp.where(jnp.any(act), jnp.int32(0), jnp.int32(-1)),  # cur row
        zero,                                                  # cur is_leaf
        zero,                                                  # sp
        (zero,) * stack_depth,                                 # stack rows
        (zero,) * stack_depth,                                 # stack masks
        zero,                                                  # visit count
        tmax,
        jnp.full(tmax.shape, -1, jnp.int32),
        jnp.zeros(tmax.shape, jnp.float32),
        jnp.zeros(tmax.shape, jnp.float32),
    )

    def visit(_, c):
        (cur, cleaf, sp, srows, smasks, it,
         best_t, best_r, best_u, best_v) = c
        valid = cur >= 0
        pc = jnp.maximum(cur, 0)
        row = stream_ref[pl.ds(pc, 1), :]
        row_i = pltpu.bitcast(row, jnp.int32)
        is_leaf = cleaf == 1

        if any_hit:
            live = act & (best_r < 0)
        else:
            live = act

        # ---- node interpretation: per-child hit mask --------------------
        mask = zero
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
            tmin = jnp.minimum(tx_n, tx_f)
            tmax_ = jnp.maximum(tx_n, tx_f)
            ty_n = (lo_y - oy) * inv_dy
            ty_f = (hi_y - oy) * inv_dy
            tmin = jnp.maximum(tmin, jnp.minimum(ty_n, ty_f))
            tmax_ = jnp.minimum(tmax_, jnp.maximum(ty_n, ty_f))
            tz_n = (lo_z - oz) * inv_dz
            tz_f = (hi_z - oz) * inv_dz
            tmin = jnp.maximum(tmin, jnp.minimum(tz_n, tz_f))
            tmax_ = jnp.minimum(tmax_, jnp.maximum(tz_n, tz_f))
            hit_k = (
                (tmax_ >= tmin) & (tmin < best_t)
                & (tmax_ > jnp.float32(0.0)) & live
            )
            mask = mask + jnp.where(jnp.any(hit_k), jnp.int32(1 << k), zero)
        mask = jnp.where(valid & ~is_leaf, mask, zero)

        # ---- leaf interpretation: 8 Möller–Trumbore tests ----------------
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

        # ---- control: descend to first hit child / pop pending ----------
        low = mask & (-mask)          # lowest set bit (one-hot)
        rem = mask & (mask - 1)       # remaining siblings
        nc = zero
        nl = zero
        for k in range(WIDTH):
            sel = low == (1 << k)
            nc = jnp.where(sel, row_i[0, REC * k + 6], nc)
            nl = jnp.where(sel, row_i[0, REC * k + 7], nl)
        go = mask != zero
        push = valid & go & (rem != zero)
        pop = valid & ~go & (sp > zero)

        top_i = sp - 1
        trow = zero
        tmask = zero
        for i in range(stack_depth):
            sel = top_i == i
            trow = jnp.where(sel, srows[i], trow)
            tmask = jnp.where(sel, smasks[i], tmask)
        prow = stream_ref[pl.ds(jnp.maximum(trow, 0), 1), :]
        prow_i = pltpu.bitcast(prow, jnp.int32)
        plow = tmask & (-tmask)
        prem = tmask & (tmask - 1)
        pnc = zero
        pnl = zero
        for k in range(WIDTH):
            sel = plow == (1 << k)
            pnc = jnp.where(sel, prow_i[0, REC * k + 6], pnc)
            pnl = jnp.where(sel, prow_i[0, REC * k + 7], pnl)

        nxt = jnp.where(go, nc, jnp.where(pop, pnc, jnp.int32(-1)))
        nxt_leaf = jnp.where(go, nl, jnp.where(pop, pnl, zero))

        new_srows = []
        new_smasks = []
        for i in range(stack_depth):
            at_push = push & (sp == i)
            at_pop = pop & (top_i == i)
            new_srows.append(jnp.where(at_push, pc, srows[i]))
            new_smasks.append(jnp.where(
                at_push, rem, jnp.where(at_pop, prem, smasks[i])))
        sp2 = sp + jnp.where(push, jnp.int32(1), zero) \
            - jnp.where(pop & (prem == zero), jnp.int32(1), zero)

        cur2 = jnp.where(valid, nxt, cur)
        cleaf2 = jnp.where(valid, nxt_leaf, cleaf)
        if any_hit:
            cur2 = jnp.where(
                jnp.any(act & (best_r < 0)), cur2, jnp.int32(-1))
        it2 = it + jnp.where(valid, jnp.int32(1), zero)
        return (cur2, cleaf2, sp2, tuple(new_srows), tuple(new_smasks),
                it2, best_t, best_r, best_u, best_v)

    def cond(c):
        # cur >= 0, with an iteration belt: every row is visited at most
        # once (each child pointer's mask bit is consumed exactly once), so
        # n_entries + K bounds the loop even under a miscompile.
        return (c[0] >= 0) & (c[5] < n_e + jnp.int32(K_VISITS))

    def body(c):
        return jax.lax.fori_loop(0, K_VISITS, visit, c)

    out = jax.lax.while_loop(cond, body, init)
    return out[5], out[6], out[7], out[8], out[9]


def _kernel_multiblock(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref, act_ref,
    stream_ref,
    t_out, rec_out, u_out, v_out, it_out,
    *, any_hit: bool, n_entries: int, n_blocks: int, algo: str = "skip",
    stack_depth: int = STACK_DEPTH,
):
    if algo == "skip2":
        def rays(b):
            return (ox_ref[b], oy_ref[b], oz_ref[b],
                    dx_ref[b], dy_ref[b], dz_ref[b],
                    tmax_ref[b], act_ref[b] != 0)

        def write(b, c):
            p, it, bt, br, bu, bv = c
            t_out[b] = bt
            rec_out[b] = br
            u_out[b] = bu
            v_out[b] = bv
            it_out[b] = jnp.full(bt.shape, it, jnp.int32)

        def pair(i, _):
            b = 2 * i
            c0, c1 = _walk_block_pair(
                rays(b), rays(b + 1), stream_ref,
                any_hit=any_hit, n_entries=n_entries)
            write(b, c0)
            write(b + 1, c1)
            return 0

        jax.lax.fori_loop(0, n_blocks // 2, pair, 0)
        if n_blocks % 2:
            b = n_blocks - 1
            it, bt, br, bu, bv = _walk_block(
                *rays(b), stream_ref, any_hit=any_hit, n_entries=n_entries)
            write(b, (0, it, bt, br, bu, bv))
        return

    if algo.startswith("ilv"):
        m = int(algo[3:])

        def rays_of(b):
            return (ox_ref[b], oy_ref[b], oz_ref[b],
                    dx_ref[b], dy_ref[b], dz_ref[b],
                    tmax_ref[b], act_ref[b] != 0)

        def write_out(b, c):
            _, it, bt, br, bu, bv = c
            t_out[b] = bt
            rec_out[b] = br
            u_out[b] = bu
            v_out[b] = bv
            it_out[b] = jnp.full(bt.shape, it, jnp.int32)

        def group(i, _):
            b0 = m * i
            outs = _walk_block_multi(
                [rays_of(b0 + j) for j in range(m)], stream_ref,
                any_hit=any_hit, n_entries=n_entries)
            for j in range(m):
                write_out(b0 + j, outs[j])
            return 0

        jax.lax.fori_loop(0, n_blocks // m, group, 0)
        for b in range(n_blocks - n_blocks % m, n_blocks):
            it, bt, br, bu, bv = _walk_block(
                *rays_of(b), stream_ref, any_hit=any_hit,
                n_entries=n_entries)
            write_out(b, (0, it, bt, br, bu, bv))
        return

    if algo.startswith("specb"):
        walk = functools.partial(_walk_block_specb, w_spec=int(algo[5:]))
    elif algo.startswith("spec"):
        walk = functools.partial(_walk_block_spec, w_spec=int(algo[4:]))
    elif algo == "stack":
        walk = functools.partial(_walk_block_stack, stack_depth=stack_depth)
    else:
        walk = _walk_block

    def blk(b, _):
        it, bt, br, bu, bv = walk(
            ox_ref[b], oy_ref[b], oz_ref[b],
            dx_ref[b], dy_ref[b], dz_ref[b],
            tmax_ref[b], act_ref[b] != 0,
            stream_ref, any_hit=any_hit, n_entries=n_entries,
        )
        t_out[b] = bt
        rec_out[b] = br
        u_out[b] = bu
        v_out[b] = bv
        it_out[b] = jnp.full(bt.shape, it, jnp.int32)
        return 0

    jax.lax.fori_loop(0, n_blocks, blk, 0)


# ---------------------------------------------------------------------------
# algo="bits": chain-free three-phase traversal
# ---------------------------------------------------------------------------
#
# The walk kernels above are latency-bound: every visit serializes
# fetch -> vector eval -> ANY-reduce -> scalar cursor -> next fetch
# (~400-550 ns/visit on v5e regardless of math, scripts/tpu_dep_micro.py).
# This path removes ALL vector->scalar dependencies instead of amortizing
# them:
#
#   phase 1 (XLA, dense): per ray packet, slab-test every row's OWN
#     bounding box (WideStream.box_lo/hi) against all rays with their
#     initial t_max -> one "some ray hits this row" bit per row.  Dense,
#     static, reduction-friendly — no control flow.
#   phase 1.5 (XLA): a leaf row can contain a qualifying hit only if its
#     own box AND every ancestor box is hit (standard BVH argument, with
#     t bounds at their initial values — conservative, never misses);
#     AND-gather the bits along anc_leaf, then cumsum-compact surviving
#     leaf-row indices into a per-packet list (+ group count).
#   phase 2 (Pallas): fori over the list, 8 leaf rows per step, 8
#     Möller–Trumbore tests per row with per-lane closest-hit updates.
#     Every scalar the kernel consumes (list entries, row fields) comes
#     from VMEM fetches the scalar unit can run ahead on; nothing feeds
#     back from the VPU — the loop runs at vector throughput (the
#     measured fixed-trip regime, ~21.5 ns per 100-vector-op visit),
#     not at drain latency.  List padding points at a guaranteed inert
#     zero-triangle row (|det| < eps fails every test), so no masking is
#     needed past the end; the trip count arrives via scalar prefetch.
#
# Result parity: identical hit (t, rec, u, v) to the skip walk / stream
# oracle — leaf rows are processed in the same stream order with the same
# strictly-closer replacement, and rows pruned here (own-box miss) cannot
# contain qualifying hits.  Inactive rays are killed by t_max = -FAR
# (t >= eps can never beat it), not a mask.


def _ray_box_bits(box_lo, box_hi, o3, inv3, tm):
    """Per-(box, ray) slab test: box_lo/hi [3, E], o3/inv3 [3, R], tm [R]
    -> hit [E, R] bool.  NaN boxes (inert/pad rows) propagate NaN and
    never hit."""
    tmin = None
    tmax_ = None
    for c in range(3):
        tn = (box_lo[c][:, None] - o3[c][None, :]) * inv3[c][None, :]
        tf = (box_hi[c][:, None] - o3[c][None, :]) * inv3[c][None, :]
        lo_c = jnp.minimum(tn, tf)
        hi_c = jnp.maximum(tn, tf)
        tmin = lo_c if tmin is None else jnp.maximum(tmin, lo_c)
        tmax_ = hi_c if tmax_ is None else jnp.minimum(tmax_, hi_c)
    return (tmax_ >= tmin) & (tmin < tm[None, :]) & (tmax_ > 0.0)


def _packet_bits(box_lo, box_hi, o3, inv3, tm, halves: int = 1):
    """Slab-test all E own-boxes against one packet: box_lo/hi [3, E],
    o3/inv3 [3, R], tm [R] -> bits [E] bool (halves=1) or [E, halves]
    (one bit per (8,128) sub-block of the packet — per-sub-block candidate
    lists cut phase-2 pair work ~1.75x because unions grow sub-linearly in
    ray count, out_configs/union_visits.json)."""
    hit = _ray_box_bits(box_lo, box_hi, o3, inv3, tm)
    if halves == 1:
        return jnp.any(hit, axis=1)
    e_dim = hit.shape[0]
    return jnp.any(hit.reshape(e_dim, halves, -1), axis=2)


def _mt8(row, row_i, ox, oy, oz, dx, dy, dz, c, dtype=jnp.float32,
         sub: int = 0):
    """8 Möller–Trumbore tests of one leaf-table row against a ray block;
    the hit's prim id comes from the slot-id lane baked into the row
    (build_leaf_table), so results need no rec->prim mapping.

    dtype=bfloat16 runs the vector math at 2.06x VPU rate (measured,
    scripts/tpu_bf16_micro.py); winners within ~2^-8 relative t of each
    other may flip vs f32, which only moves isolated silhouette pixels —
    the integrator re-intersects the winning triangle in f32 for the
    differentiable t/u/v either way (integrator.py _reintersect)."""
    best_t, best_r, best_u, best_v = c
    one = dtype(1.0)
    for j in range(WIDTH):
        b = REC * j
        v0x = row[sub, b + 0].astype(dtype)
        v0y = row[sub, b + 1].astype(dtype)
        v0z = row[sub, b + 2].astype(dtype)
        e1x = row[sub, b + 3].astype(dtype)
        e1y = row[sub, b + 4].astype(dtype)
        e1z = row[sub, b + 5].astype(dtype)
        e2x = row[sub, b + 6].astype(dtype)
        e2y = row[sub, b + 7].astype(dtype)
        e2z = row[sub, b + 8].astype(dtype)
        sid = row_i[sub, b + 9]
        hx = dy * e2z - dz * e2y
        hy = dz * e2x - dx * e2z
        hz = dx * e2y - dy * e2x
        a = e1x * hx + e1y * hy + e1z * hz
        f = one / a
        sx = ox - v0x
        sy = oy - v0y
        sz = oz - v0z
        u = f * (sx * hx + sy * hy + sz * hz)
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = f * (dx * qx + dy * qy + dz * qz)
        t = f * (e2x * qx + e2y * qy + e2z * qz)
        if dtype is jnp.bfloat16:
            # v5e's VPU has neither packed-bf16 compares ("Target does not
            # support this comparison") nor packed-mask -> 32-bit-lane
            # relayouts, so only the MUL/ADD polynomial runs in bf16 (2.06x
            # rate); decisions, carries and selects stay f32.
            a = a.astype(jnp.float32)
            u = u.astype(jnp.float32)
            v = v.astype(jnp.float32)
            t = t.astype(jnp.float32)
        hit = (
            (jnp.abs(a) >= _EPS)
            & (u >= 0.0) & (u <= 1.0)
            & (v >= 0.0) & (u + v <= 1.0)
            & (t >= _EPS) & (t < best_t)
        )
        best_t = jnp.where(hit, t, best_t)
        best_r = jnp.where(hit, sid, best_r)
        best_u = jnp.where(hit, u, best_u)
        best_v = jnp.where(hit, v, best_v)
    return best_t, best_r, best_u, best_v


def _mt8_any(row, ox, oy, oz, dx, dy, dz, c):
    """Any-hit variant of _mt8 (shadow/connect rays, ray_connect.comp:
    178-212): occlusion only needs *whether* some triangle lies in
    [eps, t_max), so the winner-id/u/v carries, their selects and the
    slot-id extract are dropped — the single best_t carry doubles as the
    occlusion flag (best_t < t_max at the end <=> occluded).  u/v are
    still computed (they are part of the hit predicate)."""
    (best_t,) = c
    one = jnp.float32(1.0)
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
        f = one / a
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
        )
        best_t = jnp.where(hit, t, best_t)
    return (best_t,)


def _bw8(row, row_i, ox, oy, oz, dx, dy, dz, c):
    """8 Baldwin–Weber plane+barycentric tests of one precomputed-
    coefficient row (LeafTable.tablew) against a ray block — ~1.4x fewer
    VPU issues than Möller–Trumbore for the same decision: den = n.d is
    the MT determinant up to sign (a = -n.d exactly), t from the plane
    equation, u/v from the precomputed affine barycentric rows.  Float
    rounding differs from MT, so winners within ~1 ulp of a tie may flip
    (isolated silhouette pixels); the integrator re-intersects the winner
    in f32 MT either way (integrator.py _reintersect), exactly like the
    oracle-parity argument for tie-breaks between the walk orders."""
    best_t, best_r, best_u, best_v = c
    for j in range(WIDTH):
        b = REC * j
        nx = row[0, b + 0]
        ny = row[0, b + 1]
        nz = row[0, b + 2]
        d0 = row[0, b + 3]
        a1x = row[0, b + 4]
        a1y = row[0, b + 5]
        a1z = row[0, b + 6]
        a1w = row[0, b + 7]
        a2x = row[0, b + 8]
        a2y = row[0, b + 9]
        a2z = row[0, b + 10]
        a2w = row[0, b + 11]
        sid = row_i[0, b + 12]
        den = nx * dx + ny * dy + nz * dz
        num = d0 - (nx * ox + ny * oy + nz * oz)
        t = num * (jnp.float32(1.0) / den)
        px = ox + t * dx
        py = oy + t * dy
        pz = oz + t * dz
        u = a1w + a1x * px + a1y * py + a1z * pz
        v = a2w + a2x * px + a2y * py + a2z * pz
        hit = (
            (jnp.abs(den) >= _EPS)
            & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t >= _EPS) & (t < best_t)
        )
        best_t = jnp.where(hit, t, best_t)
        best_r = jnp.where(hit, sid, best_r)
        best_u = jnp.where(hit, u, best_u)
        best_v = jnp.where(hit, v, best_v)
    return best_t, best_r, best_u, best_v


_INF = np.float32(np.inf)


def _merge_hits(a, b):
    """Left-preferring closest-hit merge: on t ties the LEFT (lower
    stream-order) candidate wins, matching the sequential strict-<
    replacement order."""
    ta, ra, ua, va = a
    tb, rb, ub, vb = b
    s = tb < ta
    return (jnp.where(s, tb, ta), jnp.where(s, rb, ra),
            jnp.where(s, ub, ua), jnp.where(s, vb, va))


def _mt8_ilp(row, row_i, ox, oy, oz, dx, dy, dz, c):
    """_mt8 restructured for instruction-level parallelism: the 8
    Möller–Trumbore tests are fully independent (no best_t in their
    conditions — failed tests get t = +inf), merged by a 3-level
    left-preferring min-tree, and compared against the carried best ONCE
    per row.  Identical results to the sequential version: among equal-t
    candidates the lowest record index wins at every tree level, and the
    final strict < keeps earlier rows' winners on cross-row ties.  The
    sequential version's per-tri select chain serializes 8 dependent
    ~10-op latency chains per row; here the chains overlap."""
    cands = []
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
        sid = row_i[0, b + 9]
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
        ok = (
            (jnp.abs(a) >= _EPS)
            & (u >= 0.0) & (u <= 1.0)
            & (v >= 0.0) & (u + v <= 1.0)
            & (t >= _EPS)
        )
        cands.append((jnp.where(ok, t, _INF), sid, u, v))
    m = _merge_hits(
        _merge_hits(_merge_hits(cands[0], cands[1]),
                    _merge_hits(cands[2], cands[3])),
        _merge_hits(_merge_hits(cands[4], cands[5]),
                    _merge_hits(cands[6], cands[7])))
    best_t, best_r, best_u, best_v = c
    hit = m[0] < best_t
    return (jnp.where(hit, m[0], best_t), jnp.where(hit, m[1], best_r),
            jnp.where(hit, m[2], best_u), jnp.where(hit, m[3], best_v))


def _bw8_ilp(row, row_i, ox, oy, oz, dx, dy, dz, c):
    """_bw8 with the same ILP min-tree restructure as _mt8_ilp."""
    cands = []
    for j in range(WIDTH):
        b = REC * j
        nx = row[0, b + 0]
        ny = row[0, b + 1]
        nz = row[0, b + 2]
        d0 = row[0, b + 3]
        a1x = row[0, b + 4]
        a1y = row[0, b + 5]
        a1z = row[0, b + 6]
        a1w = row[0, b + 7]
        a2x = row[0, b + 8]
        a2y = row[0, b + 9]
        a2z = row[0, b + 10]
        a2w = row[0, b + 11]
        sid = row_i[0, b + 12]
        den = nx * dx + ny * dy + nz * dz
        num = d0 - (nx * ox + ny * oy + nz * oz)
        t = num * (jnp.float32(1.0) / den)
        px = ox + t * dx
        py = oy + t * dy
        pz = oz + t * dz
        u = a1w + a1x * px + a1y * py + a1z * pz
        v = a2w + a2x * px + a2y * py + a2z * pz
        ok = (
            (jnp.abs(den) >= _EPS)
            & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t >= _EPS)
        )
        cands.append((jnp.where(ok, t, _INF), sid, u, v))
    m = _merge_hits(
        _merge_hits(_merge_hits(cands[0], cands[1]),
                    _merge_hits(cands[2], cands[3])),
        _merge_hits(_merge_hits(cands[4], cands[5]),
                    _merge_hits(cands[6], cands[7])))
    best_t, best_r, best_u, best_v = c
    hit = m[0] < best_t
    return (jnp.where(hit, m[0], best_t), jnp.where(hit, m[1], best_r),
            jnp.where(hit, m[2], best_u), jnp.where(hit, m[3], best_v))


def _leaf_rows_kernel(counts_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref,
                      dz_ref, tm_ref, rows_ref, *refs,
                      cap8: int, sweep: bool, halves: int,
                      carry_in: bool = False, use_bf16: bool = False,
                      use_bw: bool = False, rows_per_trip: int = LEAF_TRIS,
                      ilp: bool = False, any_trim: bool = False,
                      block_fetch: bool = False):
    """Phase-2 leaf intersection over AFFINE row addresses.

    sweep=False: rows_ref is the per-sub-block gather-compacted row buffer
    (block (halves, cap, 128)); sweep=True: rows_ref is the full leaf table
    (constant block) and the sub-block walks ALL rows — the overflow
    fallback.  Each (8,128) sub-block of the ray packet has its OWN
    candidate list (unions grow sub-linearly in ray count, so per-sub-block
    lists cut pair work ~1.75x at 2048-ray packets while phase 1 and the
    grid stay packet-wide).  Affine addressing is the whole point: a row
    fetch whose sublane index is data-dependent (extracted from a list)
    costs ~150-250 ns of scalar-pipeline serialization per row on v5e,
    while loop-affine fetches run at vector throughput
    (scripts/tpu_leaf_variants_micro.py)."""
    if carry_in:
        t_in, r_in, u_in, v_in = refs[:4]
        t_out, r_out, u_out, v_out = refs[4:]
    else:
        t_out, r_out, u_out, v_out = refs
    p = pl.program_id(0)
    dt = jnp.bfloat16 if use_bf16 else jnp.float32
    step = ox_ref.shape[1] // halves   # sublanes per candidate list
    for h in range(halves):
        sl = slice(h * step, (h + 1) * step)
        trip = jnp.minimum(counts_ref[p * halves + h], jnp.int32(cap8))
        ox = ox_ref[0, sl].astype(dt)
        oy = oy_ref[0, sl].astype(dt)
        oz = oz_ref[0, sl].astype(dt)
        dx = dx_ref[0, sl].astype(dt)
        dy = dy_ref[0, sl].astype(dt)
        dz = dz_ref[0, sl].astype(dt)

        def group(gi, c, h=h, ox=ox, oy=oy, oz=oz, dx=dx, dy=dy, dz=dz):
            if block_fetch and not any_trim:
                # one (rows_per_trip, 128) VMEM read per trip instead of
                # rows_per_trip (1, 128) reads — tests whether per-fetch
                # scaffolding (not extracts/vector math) floors the row
                # cost (algo flag 'b', r4 experiment)
                if sweep:
                    blk = rows_ref[pl.ds(gi * rows_per_trip, rows_per_trip), :]
                else:
                    blk = rows_ref[h, pl.ds(gi * rows_per_trip,
                                            rows_per_trip), :]
                blk_i = pltpu.bitcast(blk, jnp.int32)
                for e in range(rows_per_trip):
                    c = _mt8(blk, blk_i, ox, oy, oz, dx, dy, dz, c, dt,
                             sub=e)
                return c
            for e in range(rows_per_trip):
                if sweep:
                    row = rows_ref[pl.ds(gi * rows_per_trip + e, 1), :]
                else:
                    row = rows_ref[h, pl.ds(gi * rows_per_trip + e, 1), :]
                if any_trim:
                    c = _mt8_any(row, ox, oy, oz, dx, dy, dz, c)
                    continue
                row_i = pltpu.bitcast(row, jnp.int32)
                if use_bw:
                    fn = _bw8_ilp if ilp else _bw8
                    c = fn(row, row_i, ox, oy, oz, dx, dy, dz, c)
                elif ilp:
                    c = _mt8_ilp(row, row_i, ox, oy, oz, dx, dy, dz, c)
                else:
                    c = _mt8(row, row_i, ox, oy, oz, dx, dy, dz, c, dt)
            return c

        # carries/decisions stay f32 (no packed-bf16 compares on v5e);
        # dt only accelerates the MT polynomial inside _mt8.
        tm0 = tm_ref[0, sl]
        if any_trim:
            # occlusion-only epilogue: best_t is the single carry and
            # doubles as the occluded flag.  r=0 maps through the leaf
            # table's identity rec_slot (build_leaf_table: rec[:T] =
            # arange) to prim 0 >= 0 = "occluded"; u/v are unused by the
            # connect stage (integrator._next_event reads only prim).
            (bt,) = jax.lax.fori_loop(0, trip, group, (tm0,))
            occ = bt < tm0
            t_out[0, sl] = bt
            r_out[0, sl] = jnp.where(occ, jnp.int32(0), jnp.int32(-1))
            u_out[0, sl] = jnp.zeros(tm0.shape, jnp.float32)
            v_out[0, sl] = jnp.zeros(tm0.shape, jnp.float32)
            continue
        if carry_in:
            # refinement round: resume from the prefix round's running best
            init = (t_in[0, sl], r_in[0, sl], u_in[0, sl], v_in[0, sl])
        else:
            init = (
                tm0,
                jnp.full(tm0.shape, -1, jnp.int32),
                jnp.zeros(tm0.shape, jnp.float32),
                jnp.zeros(tm0.shape, jnp.float32),
            )
        bt, br, bu, bv = jax.lax.fori_loop(0, trip, group, init)
        t_out[0, sl] = bt
        r_out[0, sl] = br
        u_out[0, sl] = bu
        v_out[0, sl] = bv


# Gather-compaction capacity (leaf rows per packet).  Packets whose
# visited set exceeds this fall back to the full-sweep kernel — still
# affine, still correct, just unculled; incoherent mega-union packets are
# near-sweep anyway.  1536 covers typical bounce/shadow unions at 1024-
# 2048 ray packets on the indoor scene with headroom.
BITS_CAP_ROWS = 1536
# Overflow-sweep VMEM chunk: 16384 rows x 512 B = 8 MB per block.  Tables
# larger than this are swept in leaf-order chunks with the running best
# carried between chunks (bit-identical; see sweep_all in _bits_leaf_lists).
# 32768 (16 MB) measured 44 KB over the 16 MB scoped-vmem limit on v5e once
# the ray blocks rode on top (stress32 device run, round 5).
SWEEP_CHUNK_ROWS = 16384

# algo="bits2": leaf-order prefix length (rows) round A processes before
# the t-refresh re-sweep culls the tail candidates.
BITS_REFINE_ROWS = 192

# algo="bitsp": per-RAY candidate GROUP list capacity (groups of 8 leaf
# rows).  Indoor-scene per-ray group counts: mean ~3.8, p99 ~15, max 28
# (out_configs/perray_rows_study.json) — 16 leaves overflow at ~0.6%
# worst-pop; overflow rays fall back to the packet-union path exactly.
PAIR_GROUPS = 16


@functools.partial(jax.jit, static_argnames=(
    "any_hit", "interpret", "capg", "cap_rows", "inert_row"))
def _traverse_pairs_padded(ltab, box_lo, box_hi, anc,
                           ox, oy, oz, dx, dy, dz, tm, ac,
                           any_hit: bool, interpret: bool,
                           capg: int, cap_rows: int, inert_row: int):
    """algo="bitsp": per-RAY pair-list phase 2, pure XLA (no Pallas).

    The union kernel charges every ray the MT math of its whole packet's
    candidate union (~1290 rows at 2048-ray bounce packets) while the
    per-ray EXACT candidate set averages ~4 rows (~3.8 groups,
    out_configs/perray_rows_study.json) — a ~300x math redundancy.  This
    path builds a per-ray list of candidate GROUPS (8 leaf rows each),
    gathers each ray's listed rows densely ([R, capg*8] row gathers run
    at the measured ~2G rows/s), and runs Möller–Trumbore vectorized over
    [R, capg*8, WIDTH] with a first-win argmin — XLA fuses the whole
    chain; there is no serialized per-visit dependence anywhere.

    Exactness: a (ray, row) pair whose own-box slab test failed cannot
    contain a qualifying hit for THAT ray (any contained intersection has
    t inside the box's [tmin, tmax], which missed [0, t_max)) — so
    gathering whole groups and even duplicate/padded groups is harmless
    per ray; list order (ascending group, row, tri) is stream order, and
    the first-win argmin reproduces the sequential strict-< replacement
    winner.  Rays whose group count exceeds capg are resolved by the
    packet-union path (_traverse_bits_padded with row_lists) in a second
    pass where only overflow rays are live; dead packets there skip phase
    1 via the existing lax.cond and the dead-packet DMA aliasing.
    Reference analog: ray_extend.comp:26-165 + bvh.glsl:98-121 (the
    per-ray closest-hit contract), re-shaped for the MXU/VPU cost model.
    """
    g, sub, _ = ox.shape
    R = sub * LANE
    L = anc.shape[0]
    sizes = [L]
    while sizes[-1] > 1:
        sizes.append(-(-sizes[-1] // 8))
    offs = np.concatenate([[0], np.cumsum(sizes)]).tolist()
    L1 = sizes[1] if len(sizes) > 1 else 1
    padL = L1 * 8 - L
    inert_group = inert_row // 8

    tmf = jnp.where(ac != 0, tm, -_FAR).reshape(g, R)
    o3 = jnp.stack([ox, oy, oz]).reshape(3, g, R)
    d3 = jnp.stack([dx, dy, dz]).reshape(3, g, R)
    inv3 = jnp.float32(1.0) / d3

    jcap = jnp.arange(capg, dtype=jnp.int32)
    gids = jnp.arange(L1, dtype=jnp.int32)
    roff = jnp.arange(8, dtype=jnp.int32)

    def live(o_p, i_p, t_p, d_p):
        hit = _ray_box_bits(box_lo, box_hi, o_p, i_p, t_p)   # [EB, R]
        # hierarchical AND down to the leaf level (leaf-first layout);
        # parent broadcast is a static 8x repeat, not a gather.
        v = hit[offs[len(sizes) - 1]][None, :]               # root [1, R]
        for k in range(len(sizes) - 2, -1, -1):
            par = jnp.repeat(v, 8, axis=0)[: sizes[k]]
            v = hit[offs[k]: offs[k] + sizes[k]] & par
        visL = jnp.pad(v, ((0, padL), (0, 0))) if padL else v
        visg = visL.reshape(L1, 8, R).any(axis=1).T          # [R, L1]

        cg = jnp.cumsum(visg.astype(jnp.int32), axis=1)
        counts_g = cg[:, -1]
        keyg = cg - 1
        # exact one-hot contraction (each output slot has <=1 term)
        oh = (keyg[:, :, None] == jcap[None, None, :]) & visg[:, :, None]
        gl = jnp.sum(oh * gids[None, :, None], axis=1,
                     dtype=jnp.int32)                        # [R, capg]
        gl = jnp.where(jcap[None, :] < counts_g[:, None], gl, inert_group)

        rowids = (gl[:, :, None] * 8 + roff[None, None, :]).reshape(R, -1)
        rows = jnp.take(ltab, rowids.reshape(-1), axis=0).reshape(
            R, capg * 8, WIDTH, REC)                         # [R, rows, 8, 16]
        f32 = jnp.float32

        def fld(j):
            return rows[..., j]

        dxr = d_p[0][:, None, None]
        dyr = d_p[1][:, None, None]
        dzr = d_p[2][:, None, None]
        oxr = o_p[0][:, None, None]
        oyr = o_p[1][:, None, None]
        ozr = o_p[2][:, None, None]
        v0x, v0y, v0z = fld(0), fld(1), fld(2)
        e1x, e1y, e1z = fld(3), fld(4), fld(5)
        e2x, e2y, e2z = fld(6), fld(7), fld(8)
        sid = jax.lax.bitcast_convert_type(fld(9), jnp.int32)
        hx = dyr * e2z - dzr * e2y
        hy = dzr * e2x - dxr * e2z
        hz = dxr * e2y - dyr * e2x
        a = e1x * hx + e1y * hy + e1z * hz
        f = f32(1.0) / a
        sx = oxr - v0x
        sy = oyr - v0y
        sz = ozr - v0z
        u = f * (sx * hx + sy * hy + sz * hz)
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        vv = f * (dxr * qx + dyr * qy + dzr * qz)
        t = f * (e2x * qx + e2y * qy + e2z * qz)
        ok = (
            (jnp.abs(a) >= _EPS)
            & (u >= 0.0) & (u <= 1.0)
            & (vv >= 0.0) & (u + vv <= 1.0)
            & (t >= _EPS) & (t < t_p[:, None, None])
        )
        tc = jnp.where(ok, t, _INF).reshape(R, -1)
        best = jnp.argmin(tc, axis=1)                        # first-win
        tb = jnp.take_along_axis(tc, best[:, None], axis=1)[:, 0]
        found = tb < t_p

        def pick(x, fill):
            xb = jnp.take_along_axis(
                x.reshape(R, -1), best[:, None], axis=1)[:, 0]
            return jnp.where(found, xb, fill)

        return (jnp.where(found, tb, t_p), pick(sid, jnp.int32(-1)),
                pick(u, f32(0.0)), pick(vv, f32(0.0)),
                counts_g > capg)

    def body(args):
        o_p, i_p, d_p, t_p = args
        return jax.lax.cond(
            jnp.any(t_p > -_FAR),
            lambda: live(o_p, i_p, t_p, d_p),
            lambda: (t_p, jnp.full((R,), -1, jnp.int32),
                     jnp.zeros(R, jnp.float32), jnp.zeros(R, jnp.float32),
                     jnp.zeros(R, bool)))

    t_a, r_a, u_a, v_a, ovf = jax.lax.map(
        body, (jnp.moveaxis(o3, 1, 0), jnp.moveaxis(inv3, 1, 0),
               jnp.moveaxis(d3, 1, 0), tmf))

    # Overflow fallback: the packet-union exact-row path with only the
    # overflow rays live (typically none -> every packet dead -> its
    # phase-1 cond skips and its Pallas dispatch aliases to block 0).
    ac_ov = (ovf & (tmf > -_FAR)).reshape(g, sub, LANE).astype(jnp.int32)
    t_f, r_f, u_f, v_f = _traverse_bits_padded(
        ltab, box_lo, box_hi, anc, ox, oy, oz, dx, dy, dz, tm, ac_ov,
        any_hit, interpret, cap_rows, inert_row, row_lists=True)

    ovf3 = ovf.reshape(g, sub, LANE)

    def sel(fb, pr):
        return jnp.where(ovf3, fb, pr.reshape(g, sub, LANE))

    return (sel(t_f, t_a), sel(r_f, r_a), sel(u_f, u_a), sel(v_f, v_a))


@functools.partial(jax.jit, static_argnames=(
    "any_hit", "interpret", "cap_rows", "inert_row", "sub_lists",
    "refine_rows", "use_bf16", "use_bw", "row_lists", "ilp", "unroll",
    "no_any_trim", "block_fetch"))
def _traverse_bits_padded(ltab, box_lo, box_hi, anc,
                          ox, oy, oz, dx, dy, dz, tm, ac,
                          any_hit: bool, interpret: bool,
                          cap_rows: int, inert_row: int,
                          sub_lists: bool = False, refine_rows: int = 0,
                          use_bf16: bool = False, use_bw: bool = False,
                          row_lists: bool = False, ilp: bool = False,
                          unroll: int = 1, no_any_trim: bool = False,
                          block_fetch: bool = False):
    g, sub, _ = ox.shape
    R = sub * LANE
    E = ltab.shape[0]
    L = anc.shape[0]
    cap_rows = min(cap_rows, E)
    cap8 = -(-cap_rows // LEAF_TRIS)
    cap = cap8 * LEAF_TRIS
    # sub_lists=True builds one candidate list per (8,128) sub-block.
    # Measured LOSS on v5e frames (256^2@4spp: 1431 ms vs 1191 packet-wide):
    # dense-table unions shrink too little at 1024 rays to pay for the
    # extra rows' per-row fixed cost + doubled gather/DMA.  Kept as an
    # option for scenes with smaller leaf footprints.
    H = max(1, sub // SUBBLK) if sub_lists else 1
    gH = g * H

    # Inactive rays: t_max = -FAR makes every box test (tmin < tm) and
    # every triangle test (t < best_t) fail — no masks anywhere.
    tmf = jnp.where(ac != 0, tm, -_FAR).reshape(g, R)
    o3 = jnp.stack([ox, oy, oz]).reshape(3, g, R)
    d3 = jnp.stack([dx, dy, dz]).reshape(3, g, R)
    inv3 = jnp.float32(1.0) / d3

    # phase 1: per-packet row bits (sequential over packets: each body is
    # a dense [E, R] slab sweep XLA tiles well; lax.map compiles it once).
    # lax.map lowers to scan, so the cond is a REAL branch — packets with
    # no live ray (compacted tail waves) skip the whole sweep.  The
    # any-reduce stops at (8,128) sub-block granularity: each sub-block
    # gets its OWN candidate list (same phase-1 cost, ~1.75x less phase-2
    # pair work — unions grow sub-linearly in ray count).
    EB = box_lo.shape[1]

    def body(args):
        o_p, i_p, t_p = args
        return jax.lax.cond(
            jnp.any(t_p > -_FAR),
            lambda: _packet_bits(box_lo, box_hi, o_p, i_p, t_p, H),
            lambda: jnp.zeros((EB, H) if H > 1 else (EB,), bool))

    bits = jax.lax.map(
        body, (jnp.moveaxis(o3, 1, 0), jnp.moveaxis(inv3, 1, 0), tmf))
    if H > 1:
        bits = jnp.moveaxis(bits, 2, 1).reshape(gH, EB)  # list id = p*H + h

    # phase 1.5a: visited leaf rows, hierarchically — level k is visited
    # only where level k+1's parent is (box_lo levels are stored leaf
    # level first; sizes are the 8-ary chain of L, so the gather count is
    # L * 8/7 instead of L * MAXD).
    sizes = [L]
    while sizes[-1] > 1:
        sizes.append(-(-sizes[-1] // 8))
    offs = np.concatenate([[0], np.cumsum(sizes)]).tolist()

    def leaf_vis(b):
        v = b[:, offs[len(sizes) - 1]][:, None]  # root level [gH, 1]
        for k in range(len(sizes) - 2, -1, -1):
            idx = offs[k] + jnp.arange(sizes[k], dtype=jnp.int32)
            v = b[:, idx] & v[:, jnp.arange(sizes[k]) // 8]
        return v  # [gH, L]

    vis = leaf_vis(bits)

    # phase 1.5b: compact surviving candidates at 8-row GROUP granularity
    # (hierarchy level 1), then gather each listed group's 8 rows so phase
    # 2 reads affine addresses.  Group lists process ~1.6-2.2x more rows
    # than exact row lists (out_configs/bits_union_study.json) but cut the
    # compaction scatter 8x — and the TPU scatter is ~44 ns/UPDATE
    # (tpu_scatter_micro.py: 234 us/packet at row granularity, 28 us at
    # group granularity), which dominated every call including fully-dead
    # tail waves (bits-dead slope ~490 ns/ray).  Rows gathered via group
    # rounding whose own box was NOT hit are inert-equivalent: no ray hits
    # their box, so no contained triangle can pass MT.
    L1 = sizes[1] if len(sizes) > 1 else 1
    padL = L1 * 8 - L
    pid = jnp.arange(gH, dtype=jnp.int32)[:, None]
    grp_ids = jnp.broadcast_to(
        jnp.arange(L1, dtype=jnp.int32)[None, :], (gH, L1))
    inert_group = inert_row // 8  # full inert group (build_leaf_table pads)
    cap8 = min(cap8, L1)
    cap = cap8 * LEAF_TRIS

    def group_any(vz):  # leaf candidates [gH, L] -> group mask [gH, L1]
        vzp = jnp.pad(vz, ((0, 0), (0, padL))) if padL else vz
        return vzp.reshape(gH, L1, 8).any(axis=2)

    def compact_groups(vg):
        cz = vg.sum(axis=1, dtype=jnp.int32)              # groups = trips
        kz = jnp.cumsum(vg, axis=1, dtype=jnp.int32) - 1  # [gH, L1]
        dz_ = jnp.where(vg & (kz < cap8), pid * cap8 + kz, gH * cap8)
        fz = jnp.full((gH * cap8,), inert_group, jnp.int32)
        fz = fz.at[dz_.reshape(-1)].set(grp_ids.reshape(-1), mode="drop")
        rows_idx = (fz[:, None] * 8
                    + jnp.arange(8, dtype=jnp.int32)[None, :]).reshape(-1)
        return cz, kz, jnp.take(ltab, rows_idx, axis=0).reshape(
            gH, cap, LANE)

    if row_lists:
        # phase 1.5b': EXACT row lists — no group-8 rounding (which
        # inflates processed rows ~1.9x on bounce unions at 2048-ray
        # packets, out_configs/bits_union_study.json).  The compaction
        # scatter is replaced by a per-packet one-hot CONTRACTION
        # (bandwidth-bound, ~15 ns/ray) because the TPU scatter costs
        # ~44 ns per update ENTRY (dropped or not), which made
        # row-granularity scatters 8x the group cost.  lst[k] = sum_j
        # onehot(key_j == k & vis_j) * j, evaluated as a bf16 matvec with
        # j split into (j//64, j%64) columns — every product is an exact
        # bf16 integer < 64 and each column sum has exactly one term, so
        # the contraction is exact.
        assert H == 1 and refine_rows <= 0, \
            "row_lists is packet-wide and excludes the t-refresh round"
        # bf16 (row//64, row%64) id encoding is exact only for row < 16384
        # (~131k tris); fail loudly rather than mis-render (ADVICE r4).
        assert L <= 16384, (
            f"LeafTable has {L} leaf rows > 16384: bf16 one-hot row-id "
            "contraction would be inexact; use group lists (algo without "
            "'r') or chunk the scene")
        key = None
        counts = vis.sum(axis=1, dtype=jnp.int32)
        keyr = jnp.cumsum(vis, axis=1, dtype=jnp.int32) - 1
        ids_hi = (jnp.arange(L, dtype=jnp.int32) // 64).astype(jnp.bfloat16)
        ids_lo = (jnp.arange(L, dtype=jnp.int32) % 64).astype(jnp.bfloat16)
        rhs = jnp.stack([ids_hi, ids_lo], axis=1)  # [L, 2]
        karange = jnp.arange(cap, dtype=jnp.int32)

        def one_list(args):
            visp, keyp, cntp = args

            def live():
                oh = ((keyp[:, None] == karange[None, :])
                      & visp[:, None]).astype(jnp.bfloat16)   # [L, cap]
                out = jax.lax.dot_general(
                    rhs, oh, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)       # [2, cap]
                lstp = (out[0] * 64 + out[1]).astype(jnp.int32)
                return jnp.where(karange < jnp.minimum(cntp, cap),
                                 lstp, inert_row)

            # Dead packets (compacted tail waves / ladder remainders) have
            # all-zero bits -> counts == 0; lax.map lowers to scan so the
            # cond is a REAL branch, killing the [L, cap] one-hot + matvec
            # that otherwise ran full-width EVERY wave (~32 ms/wave floor
            # at 256^2 regardless of occupancy, scripts/tpu_wave_profile).
            return jax.lax.cond(
                cntp > 0, live,
                lambda: jnp.full((cap,), inert_row, jnp.int32))

        lst = jax.lax.map(one_list, (vis, keyr, counts))      # [gH, cap]
        rows3d = jnp.take(ltab, lst.reshape(-1), axis=0).reshape(
            gH, cap, LANE)
        # unroll > 1 processes `unroll` rows per dynamic-trip iteration:
        # the data-dependent fori lowers to a while loop whose condition
        # check serializes the pipeline per ITERATION, so fewer, fatter
        # iterations amortize it.  The tail rows past `counts` in the last
        # iteration are inert_row padding (one_list pads) — exact.
        assert cap % unroll == 0
        trip_cap, rows_step = cap // unroll, unroll
        counts = -(-counts // unroll)         # rows -> trips
        overflow = counts > trip_cap
    else:
        counts, key, rows3d = compact_groups(group_any(vis))
        trip_cap, rows_step = cap8, LEAF_TRIS
        overflow = counts > cap8

    # The sweep fallback always walks the whole table at LEAF_TRIS rows
    # per trip, independent of the list granularity.
    list_counts = jnp.where(overflow, 0, counts)
    sweep_counts = jnp.where(overflow, E // LEAF_TRIS, 0).astype(jnp.int32)

    def call(kernel_sweep, cnts, rows, rows_spec, carry=None):
        ray_spec = pl.BlockSpec((1, sub, LANE), lambda p, s: (p, 0, 0))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(g,),
            in_specs=[ray_spec] * 7 + [rows_spec]
            + ([ray_spec] * 4 if carry is not None else []),
            out_specs=[ray_spec] * 4,
        )
        out_shape = [
            jax.ShapeDtypeStruct((g, sub, LANE), jnp.float32),
            jax.ShapeDtypeStruct((g, sub, LANE), jnp.int32),
            jax.ShapeDtypeStruct((g, sub, LANE), jnp.float32),
            jax.ShapeDtypeStruct((g, sub, LANE), jnp.float32),
        ]
        kernel = functools.partial(
            _leaf_rows_kernel,
            cap8=(rows.shape[0] // LEAF_TRIS if kernel_sweep else trip_cap),
            sweep=kernel_sweep, halves=H, carry_in=carry is not None,
            use_bf16=use_bf16, use_bw=use_bw, ilp=ilp,
            rows_per_trip=(LEAF_TRIS if kernel_sweep else rows_step),
            block_fetch=block_fetch and not kernel_sweep,
            # Shadow rays need only the occlusion bit: drop the winner-id/
            # u/v carries and the slot-id extract (any-hit epilogue trim,
            # ray_connect.comp:178-212 analog).  Not composed with the
            # bw/ilp/bf16 experiment kernels or the t-refresh carry round.
            any_trim=(any_hit and not (use_bw or use_bf16 or ilp
                                       or no_any_trim)
                      and refine_rows <= 0 and carry is None))
        return pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret,
        )(cnts, ox, oy, oz, dx, dy, dz, tmf.reshape(g, sub, LANE), rows,
          *(carry if carry is not None else ()))

    # Dead packets (compacted tail waves: every lane inactive -> counts==0,
    # and overflow packets routed to the sweep kernel) are mapped to block 0
    # in the index map: consecutive equal block indices skip the ~cap*LANE*4B
    # (~786 KB/list at cap=1536) HBM->VMEM DMA per packet, so tail waves stop
    # paying full-width row traffic (VERDICT r1 item 2).  trip==0 means the
    # kernel never reads rows_ref, so the aliased block is harmless.
    def live_map(p, s):
        live = s[p * H] > 0
        for h in range(1, H):
            live = live | (s[p * H + h] > 0)
        return (jnp.where(live, p, 0), 0, 0)

    list_spec = pl.BlockSpec((H, cap, LANE), live_map)

    def sweep_all():
        """Overflow sweep, CHUNKED (VERDICT r4 item 4): the whole-table
        (E, 128) VMEM block stops fitting at ~1.5-2M stored tris, so the
        table is sliced into SWEEP_CHUNK_ROWS blocks and the running best
        threads through the kernel's carry_in path (same mechanism as the
        bits2 refinement round).  Chunk boundaries preserve leaf order, so
        the strictly-closer total order — and hence the winner — is
        bit-identical to the single-block sweep; the single-chunk case
        keeps the original call shape exactly (incl. the any-hit trim,
        which the carry path does not compose with)."""
        if E <= SWEEP_CHUNK_ROWS:
            spec = pl.BlockSpec((E, LANE), lambda p, s: (0, 0))
            return call(True, sweep_counts, ltab, spec)
        res = None
        for start in range(0, E, SWEEP_CHUNK_ROWS):
            end = min(start + SWEEP_CHUNK_ROWS, E)
            chunk = jax.lax.slice_in_dim(ltab, start, end)
            cnts_c = jnp.where(
                overflow, (end - start) // LEAF_TRIS, 0).astype(jnp.int32)
            spec_c = pl.BlockSpec((end - start, LANE), lambda p, s: (0, 0))
            res = call(True, cnts_c, chunk, spec_c, carry=res)
        return res

    def sel(a, b):  # per-list overflow select: a sweep, b list
        ovf = overflow.reshape(g, H, 1, 1)
        a4 = a.reshape(g, H, sub // H, LANE)
        b4 = b.reshape(g, H, sub // H, LANE)
        return jnp.where(ovf, a4, b4).reshape(g, sub, LANE)

    if refine_rows <= 0:
        t_l, r_l, u_l, v_l = call(False, list_counts, rows3d, list_spec)
        t_s, r_s, u_s, v_s = sweep_all()
        return (sel(t_s, t_l), sel(r_s, r_l),
                sel(u_s, u_l), sel(v_s, v_l))

    # ---- t-refresh refinement (algo="bits2") --------------------------
    # Round A processes only the first k1 rows of each list; the running
    # best_t it produces then re-runs phase 1 (cheap: ~20 ns/ray) with the
    # TIGHTENED bound, and round B processes only tail candidates that
    # survive.  EXACT for closest-hit: a culled row's box entry t exceeds
    # best_t along every ray, so no triangle in it can win; processing
    # order (leaf-order prefix, then surviving leaf-order tail) matches
    # the single-round kernel's, so results are bit-identical.  For
    # any-hit, rays that already found a hit are killed outright
    # (t_max = -FAR) — any hit is as good as any other.
    k1_8 = min(-(-refine_rows // LEAF_TRIS), cap8)
    cnts_a = jnp.minimum(list_counts, k1_8)
    A = call(False, cnts_a, rows3d, list_spec)
    t_s, r_s, u_s, v_s = sweep_all()

    if any_hit:
        tm2 = jnp.where(A[1].reshape(g, R) >= 0, -_FAR, tmf)
    else:
        tm2 = A[0].reshape(g, R)

    def body2(args):
        o_p, i_p, t_p = args
        return jax.lax.cond(
            jnp.any(t_p > -_FAR),
            lambda: _packet_bits(box_lo, box_hi, o_p, i_p, t_p, H),
            lambda: jnp.zeros((EB, H) if H > 1 else (EB,), bool))

    bits2 = jax.lax.map(
        body2, (jnp.moveaxis(o3, 1, 0), jnp.moveaxis(inv3, 1, 0), tm2))
    if H > 1:
        bits2 = jnp.moveaxis(bits2, 2, 1).reshape(gH, EB)
    # bits2 is a subset of bits (tighter t bound), so group_any(leaf_vis(
    # bits2)) is a subset of the round-A group mask and every surviving
    # group has a valid round-A list position in `key`; the tail is the
    # surviving groups NOT in round A's k1_8-group prefix.  Everything
    # stays at group granularity (round A processed whole groups).
    vis2g = group_any(leaf_vis(bits2)) & (key >= k1_8)
    counts2, _, rows3d_b = compact_groups(vis2g)
    cnts_b = jnp.where(overflow, 0, counts2)
    t_l, r_l, u_l, v_l = call(False, cnts_b, rows3d_b, list_spec, carry=A)
    return sel(t_s, t_l), sel(r_s, r_l), sel(u_s, u_l), sel(v_s, v_l)


MULTIBLOCK_CHUNK = 64 * BLOCK


@functools.partial(jax.jit, static_argnames=(
    "any_hit", "interpret", "algo", "stack_depth"))
def _traverse_padded(stream, rec_slot, ox, oy, oz, dx, dy, dz,
                     tm, ac, any_hit: bool, interpret: bool,
                     algo: str = "skip", stack_depth: int = STACK_DEPTH):
    n_entries = stream.shape[0]
    g, sub, _ = ox.shape
    chunk_blocks = max(1, MULTIBLOCK_CHUNK // (sub * LANE))
    outs = []
    for start in range(0, g, chunk_blocks):
        end = min(start + chunk_blocks, g)
        nb = end - start
        kernel = functools.partial(
            _kernel_multiblock, any_hit=any_hit, n_entries=n_entries,
            n_blocks=nb, algo=algo, stack_depth=stack_depth,
        )
        out_shape = [
            jax.ShapeDtypeStruct((nb, sub, LANE), jnp.float32),
            jax.ShapeDtypeStruct((nb, sub, LANE), jnp.int32),
            jax.ShapeDtypeStruct((nb, sub, LANE), jnp.float32),
            jax.ShapeDtypeStruct((nb, sub, LANE), jnp.float32),
            jax.ShapeDtypeStruct((nb, sub, LANE), jnp.int32),  # visits
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
    algo: str = "skip",
    block_rays: int = BLOCK,
    cap_rows: int = 0,
    refine_rows: int = 0,
    pair_groups: int = 0,
) -> Hit:
    """Drop-in replacement for accel.traverse.traverse / traverse_pallas;
    hit.prim is the leaf-order triangle slot (map through scene.perm for
    the original id), identical to the binary kernels.

    ``block_rays`` (multiple of 1024) sets the packet size: one walk
    serves block_rays rays, so the per-visit fixed chain (~400 ns fetch +
    reduce, the dominant cost) amortizes over a larger union — unions grow
    sub-linearly in ray count, so bigger blocks trade vector-issue time
    (cheap) for fewer visits (expensive)."""
    n = origin.shape[0]
    pad = (-n) % block_rays
    n_pad = n + pad
    g = n_pad // block_rays
    sub = block_rays // LANE

    # Sanitize exactly-zero direction components so 1/d is finite and the
    # kernel's slab test never sees 0*inf NaNs (lets it use 1-op IEEE
    # min/max).  The nudge is far below float32 direction precision.
    direction = jnp.where(
        jnp.abs(direction) < 1e-20,
        jnp.where(direction < 0, jnp.float32(-1e-20), jnp.float32(1e-20)),
        direction,
    )

    def prep(x, fill=0):
        x = jnp.concatenate(
            [x, jnp.full((pad,), fill, x.dtype)]
        ) if pad else x
        return x.reshape(g, sub, LANE)

    if algo.startswith("bits"):
        # "bits" three-phase list-driven traversal.
        # Flag characters after "bits" compose (any order):
        #   2 = t-refresh refinement round      8 = per-(8,128) sub-lists
        #   w = Baldwin–Weber rows              r = exact row lists
        #   h = bf16 leaf math (measured LOSS)  i = ILP min-tree merge
        #   uN = N rows per phase-2 loop iteration (row lists only)
        flag_str = algo[4:]
        unroll = 1
        # Anchored uN parse (ADVICE r3): N must be one of the valid unroll
        # factors and must not be followed by another digit, so e.g.
        # "bitsru28" fails the flag assert below instead of parsing as
        # unroll=28 or silently eating unrelated characters.  Only the
        # matched span is removed.
        um = re.search(r"u(16|1|2|4|8)(?!\d)", flag_str)
        if um:
            unroll = int(um.group(1))
            flag_str = flag_str[:um.start()] + flag_str[um.end():]
        flags = set(flag_str)
        assert flags <= set("28whripab"), f"unknown algo {algo}"
        assert unroll in (1, 2, 4, 8, 16) and (unroll == 1 or "r" in flags), \
            "uN unroll needs exact row lists (r) and N in {1,2,4,8,16}"
        use_bf16 = "h" in flags
        use_bw = "w" in flags
        row_lists = "r" in flags
        ilp = "i" in flags
        refine = "2" in flags
        sub_l = "8" in flags
        pairs = "p" in flags
        no_any_trim = "a" in flags  # legacy full any-hit epilogue (A/B)
        block_fetch = "b" in flags  # (unroll,128) block row fetches (A/B)
        assert not block_fetch or ("r" in flags and "w" not in flags
                                   and "i" not in flags), \
            "block fetch ('b') needs row lists and the plain MT kernel"
        assert not (row_lists and (refine or sub_l)), \
            "row lists are packet-wide (no sub-lists / t-refresh)"
        assert not (pairs and (flags - {"p"})), \
            "bitsp composes with no other flag (its fallback is bitsr)"
        assert wt.ltab is not None, \
            "WideTrace lacks a LeafTable (rebuild via device_wide_trace)"
        assert not (use_bw and wt.ltabw is None), \
            "WideTrace lacks a Baldwin–Weber table (rebuild the scene)"
        if pairs:
            t_o, r_o, u_o, v_o = _traverse_pairs_padded(
                wt.ltab, wt.box_lo, wt.box_hi, wt.anc,
                prep(origin[:, 0]), prep(origin[:, 1]), prep(origin[:, 2]),
                prep(direction[:, 0], 1), prep(direction[:, 1], 1),
                prep(direction[:, 2], 1),
                prep(t_max.astype(jnp.float32)),
                prep(active.astype(jnp.int32)),
                any_hit, interpret, pair_groups or PAIR_GROUPS,
                cap_rows or BITS_CAP_ROWS, int(wt.inert_row),
            )

            def unprep(x):
                return x.reshape(n_pad)[:n]

            return Hit(
                prim=jnp.where(active, unprep(r_o), -1),
                t=unprep(t_o),
                u=unprep(u_o),
                v=unprep(v_o),
            )
        t_o, r_o, u_o, v_o = _traverse_bits_padded(
            wt.ltabw if use_bw else wt.ltab,
            wt.box_lo, wt.box_hi, wt.anc,
            prep(origin[:, 0]), prep(origin[:, 1]), prep(origin[:, 2]),
            prep(direction[:, 0], 1), prep(direction[:, 1], 1),
            prep(direction[:, 2], 1),
            prep(t_max.astype(jnp.float32)), prep(active.astype(jnp.int32)),
            any_hit, interpret, cap_rows or BITS_CAP_ROWS,
            int(wt.inert_row), sub_lists=sub_l,
            refine_rows=(refine_rows or BITS_REFINE_ROWS) if refine else 0,
            use_bf16=use_bf16, use_bw=use_bw, row_lists=row_lists, ilp=ilp,
            unroll=unroll, no_any_trim=no_any_trim,
            block_fetch=block_fetch,
        )

        def unprep(x):
            return x.reshape(n_pad)[:n]

        # best_r already carries the leaf-order tri slot (baked into the
        # row's slot-id lanes) — no rec->prim gather needed.
        return Hit(
            prim=jnp.where(active, unprep(r_o), -1),
            t=unprep(t_o),
            u=unprep(u_o),
            v=unprep(v_o),
        )

    t_o, r_o, u_o, v_o, it_o = _traverse_padded(
        wt.stream, wt.rec_slot,
        prep(origin[:, 0]), prep(origin[:, 1]), prep(origin[:, 2]),
        prep(direction[:, 0], 1), prep(direction[:, 1], 1),
        prep(direction[:, 2], 1),
        prep(t_max.astype(jnp.float32)), prep(active.astype(jnp.int32)),
        any_hit, interpret, algo,
        max(int(wt.max_depth), STACK_DEPTH) if algo == "stack"
        else STACK_DEPTH,
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
