"""Two-level instanced bits traversal: TLAS -> instance -> object-space BLAS.

Device-side instancing (VERDICT r3 item 8).  The reference traverses a TLAS
whose leaves transform the ray into each instance's object space and walk a
SHARED per-mesh BLAS (/root/reference/sources/bvh.cpp:481-513,
shaders/ray_extend.comp:88-103), so N instances of an M-tri mesh cost O(M)
memory.  The flattened render path (scene/compile.py) trades that for
lockstep-friendly world-space tables; this module closes the capability gap
with a TPU-native two-level formulation that keeps the measured bits-kernel
cost model intact (DESIGN.md §4a):

- phase 0: packet rays vs instance world AABBs (I slab rows — the TLAS
  analog at packet granularity);
- phase 1 (per HIT instance, lax.cond-guarded): the ray packet is
  transformed ONCE into the instance's object space (12 scalar coefficients
  applied as ~18 vector ops, amortized over the instance's whole candidate
  set) and swept against the shared mesh's 8-ary box chain -> exact
  candidate leaf-row list via the one-hot contraction (bit-exact, same
  trick as algo="bitsr");
- phase 2 (Pallas): per-instance candidate segments processed by the same
  unrolled Möller–Trumbore row loop as bitsru8, with the ray block
  re-transformed in-kernel per segment (the 12 transform scalars are
  vector->scalar extracts — measured ~free — and the object-space direction
  is NOT normalized, so t is the world-space parameter exactly as in
  Instance::intersect, bvh.cpp:481-496).

Per-packet overhead vs the flattened kernel is ~I pipeline drains + ~I
row-visit-equivalents of transform math — noise against the hundreds-of-rows
candidate unions — while table memory drops from O(sum instance tris) to
O(sum unique-mesh tris).

Winner selection: segments are processed in instance order, rows in mesh
leaf order, triangles in record order, with strictly-closer replacement —
the winner is the first minimum in that total order, replicated exactly by
``traverse_instanced_np`` (the test oracle) and matched within float chaos
by TwoLevelScene (whose ordered stackful walk may break exact-t ties
differently)."""

from __future__ import annotations

import functools
import warnings
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .builder import build_blas
from .wide import LANE, LEAF_TRIS, REC, build_leaf_table
from .pallas_wide import _EPS, _ray_box_bits

_FAR = np.float32(1e30)
BLOCK = 2048
CAP_PER_INST = 512  # candidate rows per (packet, instance); overflow -> sweep
MAX_CAP_TOTAL = 12288  # sum-of-caps VMEM budget (rows; 1 KB/row double-buffered)


class InstancedMeta(NamedTuple):
    """Hashable static companion (jit-static argument)."""

    mesh_of: tuple          # per instance: mesh index
    row_off: tuple          # per mesh: first leaf row in ltab
    n_rows: tuple           # per mesh: real leaf rows L_m
    box_off: tuple          # per mesh: offset into box_lo/box_hi columns
    sizes: tuple            # per mesh: 8-ary level sizes (L_m, ceil/8, ..., 1)
    caps: tuple             # per instance: candidate-list capacity (rows)
    inert_row: int          # global all-zero row id (list padding)


class InstancedTrace(NamedTuple):
    """Device arrays (jnp pytree) + static meta for the two-level kernel."""

    ltab: jnp.ndarray       # [rows_tot, 128] concatenated per-mesh leaf tables
    box_lo: jnp.ndarray     # [3, E_tot] concatenated per-mesh box chains (SoA)
    box_hi: jnp.ndarray     # [3, E_tot]
    xf_rows: jnp.ndarray    # [I, 128] lanes 0..11 = inverse 3x4 (A | b)
    inst_lo: jnp.ndarray    # [3, I] instance world AABBs (SoA)
    inst_hi: jnp.ndarray    # [3, I]
    meta: InstancedMeta     # static (held out of the pytree by callers)


class InstancedHost(NamedTuple):
    """Host-side build products (oracle + prim mapping)."""

    trace: InstancedTrace
    perms: list             # per mesh: leaf-order slot -> mesh tri id
    meshes: list            # per mesh: (v0, v1, v2) leaf-ordered (object)
    inv3x4: np.ndarray      # [I, 12]


def build_instanced_trace(meshes, instances,
                          cap_per_inst: int = CAP_PER_INST) -> InstancedHost:
    """meshes: list of (v0, v1, v2) object-space triangle SoA arrays.
    instances: list of (mesh_index, transform4x4, world_lo, world_hi);
    world bounds may be None to derive from the 8 transformed corners.
    ``cap_per_inst`` bounds each (packet, instance) candidate list — the
    phase-2 gather buffer scales as packets x sum(caps) x 512 B, so high
    instance counts want a smaller cap (overflow falls back to the
    cond-gated all-rows sweep)."""
    tabs, box_los, box_his = [], [], []
    row_off, n_rows, box_off, sizes_all = [], [], [], []
    perms, leaf_meshes = [], []
    rows_acc = 0
    box_acc = 0
    for (v0, v1, v2) in meshes:
        bvh = build_blas(np.asarray(v0, np.float32),
                         np.asarray(v1, np.float32),
                         np.asarray(v2, np.float32),
                         min_leaf=4, max_leaf=LEAF_TRIS)
        perm = bvh.indices.astype(np.int64)
        tv0 = np.asarray(v0, np.float32)[perm]
        tv1 = np.asarray(v1, np.float32)[perm]
        tv2 = np.asarray(v2, np.float32)[perm]
        lt = build_leaf_table(tv0, tv1, tv2)
        tabs.append(lt.table)
        box_los.append(lt.box_lo)
        box_his.append(lt.box_hi)
        row_off.append(rows_acc)
        # The one-hot list contraction encodes row ids as bf16 (row//64,
        # row%64); the hi part is exact only for row < 16384.  Fail loudly
        # instead of silently corrupting candidate ids (ADVICE r4).
        if int(lt.n_rows) > 16384:
            raise ValueError(
                f"mesh has {int(lt.n_rows)} leaf rows > 16384 (~131k tris):"
                " bf16 one-hot row-id contraction would be inexact; use the"
                " flattened path or chunk the mesh")
        n_rows.append(int(lt.n_rows))
        box_off.append(box_acc)
        szs = [int(lt.n_rows)]
        while szs[-1] > 1:
            szs.append(-(-szs[-1] // 8))
        sizes_all.append(tuple(szs))
        rows_acc += lt.table.shape[0]
        box_acc += lt.box_lo.shape[0]
        perms.append(perm.astype(np.int32))
        leaf_meshes.append((tv0, tv1, tv2))

    ltab = np.concatenate(tabs)
    box_lo = np.concatenate(box_los)
    box_hi = np.concatenate(box_his)
    # every mesh's table ends with a full inert group (build_leaf_table);
    # use the first mesh's for global list padding
    inert_row = row_off[0] + tabs[0].shape[0] - 1

    mesh_of, inv3x4, ilo, ihi, caps = [], [], [], [], []
    for (mi, xform, wlo, whi) in instances:
        mesh_of.append(int(mi))
        m = np.asarray(xform, np.float32)
        inv = np.linalg.inv(m.astype(np.float64)).astype(np.float32)
        inv3x4.append(inv[:3, :4].reshape(12))
        if wlo is None or whi is None:
            v0, v1, v2 = meshes[mi]
            pts = np.concatenate([v0, v1, v2]).astype(np.float32)
            lo, hi = pts.min(axis=0), pts.max(axis=0)
            corners = np.array([[x, y, z]
                                for x in (lo[0], hi[0])
                                for y in (lo[1], hi[1])
                                for z in (lo[2], hi[2])], np.float32)
            w = (m[:3, :3] @ corners.T).T + m[:3, 3]
            wlo, whi = w.min(axis=0), w.max(axis=0)
        ilo.append(np.asarray(wlo, np.float32))
        ihi.append(np.asarray(whi, np.float32))
        cap = min(-(-n_rows[mi] // 8) * 8, cap_per_inst)
        caps.append(int(cap))
    # The phase-2 list kernel's row block is (1, sum(caps), 128) f32,
    # double-buffered by Mosaic: sum(caps) x 1 KB of scoped VMEM against
    # the v5e 16 MB limit (measured overflow at sum(caps)=16416, 32
    # instances x cap 512).  Scale per-instance caps down proportionally
    # to stay under budget — overflowing packets just ride the cond-gated
    # chunked sweep more often (exactness unchanged).
    if sum(caps) > MAX_CAP_TOTAL:
        if len(caps) * 8 > MAX_CAP_TOTAL:
            raise ValueError(
                f"{len(caps)} instances x minimum 8-row lists exceed the "
                f"{MAX_CAP_TOTAL}-row VMEM budget of the per-(packet,"
                "instance) list kernel; render fewer instances per scene "
                "or use the flattened path")
        scale = MAX_CAP_TOTAL / sum(caps)
        caps = [max(8, int(c * scale) // 8 * 8) for c in caps]
        warnings.warn(
            f"instanced list caps scaled to {caps[0]} rows/instance "
            f"(sum {sum(caps)}) to fit the 16 MB scoped-VMEM budget; "
            "overflow packets fall back to the chunked sweep")
    inv3x4 = np.stack(inv3x4)
    xf_rows = np.zeros((len(instances), LANE), np.float32)
    xf_rows[:, :12] = inv3x4

    meta = InstancedMeta(
        mesh_of=tuple(mesh_of), row_off=tuple(row_off),
        n_rows=tuple(n_rows), box_off=tuple(box_off),
        sizes=tuple(sizes_all), caps=tuple(caps), inert_row=int(inert_row))
    trace = InstancedTrace(
        ltab=jnp.asarray(ltab),
        box_lo=jnp.asarray(box_lo.T.copy()),
        box_hi=jnp.asarray(box_hi.T.copy()),
        xf_rows=jnp.asarray(xf_rows),
        inst_lo=jnp.asarray(np.stack(ilo).T.copy()),
        inst_hi=jnp.asarray(np.stack(ihi).T.copy()),
        meta=meta)
    return InstancedHost(trace=trace, perms=perms, meshes=leaf_meshes,
                         inv3x4=inv3x4)


class InstHit(NamedTuple):
    inst: jnp.ndarray   # [N] int32 instance id, -1 on miss
    prim: jnp.ndarray   # [N] int32 mesh-LOCAL leaf-order slot, -1 on miss
    t: jnp.ndarray      # [N] float32
    u: jnp.ndarray
    v: jnp.ndarray


def _mt8i(row, row_i, ox, oy, oz, dx, dy, dz, inst_id, c):
    """_mt8 with an instance-id carry (two instances of one mesh share
    slot ids, so the winner needs (inst, slot))."""
    best_t, best_r, best_u, best_v, best_i = c
    one = jnp.float32(1.0)
    for j in range(LEAF_TRIS):
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
        best_r = jnp.where(hit, sid, best_r)
        best_u = jnp.where(hit, u, best_u)
        best_v = jnp.where(hit, v, best_v)
        best_i = jnp.where(hit, inst_id, best_i)
    return best_t, best_r, best_u, best_v, best_i


def _inst_rows_kernel(counts_ref, ox_ref, oy_ref, oz_ref,
                      dx_ref, dy_ref, dz_ref, tm_ref, xf_ref, rows_ref,
                      t_out, r_out, u_out, v_out, i_out,
                      *, meta: InstancedMeta, sweep: bool, unroll: int,
                      any_hit: bool):
    """Phase-2 segment loop: one (sub, 128) ray block against per-instance
    candidate segments.  Each segment re-derives the object-space ray from
    the instance's inverse-transform row (12 scalar extracts, ~free) and
    runs the bitsru8-style unrolled MT row loop over affine addresses."""
    p = pl.program_id(0)
    n_inst = len(meta.mesh_of)
    ox = ox_ref[0]   # (sub, LANE)
    oy = oy_ref[0]
    oz = oz_ref[0]
    dx = dx_ref[0]
    dy = dy_ref[0]
    dz = dz_ref[0]
    tm0 = tm_ref[0]
    c = (tm0,
         jnp.full(tm0.shape, -1, jnp.int32),
         jnp.zeros(tm0.shape, jnp.float32),
         jnp.zeros(tm0.shape, jnp.float32),
         jnp.full(tm0.shape, -1, jnp.int32))
    seg_base = 0
    for i in range(n_inst):
        m = meta.mesh_of[i]
        xr = xf_ref[pl.ds(i, 1), :]
        a = [xr[0, k] for k in range(12)]
        oxi = a[0] * ox + a[1] * oy + a[2] * oz + a[3]
        oyi = a[4] * ox + a[5] * oy + a[6] * oz + a[7]
        ozi = a[8] * ox + a[9] * oy + a[10] * oz + a[11]
        dxi = a[0] * dx + a[1] * dy + a[2] * dz
        dyi = a[4] * dx + a[5] * dy + a[6] * dz
        dzi = a[8] * dx + a[9] * dy + a[10] * dz
        if sweep:
            base = meta.row_off[m]
            n_seg_rows = -(-meta.n_rows[m] // 8) * 8
        else:
            base = seg_base
            n_seg_rows = meta.caps[i]
            seg_base += meta.caps[i]

        def visit(k, c, base=base, oxi=oxi, oyi=oyi, ozi=ozi,
                  dxi=dxi, dyi=dyi, dzi=dzi, ii=i):
            for e in range(unroll):
                if sweep:
                    row = rows_ref[pl.ds(base + k * unroll + e, 1), :]
                else:
                    row = rows_ref[0, pl.ds(base + k * unroll + e, 1), :]
                row_i = pltpu.bitcast(row, jnp.int32)
                c = _mt8i(row, row_i, oxi, oyi, ozi, dxi, dyi, dzi,
                          jnp.int32(ii), c)
            return c

        if sweep:
            trip = (n_seg_rows + unroll - 1) // unroll  # static
            c = jax.lax.fori_loop(0, trip, visit, c)
        else:
            trip = jnp.minimum(
                (counts_ref[p * n_inst + i] + unroll - 1) // unroll,
                jnp.int32(n_seg_rows // unroll))
            c = jax.lax.fori_loop(0, trip, visit, c)
    bt, br, bu, bv, bi = c
    t_out[0] = bt
    r_out[0] = br
    u_out[0] = bu
    v_out[0] = bv
    i_out[0] = bi


def _leaf_vis(bits, sizes, box_off):
    """Hierarchical AND down one mesh's 8-ary chain: bits [E_tot, R] ->
    visited-leaf-row mask [L_m, R]."""
    offs = [box_off]
    for s in sizes[:-1]:
        offs.append(offs[-1] + s)
    v = bits[offs[len(sizes) - 1]][None, :]
    for k in range(len(sizes) - 2, -1, -1):
        idx = offs[k] + np.arange(sizes[k])
        v = bits[idx] & v[np.arange(sizes[k]) // 8]
    return v  # [L_m, R]


@functools.partial(jax.jit, static_argnames=(
    "meta", "any_hit", "interpret", "unroll"))
def _traverse_instanced_padded(ltab, box_lo, box_hi, xf_rows, inst_lo,
                               inst_hi, inv3x4, ox, oy, oz, dx, dy, dz,
                               tm, ac, meta: InstancedMeta, any_hit: bool,
                               interpret: bool, unroll: int = 8):
    g, sub, _ = ox.shape
    R = sub * LANE
    n_inst = len(meta.mesh_of)
    cap_tot = sum(meta.caps)

    tmf = jnp.where(ac != 0, tm, -_FAR).reshape(g, R)
    o3 = jnp.stack([ox, oy, oz]).reshape(3, g, R)
    d3 = jnp.stack([dx, dy, dz]).reshape(3, g, R)

    karanges = {c: jnp.arange(c, dtype=jnp.int32)
                for c in set(meta.caps)}

    def one_packet(args):
        o_p, d_p, t_p = args
        inv_p = jnp.float32(1.0) / d_p
        # phase 0: instance world-AABB bits (the packet-level TLAS)
        ibits = jnp.any(
            _ray_box_bits(inst_lo, inst_hi, o_p, inv_p, t_p), axis=1)  # [I]
        lists, counts, ovfs = [], [], []
        for i in range(n_inst):
            m = meta.mesh_of[i]
            L = meta.n_rows[m]
            cap = meta.caps[i]
            A = inv3x4[i]

            def live(i=i, m=m, L=L, cap=cap, A=A):
                oi = jnp.stack([
                    A[0] * o_p[0] + A[1] * o_p[1] + A[2] * o_p[2] + A[3],
                    A[4] * o_p[0] + A[5] * o_p[1] + A[6] * o_p[2] + A[7],
                    A[8] * o_p[0] + A[9] * o_p[1] + A[10] * o_p[2] + A[11],
                ])
                di = jnp.stack([
                    A[0] * d_p[0] + A[1] * d_p[1] + A[2] * d_p[2],
                    A[4] * d_p[0] + A[5] * d_p[1] + A[6] * d_p[2],
                    A[8] * d_p[0] + A[9] * d_p[1] + A[10] * d_p[2],
                ])
                di = jnp.where(jnp.abs(di) < 1e-20,
                               jnp.where(di < 0, jnp.float32(-1e-20),
                                         jnp.float32(1e-20)), di)
                ivi = jnp.float32(1.0) / di
                e0, e1 = meta.box_off[m], meta.box_off[m] + sum(meta.sizes[m])
                bits = _ray_box_bits(box_lo[:, e0:e1], box_hi[:, e0:e1],
                                     oi, ivi, t_p)           # [E_m, R]
                vis = jnp.any(
                    _leaf_vis(bits, meta.sizes[m], 0), axis=1)  # [L_m]
                cnt = vis.sum(dtype=jnp.int32)
                key = jnp.cumsum(vis, dtype=jnp.int32) - 1
                ids_hi = (jnp.arange(L, dtype=jnp.int32) // 64
                          ).astype(jnp.bfloat16)
                ids_lo = (jnp.arange(L, dtype=jnp.int32) % 64
                          ).astype(jnp.bfloat16)
                rhs = jnp.stack([ids_hi, ids_lo], axis=1)       # [L, 2]
                kar = karanges[cap]
                oh = ((key[:, None] == kar[None, :])
                      & vis[:, None]).astype(jnp.bfloat16)      # [L, cap]
                out = jax.lax.dot_general(
                    rhs, oh, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)         # [2, cap]
                lst = (out[0] * 64 + out[1]).astype(jnp.int32)
                lst = jnp.where(kar < jnp.minimum(cnt, cap),
                                lst + meta.row_off[m],
                                jnp.int32(meta.inert_row))
                return lst, cnt

            lst, cnt = jax.lax.cond(
                ibits[i] & jnp.any(t_p > -_FAR), live,
                lambda cap=cap: (jnp.full((cap,), meta.inert_row,
                                          jnp.int32), jnp.int32(0)))
            lists.append(lst)
            counts.append(cnt)
            ovfs.append(cnt > cap)
        return (jnp.concatenate(lists), jnp.stack(counts),
                jnp.stack(ovfs).any())

    lst, counts, overflow = jax.lax.map(
        one_packet, (jnp.moveaxis(o3, 1, 0), jnp.moveaxis(d3, 1, 0), tmf))
    # lst [g, cap_tot]; counts [g, I]; overflow [g]
    rows3d = jnp.take(ltab, lst.reshape(-1), axis=0).reshape(
        g, cap_tot, LANE)
    counts_flat = jnp.where(overflow[:, None], 0, counts).reshape(-1)

    def call(kernel_sweep, rows, rows_spec):
        ray_spec = pl.BlockSpec((1, sub, LANE), lambda p, s: (p, 0, 0))
        xf_spec = pl.BlockSpec((n_inst, LANE), lambda p, s: (0, 0))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(g,),
            in_specs=[ray_spec] * 7 + [xf_spec, rows_spec],
            out_specs=[ray_spec] * 5,
        )
        out_shape = [
            jax.ShapeDtypeStruct((g, sub, LANE), jnp.float32),
            jax.ShapeDtypeStruct((g, sub, LANE), jnp.int32),
            jax.ShapeDtypeStruct((g, sub, LANE), jnp.float32),
            jax.ShapeDtypeStruct((g, sub, LANE), jnp.float32),
            jax.ShapeDtypeStruct((g, sub, LANE), jnp.int32),
        ]
        kernel = functools.partial(
            _inst_rows_kernel, meta=meta, sweep=kernel_sweep,
            unroll=unroll, any_hit=any_hit)
        return pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret,
        )(counts_flat, ox, oy, oz, dx, dy, dz,
          tmf.reshape(g, sub, LANE), xf_rows, rows)

    list_spec = pl.BlockSpec((1, cap_tot, LANE), lambda p, s: (p, 0, 0))
    sweep_spec = pl.BlockSpec((ltab.shape[0], LANE), lambda p, s: (0, 0))
    t_l, r_l, u_l, v_l, i_l = call(False, rows3d, list_spec)
    # The full all-instances sweep only runs when some packet's candidate
    # list actually overflowed (ADVICE r4: unconditional execution made the
    # sweep — far more rows than the capped lists — a dominant always-paid
    # cost).  Both branches produce identically shaped outputs; when no
    # overflow occurred the sweep results are never selected, so the cheap
    # branch just passes the list results through.
    t_s, r_s, u_s, v_s, i_s = jax.lax.cond(
        overflow.any(),
        lambda: call(True, ltab, sweep_spec),
        lambda: (t_l, r_l, u_l, v_l, i_l))

    ovf = overflow[:, None, None]

    def sel(a, b):
        return jnp.where(ovf, a, b)

    return (sel(t_s, t_l), sel(r_s, r_l), sel(u_s, u_l), sel(v_s, v_l),
            sel(i_s, i_l))


def traverse_instanced(host: InstancedHost, origin, direction, t_max,
                       active, any_hit: bool = False,
                       interpret: bool = False,
                       block_rays: int = BLOCK, unroll: int = 8) -> InstHit:
    """Two-level closest-hit/any-hit traversal over shared object-space
    BLASes.  hit.prim is the mesh-LOCAL leaf-order slot (map through
    host.perms[meta.mesh_of[inst]] for the mesh triangle id)."""
    return traverse_instanced_arrays(
        host.trace, jnp.asarray(host.inv3x4), origin, direction, t_max,
        active, any_hit=any_hit, interpret=interpret,
        block_rays=block_rays, unroll=unroll)


def traverse_instanced_arrays(it: InstancedTrace, inv3x4, origin, direction,
                              t_max, active, any_hit: bool = False,
                              interpret: bool = False,
                              block_rays: int = BLOCK,
                              unroll: int = 8) -> InstHit:
    """Array-level entry (used by the integrator's algo="twolevel" mode:
    the InstancedTrace arrays live in the RenderScene pytree, meta rides
    as a jit-static)."""
    n = origin.shape[0]
    pad = (-n) % block_rays
    n_pad = n + pad
    g = n_pad // block_rays
    sub = block_rays // LANE
    # Caps are rounded to multiples of 8 at build time, but the list-kernel
    # trip clamp floors in UNROLL units — a cap that is not a multiple of
    # unroll would silently drop candidate rows (ADVICE r4).
    bad = [c for c in it.meta.caps if c % unroll != 0]
    if bad:
        raise ValueError(
            f"instance caps {bad} not multiples of unroll={unroll}; "
            "rows past the floored trip would be silently skipped")

    direction = jnp.where(
        jnp.abs(direction) < 1e-20,
        jnp.where(direction < 0, jnp.float32(-1e-20), jnp.float32(1e-20)),
        direction,
    )

    def prep(x, fill=0):
        x = jnp.concatenate(
            [x, jnp.full((pad,), fill, x.dtype)]) if pad else x
        return x.reshape(g, sub, LANE)

    t_o, r_o, u_o, v_o, i_o = _traverse_instanced_padded(
        it.ltab, it.box_lo, it.box_hi, it.xf_rows, it.inst_lo, it.inst_hi,
        jnp.asarray(inv3x4),
        prep(origin[:, 0]), prep(origin[:, 1]), prep(origin[:, 2]),
        prep(direction[:, 0], 1), prep(direction[:, 1], 1),
        prep(direction[:, 2], 1),
        prep(t_max.astype(jnp.float32)), prep(active.astype(jnp.int32)),
        it.meta, any_hit, interpret, unroll)

    def unprep(x):
        return x.reshape(n_pad)[:n]

    found = unprep(r_o) >= 0
    act = jnp.asarray(active)
    return InstHit(
        inst=jnp.where(act & found, unprep(i_o), -1),
        prim=jnp.where(act & found, unprep(r_o), -1),
        t=unprep(t_o),
        u=unprep(u_o),
        v=unprep(v_o),
    )


def traverse_instanced_np(host: InstancedHost, origin, direction, t_max):
    """NumPy oracle with the kernel's exact total order (instances in id
    order, rows in mesh leaf order, strictly-closer replacement)."""
    it = host.trace
    meta = it.meta
    n = len(origin)
    out = dict(inst=np.full(n, -1, np.int64), prim=np.full(n, -1, np.int64),
               t=np.asarray(t_max, np.float32).copy(),
               u=np.zeros(n, np.float32), v=np.zeros(n, np.float32))
    eps = np.float32(1e-5)
    d_s = np.asarray(direction, np.float32)
    d_s = np.where(np.abs(d_s) < 1e-20,
                   np.where(d_s < 0, np.float32(-1e-20), np.float32(1e-20)),
                   d_s)
    for r in range(n):
        o_w = np.asarray(origin[r], np.float32)
        d_w = d_s[r]
        for i, m in enumerate(meta.mesh_of):
            A = host.inv3x4[i].reshape(3, 4)
            o = A[:, :3] @ o_w + A[:, 3]
            d = A[:, :3] @ d_w
            tv0, tv1, tv2 = host.meshes[m]
            for p in range(len(tv0)):
                v0 = tv0[p]
                e1 = tv1[p] - v0
                e2 = tv2[p] - v0
                h = np.cross(d, e2)
                a = np.float32(e1 @ h)
                if abs(a) < eps:
                    continue
                f = np.float32(1.0) / a
                s = o - v0
                u = f * np.float32(s @ h)
                if u < 0.0 or u > 1.0:
                    continue
                q = np.cross(s, e1)
                v = f * np.float32(d @ q)
                if v < 0.0 or u + v > 1.0:
                    continue
                t = f * np.float32(e2 @ q)
                if eps <= t < out["t"][r]:
                    out["t"][r] = t
                    out["inst"][r] = i
                    out["prim"][r] = p
                    out["u"][r] = u
                    out["v"][r] = v
    return out
