"""Scene compiler: host Scene -> device-resident flattened SoA arrays.

The TPU-native analog of the reference's GPUBatcher + GPUScene upload path
(/root/reference/sources/scene.cpp:61-258): a host pass that flattens meshes,
BVHs, materials, instances and lights into global arrays, which then live in
HBM (replicated per chip) for the wavefront kernels.

TPU-first design departure (documented per SURVEY.md §2 BVH rows): instead of
the reference's two-level TLAS->instance->BLAS traversal with per-instance
ray transforms (bvh.cpp:481-513), instances are *pre-transformed to world
space* at compile time and a single flattened BVH is built over all world
triangles.  Lockstep traversal then needs no nested stacks or per-lane matrix
loads — far better for the VPU — while animation still only re-transforms the
moved instance's triangle slice and refits (see ``CompiledScene.update``).
The two-level structures remain available (accel.build_blas / build_tlas) and
are exercised by the test suite for the reference-shaped API.

Gradient plumbing: ``RenderScene`` carries the differentiable leaves
(material table, sampling-geometry arrays); the traversal arrays are derived
and treated as detached — kernels re-intersect the *chosen* primitive
differentiably (see wavefront/integrator.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..accel import builder
from ..accel.wide import (build_leaf_table, build_wide_stream,
                          pad_wide_stream, refit_wide_stream)
from ..accel.traverse import (
    TraceArrays,
    build_skiplinks,
    bvh_max_depth,
    pack_trace_tables,
    skiplink_boxes,
)
from .material import build_material_table
from .scene import Scene


class RenderScene(NamedTuple):
    """Device pytree consumed by the wavefront kernels. All jnp arrays."""

    # traversal set (leaf-ordered, detached)
    trace: TraceArrays
    tri_inst: jnp.ndarray      # [T] int32, leaf-ordered instance id
    tri_n0: jnp.ndarray        # [T,3] leaf-ordered world normals (M @ n, unnormalized)
    tri_n1: jnp.ndarray
    tri_n2: jnp.ndarray
    tri_uv0: jnp.ndarray       # [T,2] leaf-ordered UVs (fetched, unused — parity)
    tri_uv1: jnp.ndarray
    tri_uv2: jnp.ndarray
    perm: jnp.ndarray          # [T] int32: leaf slot -> original (sampling) id
    # sampling set (original instance-contiguous order, differentiable)
    samp_v0: jnp.ndarray       # [T,3]
    samp_v1: jnp.ndarray
    samp_v2: jnp.ndarray
    samp_n0: jnp.ndarray
    samp_n1: jnp.ndarray
    samp_n2: jnp.ndarray
    # instances
    inst_tri_offset: jnp.ndarray  # [I] int32 into samp arrays
    inst_tri_count: jnp.ndarray   # [I] int32
    inst_area: jnp.ndarray        # [I] float32 (transformed surface area)
    inst_material: jnp.ndarray    # [I] int32
    # materials (primary gradient targets)
    mat_albedo: jnp.ndarray           # [M,3]
    mat_emission_color: jnp.ndarray   # [M,3]
    mat_absorption: jnp.ndarray       # [M,3]
    mat_emission_strength: jnp.ndarray  # [M]
    mat_reflectivity: jnp.ndarray     # [M]
    mat_refractivity: jnp.ndarray     # [M]
    mat_ior: jnp.ndarray              # [M]
    mat_is_light: jnp.ndarray         # [M] bool
    # lights
    light_inst: jnp.ndarray    # [L] int32 instance ids (L >= 1; padded if 0)
    # background
    bg_type: jnp.ndarray       # scalar int32 (0 solid / 1 gradient)
    bg_color: jnp.ndarray      # [3]
    bg_gradient_a: jnp.ndarray # [3]
    bg_gradient_b: jnp.ndarray # [3]
    # algo="twolevelp" pure object-space shading set (O(unique mesh tris);
    # HostCompiled(two_level="pure") — the reference's end-to-end
    # instancing shape, bvh.cpp:481-594: SHARED object-space meshes +
    # per-instance transforms, no flattened world-space duplication).
    # Arrays are in ORIGINAL mesh-tri order, concatenated per unique mesh;
    # trace.inst_obj_base[i] is instance i's base offset.
    obj_v0: jnp.ndarray | None = None   # [Tu,3] object-space vertices
    obj_v1: jnp.ndarray | None = None
    obj_v2: jnp.ndarray | None = None
    obj_n0: jnp.ndarray | None = None   # [Tu,3] object-space normals
    obj_n1: jnp.ndarray | None = None
    obj_n2: jnp.ndarray | None = None
    inst_fwd: jnp.ndarray | None = None  # [I,12] forward 3x4 rows (affine)


class SceneStatic(NamedTuple):
    """Hashable static companion passed as a jit-static argument."""

    stack_depth: int
    num_lights: int
    tri_count: int
    inst_meta: tuple | None = None  # InstancedMeta for algo="twolevel"


def _dedupe_materials(scene: Scene):
    mats, ids = [], {}
    for inst in scene.instances:
        if id(inst.material) not in ids:
            ids[id(inst.material)] = len(mats)
            mats.append(inst.material)
    inst_material = np.array([ids[id(i.material)] for i in scene.instances], np.int32)
    return mats, inst_material


def compile_scene(scene: Scene) -> tuple[RenderScene, SceneStatic]:
    host = HostCompiled(scene)
    return host.render_scene, host.static


class HostCompiled:
    """Keeps the host-side arrays so animation updates can be incremental
    (only the moved instance's triangle slice is re-transformed and the BVH
    refit — the analog of GPUScene::update's instance+TLAS re-upload,
    scene.cpp:267-282)."""

    def __init__(self, scene: Scene, render_min_leaf: int = 4,
                 two_level: bool | str = False, inst_cap: int | None = None):
        self.scene = scene
        self.render_min_leaf = render_min_leaf
        self.inst_cap = inst_cap  # per-(packet,instance) candidate cap
        # two_level=True: instanced TRAVERSAL, flattened shading (hits map
        # back through inst_prim_map).  two_level="pure": instanced
        # end-to-end — O(unique mesh tris) device memory, no flattened
        # build at all (algo="twolevelp"); the only O(sum instance tris)
        # cost left is the host-side area/bounds pass per instance.
        self.pure = two_level == "pure"
        self.two_level = bool(two_level)
        mats, inst_material = _dedupe_materials(scene)
        self.materials = build_material_table(mats)
        self.inst_material = inst_material
        if self.pure:
            self._build_pure()
            return

        v0s, v1s, v2s, n0s, n1s, n2s = [], [], [], [], [], []
        uv0s, uv1s, uv2s = [], [], []
        offsets, counts = [], []
        off = 0
        for inst in scene.instances:
            w = inst.world_triangles()
            v0s.append(w[0]); v1s.append(w[1]); v2s.append(w[2])
            n0s.append(w[3]); n1s.append(w[4]); n2s.append(w[5])
            uv0s.append(inst.mesh.uv0); uv1s.append(inst.mesh.uv1); uv2s.append(inst.mesh.uv2)
            offsets.append(off)
            counts.append(inst.mesh.tri_count)
            off += inst.mesh.tri_count
        self.samp_v0 = np.concatenate(v0s); self.samp_v1 = np.concatenate(v1s)
        self.samp_v2 = np.concatenate(v2s)
        self.samp_n0 = np.concatenate(n0s); self.samp_n1 = np.concatenate(n1s)
        self.samp_n2 = np.concatenate(n2s)
        self.uv0 = np.concatenate(uv0s); self.uv1 = np.concatenate(uv1s)
        self.uv2 = np.concatenate(uv2s)
        self.inst_tri_offset = np.asarray(offsets, np.int32)
        self.inst_tri_count = np.asarray(counts, np.int32)
        self.tri_inst = np.repeat(
            np.arange(len(scene.instances), dtype=np.int32), self.inst_tri_count
        )
        self._caps: dict[str, int] = {}
        self._rebuild_bvh()
        self._seen_version = scene.version

    def _build_pure(self):
        """Pure two-level compile (algo="twolevelp"): shared per-unique-mesh
        object-space tables + per-instance transforms, O(unique mesh tris)
        device memory end-to-end (the reference's instancing shape,
        bvh.cpp:481-594).  No flattened BVH, wide stream, leaf table or
        samp_* duplication is built or uploaded — shading re-derives world
        geometry per lane from 12 transform scalars."""
        from ..accel.pallas_instanced import build_instanced_trace

        scene = self.scene
        mesh_ids: dict[int, int] = {}
        meshes = []
        insts = []
        for inst in scene.instances:
            m4 = np.asarray(inst.transform, np.float32)
            assert np.allclose(m4[3], [0, 0, 0, 1]), \
                "twolevelp assumes affine instance transforms (w == 1)"
            key = id(inst.mesh)
            if key not in mesh_ids:
                mesh_ids[key] = len(meshes)
                meshes.append(inst.mesh)
            insts.append((mesh_ids[key], inst.transform,
                          inst.bounds_min, inst.bounds_max))
        kw = {} if self.inst_cap is None else dict(
            cap_per_inst=self.inst_cap)
        ih = build_instanced_trace(
            [(m.v0, m.v1, m.v2) for m in meshes], insts, **kw)
        self._inst_host = ih
        meta = ih.trace.meta

        # Object-space arrays in ORIGINAL mesh order, one block per unique
        # mesh; slot_perm maps mesh-local LEAF slot -> mesh-local original
        # id (ih.perms), concatenated with the same per-mesh bases.
        base = np.concatenate(
            [[0], np.cumsum([m.tri_count for m in meshes])]).astype(np.int64)
        obj = {f: np.concatenate([getattr(m, f) for m in meshes])
               for f in ("v0", "v1", "v2", "n0", "n1", "n2")}
        slot_perm = np.concatenate(ih.perms).astype(np.int32)
        inst_obj_base = np.asarray(
            [base[mi] for mi, *_ in insts], np.int32)
        inst_fwd = np.stack([
            np.asarray(inst.transform, np.float32)[:3, :4].reshape(12)
            for inst in scene.instances])
        self.inst_tri_count = np.asarray(
            [inst.mesh.tri_count for inst in scene.instances], np.int32)

        bg = scene.background
        light_inst = np.asarray(scene.light_indices, np.int32)
        if len(light_inst) == 0:
            light_inst = np.zeros(1, np.int32)
        j = jnp.asarray
        d1 = j(np.zeros((1, 3), np.float32))
        d1i = j(np.zeros(1, np.int32))
        d2 = j(np.zeros((1, 2), np.float32))
        self.render_scene = RenderScene(
            trace=TraceArrays(
                tri_v0=d1, tri_v1=d1, tri_v2=d1,
                node_boxes=j(np.full((1, 6), np.nan, np.float32)),
                node_meta=j(np.zeros((1, 3), np.int32)),
                nodes_packed=j(np.zeros((1, 128), np.float32)),
                tris_packed=j(np.zeros((1, 128), np.float32)),
                inst_ltab=ih.trace.ltab,
                inst_box_lo=ih.trace.box_lo,
                inst_box_hi=ih.trace.box_hi,
                inst_xf=ih.trace.xf_rows,
                inst_wlo=ih.trace.inst_lo,
                inst_whi=ih.trace.inst_hi,
                inst_inv=j(ih.inv3x4),
                inst_obj_base=j(inst_obj_base),
                inst_slot_perm=j(slot_perm),
            ),
            tri_inst=d1i, tri_n0=d1, tri_n1=d1, tri_n2=d1,
            tri_uv0=d2, tri_uv1=d2, tri_uv2=d2, perm=d1i,
            samp_v0=d1, samp_v1=d1, samp_v2=d1,
            samp_n0=d1, samp_n1=d1, samp_n2=d1,
            inst_tri_offset=j(inst_obj_base),
            inst_tri_count=j(self.inst_tri_count),
            inst_area=j(np.array(
                [i.area for i in scene.instances], np.float32)),
            inst_material=j(self.inst_material),
            mat_albedo=j(self.materials.albedo),
            mat_emission_color=j(self.materials.emission_color),
            mat_absorption=j(self.materials.absorption),
            mat_emission_strength=j(self.materials.emission_strength),
            mat_reflectivity=j(self.materials.reflectivity),
            mat_refractivity=j(self.materials.refractivity),
            mat_ior=j(self.materials.ior),
            mat_is_light=j(self.materials.is_light),
            light_inst=j(light_inst),
            bg_type=jnp.int32(bg.type),
            bg_color=j(bg.color),
            bg_gradient_a=j(bg.gradient_a),
            bg_gradient_b=j(bg.gradient_b),
            obj_v0=j(obj["v0"]), obj_v1=j(obj["v1"]), obj_v2=j(obj["v2"]),
            obj_n0=j(obj["n0"]), obj_n1=j(obj["n1"]), obj_n2=j(obj["n2"]),
            inst_fwd=j(inst_fwd),
        )
        self.static = SceneStatic(
            stack_depth=8,  # unused by the instanced kernels
            num_lights=len(scene.light_indices),
            tri_count=int(len(obj["v0"])),
            inst_meta=meta,
        )
        self._seen_version = scene.version

    def _cap(self, name: str, n: int, quantum: int = 1024) -> int:
        """Sticky capacity class for a topology-dependent array dimension:
        rounds n (+12.5% headroom) up to a quantum on first use and keeps
        that capacity until exceeded, so per-frame SAH rebuilds produce
        identically-shaped device arrays and the jitted render re-uses its
        compiled executable (VERDICT r3 item 4)."""
        c = self._caps.get(name, 0)
        if n > c:
            c = -(-int(n * 1.125 + 1) // quantum) * quantum
            self._caps[name] = c
        return c

    def _pad_node_boxes(self, boxes):
        """Pad skip-link boxes to the sticky node capacity with NaN rows
        (NaN fails every slab comparison — never hit)."""
        d_cap = self._cap("nodes", len(boxes))
        if len(boxes) == d_cap:
            return boxes
        out = np.full((d_cap, 6), np.nan, np.float32)
        out[:len(boxes)] = boxes
        return out

    def _rebuild_bvh(self):
        self.bvh = builder.build_blas(
            self.samp_v0, self.samp_v1, self.samp_v2,
            min_leaf=self.render_min_leaf,
            # 8-wide kernel layout stores one leaf per 128-lane row
            # (accel/wide.py); bound leaf size accordingly.
            max_leaf=8,
        )
        self._ws = None  # topology changed: full wide-stream rebuild
        self._refresh_device()

    def _refit_bvh(self):
        lo, hi = builder.triangle_bounds(self.samp_v0, self.samp_v1, self.samp_v2)
        self.bvh = builder.refit(self.bvh, lo, hi)
        self._refresh_device(refit_only=True)

    def _refresh_device(self, refit_only: bool = False):
        perm = self.bvh.indices.astype(np.int64)
        refit_fast = refit_only and getattr(self, "_ws", None) is not None
        if refit_fast:
            # Animation fast path (GPUScene::update analog,
            # scene.cpp:267-282): topology is unchanged, so the skip-link
            # preorder/meta are reused and only box values re-gather
            # (90 ms Python DFS -> ~1 ms), the wide stream refits in
            # place, and the device scene is updated with ._replace so
            # unchanged arrays (materials, UVs, rec_slot, meta) keep
            # their device buffers instead of re-uploading.
            boxes = self._pad_node_boxes(
                skiplink_boxes(self.bvh, self._skip_order))
            meta = self._skip_meta
        else:
            boxes, meta, self._skip_order = build_skiplinks(
                self.bvh, return_order=True)
            # Capacity padding: NaN boxes never hit; pad meta is a
            # non-leaf whose skip jumps straight to the padded end, so a
            # lane that reaches the pad region pays one visit and exits.
            d_cap = self._cap("nodes", len(meta))
            boxes = self._pad_node_boxes(boxes)
            meta_pad = np.zeros((d_cap, 3), np.int32)
            meta_pad[:, 2] = d_cap
            meta_pad[:len(meta)] = meta
            meta = meta_pad
            self._skip_meta = meta
        tv0 = self.samp_v0[perm]
        tv1 = self.samp_v1[perm]
        tv2 = self.samp_v2[perm]
        nodes_packed, tris_packed = pack_trace_tables(tv0, tv1, tv2, boxes, meta)
        if refit_fast:
            ws = refit_wide_stream(self._ws, self.bvh, tv0, tv1, tv2)
        else:
            ws = build_wide_stream(self.bvh, tv0, tv1, tv2)
            ws = pad_wide_stream(
                ws, self._cap("stream_rows", ws.stream.shape[0]))
        self._ws = ws
        # Dense leaf table for algo="bits" (rebuilt whole — pure
        # vectorized packing, a few ms; topology-static parts (rec_slot,
        # anc) are only re-uploaded on full rebuilds).
        lt = build_leaf_table(tv0, tv1, tv2)
        j = jnp.asarray
        if refit_fast:
            self.render_scene = self.render_scene._replace(
                trace=self.render_scene.trace._replace(
                    tri_v0=j(tv0), tri_v1=j(tv1), tri_v2=j(tv2),
                    node_boxes=j(boxes),
                    nodes_packed=j(nodes_packed),
                    tris_packed=j(tris_packed),
                    wide_stream=j(ws.stream),
                    wide_ltab=j(lt.table),
                    wide_ltabw=j(lt.tablew),
                    wide_box_lo=j(lt.box_lo.T.copy()),
                    wide_box_hi=j(lt.box_hi.T.copy()),
                ),
                tri_n0=j(self.samp_n0[perm]),
                tri_n1=j(self.samp_n1[perm]),
                tri_n2=j(self.samp_n2[perm]),
                samp_v0=j(self.samp_v0),
                samp_v1=j(self.samp_v1),
                samp_v2=j(self.samp_v2),
                samp_n0=j(self.samp_n0),
                samp_n1=j(self.samp_n1),
                samp_n2=j(self.samp_n2),
                inst_area=j(np.array(
                    [i.area for i in self.scene.instances], np.float32)),
            )
            if self.two_level and getattr(self, "_inst_host", None):
                # Instance transforms may have moved; the shared per-mesh
                # object-space BLASes are animation-invariant but the
                # per-instance inverse transforms + world AABBs are not
                # (ADVICE r4: stale _inst_host silently traversed old
                # transforms on animated scenes).
                self._refresh_instanced_xf()
            return
        scene = self.scene
        bg = scene.background
        light_inst = np.asarray(scene.light_indices, np.int32)
        if len(light_inst) == 0:
            light_inst = np.zeros(1, np.int32)  # padded; gated by num_lights

        j = jnp.asarray
        self.render_scene = RenderScene(
            trace=TraceArrays(
                tri_v0=j(tv0),
                tri_v1=j(tv1),
                tri_v2=j(tv2),
                node_boxes=j(boxes),
                node_meta=j(meta),
                nodes_packed=j(nodes_packed),
                tris_packed=j(tris_packed),
                wide_stream=j(ws.stream),
                wide_rec_slot=j(ws.rec_slot),
                wide_ltab=j(lt.table),
                wide_ltabw=j(lt.tablew),
                wide_lrec=j(lt.rec_slot),
                wide_box_lo=j(lt.box_lo.T.copy()),
                wide_box_hi=j(lt.box_hi.T.copy()),
                wide_anc=j(lt.anc),
            ),
            tri_inst=j(self.tri_inst[perm]),
            tri_n0=j(self.samp_n0[perm]),
            tri_n1=j(self.samp_n1[perm]),
            tri_n2=j(self.samp_n2[perm]),
            tri_uv0=j(self.uv0[perm]),
            tri_uv1=j(self.uv1[perm]),
            tri_uv2=j(self.uv2[perm]),
            perm=j(perm.astype(np.int32)),
            samp_v0=j(self.samp_v0),
            samp_v1=j(self.samp_v1),
            samp_v2=j(self.samp_v2),
            samp_n0=j(self.samp_n0),
            samp_n1=j(self.samp_n1),
            samp_n2=j(self.samp_n2),
            inst_tri_offset=j(self.inst_tri_offset),
            inst_tri_count=j(self.inst_tri_count),
            inst_area=j(
                np.array([i.area for i in self.scene.instances], np.float32)
            ),
            inst_material=j(self.inst_material),
            mat_albedo=j(self.materials.albedo),
            mat_emission_color=j(self.materials.emission_color),
            mat_absorption=j(self.materials.absorption),
            mat_emission_strength=j(self.materials.emission_strength),
            mat_reflectivity=j(self.materials.reflectivity),
            mat_refractivity=j(self.materials.refractivity),
            mat_ior=j(self.materials.ior),
            mat_is_light=j(self.materials.is_light),
            light_inst=j(light_inst),
            bg_type=jnp.int32(bg.type),
            bg_color=j(bg.color),
            bg_gradient_a=j(bg.gradient_a),
            bg_gradient_b=j(bg.gradient_b),
        )
        inst_meta = None
        if self.two_level:
            inst_meta = self._attach_instanced(perm)
        # stack_depth is a jit-static; round it up to a sticky multiple of
        # 8 so per-frame rebuilds (whose tree depth wobbles by a level or
        # two) keep an identical RenderConfig and reuse the executable.
        self.static = SceneStatic(
            stack_depth=self._cap(
                "stack_depth", bvh_max_depth(self.bvh) + 2, quantum=8),
            num_lights=len(self.scene.light_indices),
            tri_count=int(len(self.samp_v0)),
            inst_meta=inst_meta,
        )

    def _attach_instanced(self, perm):
        """algo="twolevel" tables: shared per-UNIQUE-mesh object-space
        BLASes + per-instance transforms (accel/pallas_instanced; the
        reference's TLAS->instance->BLAS shape, bvh.cpp:481-513).  The
        (inst, mesh-local slot) winner is mapped back to the flattened
        render BVH's leaf slot so the shading/NEE/diff pipeline is
        untouched.  The mesh-level build (shared BLASes, caps, prim maps)
        is cached; the per-instance transforms/world-AABBs are re-derived
        from the CURRENT instance state on every attach/refit so animated
        scenes traverse fresh transforms (ADVICE r4)."""
        from ..accel.pallas_instanced import build_instanced_trace

        ih = getattr(self, "_inst_host", None)
        fresh = ih is None
        if ih is None:
            mesh_ids: dict[int, int] = {}
            meshes = []
            insts = []
            for inst in self.scene.instances:
                key = id(inst.mesh)
                if key not in mesh_ids:
                    mesh_ids[key] = len(meshes)
                    meshes.append((inst.mesh.v0, inst.mesh.v1, inst.mesh.v2))
                insts.append((mesh_ids[key], inst.transform,
                              inst.bounds_min, inst.bounds_max))
            ih = build_instanced_trace(meshes, insts)
            self._inst_host = ih
        meta = ih.trace.meta
        inv_perm = np.zeros(len(perm), np.int64)
        inv_perm[perm] = np.arange(len(perm))
        fm = np.concatenate([
            inv_perm[self.inst_tri_offset[i] + ih.perms[m]]
            for i, m in enumerate(meta.mesh_of)
        ]).astype(np.int32)
        base = np.concatenate(
            [[0], np.cumsum([len(ih.perms[m])
                             for m in meta.mesh_of])])[:-1].astype(np.int32)
        j = jnp.asarray
        self.render_scene = self.render_scene._replace(
            trace=self.render_scene.trace._replace(
                inst_ltab=ih.trace.ltab,
                inst_box_lo=ih.trace.box_lo,
                inst_box_hi=ih.trace.box_hi,
                inst_xf=ih.trace.xf_rows,
                inst_wlo=ih.trace.inst_lo,
                inst_whi=ih.trace.inst_hi,
                inst_inv=j(ih.inv3x4),
                inst_prim_map=j(fm),
                inst_prim_base=j(base),
            ))
        if not fresh:
            self._refresh_instanced_xf()
        return meta

    def _refresh_instanced_xf(self):
        """Re-derive the per-instance arrays of the two-level tables
        (inverse 3x4 transforms + world AABBs) from the CURRENT instance
        transforms, updating both the cached InstancedHost and the live
        RenderScene trace.  O(I) host work; the shared per-mesh tables are
        untouched (their device buffers are reused)."""
        ih = self._inst_host
        insts = self.scene.instances
        inv3x4 = np.stack([
            np.linalg.inv(
                np.asarray(inst.transform, np.float64))[:3, :4]
            .astype(np.float32).reshape(12)
            for inst in insts])
        xf = np.zeros_like(np.asarray(ih.trace.xf_rows))
        xf[:, :12] = inv3x4
        ilo = np.stack([inst.bounds_min for inst in insts]).T.copy()
        ihi = np.stack([inst.bounds_max for inst in insts]).T.copy()
        j = jnp.asarray
        trace = ih.trace._replace(
            xf_rows=j(xf), inst_lo=j(ilo), inst_hi=j(ihi))
        self._inst_host = ih._replace(trace=trace, inv3x4=inv3x4)
        self.render_scene = self.render_scene._replace(
            trace=self.render_scene.trace._replace(
                inst_xf=trace.xf_rows,
                inst_wlo=trace.inst_lo,
                inst_whi=trace.inst_hi,
                inst_inv=j(inv3x4),
            ))

    def update(self, delta_time: float, rebuild: bool = False):
        """Advance the scene animation and refresh device arrays.

        ``rebuild=True`` forces a full SAH rebuild (BASELINE config 4);
        otherwise the BVH is refit in place."""
        self.scene.update(delta_time)
        self.refresh(rebuild=rebuild)

    def refresh(self, rebuild: bool = False):
        """Re-transform triangle slices ONLY for instances whose transform
        changed since the last refresh (Instance.version), then
        refit/rebuild.  On the indoor animation this touches one instance
        instead of all eleven (VERDICT r1 item 3)."""
        if self.pure:
            # Pure two-level: the shared object-space BLASes are
            # animation-invariant; only the O(I) per-instance arrays move
            # (forward/inverse transforms, world AABBs, areas).
            self._refresh_instanced_xf()
            self.render_scene = self.render_scene._replace(
                inst_fwd=jnp.asarray(np.stack([
                    np.asarray(i.transform, np.float32)[:3, :4].reshape(12)
                    for i in self.scene.instances])),
                inst_area=jnp.asarray(np.array(
                    [i.area for i in self.scene.instances], np.float32)),
            )
            return
        seen = getattr(self, "_inst_versions", None)
        if seen is None:
            seen = [-1] * len(self.scene.instances)
        for i, inst in enumerate(self.scene.instances):
            v = getattr(inst, "version", 0)
            if v == seen[i]:
                continue
            seen[i] = v
            o = self.inst_tri_offset[i]
            c = self.inst_tri_count[i]
            w = inst.world_triangles()
            self.samp_v0[o:o + c] = w[0]; self.samp_v1[o:o + c] = w[1]
            self.samp_v2[o:o + c] = w[2]
            self.samp_n0[o:o + c] = w[3]; self.samp_n1[o:o + c] = w[4]
            self.samp_n2[o:o + c] = w[5]
        self._inst_versions = seen
        if rebuild:
            self._rebuild_bvh()
        else:
            self._refit_bvh()
