"""GPUBatcher equivalent: flatten per-object data into global pools.

Mirrors GPUBatcher::createBatchInfo (/root/reference/sources/scene.cpp:61-157
and the GPUInstance/GPULightData records bvh.h:93-102, scene.h:67-82): global
triangle + extension buffers over the deduped mesh set, concatenated BLAS
index/node pools, a deduped material table, per-instance offset records into
the global pools, TLAS indices/nodes, and light records.

The TPU render path consumes the world-space flattened arrays from
scene/compile.py instead (pre-transformed, single BVH); this batch is the
reference-shaped alternative used by the two-level traversal
(accel/twolevel.py), by tests, and for export/debugging.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..accel.twolevel import BLAS, TwoLevelScene
from .material import MaterialTable, build_material_table
from .scene import Scene


@dataclass
class GPUInstanceRecord:
    """GPUInstance (bvh.h:93-102)."""

    tri_offset: int
    bvh_idx_offset: int
    bvh_node_offset: int
    material_offset: int
    area: float
    transform: np.ndarray
    inv_transform: np.ndarray


@dataclass
class GPULightRecord:
    """GPULightData (scene.h:67-71)."""

    instance_idx: int
    primitive_count: int


@dataclass
class GPUBatch:
    tri_v0: np.ndarray       # [T,3] global triangle buffer (object space)
    tri_v1: np.ndarray
    tri_v2: np.ndarray
    tri_n0: np.ndarray       # [T,3] extension buffer (normals)
    tri_n1: np.ndarray
    tri_n2: np.ndarray
    tri_uv0: np.ndarray      # [T,2]
    tri_uv1: np.ndarray
    tri_uv2: np.ndarray
    blas_indices: np.ndarray    # concatenated BLAS index pools
    blas_node_lo: np.ndarray    # concatenated BLAS node pools
    blas_node_hi: np.ndarray
    blas_left_first: np.ndarray
    blas_count: np.ndarray
    materials: MaterialTable
    instances: list = field(default_factory=list)   # [GPUInstanceRecord]
    lights: list = field(default_factory=list)      # [GPULightRecord]
    tlas_indices: np.ndarray = None
    tlas_node_lo: np.ndarray = None
    tlas_node_hi: np.ndarray = None
    tlas_left_first: np.ndarray = None
    tlas_count: np.ndarray = None


def create_batch(scene: Scene, two_level: TwoLevelScene | None = None) -> GPUBatch:
    """Flatten the scene into global pools (scene.cpp:61-157 semantics;
    dedupe order = first appearance in instance order rather than the
    reference's pointer-map order, which is allocator-dependent)."""
    if two_level is None:
        two_level = TwoLevelScene(scene.instances)

    # dedupe meshes / BLASes / materials in first-appearance order
    meshes: list = []
    mesh_ids: dict[int, int] = {}
    mats: list = []
    mat_ids: dict[int, int] = {}
    for inst in scene.instances:
        if id(inst.mesh) not in mesh_ids:
            mesh_ids[id(inst.mesh)] = len(meshes)
            meshes.append(inst.mesh)
        if id(inst.material) not in mat_ids:
            mat_ids[id(inst.material)] = len(mats)
            mats.append(inst.material)

    tri_offsets, idx_offsets, node_offsets = [], [], []
    t_off = i_off = n_off = 0
    v0s, v1s, v2s, n0s, n1s, n2s, uv0s, uv1s, uv2s = ([] for _ in range(9))
    idxs, nlo, nhi, nlf, ncnt = [], [], [], [], []
    for mesh in meshes:
        blas: BLAS = two_level.blas[id(mesh)]
        tri_offsets.append(t_off)
        idx_offsets.append(i_off)
        node_offsets.append(n_off)
        t = mesh.tri_count
        v0s.append(mesh.v0); v1s.append(mesh.v1); v2s.append(mesh.v2)
        n0s.append(mesh.n0); n1s.append(mesh.n1); n2s.append(mesh.n2)
        uv0s.append(mesh.uv0); uv1s.append(mesh.uv1); uv2s.append(mesh.uv2)
        idxs.append(blas.bvh.indices)
        used = blas.bvh.nodes_used
        nlo.append(blas.bvh.node_lo[:used])
        nhi.append(blas.bvh.node_hi[:used])
        nlf.append(blas.bvh.left_first[:used])
        ncnt.append(blas.bvh.count[:used])
        t_off += t
        i_off += t
        n_off += used

    instances = []
    lights = []
    for i, inst in enumerate(scene.instances):
        m = mesh_ids[id(inst.mesh)]
        rec = GPUInstanceRecord(
            tri_offset=tri_offsets[m],
            bvh_idx_offset=idx_offsets[m],
            bvh_node_offset=node_offsets[m],
            material_offset=mat_ids[id(inst.material)],
            area=inst.area,
            transform=inst.transform,
            inv_transform=inst.inv_transform,
        )
        if inst.material.is_light():
            # GPULightData {instanceIdx, primitiveCount} (scene.cpp:143-148)
            lights.append(GPULightRecord(i, inst.mesh.tri_count))
        instances.append(rec)

    tlas = two_level.tlas
    used = tlas.nodes_used
    return GPUBatch(
        tri_v0=np.concatenate(v0s), tri_v1=np.concatenate(v1s),
        tri_v2=np.concatenate(v2s),
        tri_n0=np.concatenate(n0s), tri_n1=np.concatenate(n1s),
        tri_n2=np.concatenate(n2s),
        tri_uv0=np.concatenate(uv0s), tri_uv1=np.concatenate(uv1s),
        tri_uv2=np.concatenate(uv2s),
        blas_indices=np.concatenate(idxs),
        blas_node_lo=np.concatenate(nlo), blas_node_hi=np.concatenate(nhi),
        blas_left_first=np.concatenate(nlf), blas_count=np.concatenate(ncnt),
        materials=build_material_table(mats),
        instances=instances,
        lights=lights,
        tlas_indices=tlas.indices,
        tlas_node_lo=tlas.node_lo[:used], tlas_node_hi=tlas.node_hi[:used],
        tlas_left_first=tlas.left_first[:used], tlas_count=tlas.count[:used],
    )
