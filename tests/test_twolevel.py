"""Two-level TLAS->BLAS traversal + GPU batch flattening tests
(reference-shaped structures: bvh.cpp two-level design, GPUBatcher)."""

import numpy as np
import pytest

from surf_tpu.accel.twolevel import TwoLevelScene
from surf_tpu.reference.cpu_renderer import OracleRenderer
from surf_tpu.scene import builtin
from surf_tpu.scene.batch import create_batch
from surf_tpu.scene.compile import HostCompiled


@pytest.fixture(scope="module")
def setup():
    scene = builtin.make_diffuse_box_scene()
    host = HostCompiled(scene)
    two = TwoLevelScene(scene.instances)
    cam = builtin.make_indoor_camera(16, 16)
    oracle = OracleRenderer(host, cam)
    return scene, host, two, oracle


def test_two_level_matches_brute_force(setup):
    scene, host, two, oracle = setup
    rng = np.random.default_rng(0)
    n = 128
    o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    prim_b, t_b, _, _ = oracle._closest(
        o, d, np.full(n, 1e30, np.float32), np.ones(n, bool)
    )
    for i in range(n):
        hit = two.intersect(o[i], d[i])
        if prim_b[i] < 0:
            assert hit is None
        else:
            assert hit is not None
            inst, prim, t, u, v = hit
            # brute force uses world-space flattened triangles; map back
            assert inst == host.tri_inst[prim_b[i]]
            assert np.isclose(t, t_b[i], rtol=1e-4, atol=1e-5)


def test_two_level_any_hit(setup):
    scene, host, two, oracle = setup
    rng = np.random.default_rng(1)
    n = 64
    o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    occ_ref = oracle._occluded(o, d, np.full(n, 8.0, np.float32), np.ones(n, bool))
    for i in range(n):
        hit = two.intersect(o[i], d[i], t_bound=np.float32(8.0), any_hit=True)
        assert (hit is not None) == bool(occ_ref[i])


def test_two_level_refit_after_animation(setup):
    scene = builtin.make_indoor_scene()
    two = TwoLevelScene(scene.instances)
    o = np.array([0, 0, -7], np.float32)
    d = np.array([0, 0, 1], np.float32)
    before = two.intersect(o, d)
    scene.update(0.4)  # rotates instance 3 (susanne0) and refreshes bounds
    two.refit()
    after = two.intersect(o, d)
    assert before is not None and after is not None
    # the ray toward the scene center hits the animated susanne instance
    assert before[0] == 3 and after[0] == 3
    assert before[2] != after[2]  # hit distance changed with the rotation


def test_gpu_batch_structure(setup):
    scene, host, two, _ = setup
    batch = create_batch(scene, two)
    total_tris = sum(
        m.tri_count for m in {id(i.mesh): i.mesh for i in scene.instances}.values()
    )
    assert len(batch.tri_v0) == total_tris
    assert len(batch.blas_indices) == total_tris
    assert len(batch.instances) == len(scene.instances)
    assert [l.instance_idx for l in batch.lights] == scene.light_indices
    # offsets must be monotone and in range
    for rec in batch.instances:
        assert 0 <= rec.tri_offset < total_tris or rec.tri_offset == 0
        assert rec.material_offset < batch.materials.albedo.shape[0]
    # TLAS covers all instances
    assert sorted(batch.tlas_indices.tolist()) == list(range(len(scene.instances)))


def test_compaction_preserves_image():
    from surf_tpu.scene.camera import CameraParams
    from surf_tpu.wavefront import RenderConfig, render_frame_jit
    import jax.numpy as jnp

    host = HostCompiled(builtin.make_diffuse_box_scene())
    W = H = 16
    cam = builtin.make_indoor_camera(W, H)
    cp = CameraParams.from_camera(cam)
    cfg = RenderConfig.for_scene(host.static, W, H, 2, use_defocus=True)
    a = np.asarray(render_frame_jit(host.render_scene, cfg, cp, jnp.uint32(0)))
    b = np.asarray(
        render_frame_jit(
            host.render_scene, cfg._replace(compact=True), cp, jnp.uint32(0)
        )
    )
    # Identical RNG streams; lane placement only perturbs fusion order, so
    # per-path math can differ by ulps — which occasionally flips a
    # decision boundary and diverges a single path (same class as the
    # oracle-vs-XLA divergence).  Robust criterion:
    diff = np.abs(a - b).max(axis=2)
    assert (diff > 1e-3).mean() < 0.02
    assert abs(a.sum() - b.sum()) / abs(a.sum()) < 0.005
