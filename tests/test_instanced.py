"""Two-level instanced traversal (accel/pallas_instanced): the TPU-native
TLAS -> instance -> shared object-space BLAS path (VERDICT r3 item 8;
reference bvh.cpp:481-513, ray_extend.comp:88-103), validated in Pallas
interpret mode against (a) a NumPy oracle with the kernel's exact total
order and (b) the reference-shaped TwoLevelScene stackful walk."""

import numpy as np
import pytest

from surf_tpu.accel.pallas_instanced import (
    build_instanced_trace,
    traverse_instanced,
    traverse_instanced_np,
)
from surf_tpu.core import transform as tf
from surf_tpu.scene.mesh import make_cube, make_plane


@pytest.fixture(scope="module")
def setup():
    cube = make_cube()
    plane = make_plane()
    meshes = [
        (cube.v0, cube.v1, cube.v2),
        (plane.v0, plane.v1, plane.v2),
    ]
    xforms = [
        (0, tf.identity()),
        (0, tf.rotate(tf.translate(tf.identity(), [2.5, 0.5, 0.0]),
                      0.7, [0, 1, 0])),
        (0, tf.scale(tf.translate(tf.identity(), [-2.0, 0.0, 1.0]),
                     [1.5, 0.5, 1.0])),
        (1, tf.scale(tf.translate(tf.identity(), [0.0, -1.0, 0.0]),
                     [10, 1, 10])),
    ]
    host = build_instanced_trace(
        meshes, [(m, x, None, None) for m, x in xforms])

    rng = np.random.default_rng(3)
    n = 512
    o = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    # aim half the rays at the scene so plenty hit
    aim = rng.uniform(-2, 2, (n // 2, 3)).astype(np.float32)
    d[: n // 2] = aim - o[: n // 2]
    d[: n // 2] /= np.linalg.norm(d[: n // 2], axis=1, keepdims=True)
    # axis-aligned edge rays
    d[:6] = 0.0
    d[np.arange(6), np.arange(6) % 3] = np.where(np.arange(6) % 2 == 0,
                                                 1.0, -1.0)
    tm = np.full(n, 1e30, np.float32)
    return host, (cube, plane), xforms, o, d, tm


def test_matches_numpy_oracle_exactly(setup):
    host, _, _, o, d, tm = setup
    ref = traverse_instanced_np(host, o, d, tm)
    hit = traverse_instanced(host, o, d, tm, np.ones(len(o), bool),
                             interpret=True, block_rays=1024)
    inst = np.asarray(hit.inst)
    prim = np.asarray(hit.prim)
    t = np.asarray(hit.t)
    hit_frac = float((ref["inst"] >= 0).mean())
    assert hit_frac > 0.3, "fixture rays barely hit the scene"
    assert (inst == ref["inst"]).mean() == 1.0
    assert (prim == ref["prim"]).mean() == 1.0
    m = ref["inst"] >= 0
    assert np.allclose(t[m], ref["t"][m], rtol=1e-6, atol=1e-6)


def test_matches_twolevel_reference_walk(setup):
    from surf_tpu.accel.twolevel import TwoLevelScene
    from surf_tpu.scene.instance import Instance
    from surf_tpu.scene.material import Material

    host, (cube, plane), xforms, o, d, tm = setup
    mat = Material()
    mesh_objs = [cube, plane]
    tls = TwoLevelScene(
        [Instance(mesh_objs[m], mat, x) for m, x in xforms])
    hit = traverse_instanced(host, o, d, tm, np.ones(len(o), bool),
                             interpret=True, block_rays=1024)
    inst = np.asarray(hit.inst)
    prim = np.asarray(hit.prim)
    t = np.asarray(hit.t)
    n = len(o)
    mism = 0
    for r in range(n):
        ref = tls.intersect(o[r], d[r], 1e30)
        if ref is None:
            if inst[r] >= 0:
                mism += 1
            continue
        ri, rp, rt, _, _ = ref
        if inst[r] < 0:
            mism += 1
            continue
        # map kernel's mesh-local leaf slot to the mesh triangle id
        m = host.trace.meta.mesh_of[inst[r]]
        kp = int(host.perms[m][prim[r]])
        # exact-t ties may pick a different (instance, prim) between walk
        # orders; accept if t agrees tightly
        if not np.isclose(t[r], rt, rtol=1e-5, atol=1e-6):
            mism += 1
        elif (inst[r], kp) != (ri, rp) and not np.isclose(t[r], rt,
                                                          rtol=1e-6):
            mism += 1
    assert mism <= n * 0.002, f"{mism}/{n} mismatches vs TwoLevelScene"


def test_any_hit_mode(setup):
    host, _, _, o, d, tm = setup
    ref = traverse_instanced_np(host, o, d, tm)
    hit = traverse_instanced(host, o, d, tm, np.ones(len(o), bool),
                             any_hit=True, interpret=True, block_rays=1024)
    assert ((np.asarray(hit.prim) >= 0) == (ref["inst"] >= 0)).mean() == 1.0


def test_shared_mesh_memory(setup):
    """The point of the two-level path: N instances of a mesh store its
    table ONCE (the flattened path's tables grow with instances;
    tests/test_scene.py pins that)."""
    host, (cube, plane), _, _, _, _ = setup
    rows_expected = 0
    for (v0, _, _) in [(cube.v0, 0, 0), (plane.v0, 0, 0)]:
        n0 = -(-len(v0) // 8)
        rows_expected += (-(-n0 // 8) + 1) * 8
    assert host.trace.ltab.shape[0] == rows_expected  # 3 cube instances, 1 table


def test_twolevel_full_render_matches_flattened():
    """algo="twolevel" as a FULL renderer mode: the two-level instanced
    traversal drops into the wavefront integrator (winner mapped back to
    the flattened leaf slot) and reproduces the default path's image up
    to the documented float-chaos class (object-space MT floats differ
    from world-space MT)."""
    import jax
    import jax.numpy as jnp

    from surf_tpu.scene import builtin
    from surf_tpu.scene.camera import CameraParams
    from surf_tpu.scene.compile import HostCompiled
    from surf_tpu.wavefront import RenderConfig
    from surf_tpu.wavefront.integrator import (initial_seeds,
                                               render_frame_seeded)

    h = HostCompiled(builtin.make_diffuse_box_scene(), two_level=True)
    cam = builtin.make_indoor_camera(24, 24)
    cp = CameraParams.from_camera(cam)
    scene = jax.device_put(h.render_scene)
    base = RenderConfig.for_scene(
        h.static, 24, 24, 1, use_defocus=True, use_pallas=False,
    )._replace(max_bounces=None, wave_limit=8, compact=True)
    tl = base._replace(use_pallas=True, pallas_interpret=True,
                       algo="twolevel", block_rays=1024)
    imgs = {}
    for name, cfg in (("xla", base), ("twolevel", tl)):
        seed = initial_seeds(cfg, jnp.uint32(0))
        img, _ = render_frame_seeded(scene, cfg, cp, seed)
        imgs[name] = np.asarray(img)
    d = np.abs(imgs["xla"] - imgs["twolevel"]).max(axis=2)
    assert (d > 1e-3).mean() < 0.01
    e = imgs["xla"].sum()
    assert abs(e - imgs["twolevel"].sum()) / abs(e) < 0.005


def test_inactive_rays_masked(setup):
    host, _, _, o, d, tm = setup
    act = np.zeros(len(o), bool)
    act[::2] = True
    hit = traverse_instanced(host, o, d, tm, act, interpret=True,
                             block_rays=1024)
    assert (np.asarray(hit.inst)[~act] == -1).all()
    ref = traverse_instanced_np(host, o[act], d[act], tm[act])
    assert (np.asarray(hit.inst)[act] == ref["inst"]).all()


def test_twolevelp_pure_render_matches_flattened():
    """algo="twolevelp" (round 5): PURE two-level rendering — object-space
    shared meshes + per-lane instance transforms in shading and NEE, no
    flattened samp arrays at all (the reference's instancing end-to-end,
    bvh.cpp:481-594).  Must reproduce the flattened image within the
    documented float-chaos class (world geometry re-derived per lane in a
    different op order)."""
    import jax
    import jax.numpy as jnp

    from surf_tpu.scene import builtin
    from surf_tpu.scene.camera import CameraParams
    from surf_tpu.scene.compile import HostCompiled
    from surf_tpu.wavefront import RenderConfig
    from surf_tpu.wavefront.integrator import (initial_seeds,
                                               render_frame_seeded)

    hp = HostCompiled(builtin.make_diffuse_box_scene(), two_level="pure")
    hf = HostCompiled(builtin.make_diffuse_box_scene())
    cp = CameraParams.from_camera(builtin.make_indoor_camera(24, 24))
    base = RenderConfig.for_scene(
        hf.static, 24, 24, 1, use_defocus=True, use_pallas=False,
    )._replace(max_bounces=None, wave_limit=8, compact=True)
    tlp = RenderConfig.for_scene(
        hp.static, 24, 24, 1, use_defocus=True, use_pallas=False,
    )._replace(max_bounces=None, wave_limit=8, compact=True,
               use_pallas=True, pallas_interpret=True, algo="twolevelp",
               block_rays=1024)
    seed = initial_seeds(base, jnp.uint32(0))
    img_f, _ = render_frame_seeded(
        jax.device_put(hf.render_scene), base, cp, seed)
    img_p, _ = render_frame_seeded(
        jax.device_put(hp.render_scene), tlp, cp, seed)
    img_f = np.asarray(img_f)
    img_p = np.asarray(img_p)
    d = np.abs(img_f - img_p).max(axis=2)
    assert (d > 1e-3).mean() < 0.01
    assert abs(img_f.sum() - img_p.sum()) / abs(img_f.sum()) < 0.005


def test_twolevelp_memory_is_o_unique_tris():
    """The pure mode's whole point: device bytes must NOT scale with the
    instance count (shared meshes + O(I) transforms), while the flattened
    compile scales linearly (tests/test_scene.py pins that side)."""
    import jax

    from surf_tpu.scene import builtin
    from surf_tpu.scene.compile import HostCompiled

    def nbytes(rs):
        return sum(x.nbytes for x in jax.tree.leaves(rs)
                   if hasattr(x, "nbytes"))

    sizes = {}
    for n in (8, 32):
        h = HostCompiled(
            builtin.make_instanced_stress_scene(n, mesh_name="cube.obj"),
            two_level="pure")
        sizes[n] = nbytes(h.render_scene)
    # 4x the instances must cost only the O(I) arrays (< 5% growth here),
    # not 4x the geometry.
    assert sizes[32] < 1.2 * sizes[8], sizes


def test_twolevelp_animation_refresh():
    """Pure-mode refresh: moving an instance updates the per-instance
    forward/inverse transforms and world AABBs (no stale-transform
    traversal — ADVICE r4); the refreshed compile must match a FRESH pure
    compile of the same scene state exactly."""
    import jax
    import jax.numpy as jnp

    from surf_tpu.core import transform as tf
    from surf_tpu.scene import builtin
    from surf_tpu.scene.camera import CameraParams
    from surf_tpu.scene.compile import HostCompiled
    from surf_tpu.wavefront import RenderConfig
    from surf_tpu.wavefront.integrator import (initial_seeds,
                                               render_frame_seeded)

    def build():
        return builtin.make_diffuse_box_scene()

    sc = build()
    h = HostCompiled(sc, two_level="pure")
    cp = CameraParams.from_camera(builtin.make_indoor_camera(16, 16))
    cfg = RenderConfig.for_scene(
        h.static, 16, 16, 1, use_defocus=True, use_pallas=False,
    )._replace(max_bounces=None, wave_limit=6, compact=True,
               use_pallas=True, pallas_interpret=True, algo="twolevelp",
               block_rays=1024)
    seed = initial_seeds(cfg, jnp.uint32(0))

    def render(host):
        img, _ = render_frame_seeded(
            jax.device_put(host.render_scene), cfg, cp, seed)
        return np.asarray(img)

    img0 = render(h)
    # move the middle box and refresh
    moved = tf.translate(tf.identity(), [0.6, 0.2, 0.0])
    sc.instances[1].set_transform(moved)
    h.refresh()
    img1 = render(h)
    assert not np.allclose(img0, img1), "moving an instance must change it"

    sc2 = build()
    sc2.instances[1].set_transform(moved)
    h2 = HostCompiled(sc2, two_level="pure")
    img2 = render(h2)
    assert np.array_equal(img1, img2), "refresh must equal fresh compile"


def test_cap_total_vmem_budget():
    """Sum-of-caps auto-clamp (round 5): the phase-2 list block is
    sum(caps) KB of double-buffered scoped VMEM and overflowed the v5e
    16 MB limit at 32 x cap-512 (stress n=32 on device).  Many-instance
    builds must scale caps down (multiples of 8, sum <= MAX_CAP_TOTAL);
    absurd instance counts fail loudly."""
    from surf_tpu.accel.pallas_instanced import MAX_CAP_TOTAL

    cube = make_cube()
    # A mesh with enough leaf rows that cap_per_inst=512 binds: tile the
    # cube 600x (4.3k rows); instance it 40x so raw sum(caps) > budget.
    reps = 600
    off = np.arange(reps, dtype=np.float32)[:, None] * 3.0
    v0 = np.concatenate([cube.v0 + off[i] for i in range(reps)])
    v1 = np.concatenate([cube.v1 + off[i] for i in range(reps)])
    v2 = np.concatenate([cube.v2 + off[i] for i in range(reps)])
    insts = [(0, tf.translate(tf.identity(), [0.0, 4.0 * i, 0.0]),
              None, None) for i in range(40)]
    with pytest.warns(UserWarning, match="scoped-VMEM budget"):
        host = build_instanced_trace([(v0, v1, v2)], insts)
    caps = host.trace.meta.caps
    assert sum(caps) <= MAX_CAP_TOTAL
    assert all(c % 8 == 0 and c >= 8 for c in caps)

    tiny = [(0, tf.identity(), None, None)] * (MAX_CAP_TOTAL // 8 + 1)
    with pytest.raises(ValueError, match="VMEM budget"):
        build_instanced_trace([(cube.v0, cube.v1, cube.v2)], tiny)
