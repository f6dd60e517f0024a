"""Animation + per-frame BVH rebuild/refit flow (BASELINE config 4 shape,
scene.cpp:267-282 semantics) and the CLI animate path."""

import numpy as np

from surf_tpu.scene import builtin
from surf_tpu.scene.compile import HostCompiled


def test_refit_vs_rebuild_equivalent_images():
    """After animation, a refit BVH and a fully rebuilt BVH must produce the
    same hit results (topology differs; geometry coverage identical)."""
    import jax.numpy as jnp

    from surf_tpu.scene.camera import CameraParams
    from surf_tpu.wavefront import RenderConfig, render_frame_jit

    host_a = HostCompiled(builtin.make_indoor_scene())
    host_b = HostCompiled(builtin.make_indoor_scene())
    host_a.update(0.3, rebuild=False)  # refit
    host_b.update(0.3, rebuild=True)   # full SAH rebuild

    W = H = 16
    cam = builtin.make_indoor_camera(W, H)
    cp = CameraParams.from_camera(cam)
    cfg = RenderConfig.for_scene(host_a.static, W, H, 1, use_defocus=True)
    cfg_b = RenderConfig.for_scene(host_b.static, W, H, 1, use_defocus=True)
    a = np.asarray(render_frame_jit(host_a.render_scene, cfg, cp, jnp.uint32(0)))
    b = np.asarray(render_frame_jit(host_b.render_scene, cfg_b, cp, jnp.uint32(0)))
    diff = np.abs(a - b).max(axis=2)
    # identical geometry + RNG; only traversal order / fp fusion differs
    assert (diff > 1e-3).mean() < 0.02
    assert abs(a.sum() - b.sum()) / abs(a.sum()) < 0.01


def test_cli_animate_rebuild(tmp_path):
    from surf_tpu.app.cli import main

    rc = main([
        "--scene", "box", "--width", "8", "--height", "8", "--spp", "1",
        "--frames", "3", "--animate", "--rebuild-bvh",
        "--output", str(tmp_path / "o.npy"),
    ])
    assert rc == 0
    img = np.load(tmp_path / "o.npy")
    assert np.isfinite(img).all()


def test_scaling_sweep_smoke():
    """dist.scaling_sweep runs on 1 and 2 virtual devices and returns
    positive frame times."""
    import jax

    if len(jax.devices()) < 2:
        import pytest

        pytest.skip("needs multiple devices")
    from surf_tpu.dist import scaling_sweep
    from surf_tpu.scene.camera import CameraParams
    from surf_tpu.wavefront import RenderConfig

    host = HostCompiled(builtin.make_diffuse_box_scene())
    cam = builtin.make_indoor_camera(16, 16)
    cfg = RenderConfig.for_scene(host.static, 16, 16, 1, use_defocus=True)
    res = scaling_sweep(
        host.render_scene, cfg, CameraParams.from_camera(cam), (1, 2),
        repeats=1,
    )
    assert set(res) == {1, 2}
    assert all(v > 0 for v in res.values())
