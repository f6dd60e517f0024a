"""Scene JSON loader tests."""

import json

import numpy as np

from surf_tpu.scene.loader import camera_from_spec, load_scene_file

DOC = {
    "meshes": {
        "box": {"procedural": "cube"},
        "floor": {"procedural": "plane"},
    },
    "materials": {
        "red": {"albedo": [1, 0, 0]},
        "lamp": {"emission_color": [1, 0.8, 0.6], "emission_strength": 5.0},
    },
    "instances": [
        {"mesh": "floor", "material": "red",
         "transform": [["translate", [0, -1, 0]], ["scale", [10, 10, 10]]]},
        {"mesh": "box", "material": "lamp",
         "transform": [["translate", [-3, 4, 2]],
                        ["rotate", [90, [0, 0, -1]]],
                        ["scale", 0.5]]},
    ],
    "background": {"type": "gradient", "a": [0.8, 0.8, 0.8], "b": [0.1, 0.4, 0.6]},
    "camera": {"position": [0, 0, -7], "target": [0, 0, 0], "fov_y": 70,
               "focal_length": 7, "defocus_angle": 0.5},
}


def test_load_and_render(tmp_path):
    p = tmp_path / "scene.json"
    p.write_text(json.dumps(DOC))
    scene, cam_spec = load_scene_file(str(p))
    assert len(scene.instances) == 2
    assert scene.light_indices == [1]
    # translate-then-scale: translation unscaled (glm semantics)
    t = scene.instances[0].transform
    assert np.allclose(t[:3, 3], [0, -1, 0])
    assert np.isclose(t[0, 0], 10)

    cam = camera_from_spec(cam_spec, 16, 16)
    assert cam.focal_length == 7.0

    # end to end: compiles and renders finite radiance
    import jax.numpy as jnp

    from surf_tpu.scene.camera import CameraParams
    from surf_tpu.scene.compile import HostCompiled
    from surf_tpu.wavefront import RenderConfig, render_frame_jit

    host = HostCompiled(scene)
    cfg = RenderConfig.for_scene(host.static, 16, 16, 1, use_defocus=True)
    img = np.asarray(
        render_frame_jit(host.render_scene, cfg,
                         CameraParams.from_camera(cam), jnp.uint32(0))
    )
    assert np.isfinite(img).all() and img.sum() > 0


def test_cli_accepts_scene_file(tmp_path):
    p = tmp_path / "scene.json"
    p.write_text(json.dumps(DOC))
    from surf_tpu.app.cli import main

    out = str(tmp_path / "o.npy")
    rc = main(["--scene", str(p), "--width", "8", "--height", "8",
               "--spp", "1", "--frames", "1", "--output", out])
    assert rc == 0
    img = np.load(out)
    assert img.shape == (8, 8, 3)
