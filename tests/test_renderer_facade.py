"""IRenderer-shaped facade: progressive refinement + oracle/wavefront
cross-check through the high-level API."""

import numpy as np

from surf_tpu.app.renderer import (
    OracleRendererFacade,
    RendererConfigHost,
    WavefrontRenderer,
)
from surf_tpu.scene import builtin
from surf_tpu.scene.compile import HostCompiled


def test_facades_agree_and_refine():
    host = HostCompiled(builtin.make_diffuse_box_scene())
    cam = builtin.make_indoor_camera(16, 16)
    cfg = RendererConfigHost(max_bounces=None, samples_per_frame=2)

    wf = WavefrontRenderer(host, cam, cfg)
    orc = OracleRendererFacade(host, cam, RendererConfigHost(samples_per_frame=2))

    img_wf_1 = wf.render()
    img_or_1 = orc.render()
    assert wf.frame_info().total_samples == 2
    # equal seeds => near-identical images
    diff = np.abs(img_wf_1 - img_or_1).max(axis=2)
    assert (diff > 1e-3).mean() < 0.02

    # progressive refinement accumulates (different samples, same pixels)
    img_wf_2 = wf.render()
    assert wf.frame_info().total_samples == 4
    assert not np.array_equal(img_wf_1, img_wf_2)

    # clear resets the accumulator
    wf.clear_accumulator()
    assert wf.frame_info().total_samples == 4  # info reflects last frame
    img_wf_3 = wf.render()
    assert np.array_equal(np.asarray(img_wf_1), np.asarray(img_wf_3))


def test_energy_checksum_cross_impl():
    """The 'Lumen' invariant (renderer.cpp:191-201): both implementations
    converge to the same energy at equal seed."""
    host = HostCompiled(builtin.make_diffuse_box_scene())
    cam = builtin.make_indoor_camera(16, 16)
    wf = WavefrontRenderer(host, cam, RendererConfigHost(samples_per_frame=4))
    orc = OracleRendererFacade(host, cam, RendererConfigHost(samples_per_frame=4))
    wf.render()
    orc.render()
    e_wf = wf.frame_info().energy
    e_or = orc.frame_info().energy
    assert abs(e_wf - e_or) / abs(e_or) < 0.01
