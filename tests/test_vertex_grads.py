"""Vertex-position gradients (BASELINE config 3's third target).

The estimator re-intersects the chosen triangle differentiably and builds
normals/NEE sample points from the sampling-geometry arrays, so pixel
gradients flow into ``samp_v*`` directly — the traversal copy (trace
arrays) is detached.

FD validation uses a smooth aggregate parameter (vertical translation of the
whole floor slab) rather than a single vertex: per-vertex FD is dominated by
detached-decision flips (occlusion tests change value discretely), while a
rigid translation moves every floor hit smoothly."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np

from surf_tpu.scene import builtin
from surf_tpu.scene.camera import CameraParams
from surf_tpu.scene.compile import HostCompiled
from surf_tpu.wavefront import RenderConfig
from surf_tpu.wavefront.integrator import render_frame

warnings.filterwarnings("ignore", category=RuntimeWarning)


def test_vertex_gradient_flows_and_matches_fd():
    host = HostCompiled(builtin.make_diffuse_box_scene())
    W = H = 12
    cam = builtin.make_indoor_camera(W, H)
    cp = CameraParams.from_camera(cam)
    cfg = RenderConfig.for_scene(
        host.static, W, H, 1, use_defocus=True
    )._replace(max_bounces=6)

    # floor = instance 0: mask of its triangle rows
    o = int(host.inst_tri_offset[0])
    c = int(host.inst_tri_count[0])
    n_tris = host.static.tri_count
    mask = jnp.zeros((n_tris, 1), jnp.float32).at[o:o + c].set(1.0)
    dy_vec = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)

    base = host.render_scene

    def loss(dy):
        shift = mask * dy * dy_vec
        # Shift the traversal copies too (leaf order, via perm) so FD
        # evaluates a consistent world; the integrator stop-gradients the
        # trace arrays, so AD still differentiates only the shading path.
        tshift = jnp.take(shift, base.perm, axis=0)
        scene = base._replace(
            samp_v0=base.samp_v0 + shift,
            samp_v1=base.samp_v1 + shift,
            samp_v2=base.samp_v2 + shift,
            trace=base.trace._replace(
                tri_v0=base.trace.tri_v0 + tshift,
                tri_v1=base.trace.tri_v1 + tshift,
                tri_v2=base.trace.tri_v2 + tshift,
            ),
        )
        img = render_frame(scene, cfg, cp, jnp.uint32(0))
        return jnp.mean(img)

    f = jax.jit(loss)
    ad = float(jax.jit(jax.grad(loss))(jnp.float32(0.0)))
    assert np.isfinite(ad) and ad != 0.0

    fds = []
    for h in (1e-3, 5e-4, 2e-4):
        fds.append((float(f(jnp.float32(h))) - float(f(jnp.float32(-h)))) / (2 * h))
    best = min(abs(fd - ad) for fd in fds)
    assert best < 0.5 * abs(ad) + 1e-4, (fds, ad)


def test_per_vertex_gradient_plumbing():
    """Raw per-vertex gradients are finite and nonzero (plumbing check; FD
    equivalence is established by the smooth-parameter test above)."""
    host = HostCompiled(builtin.make_diffuse_box_scene())
    W = H = 8
    cam = builtin.make_indoor_camera(W, H)
    cp = CameraParams.from_camera(cam)
    cfg = RenderConfig.for_scene(
        host.static, W, H, 1, use_defocus=True
    )._replace(max_bounces=4)

    def loss(v0):
        img = render_frame(
            host.render_scene._replace(samp_v0=v0), cfg, cp, jnp.uint32(0)
        )
        return jnp.mean(img)

    grad = np.asarray(jax.jit(jax.grad(loss))(host.render_scene.samp_v0))
    assert np.isfinite(grad).all()
    assert np.abs(grad).sum() > 0
