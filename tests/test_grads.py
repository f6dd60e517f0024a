"""Gradient correctness (BASELINE config 3): AD through the wavefront
estimator vs central finite differences of the same fixed-seed estimator.

Because all discrete decisions (lobe, light pick, RR, Fresnel branch) are
deterministic in the uint32 seed lattice and detached from the differentiated
parameters, FD of the estimator converges to the AD derivative except where a
decision flips inside [θ-h, θ+h].  Material gradients barely flip (tight
tolerance); camera-pose FD is flip-prone at silhouettes, so it is checked at
small h with a robust criterion (SURVEY.md §7.3.4)."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surf_tpu.diff import DiffTargets, grad_image_loss, image_loss
from surf_tpu.scene import builtin
from surf_tpu.scene.camera import CameraParams
from surf_tpu.scene.compile import HostCompiled
from surf_tpu.wavefront import RenderConfig

warnings.filterwarnings("ignore", category=RuntimeWarning)

W = H = 16
SPP = 2


@pytest.fixture(scope="module")
def setup():
    host = HostCompiled(builtin.make_diffuse_box_scene())
    cam = builtin.make_indoor_camera(W, H)
    cfg = RenderConfig.for_scene(
        host.static, W, H, SPP, use_defocus=True
    )._replace(max_bounces=12)
    targets = DiffTargets.from_scene(
        host.render_scene, CameraParams.from_camera(cam)
    )
    loss, grads = grad_image_loss(host.render_scene, cfg, targets, jnp.uint32(0))
    return host, cfg, targets, float(loss), grads


def _fd(f_jit, base, idx, h):
    base = np.asarray(base, np.float64)
    bp = base.copy()
    bm = base.copy()
    bp[idx] += h
    bm[idx] -= h
    return (
        float(f_jit(jnp.asarray(bp, jnp.float32)))
        - float(f_jit(jnp.asarray(bm, jnp.float32)))
    ) / (2 * h)


def test_loss_finite_and_nonzero(setup):
    _, _, _, loss, grads = setup
    assert np.isfinite(loss) and loss > 0
    flat, _ = jax.tree.flatten(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert float(jnp.abs(grads.albedo).sum()) > 0


def test_albedo_gradients_match_fd(setup):
    host, cfg, targets, _, grads = setup
    f = jax.jit(
        lambda a: image_loss(
            host.render_scene, cfg, targets._replace(albedo=a), jnp.uint32(0)
        )
    )
    for idx in [(0, 0), (0, 2), (1, 1)]:
        fd = _fd(f, targets.albedo, idx, 1e-3)
        ad = float(np.asarray(grads.albedo)[idx])
        assert abs(fd - ad) < 0.05 * abs(ad) + 1e-4, (idx, fd, ad)


def test_emission_strength_gradient_matches_fd(setup):
    host, cfg, targets, _, grads = setup
    f = jax.jit(
        lambda e: image_loss(
            host.render_scene, cfg, targets._replace(emission_strength=e),
            jnp.uint32(0),
        )
    )
    fd = _fd(f, targets.emission_strength, (2,), 1e-3)  # the soft light
    ad = float(np.asarray(grads.emission_strength)[2])
    assert ad > 0  # brighter light -> brighter image
    assert abs(fd - ad) < 0.05 * abs(ad) + 1e-5, (fd, ad)


def test_unused_material_has_zero_gradient(setup):
    # Material 2 in the dedupe order has no diffuse surface visible? Instead:
    # check that the *dielectric* material's albedo gradient is zero in a
    # scene with no dielectric instance (diffuse box scene materials:
    # floor, diffuse, soft_light). Emission color of non-light materials
    # must not receive gradient either.
    _, _, _, _, grads = setup
    g_emit_color = np.asarray(grads.emission_color)
    # floor (0) and diffuse (1) are not lights: no emission path touches them
    assert np.allclose(g_emit_color[0], 0) and np.allclose(g_emit_color[1], 0)


def test_camera_position_gradient_matches_fd_small_h(setup):
    host, cfg, targets, _, grads = setup
    f = jax.jit(
        lambda p: image_loss(
            host.render_scene, cfg,
            targets._replace(camera=targets.camera._replace(position=p)),
            jnp.uint32(0),
        )
    )
    # Any single FD quotient can be poisoned by a decision flip inside
    # [θ-h, θ+h] (observed: one flipped path changes the quotient by ~0.3 at
    # h=3e-5).  Quotients at flip-free step sizes cluster at the true
    # derivative, so require the best of three step sizes to agree — with the
    # f32 noise floor (~loss*eps/h) as the absolute term.
    for ax in range(3):
        ad = float(np.asarray(grads.camera.position)[ax])
        fds = [_fd(f, targets.camera.position, (ax,), h) for h in (3e-4, 1e-4, 5e-5)]
        best = min(abs(fd - ad) for fd in fds)
        assert best < 0.6 * abs(ad) + 1e-3, (ax, fds, ad)


def test_focal_length_gradient_finite(setup):
    _, _, _, _, grads = setup
    assert np.isfinite(float(grads.camera.focal_length))


def test_inverse_rendering_step_descends():
    """One SGD step on albedo against a fixed reference image reduces L2 —
    the end-to-end inverse-rendering loop (config 3's purpose)."""
    host = HostCompiled(builtin.make_diffuse_box_scene())
    cam = builtin.make_indoor_camera(W, H)
    cfg = RenderConfig.for_scene(
        host.static, W, H, SPP, use_defocus=True
    )._replace(max_bounces=12)
    targets = DiffTargets.from_scene(
        host.render_scene, CameraParams.from_camera(cam)
    )
    from surf_tpu.diff.estimator import render_image_diff

    ref = jax.jit(
        lambda t: render_image_diff(host.render_scene, cfg, t, jnp.uint32(0)),
        static_argnums=(),
    )(targets)

    # Perturb the floor albedo, then descend.
    wrong = targets._replace(
        albedo=targets.albedo.at[0].set(jnp.asarray([0.2, 0.2, 0.2]))
    )
    loss0, g = grad_image_loss(
        host.render_scene, cfg, wrong, jnp.uint32(0), reference_image=ref
    )
    losses = []
    for lr in (2.0, 5.0, 10.0):
        stepped = wrong._replace(albedo=wrong.albedo - lr * g.albedo)
        l1, _ = grad_image_loss(
            host.render_scene, cfg, stepped, jnp.uint32(0), reference_image=ref
        )
        losses.append(float(l1))
    assert min(losses) < float(loss0), (float(loss0), losses)


def test_indoor_gradients_finite_all_materials():
    """NaN-regression gate (round 5): on the indoor scene at
    max_bounces>=3, three distinct 0*NaN cotangent leaks used to poison
    the dielectric/specular material rows AND the camera gradients —
    inf t/u/v from miss-lane re-intersection, ior=0 on non-dielectric
    lanes (inf refract partials riding the direction cotangent back
    through every wave), and p=0 RR lanes (inf rr_scale times zero
    transmission).  All gradients must be finite for every material."""
    host = HostCompiled(builtin.make_indoor_scene())
    cam = builtin.make_indoor_camera(W, H)
    cfg = RenderConfig.for_scene(
        host.static, W, H, SPP, use_defocus=True
    )._replace(max_bounces=6)
    targets = DiffTargets.from_scene(
        host.render_scene, CameraParams.from_camera(cam)
    )
    loss, grads = grad_image_loss(
        host.render_scene, cfg, targets, jnp.uint32(0))
    assert np.isfinite(float(loss))
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


def test_albedo_fd_exact_with_rr_disabled():
    """Tight CRN gradient gate (VERDICT r4 item 5): with cfg.rr=False the
    estimator has no discrete decision that moves under a material
    perturbation, so the fixed-seed central difference must match AD to
    float32 truncation (measured 2e-5 rel at 32^2; 1e-3 bound here).  The
    loose statistical bounds elsewhere could hide a systematic pdf bias —
    this one cannot."""
    host = HostCompiled(builtin.make_diffuse_box_scene())
    cam = builtin.make_indoor_camera(W, H)
    cfg = RenderConfig.for_scene(
        host.static, W, H, SPP, use_defocus=True
    )._replace(max_bounces=8, rr=False)
    targets = DiffTargets.from_scene(
        host.render_scene, CameraParams.from_camera(cam)
    )
    _, grads = grad_image_loss(host.render_scene, cfg, targets, jnp.uint32(0))
    ga = np.asarray(grads.albedo, np.float64)
    m, c = np.unravel_index(np.argmax(np.abs(ga)), ga.shape)
    ad = ga[m, c]

    f = jax.jit(lambda a: image_loss(
        host.render_scene, cfg, targets._replace(albedo=a), jnp.uint32(0)))
    base = np.asarray(targets.albedo, np.float64)
    h = 4e-3
    bp = base.copy(); bp[m, c] += h
    bm = base.copy(); bm[m, c] -= h
    fd = (float(f(jnp.asarray(bp, jnp.float32)))
          - float(f(jnp.asarray(bm, jnp.float32)))) / (2 * h)
    assert abs(fd - ad) / abs(ad) < 1e-3, (fd, ad)
