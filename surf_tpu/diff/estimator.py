"""Differentiable rendering: pixel gradients w.r.t. materials, camera pose,
and scene geometry (BASELINE config 3).

The reference has no differentiability; this subsystem is the TPU build's
extension (BASELINE.json north star).  Estimator design (SURVEY.md §7.3.4):

- All *discrete* sampling decisions — lobe selection, light/triangle picks,
  Russian-roulette termination, Fresnel reflect/refract choice — are taken on
  detached values (uint32 RNG + stop_gradient'ed probabilities in
  wavefront/integrator.py).  With the sampling measure fixed at the
  linearization point, reverse-mode AD of the per-sample radiance is an
  unbiased estimator of the gradient of expected radiance for targets that
  do not alter the sampling distribution (albedo, emission, absorption,
  camera pose, vertices); visibility discontinuities contribute the usual
  interior-derivative bias at silhouettes.
- BVH traversal is non-differentiable (while_loop); the integrator
  re-intersects the *chosen* triangle differentiably, so dI/d(camera) and
  dI/d(vertex) flow through hit positions, normals and NEE sample points.
- The bounce loop must be a statically-bounded ``fori_loop``
  (``RenderConfig.max_bounces``) — reverse AD cannot cross ``while_loop``;
  RR makes a cap of ~32-64 statistically indistinguishable from unbounded
  (tested in test_render_parity.py).

Gradient targets exposed: the whole ``RenderScene`` pytree is differentiable
where it makes sense; ``DiffTargets`` carries the canonical trio (material
table slices, camera params) used by the benchmark configs.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..scene.camera import CameraParams
from ..scene.compile import RenderScene
from ..wavefront.integrator import RenderConfig, render_frame


class DiffTargets(NamedTuple):
    """Canonical differentiable parameter bundle (config 3)."""

    albedo: jnp.ndarray           # [M,3]
    emission_color: jnp.ndarray   # [M,3]
    emission_strength: jnp.ndarray  # [M]
    absorption: jnp.ndarray       # [M,3]
    camera: CameraParams

    @classmethod
    def from_scene(cls, scene: RenderScene, camera: CameraParams) -> "DiffTargets":
        return cls(
            albedo=scene.mat_albedo,
            emission_color=scene.mat_emission_color,
            emission_strength=scene.mat_emission_strength,
            absorption=scene.mat_absorption,
            camera=camera,
        )


def apply_targets(scene: RenderScene, targets: DiffTargets) -> RenderScene:
    return scene._replace(
        mat_albedo=targets.albedo,
        mat_emission_color=targets.emission_color,
        mat_emission_strength=targets.emission_strength,
        mat_absorption=targets.absorption,
    )


def render_image_diff(
    scene: RenderScene,
    cfg: RenderConfig,
    targets: DiffTargets,
    total_samples,
) -> jnp.ndarray:
    """Differentiable frame render (radiance mean over cfg.spp samples)."""
    assert cfg.max_bounces is not None, (
        "differentiable rendering needs a static bounce cap "
        "(RenderConfig.max_bounces)"
    )
    img = render_frame(apply_targets(scene, targets), cfg, targets.camera,
                       total_samples)
    return img / jnp.float32(cfg.spp)


def image_loss(
    scene: RenderScene,
    cfg: RenderConfig,
    targets: DiffTargets,
    total_samples,
    loss_fn: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
    reference_image: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Scalar objective over the rendered image.

    Default: mean radiance (a smooth probe for FD validation).  With
    ``reference_image``: L2 — the inverse-rendering objective."""
    img = render_image_diff(scene, cfg, targets, total_samples)
    if loss_fn is not None:
        return loss_fn(img)
    if reference_image is not None:
        d = img - reference_image
        return jnp.mean(d * d)
    return jnp.mean(img)


@partial(jax.jit, static_argnums=(1,))
def grad_image_loss(scene: RenderScene, cfg: RenderConfig, targets: DiffTargets,
                    total_samples, reference_image=None):
    """(loss, dloss/dtargets) — jitted; gradients flow to material table and
    camera pose through the full wavefront estimator."""
    def f(t):
        return image_loss(scene, cfg, t, total_samples,
                          reference_image=reference_image)

    return jax.value_and_grad(f)(targets)
