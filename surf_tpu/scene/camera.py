"""Thin-lens camera.

Host class mirrors the reference Camera (/root/reference/sources/camera.cpp,
headers/camera.h): position/forward/up basis built from a look-at target with
WORLD_UP, a precomputed view plane {firstPixel, uVector, vVector}, fovY in
degrees, focal length and defocus angle.

``view_plane_jnp`` re-derives the view plane *inside jit* from raw pose
parameters so pixel gradients flow to camera position / forward / focal
length (the reference computes it host-side once per change,
camera.cpp:28-46 — on TPU we fold it into the traced raygen so it is
differentiable and free after fusion).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

VIEWPORT_HEIGHT = 2.0  # camera.cpp:7

_WORLD_UP = np.array([0.0, 1.0, 0.0], np.float32)


def _normalize(v: np.ndarray) -> np.ndarray:
    return (v / np.linalg.norm(v)).astype(np.float32)


def _radians(deg: float) -> float:
    # surf_math.h:233 — deg * pi * 0.005555555555555f
    return float(
        np.float32(deg) * np.float32(3.14159265358979323846264) * np.float32(0.005555555555555)
    )


class Camera:
    def __init__(
        self,
        position,
        target,
        screen_width: int,
        screen_height: int,
        fov_y: float = 70.0,
        focal_length: float = 1.5,
        defocus_angle: float = 0.0,
    ):
        self.position = np.asarray(position, np.float32)
        self.forward = _normalize(np.asarray(target, np.float32) - self.position)
        right = _normalize(np.cross(_WORLD_UP, self.forward))
        self.up = _normalize(np.cross(self.forward, right))
        self.screen_width = int(screen_width)
        self.screen_height = int(screen_height)
        self.fov_y = float(fov_y)
        self.focal_length = float(focal_length)
        self.defocus_angle = float(defocus_angle)

    def right(self) -> np.ndarray:
        # camera.h:55-58: cross(up, forward), normalized
        return _normalize(np.cross(self.up, self.forward))

    def view_plane(self):
        """generateViewPlane (camera.cpp:28-46). Returns
        (first_pixel, u_vector, v_vector) as float32 arrays."""
        height_scale = np.float32(np.tan(_radians(self.fov_y) / 2.0))
        aspect = np.float32(self.screen_width) / np.float32(self.screen_height)
        viewport_h = np.float32(VIEWPORT_HEIGHT) * height_scale * np.float32(self.focal_length)
        viewport_w = aspect * viewport_h
        u_vector = self.right() * viewport_w
        v_vector = -1.0 * self.up * viewport_h
        u_delta = u_vector / np.float32(self.screen_width)
        v_delta = v_vector / np.float32(self.screen_height)
        top_left = (
            self.position
            + self.forward * np.float32(self.focal_length)
            - 0.5 * u_vector
            - 0.5 * v_vector
        )
        first_pixel = top_left + 0.5 * (u_delta + v_delta)
        return (
            first_pixel.astype(np.float32),
            u_vector.astype(np.float32),
            v_vector.astype(np.float32),
        )


class CameraParams(NamedTuple):
    """Raw differentiable camera parameters (jnp pytree)."""

    position: jnp.ndarray      # [3]
    forward: jnp.ndarray       # [3] (unit)
    up: jnp.ndarray            # [3] (unit)
    fov_y: jnp.ndarray         # scalar, degrees
    focal_length: jnp.ndarray  # scalar
    defocus_angle: jnp.ndarray # scalar, degrees

    @classmethod
    def from_camera(cls, cam: Camera) -> "CameraParams":
        return cls(
            position=jnp.asarray(cam.position, jnp.float32),
            forward=jnp.asarray(cam.forward, jnp.float32),
            up=jnp.asarray(cam.up, jnp.float32),
            fov_y=jnp.float32(cam.fov_y),
            focal_length=jnp.float32(cam.focal_length),
            defocus_angle=jnp.float32(cam.defocus_angle),
        )


class ViewPlane(NamedTuple):
    first_pixel: jnp.ndarray  # [3]
    u_vector: jnp.ndarray     # [3]
    v_vector: jnp.ndarray     # [3]
    right: jnp.ndarray        # [3]
    up: jnp.ndarray           # [3]
    position: jnp.ndarray     # [3]
    focal_length: jnp.ndarray
    defocus_angle: jnp.ndarray


def _radians_jnp(deg):
    return (jnp.float32(deg) * jnp.float32(3.14159265358979323846264)) * jnp.float32(
        0.005555555555555
    )


def view_plane_jnp(params: CameraParams, width: int, height: int) -> ViewPlane:
    """Traced generateViewPlane — differentiable w.r.t. every CameraParams
    leaf (camera.cpp:28-46 semantics)."""
    f = params.forward
    u_axis = params.up
    right = _cross(u_axis, f)
    right = right / jnp.sqrt(jnp.sum(right * right))
    height_scale = jnp.tan(_radians_jnp(params.fov_y) / jnp.float32(2.0))
    aspect = jnp.float32(width) / jnp.float32(height)
    viewport_h = jnp.float32(VIEWPORT_HEIGHT) * height_scale * params.focal_length
    viewport_w = aspect * viewport_h
    u_vector = right * viewport_w
    v_vector = jnp.float32(-1.0) * u_axis * viewport_h
    u_delta = u_vector / jnp.float32(width)
    v_delta = v_vector / jnp.float32(height)
    top_left = (
        params.position
        + f * params.focal_length
        - jnp.float32(0.5) * u_vector
        - jnp.float32(0.5) * v_vector
    )
    first_pixel = top_left + jnp.float32(0.5) * (u_delta + v_delta)
    return ViewPlane(
        first_pixel=first_pixel,
        u_vector=u_vector,
        v_vector=v_vector,
        right=right,
        up=u_axis,
        position=params.position,
        focal_length=params.focal_length,
        defocus_angle=params.defocus_angle,
    )


def _cross(a, b):
    return jnp.stack(
        [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ]
    )
