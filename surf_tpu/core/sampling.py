"""Vectorized sampling routines with reference-identical RNG consumption.

Replicates /root/reference/sources/surf_math.cpp:97-134 (hemisphere samplers)
and /root/reference/headers/camera.h:74-87 (defocus disk).  The reference uses
data-dependent rejection loops; here each lane redraws only while *it* is
unaccepted (masked seed advancement inside a ``lax.while_loop``), so every
lane's RNG stream consumes exactly the draws the sequential CPU code would —
the property the oracle-parity tests rely on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import rng
from .vecmath import (
    F32_2PI,
    F32_EPSILON,
    WORLD_RIGHT,
    WORLD_UP,
    cross,
    dot,
    normalize,
)


def _tangent_frame_dir(r0, r1, normal):
    """Cosine-weighted direction from two uniforms in the reference's
    tangent frame (surf_math.cpp:119-129). Differentiable in ``normal``."""
    r = jnp.sqrt(r0)
    theta = F32_2PI * r1
    dx = r * jnp.cos(theta)
    dy = r * jnp.sin(theta)
    dz = jnp.sqrt(jnp.float32(1.0) - r0)
    x_max = jnp.float32(1.0) - F32_EPSILON
    tmp = jnp.where(jnp.abs(normal[..., 0:1]) > x_max, WORLD_UP, WORLD_RIGHT)
    b = normalize(cross(normal, tmp))
    t = cross(b, normal)
    return dx[..., None] * t + dy[..., None] * b + dz[..., None] * normal


def cosine_hemisphere(seed: jnp.ndarray, normal: jnp.ndarray, active: jnp.ndarray):
    """randomOnHemisphereCosineWeighted (surf_math.cpp:116-134).

    Two f32 draws -> (r*cos, r*sin, sqrt(1-r0)) in a tangent frame built from
    WORLD_UP/WORLD_RIGHT; retries (re-drawing both) while dot(out, n) == 0.
    Only lanes where ``active`` consume randoms. Returns (seed, direction).

    Reverse-mode AD note: the rejection ``while_loop`` carries only the
    (uint32-derived, tangent-free) uniforms, with acceptance judged on a
    detached normal; the returned direction is reconstructed *outside* the
    loop from the live normal, so d(direction)/d(normal) flows while the loop
    itself never sees a perturbed input.
    """
    n_det = jax.lax.stop_gradient(normal)

    def draw(seed, mask):
        seed, r0 = rng.next_f32_masked(seed, mask)
        seed, r1 = rng.next_f32_masked(seed, mask)
        return seed, r0, r1

    seed, r0, r1 = draw(seed, active)

    def accept_fail(r0, r1, need):
        out = _tangent_frame_dir(r0, r1, n_det)
        return need & (dot(out, n_det) == jnp.float32(0.0))

    def cond(state):
        return jnp.any(state[3])

    def body(state):
        seed, r0, r1, need = state
        seed2, r0n, r1n = draw(seed, need)
        r0 = jnp.where(need, r0n, r0)
        r1 = jnp.where(need, r1n, r1)
        return seed2, r0, r1, accept_fail(r0, r1, need)

    seed, r0, r1, _ = jax.lax.while_loop(
        cond, body, (seed, r0, r1, accept_fail(r0, r1, active))
    )
    return seed, _tangent_frame_dir(r0, r1, normal)


def uniform_hemisphere(seed: jnp.ndarray, normal: jnp.ndarray, active: jnp.ndarray):
    """randomOnHemisphere (surf_math.cpp:97-114): rejection-sample the unit
    ball (3 draws per attempt), flip into the normal's hemisphere, normalize."""

    def attempt(seed, mask):
        seed, x = rng.next_f32_range_masked(seed, mask, -1.0, 1.0)
        seed, y = rng.next_f32_range_masked(seed, mask, -1.0, 1.0)
        seed, z = rng.next_f32_range_masked(seed, mask, -1.0, 1.0)
        d = jnp.stack([x, y, z], axis=-1)
        return seed, d

    seed, d = attempt(seed, active)
    need = active & (dot(d, d) > jnp.float32(1.0))

    def cond(state):
        return jnp.any(state[2])

    def body(state):
        seed, d, need = state
        seed, d2 = attempt(seed, need)
        d = jnp.where(need[..., None], d2, d)
        need = need & (dot(d, d) > jnp.float32(1.0))
        return seed, d, need

    seed, d, _ = jax.lax.while_loop(cond, body, (seed, d, need))
    d = jnp.where(dot(d, normal)[..., None] < jnp.float32(0.0), -d, d)
    return seed, normalize(d)


def unit_disk(seed: jnp.ndarray, active: jnp.ndarray):
    """Rejection-sampled point in the unit disk, 2 draws per attempt
    (camera.h:74-87 sampleDefocusDisk). Returns (seed, u, v)."""

    def attempt(seed, mask):
        seed, u = rng.next_f32_range_masked(seed, mask, -1.0, 1.0)
        seed, v = rng.next_f32_range_masked(seed, mask, -1.0, 1.0)
        return seed, u, v

    seed, u, v = attempt(seed, active)
    need = active & (u * u + v * v > jnp.float32(1.0))

    def cond(state):
        return jnp.any(state[3])

    def body(state):
        seed, u, v, need = state
        seed, u2, v2 = attempt(seed, need)
        u = jnp.where(need, u2, u)
        v = jnp.where(need, v2, v)
        need = need & (u * u + v * v > jnp.float32(1.0))
        return seed, u, v, need

    seed, u, v, _ = jax.lax.while_loop(cond, body, (seed, u, v, need))
    return seed, u, v
